"""Pallas TPU kernel: fused token-field construction.

The XLA path builds each chunk's token bit fields with two one-hot MXU table
lookups per quarter (symbolmap.table_lookup): exact, but the f32 one-hot
operand streams E x 288 floats (~75 MB per chunk) through HBM per lookup —
measured 0.112 ms for the litlen side alone.  This kernel keeps the chunk's
symbol arrays VMEM-resident and resolves the (tiny, <= 288-entry) packed
code|len<<16 tables with a bin loop of compare-selects — the table entry
rides as a scalar broadcast per bin, so no one-hot is ever materialized.

One grid program per (chunk, quarter): each quarter's tokens are coded with
its owning block's tables (the per-quarter rows the caller selects from the
chosen composition).  Outputs are the four per-position field arrays
(t1v/t1b/t2v/t2b); the caller interleaves (t1, t2) into the field list
exactly as the XLA path does, so the packed bitstream is bit-identical
(asserted in tests/test_field_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
NSYM_L = 288
NSYM_D = 30


def _kernel(huff_ref, lsym_ref, len_en_ref, len_ev_ref, dcode_ref,
            dist_en_ref, dist_ev_ref, ltbl_ref, dtbl_ref,
            t1v_ref, t1b_ref, t2v_ref, t2b_ref):
    """Refs per (chunk, quarter) block:
    lsym/len_*/dcode/dist_*: (1, RQ, 128) int32 — lsym 999 = not a token,
      dcode 99 = not a match token (validity is encoded in the values).
    ltbl/dtbl: (1, 8, 512)/(1, 8, 128) int32 — row 0 holds the owning
      block's packed code | len << 16 table (tile-conformant VMEM blocks;
      the bin loops below are STATICALLY unrolled so every table read is a
      static-index scalar load).
    huff_ref: scalar-prefetch int32[B] — 0 for stored chunks (all widths 0).
    """
    b = pl.program_id(0)
    RQ = lsym_ref.shape[1]
    lsym = lsym_ref[0]
    dcode = dcode_ref[0]
    huff = huff_ref[b] != 0

    def lookup(vals, tbl_ref, nsym):
        acc = jnp.zeros((RQ, LANES), jnp.int32)
        for s in range(nsym):  # static unroll: static scalar VMEM reads
            acc = acc + jnp.where(vals == s, tbl_ref[0, 0, s], 0)
        return acc

    l_pack = lookup(lsym, ltbl_ref, NSYM_L)
    d_pack = lookup(dcode, dtbl_ref, NSYM_D)

    tok_on = (lsym < NSYM_L) & huff
    mt = (dcode < NSYM_D) & huff

    lsym_len = (l_pack >> 16).astype(jnp.uint32)
    t1v_ref[0] = (
        (l_pack & 0xFFFF).astype(jnp.uint32)
        | (len_ev_ref[0].astype(jnp.uint32) << lsym_len)
    ).astype(jnp.int32)
    t1b_ref[0] = jnp.where(tok_on, (l_pack >> 16) + len_en_ref[0], 0)
    d_len = (d_pack >> 16).astype(jnp.uint32)
    t2v_ref[0] = (
        (d_pack & 0xFFFF).astype(jnp.uint32)
        | (dist_ev_ref[0].astype(jnp.uint32) << d_len)
    ).astype(jnp.int32)
    t2b_ref[0] = jnp.where(mt, (d_pack >> 16) + dist_en_ref[0], 0)


@functools.lru_cache(maxsize=None)
def _field_call(B: int, RQ: int, nq: int, interpret: bool = False):
    # Index maps take (grid..., scalar_prefetch_ref) under
    # PrefetchScalarGridSpec; the trailing ref is unused here.
    def vspec():
        return pl.BlockSpec(
            (1, RQ, LANES), lambda b, q, s: (b, q, 0), memory_space=pltpu.VMEM
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nq),
        in_specs=[
            vspec(), vspec(), vspec(), vspec(), vspec(), vspec(),
            # Table rows ride 8-sublane-padded VMEM blocks (TPU block shapes
            # must tile (8, 128)); row 0 carries the table.
            pl.BlockSpec((1, 8, 512), lambda b, q, s: (b, q, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, q, s: (b, q, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(vspec(), vspec(), vspec(), vspec()),
    )
    return pl.pallas_call(
        _kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, nq * RQ, LANES), jnp.int32) for _ in range(4)
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )


def token_fields_batched(huff, lsym_eff, len_en, len_ev, dcode_eff,
                         dist_en, dist_ev, l_pack_q, d_pack_q,
                         interpret: bool = False):
    """Token field values/widths for a batch of chunks.

    Args:
      huff: int32[B] — 1 if the chunk emits Huffman tokens, 0 if stored.
      lsym_eff: int32[B, E] litlen symbol per position, 999 where not a
        token (those positions emit width-0 fields).
      len_en/len_ev: int32[B, E] length extra-bit count/value (0 for
        literals).
      dcode_eff: int32[B, E] dist code, 99 where not a match token.
      dist_en/dist_ev: int32[B, E] distance extra bits.
      l_pack_q: int32[B, nq, 288] packed litlen code|len<<16 per quarter.
      d_pack_q: int32[B, nq, 30] packed dist rows per quarter.

    Returns (t1v, t1b, t2v, t2b): int32[B, E] field arrays (t1v/t2v carry
    uint32 bit patterns).
    """
    B, E = lsym_eff.shape
    nq = l_pack_q.shape[1]
    assert E % (LANES * nq) == 0
    RQ = E // (LANES * nq)

    def shape3(a):
        return a.reshape(B, nq * RQ, LANES)

    ltbl = (
        jnp.zeros((B, nq * 8, 512), jnp.int32)
        .at[:, ::8, :NSYM_L].set(l_pack_q)
    )
    dtbl = (
        jnp.zeros((B, nq * 8, 128), jnp.int32)
        .at[:, ::8, :NSYM_D].set(d_pack_q)
    )
    outs = _field_call(B, RQ, nq, interpret)(
        huff.astype(jnp.int32),
        shape3(lsym_eff), shape3(len_en), shape3(len_ev),
        shape3(dcode_eff), shape3(dist_en), shape3(dist_ev),
        ltbl, dtbl,
    )
    return tuple(o.reshape(B, E) for o in outs)


@functools.lru_cache(maxsize=None)
def _make_single(nq: int):
    @jax.custom_batching.custom_vmap
    def tf(huff, lsym_eff, len_en, len_ev, dcode_eff, dist_en, dist_ev,
           l_pack_q, d_pack_q):
        outs = token_fields_batched(
            huff[None], lsym_eff[None], len_en[None], len_ev[None],
            dcode_eff[None], dist_en[None], dist_ev[None],
            l_pack_q[None], d_pack_q[None],
        )
        return tuple(o[0] for o in outs)

    @tf.def_vmap
    def tf_vmap(axis_size, in_batched, *args):
        bc = []
        for a, b in zip(args, in_batched):
            if not b:
                a = jnp.broadcast_to(a, (axis_size,) + a.shape)
            bc.append(a)
        return token_fields_batched(*bc), (True,) * 4

    return tf


def token_fields(huff, lsym_eff, len_en, len_ev, dcode_eff, dist_en,
                 dist_ev, l_pack_q, d_pack_q):
    """Single-chunk (vmap-aware) fused token fields; see the batched form."""
    nq = l_pack_q.shape[0]
    return _make_single(nq)(
        jnp.asarray(huff), lsym_eff, len_en, len_ev, dcode_eff, dist_en,
        dist_ev, l_pack_q, d_pack_q,
    )
