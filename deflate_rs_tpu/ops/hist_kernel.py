"""Pallas TPU kernel: fused per-quarter symbol histograms.

The XLA path (symbolmap.histogram_onehot per quarter) materializes the
one-hot masks in HBM — for a 64 KiB chunk that is E x 286 bools for the
litlen side alone (~19 MB), so the stage is HBM-bound at ~0.195 ms/chunk
(docs/perf_notes.md round-3 stage table) for ~19M one-bit compares of real
work.  This kernel keeps the chunk's symbol arrays VMEM-resident and loops
over bins with full-width compare+reduce — the same arithmetic, zero HBM
traffic beyond one read of the inputs and one tiny write of the counts.

Both histograms ride one program: litlen symbols (286 bins, counted per
quarter over all token positions) and distance codes (30 bins, counted per
quarter over match-token positions).  Invalid positions are pre-masked by
the caller into an out-of-range bin (no separate mask operand).

Counts are exact integers, so kernel output is bit-identical to the XLA
formulation (asserted in tests/test_hist_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
NBINS_L = 286
NBINS_D = 30
OUT_LANES = 3 * LANES  # 286 -> 384


def _kernel(lsym_ref, dcode_ref, lout_ref, dout_ref, *, nq: int):
    """lsym_ref/dcode_ref: (1, R, 128) int32 (out-of-range bin = inert).
    lout_ref: (1, 8, 384) int32 — rows 0..nq-1 hold the litlen counts.
    dout_ref: (1, 8, 128) int32 — rows 0..nq-1 hold the dist counts."""
    R = lsym_ref.shape[1]
    RQ = R // nq
    lsym = lsym_ref[0]
    dcode = dcode_ref[0]

    rown = jax.lax.broadcasted_iota(jnp.int32, (8, OUT_LANES), 0)
    lanen = jax.lax.broadcasted_iota(jnp.int32, (8, OUT_LANES), 1)
    rownd = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    laned = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)

    def body(b, accs):
        lacc, dacc = accs
        leq = (lsym == b).astype(jnp.int32)
        deq = (dcode == b).astype(jnp.int32)
        for q in range(nq):  # static quarter slices
            lcnt = jnp.sum(leq[q * RQ : (q + 1) * RQ])
            lacc = lacc + jnp.where((rown == q) & (lanen == b), lcnt, 0)
            dcnt = jnp.sum(deq[q * RQ : (q + 1) * RQ])
            dacc = dacc + jnp.where(
                (rownd == q) & (laned == b) & (b < NBINS_D), dcnt, 0
            )
        return lacc, dacc

    lacc, dacc = jax.lax.fori_loop(
        0, NBINS_L,
        body,
        (jnp.zeros((8, OUT_LANES), jnp.int32), jnp.zeros((8, LANES), jnp.int32)),
    )
    lout_ref[0] = lacc
    dout_ref[0] = dacc


@functools.lru_cache(maxsize=None)
def _hist_call(B: int, R: int, nq: int, interpret: bool = False):
    kern = functools.partial(_kernel, nq=nq)
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((B, 8, OUT_LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, 8, LANES), jnp.int32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, OUT_LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )


def quarter_histograms_batched(lsym_eff, dcode_eff, nq: int,
                               interpret: bool = False):
    """Per-quarter litlen + dist histograms for a batch of chunks.

    Args:
      lsym_eff: int32[B, E] litlen symbols, any value >= 286 where the
        position is not a token (it then counts nowhere).
      dcode_eff: int32[B, E] dist codes, >= 30 where not a match token.
      nq: static quarter count (E % (128*nq) == 0).

    Returns (lf[B, nq, 286], df[B, nq, 30]) int32.
    """
    B, E = lsym_eff.shape
    R = E // LANES
    assert R % nq == 0
    ls = lsym_eff.reshape(B, R, LANES)
    dc = dcode_eff.reshape(B, R, LANES)
    lf, df = _hist_call(B, R, nq, interpret)(ls, dc)
    return lf[:, :nq, :NBINS_L], df[:, :nq, :NBINS_D]


@functools.lru_cache(maxsize=None)
def _make_single(nq: int):
    @jax.custom_batching.custom_vmap
    def hq(lsym_eff, dcode_eff):
        lf, df = quarter_histograms_batched(lsym_eff[None], dcode_eff[None], nq)
        return lf[0], df[0]

    @hq.def_vmap
    def hq_vmap(axis_size, in_batched, lsym_eff, dcode_eff):
        lb, db = in_batched
        if not lb:
            lsym_eff = jnp.broadcast_to(lsym_eff, (axis_size,) + lsym_eff.shape)
        if not db:
            dcode_eff = jnp.broadcast_to(dcode_eff, (axis_size,) + dcode_eff.shape)
        out = quarter_histograms_batched(lsym_eff, dcode_eff, nq)
        return out, (True, True)

    return hq


def quarter_histograms(lsym_eff, dcode_eff, nq: int):
    """Single-chunk (vmap-aware) fused histograms; see the batched form."""
    return _make_single(nq)(lsym_eff, dcode_eff)
