"""Pallas TPU kernel: batched package-merge code-length construction.

The XLA formulation (package_merge.py) runs max_len-1 sequential levels of
(pair + sort + cumsum) on tiny (rows, 572) arrays — correct, but on TPU it is
DISPATCH-bound: ~80 small ops at a few microseconds each put the 15-level
chain at ~0.30 ms/chunk (scripts/downstream_timing.py), the single largest
downstream cost.  This kernel runs the whole construction — all levels, all
rows — as ONE Mosaic program on VMEM-resident data:

* rows (one independent alphabet each) ride the 128-lane axis;
* each level's merged list lives on the sublane axis (LL = 2*LP entries);
* the per-level sort is a BITONIC MERGE (leaves ascending ++ packages
  descending, then the standard halving network): package values are pairwise
  sums of a sorted list, hence already sorted — a full sort is never needed;
* the backward selection pass counts leaves with masked reductions instead of
  the XLA path's per-level dynamic index.

Entries are packed ``value*2 | kind`` exactly like the XLA path (kind 0 =
leaf, so equal-value leaves order before packages by integer order), making
the kernel's selected-leaf counts — and therefore the resulting code lengths
— bit-identical to the XLA path (tested in tests/test_huffman.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .package_merge import _BIG

LANES = 128


def _bitonic_merge(x, LP: int):
    """Sort a bitonic (LL, 128) sequence with the standard halving network.

    Mosaic has no ``rev`` lowering, so callers supply the second half already
    DESCENDING (the leaves ride in twice, ascending and descending — the
    descending copy is reversed for free in XLA outside the kernel).
    """
    LL = 2 * LP
    d = LP
    while d >= 1:
        y = x.reshape(LL // (2 * d), 2, d, LANES)
        a = y[:, 0]
        b = y[:, 1]
        mn = jnp.minimum(a, b)
        mx = jnp.maximum(a, b)
        x = jnp.stack([mn, mx], axis=1).reshape(LL, LANES)
        d //= 2
    return x


def _pm_kernel(leaf_asc_ref, leaf_desc_ref, out_ref, lvl_ref, *, levels: int,
               LP: int):
    """leaf_*_ref: (LP, 128) int32 frequency-sorted leaf values (_BIG = pad),
    ascending / descending per lane.  out_ref: (LP, 128) lengths-by-rank.
    lvl_ref: (levels+1, LL, 128) scratch holding each level's leaf mask.

    Both passes are fori_loops so Mosaic reuses one iteration's worth of
    temporaries (fully unrolled, the merge network's live values blow the
    16 MB VMEM stack)."""
    LL = 2 * LP
    leaves = leaf_asc_ref[:]
    leaf_packed_desc = leaf_desc_ref[:] * 2
    pad = jnp.full((LP, LANES), _BIG * 2 + 1, jnp.int32)

    packed0 = jnp.concatenate([leaves * 2, pad], axis=0)
    lvl_ref[pl.ds(0, 1), :, :] = (1 - (packed0 & 1))[None]

    def fwd(t, packed):
        half = packed.reshape(LP, 2, LANES)
        pv = jnp.minimum((half[:, 0] >> 1) + (half[:, 1] >> 1), _BIG)
        packed = _bitonic_merge(
            jnp.concatenate([pv * 2 + 1, leaf_packed_desc], axis=0), LP
        )
        lvl_ref[pl.ds(t, 1), :, :] = (1 - (packed & 1))[None]
        return packed

    jax.lax.fori_loop(1, levels + 1, fwd, packed0)

    m = jnp.sum((leaves < _BIG).astype(jnp.int32), axis=0, keepdims=True)
    rank = jax.lax.broadcasted_iota(jnp.int32, (LP, LANES), 0)
    srank = jax.lax.broadcasted_iota(jnp.int32, (LL, LANES), 0)

    def bwd(i, carry):
        n_sel, lengths = carry
        t = levels - i  # level 1 (last stored) first, deepest (0) last
        take = jnp.clip(n_sel, 0, LL)
        is_leaf = lvl_ref[pl.ds(t, 1), :, :][0]
        leaf_count = jnp.sum(
            jnp.where(srank < take, is_leaf, 0), axis=0, keepdims=True
        )
        lengths = lengths + (rank < leaf_count).astype(jnp.int32)
        return 2 * (take - leaf_count), lengths

    n_sel0 = jnp.maximum(2 * m - 2, 0)  # (1, 128)
    _, lengths = jax.lax.fori_loop(
        0, levels + 1, bwd, (n_sel0, jnp.zeros((LP, LANES), jnp.int32))
    )
    out_ref[:] = lengths


@functools.lru_cache(maxsize=None)
def _pm_call(LP: int, levels: int, G: int, interpret: bool = False):
    from jax.experimental.pallas import tpu as pltpu

    kern = functools.partial(_pm_kernel, levels=levels, LP=LP)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((LP, G * LANES), jnp.int32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((LP, LANES), lambda g: (0, g)),
            pl.BlockSpec((LP, LANES), lambda g: (0, g)),
        ],
        out_specs=pl.BlockSpec((LP, LANES), lambda g: (0, g)),
        scratch_shapes=[pltpu.VMEM((levels + 1, 2 * LP, LANES), jnp.int32)],
        interpret=interpret,
    )


def package_merge_rows_tpu(freqs, max_len: int, interpret: bool = False):
    """Optimal length-limited code lengths for a BATCH of alphabets.

    Args:
      freqs: int32[R, A] frequencies (0 = unused), values < 2**20.
      max_len: static depth limit.

    Returns:
      int32[R, A] code lengths, bit-identical to
      vmap(package_merge_lengths)(freqs).
    """
    R, A = freqs.shape
    LP = max(32, 1 << (A - 1).bit_length())  # leaves padded to a power of two
    Rp = -(-R // LANES) * LANES
    sym = jnp.arange(A, dtype=jnp.int32)
    active = freqs > 0
    m = jnp.sum(active.astype(jnp.int32), axis=1, keepdims=True)

    # Frequency-sorted leaves, stable tie on symbol index (canonical): one
    # payload sort carrying the permutation; no gathers.
    leaf_key = jnp.where(active, freqs * 512 + sym[None, :], _BIG + sym[None, :])
    skey, sperm, svals = jax.lax.sort(
        [leaf_key, jnp.broadcast_to(sym[None, :], (R, A)), freqs],
        num_keys=1, is_stable=False,  # keys are unique (…*512 + sym)
    )
    leaf_vals = jnp.where(skey < _BIG, svals, _BIG)

    # Pad rows to the lane tile and symbols to LP, transpose to (LP, Rp).
    lv = jnp.full((Rp, LP), _BIG, jnp.int32)
    lv = lv.at[:R, :A].set(leaf_vals)
    lvt = lv.T
    out = _pm_call(LP, max_len - 1, Rp // LANES, interpret)(lvt, lvt[::-1])
    lengths_by_rank = out.T[:R, :A]

    # Unsort ranks back to symbol order (payload sort by the permutation).
    lengths = jax.lax.sort([sperm, lengths_by_rank], num_keys=1, is_stable=False)[1]
    single = jnp.where(active, 1, 0)
    lengths = jnp.where(m > 1, lengths, jnp.where(m == 1, single, 0))
    return jnp.where(active, lengths, 0)
