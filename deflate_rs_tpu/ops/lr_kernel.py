"""Pallas TPU kernel: the long-range dominant-distance measurement.

XLA cannot run this stage at speed: the S x M shifted-window fetches are
~1000 distinct dynamic offsets, and every XLA formulation tried (vmapped
slices -> row gather, fori_loop collect, statically unrolled slices) paid a
~2 us/op device floor — +2.3 ms/chunk minimum for the ratio-closing budget
(scripts/probes/lr_substage.py, default_lr_timing.py).  In Mosaic the fetch
is one dynamic row-slice of the VMEM-resident phase table plus one lane
roll per pair, and the run scan is seven capped-doubling passes on (8, 128)
tiles — ~50 vector ops per pair over ~1K words.

Math (identical to longrange.local_dominant_lengths's word-space form):

* phases[r] holds the packed words P[x] (bytes x..x+3) for x ≡ r (mod 4),
  so the shifted compare row for (segment s, distance d) — P[off + 4k] with
  off = WINDOW + s*L - d — is phase row off&3 sliced at word offset off>>2:
  ONE contiguous window, lane-aligned with a roll by (off>>2) & 127.
* x = base ^ shifted; a word is `full` iff x == 0; `mb(x)` counts its
  matching low bytes.  Runs from each word start: (cnt, tmb) doubling where
  cnt = consecutive full words (>= 66 = MAX_MATCH words saturates) and
  tmb = the first bad word's matched-byte prefix: run0 = 4*cnt + tmb,
  byte-exact below the MAX_MATCH clip.
* cross-dominant winner accumulators per segment word: best run, its
  distance, and the xor of word w under the distance that wins word w+1
  (the byte-offset expansion outside the kernel needs exactly that row).

Outputs per chunk: run0/dist/xor-next arrays of shape [S, 8*128] segment
windows (owned words + overhang + padding; words past the exactness window
are masked to mismatch in-kernel so they can only underclaim).  The byte
expansion and validity clipping stay in XLA (longrange.finish_from_winner).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MAX_MATCH, WINDOW_SIZE

LANES = 128
SEG_ROWS = 8          # window rows at the default segment geometry (S=32)


def seg_rows_for(L_words: int) -> int:
    """Window rows for a segment of ``L_words`` owned words: the owned words
    plus the MAX_MATCH overhang, rounded up to whole 128-lane rows.  Round-5
    parameterization: at S=64 (the default preset's contract budget) the
    segment needs only 4 rows, halving the kernel's per-(s, m) vector work
    and its output stores vs the fixed 8-row window.
    """
    valid_w = L_words + (MAX_MATCH + 6) // 4 + 1
    return -(-valid_w // LANES)


def _mb(x):
    """Matching low bytes of an xor'd packed word (0..4)."""
    m0 = (x & 0x000000FF) == 0
    m1 = (x & 0x0000FFFF) == 0
    m2 = (x & 0x00FFFFFF) == 0
    m3 = x == 0
    return m0.astype(jnp.int32) + m1 + m2 + m3


def _shift_flat(a9, step, SR):
    """Flat-order shift of an (SR+1, 128) tile whose last row is the
    successor row (or zeros): out[j, l] = flat[j*128 + l + step].  One lane
    roll + one select; ``step`` may be traced (0 <= step < 128).  A left
    roll by ``step`` is expressed as a right roll by 128 - step (pltpu.roll
    requires non-negative shifts; 128 == identity)."""
    rolled = pltpu.roll(a9, LANES - step, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SR, LANES), 1)
    return jnp.where(lane < LANES - step, rolled[:SR],
                     rolled[1 : SR + 1])


def _z(a):
    return jnp.concatenate([a, jnp.zeros((1, LANES), a.dtype)], axis=0)


def _kernel(doms_ref, phases_ref, base_ref, run_ref, dist_ref, xn_ref, *,
            S: int, M: int, L_words: int, NPr: int, valid_w: int, SR: int):
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (SR, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (SR, LANES), 1)
    )
    pad_bad = flat >= valid_w  # beyond the exactness window: force mismatch

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    for s in range(S):
        base = base_ref[0, pl.ds((s * L_words) // LANES, SR), :]
        drow = doms_ref[0, pl.ds(s, 1), :]  # (1, 128) this segment's doms
        # Live dominants form a PREFIX of the row (freq-descending selection
        # masks dead slots to 0 — longrange._select_dominants), so the loop
        # runs only to the live count: segments whose harvest found few
        # distinct capped-claim distances (homogeneous text) skip most of
        # the measurement work.  Identical output: a d == 0 iteration can
        # never win (`better` requires d > 0).
        m_cnt = jnp.sum((drow != 0).astype(jnp.int32))
        c_s = WINDOW_SIZE + s * L_words * 4  # static

        def m_body(m, acc):
            acc_run, acc_dist, acc_xn = acc
            # Lane-m extraction as a masked reduce (a dynamic-amount roll
            # costs a multi-stage shuffle; the reduce is 2 cheap vector ops).
            d = jnp.sum(jnp.where(lane1 == m, drow, 0))
            off = c_s - d
            q0 = off >> 2
            rowstart = (off & 3) * NPr + (q0 >> 7)
            k = q0 & 127
            a9 = phases_ref[0, pl.ds(rowstart, SR + 1), :]
            sh = _shift_flat(a9, k, SR)
            x = base ^ sh
            x = jnp.where(pad_bad, jnp.uint32(1), x)
            full = x == 0
            mb = _mb(x)
            # (cnt, tmb) packed as cnt*8 + tmb (tmb <= 4 < 8): each doubling
            # pass is ONE flat shift instead of two — rolls are the kernel's
            # cost (lane shuffles), so this halves the scan's roll count.
            # Composition: cnt[w] == step extends with the successor state
            # plus 8*step full words.
            packed = jnp.where(full, 8, mb)
            step = 1
            while step <= 64:
                ext = (packed >> 3) == step
                packed = jnp.where(
                    ext, _shift_flat(_z(packed), step, SR) + 8 * step, packed
                )
                step *= 2
            run0 = ((packed >> 3) << 2) + (packed & 7)
            better = (d > 0) & (run0 > acc_run)
            acc_run = jnp.where(better, run0, acc_run)
            acc_dist = jnp.where(better, d, acc_dist)
            b_next = _shift_flat(_z(better.astype(jnp.int32)), 1, SR) != 0
            acc_xn = jnp.where(b_next, x, acc_xn)
            return acc_run, acc_dist, acc_xn

        init = (
            jnp.full((SR, LANES), -1, jnp.int32),
            jnp.zeros((SR, LANES), jnp.int32),
            jnp.zeros((SR, LANES), jnp.uint32),
        )
        acc_run, acc_dist, acc_xn = jax.lax.fori_loop(
            0, jnp.minimum(m_cnt, M), m_body, init
        )
        run_ref[0, pl.ds(s * SR, SR), :] = acc_run
        dist_ref[0, pl.ds(s * SR, SR), :] = acc_dist
        xn_ref[0, pl.ds(s * SR, SR), :] = acc_xn


@functools.lru_cache(maxsize=None)
def _lr_call(B: int, S: int, M: int, L_words: int, NPr: int, BR: int,
             valid_w: int, SR: int, interpret: bool = False):
    kern = functools.partial(
        _kernel, S=S, M=M, L_words=L_words, NPr=NPr, valid_w=valid_w, SR=SR
    )
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((B, S * SR, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, S * SR, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, S * SR, LANES), jnp.uint32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * NPr, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BR, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, S * SR, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ),
        interpret=interpret,
    )


def lr_measure_batched(doms, phases_rows, base_rows, N: int,
                       interpret: bool = False):
    """Winner (run0, dist, xor-next) per segment word for a batch.

    Args:
      doms: int32[B, S, 128] per-segment dominant distances; M = lanes
        actually used <= 128.  PRECONDITION: each row's live (nonzero)
        dominants must form a PREFIX of the row — the kernel loop runs only
        to the per-segment nonzero count, so a zero interleaved before a
        live dominant would silently skip it.  longrange._select_dominants
        guarantees this (freq-descending top_k with dead slots masked).
      phases_rows: uint32[B, 4*NPr, 128] the four phase tables as lane rows.
      base_rows: uint32[B, BR, 128] the chunk's 4-aligned word grid
        (BR >= S*L_words/128 + seg_rows_for(L_words)).
      N: static chunk positions (N % (4*128) == 0).

    Returns (run_w, dist_w, xor_next): [B, S, SR*128] segment windows.
    """
    B, S, M = doms.shape
    L_words = N // (4 * S)
    assert L_words % LANES == 0, (N, S)
    valid_w = L_words + (MAX_MATCH + 6) // 4 + 1
    SR = seg_rows_for(L_words)
    assert valid_w <= SR * LANES, (valid_w, "segment too long for window")
    NPr = phases_rows.shape[1] // 4
    BR = base_rows.shape[1]
    doms_p = doms if M == LANES else jnp.concatenate(
        [doms, jnp.zeros((B, S, LANES - M), doms.dtype)], axis=2
    )
    outs = _lr_call(B, S, M, L_words, NPr, BR, valid_w, SR, interpret)(
        doms_p.astype(jnp.int32), phases_rows, base_rows
    )
    return tuple(o.reshape(B, S, SR * LANES) for o in outs)


@functools.lru_cache(maxsize=None)
def _make_single(N: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def one(doms, phases_rows, base_rows):
        outs = lr_measure_batched(doms[None], phases_rows[None],
                                  base_rows[None], N, interpret=interpret)
        return tuple(o[0] for o in outs)

    @one.def_vmap
    def one_vmap(axis_size, in_batched, *args):
        bc = [
            a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, b in zip(args, in_batched)
        ]
        return lr_measure_batched(*bc, N, interpret=interpret), (True,) * 3

    return one


def lr_measure_single(doms, phases_rows, base_rows, N: int,
                      interpret: bool = False):
    """Single-chunk (vmap-aware) form of :func:`lr_measure_batched`."""
    return _make_single(N, interpret)(doms, phases_rows, base_rows)
