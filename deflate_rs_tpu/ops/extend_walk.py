"""Pallas TPU kernel: exact match extension for probe-saturated positions.

The sorted-space matcher (matching.py) measures match lengths up to its
16-byte probe window.  Positions whose best candidates saturate the probe are
compacted into a fixed budget and handed to this kernel, which walks the
actual bytes (as packed 4-byte words) on the scalar core — XLA's per-element
gathers made the equivalent while-loop cost ~13 ms/chunk; the true work is a
few thousand word compares.

Layout rules as in parse_walk.py: (rows, 128) arrays, dynamic row loads,
mask-reduce lane extraction, register accumulation, aligned row stores, and
batching as a grid dimension (custom_vmap routes jax.vmap here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# Probe window of the sorted-space matcher, in bytes (= matching.PROBE_BYTES;
# duplicated here to avoid a circular import at module load).
PROBE_BYTES = 16


def _make_kernel(M: int):
    def kernel(packed_ref, pos_ref, lim_ref, *rest):
        cand_refs = rest[:M]
        init_refs = rest[M : 2 * M]
        out_ref = rest[2 * M]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        num_blocks = out_ref.shape[1]

        def extract(row, j):
            return pltpu.roll(row, -j, 1)[0, 0]

        def word_at(w):
            row = packed_ref[0, pl.ds(w >> 7, 1), :]
            return pltpu.roll(row, -(w & (LANES - 1)), 1)[0, 0]

        def block_step(blk, _):
            pos_row = pos_ref[0, pl.ds(blk, 1), :]
            lim_row = lim_ref[0, pl.ds(blk, 1), :]
            cand_rows = [r[0, pl.ds(blk, 1), :] for r in cand_refs]
            init_rows = [r[0, pl.ds(blk, 1), :] for r in init_refs]

            def lane_step(j, vec):
                pos = extract(pos_row, j)
                lim = extract(lim_row, j)
                best_len = 0
                best_dist = 0

                for m in range(M):
                    cand = extract(cand_rows[m], j)
                    init = extract(init_rows[m], j)

                    def ext_body(state):
                        cur, _ = state
                        x = word_at(pos + cur) ^ word_at(cand + cur)
                        mb = jnp.where(
                            x == 0,
                            4,
                            jnp.where(
                                (x & 0xFFFFFF) == 0,
                                3,
                                jnp.where(
                                    (x & 0xFFFF) == 0, 2, jnp.where((x & 0xFF) == 0, 1, 0)
                                ),
                            ),
                        )
                        inc = jnp.minimum(mb, lim - cur)
                        cur = cur + inc
                        return cur, (mb == 4) & (cur < lim)

                    # Candidates measured below the probe window are exact
                    # (their first mismatch was observed) — no walk needed.
                    alive0 = (init >= PROBE_BYTES) & (init < lim) & (pos >= 0)
                    cur, _ = jax.lax.while_loop(
                        lambda s: s[1], ext_body, (jnp.where(alive0, init, 0), alive0)
                    )
                    cur = jnp.where(
                        init > 0, jnp.where(alive0, cur, jnp.minimum(init, lim)), 0
                    )
                    dist = pos - cand
                    better = (cur > best_len) | ((cur == best_len) & (dist < best_dist))
                    take = (init > 0) & better
                    best_len = jnp.where(take, cur, best_len)
                    best_dist = jnp.where(take, dist, best_dist)

                packed = jnp.where(pos >= 0, (best_len << 16) | best_dist, 0)
                return jnp.where(lane == j, packed, vec)

            # Compacted lanes form a prefix: whole blocks of inactive lanes
            # are common (and all-trailing), so skip them in a few cycles.
            any_active = jnp.max(pos_row) >= 0

            @pl.when(any_active)
            def _():
                vec = jax.lax.fori_loop(
                    0, LANES, lane_step, jnp.zeros((1, LANES), jnp.int32)
                )
                out_ref[0, pl.ds(blk, 1), :] = vec

            @pl.when(~any_active)
            def _():
                out_ref[0, pl.ds(blk, 1), :] = jnp.zeros((1, LANES), jnp.int32)

            return 0

        jax.lax.fori_loop(0, num_blocks, block_step, 0)

    return kernel


def _extend_batched(pw, epos, elim, ecands, einits, interpret: bool = False):
    """pw: int32[B, Wp] packed words; others int32[B, CE]-shaped."""
    B, Wp = pw.shape
    CE = epos.shape[1]
    M = len(ecands)
    RW, RC = Wp // LANES, CE // LANES

    def spec(rows):
        return pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)

    ops = [pw.reshape(B, RW, LANES), epos.reshape(B, RC, LANES), elim.reshape(B, RC, LANES)]
    ops += [c.reshape(B, RC, LANES) for c in ecands]
    ops += [i.reshape(B, RC, LANES) for i in einits]
    out = pl.pallas_call(
        _make_kernel(M),
        out_shape=jax.ShapeDtypeStruct((B, RC, LANES), jnp.int32),
        grid=(B,),
        in_specs=[spec(RW)] + [spec(RC)] * (2 + 2 * M),
        out_specs=spec(RC),
        interpret=interpret,
    )(*ops)
    return out.reshape(B, CE)


def _pad_words(packed_words):
    W = packed_words.shape[-1]
    Wp = ((W + LANES - 1) // LANES) * LANES
    return jnp.pad(packed_words.astype(jnp.int32), [(0, 0)] * (packed_words.ndim - 1) + [(0, Wp - W)])


_CACHE = {}


def extend_matches(packed_words, epos, elim, ecands, einits):
    """Extend matches exactly for compacted lanes (vmap-aware).

    Args:
      packed_words: uint32[W] 4-byte packed views of the chunk buffer.
      epos: int32[CE] position per lane (-1 = inactive); CE % 128 == 0.
      elim: int32[CE] max legal length per lane.
      ecands: list of int32[CE] candidate positions (most promising first).
      einits: list of int32[CE] probe-measured initial lengths (0 = skip).

    Returns:
      int32[CE]: (len << 16) | dist per lane, 0 for inactive lanes.
    """
    M = len(ecands)
    key = (M, epos.shape[-1])
    fn = _CACHE.get(key)
    if fn is None:

        @jax.custom_batching.custom_vmap
        def em(pw, epos, elim, *cols):
            out = _extend_batched(
                pw[None], epos[None], elim[None],
                [c[None] for c in cols[:M]], [i[None] for i in cols[M:]],
            )
            return out[0]

        @em.def_vmap
        def em_vmap(axis_size, in_batched, pw, epos, elim, *cols):
            def bc(x, b):
                return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)

            pw = bc(pw, in_batched[0])
            epos = bc(epos, in_batched[1])
            elim = bc(elim, in_batched[2])
            cols = [bc(c, bt) for c, bt in zip(cols, in_batched[3:])]
            out = _extend_batched(pw, epos, elim, list(cols[:M]), list(cols[M:]))
            return out, True

        fn = _CACHE[key] = em

    return fn(_pad_words(packed_words), epos, elim, *ecands, *einits)


def extend_matches_interpret(packed_words, epos, elim, ecands, einits):
    """Interpreter-mode variant: tests the kernel semantics on any backend."""
    out = _extend_batched(
        _pad_words(packed_words)[None], epos[None], elim[None],
        [c[None] for c in ecands], [i[None] for i in einits], interpret=True,
    )
    return out[0]
