"""Pallas TPU kernel: lock-step segmented parse scan.

Replaces round 1's serial scalar-core parse walk (removed) with a two-phase
vector formulation that computes the SAME parse (the orbit of position 0
under the jump table — the TPU reformulation of the reference's per-byte
lazy/greedy loop, lz77.rs:305-486):

Phase 1 (lock-step, vectorized): each chunk's emit region is split into
S=16 segments; 8 chunks x 16 segments = 128 lanes.  Every lane parses its
segment from offset 0 *hypothetically*, in lock-step rows over the
transposed (L, 128) layout: at row j, lane s takes a token iff its running
next-token offset equals j.  This is pure (1,128) vector work — L rows of a
handful of VPU ops, no gathers — and produces a candidate token mask plus
each segment's exit overhang into the next segment.

Phase 2 (fix-up): the TRUE parse enters segment s at the previous segment's
exit overhang, not at offset 0.  But parses over the same jump table
converge: walking from the true entry, the first time we land on a position
the hypothesis parse also marked, the two parses coincide forever after
(next[] is deterministic).  So a short scalar walk per segment (usually a
few steps) marks the pre-convergence positions (value 2 in the token
buffer) and records the convergence row; hypothesis tokens before it are
discarded by the caller.  The result is bit-for-bit the sequential parse.

Layout rules (Mosaic): (rows, 128) arrays, aligned row loads and
stores, roll-based lane extraction for the (short) scalar fix-up walks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SEGS_PER_CHUNK = 16
CHUNKS_PER_GROUP = LANES // SEGS_PER_CHUNK  # 8
MAX_OVERHANG = 258  # a jump step is at most MAX_MATCH


def _kernel(n_ref, steps_ref, tok_ref, meta_ref):
    g = pl.program_id(0)
    L = steps_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    seg = lane & (SEGS_PER_CHUNK - 1)
    seg_base = seg * L

    # Per-lane payload length of the owning chunk (8 scalar selects).
    n_lane = jnp.zeros((1, LANES), jnp.int32)
    for b in range(CHUNKS_PER_GROUP):
        n_lane = jnp.where((lane >> 4) == b, n_ref[g, b], n_lane)

    # ------------------------------------------------- phase 1: lock-step
    def row_body(j, ns):
        step_row = steps_ref[0, pl.ds(j, 1), :]
        take = (ns == j) & (seg_base + j < n_lane)
        tok_ref[0, pl.ds(j, 1), :] = take.astype(jnp.int32)
        return jnp.where(take, j + step_row, ns)

    ns = jax.lax.fori_loop(0, L, row_body, jnp.zeros((1, LANES), jnp.int32))
    exit_over = ns - L  # may be negative if the payload ends inside the seg

    # --------------------------------------------------- phase 2: fix-up
    # Sequential over lanes; entry offset propagates s -> s+1 within a chunk
    # and resets to 0 at each chunk's first segment.
    def extract(vec, j):
        return jnp.sum(jnp.where(lane == j, vec, 0))

    def fixup_lane(l, carry):
        entry_prev, conv_vec, exit_vec = carry
        s = l & (SEGS_PER_CHUNK - 1)
        entry = jnp.where(s == 0, 0, jnp.clip(entry_prev, 0, MAX_OVERHANG))
        n_b = extract(n_lane, l)
        base = s * L
        lane_exit = extract(exit_over, l)

        def walk_cond(state):
            p, done, _ = state
            return ~done & (p < L) & (base + p < n_b)

        def walk_body(state):
            p, done, conv = state
            tok_row = tok_ref[0, pl.ds(p, 1), :]
            cur = pltpu.roll(tok_row, -p * 0 - l, 1)[0, 0]  # extract lane l
            hit = cur == 1

            @pl.when(~hit)
            def _():
                tok_ref[0, pl.ds(p, 1), :] = jnp.where(lane == l, 2, tok_row)

            step_row = steps_ref[0, pl.ds(p, 1), :]
            step = pltpu.roll(step_row, -l, 1)[0, 0]
            p_next = jnp.where(hit, p, p + step)
            conv = jnp.where(hit, p, conv)
            return p_next, hit, conv

        p0 = entry
        state = (p0, entry == 0, jnp.where(entry == 0, 0, L))
        p_end, converged, conv = jax.lax.while_loop(walk_cond, walk_body, state)
        # Converged (or started at 0): exit is the hypothesis lane's exit.
        # Walked off the end: exit is the walk's own overhang.
        exitv = jnp.where(converged, lane_exit, p_end - L)
        conv = jnp.where(converged, conv, L)
        conv_vec = jnp.where(lane == l, conv, conv_vec)
        exit_vec = jnp.where(lane == l, exitv, exit_vec)
        return exitv, conv_vec, exit_vec

    zeros = jnp.zeros((1, LANES), jnp.int32)
    _, conv_vec, exit_vec = jax.lax.fori_loop(
        0, LANES, fixup_lane, (0, zeros, zeros)
    )
    meta_ref[0, pl.ds(0, 1), :] = conv_vec
    meta_ref[0, pl.ds(1, 1), :] = exit_vec
    for r in range(2, 8):
        meta_ref[0, pl.ds(r, 1), :] = zeros


def _parse_scan_groups(steps_t, n_eff, interpret: bool = False):
    """steps_t: int32[G, L, 128]; n_eff: int32[G, 8] -> (tok[G,L,128], meta[G,8,128])."""
    G, L, _ = steps_t.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, L, LANES), lambda g, s: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, L, LANES), lambda g, s: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda g, s: (g, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    tok, meta = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((G, L, LANES), jnp.int32),
            jax.ShapeDtypeStruct((G, 8, LANES), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(n_eff.astype(jnp.int32), steps_t)
    return tok, meta


def _to_groups(steps, n):
    """steps: int32[B, E]; n: int32[B] -> (steps_t[G,L,128], n_eff[G,8], pad_b)."""
    B, E = steps.shape
    L = E // SEGS_PER_CHUNK
    pad_b = (-B) % CHUNKS_PER_GROUP
    if pad_b:
        steps = jnp.concatenate(
            [steps, jnp.ones((pad_b, E), steps.dtype)], axis=0
        )
        n = jnp.concatenate([n, jnp.zeros((pad_b,), n.dtype)], axis=0)
    Bp = B + pad_b
    G = Bp // CHUNKS_PER_GROUP
    # (B, E) -> (G, 8, S, L) -> (G, L, 8, S) -> (G, L, 128)
    st = steps.reshape(G, CHUNKS_PER_GROUP, SEGS_PER_CHUNK, L)
    st = jnp.transpose(st, (0, 3, 1, 2)).reshape(G, L, LANES)
    return st, n.reshape(G, CHUNKS_PER_GROUP), pad_b, L


def _from_groups(tok, meta, B: int, E: int):
    """Invert the grouping; returns is_tok bool[B, E] (positions >= n already
    masked by the kernel)."""
    G, L, _ = tok.shape
    row = jnp.arange(L, dtype=jnp.int32)[None, :, None]
    conv = meta[:, 0:1, :]  # (G, 1, 128)
    keep = (tok == 2) | ((tok == 1) & (row >= conv))
    # (G, L, 8, S) -> (G, 8, S, L) -> (G*8, E)
    k = keep.reshape(G, L, CHUNKS_PER_GROUP, SEGS_PER_CHUNK)
    k = jnp.transpose(k, (0, 2, 3, 1)).reshape(G * CHUNKS_PER_GROUP, E)
    return k[:B]


def parse_scan_batched(steps, n, interpret: bool = False):
    """Token-start mask for a batch of chunks.

    Args:
      steps: int32[B, E] jump steps per emit position (1 literal, len match),
        E % SEGS_PER_CHUNK == 0.
      n: int32[B] payload lengths (tokens only at positions < n).

    Returns:
      bool[B, E]: True where the sequential parse from position 0 places a
      token start.
    """
    B, E = steps.shape
    st, n_eff, _, _ = _to_groups(steps, n)
    tok, meta = _parse_scan_groups(st, n_eff, interpret=interpret)
    return _from_groups(tok, meta, B, E)


def _make_parse_scan():
    @jax.custom_batching.custom_vmap
    def ps(steps, n):
        return parse_scan_batched(steps[None], n[None])[0]

    @ps.def_vmap
    def ps_vmap(axis_size, in_batched, steps, n):
        sb, nb = in_batched
        if not sb:
            steps = jnp.broadcast_to(steps, (axis_size,) + steps.shape)
        if not nb:
            n = jnp.broadcast_to(jnp.asarray(n, jnp.int32), (axis_size,))
        return parse_scan_batched(steps, n), True

    return ps


_parse_scan_single = _make_parse_scan()


def parse_scan(steps, n):
    """Single-chunk (vmap-aware) token-start mask; see parse_scan_batched."""
    return _parse_scan_single(steps, jnp.asarray(n, jnp.int32))
