"""Pallas TPU kernel: sequential parse-chain walk.

The parse is the orbit of the start position under the jump table
``next[i]`` (i+1 for literals, i+len for matches).  The XLA formulation
(pointer doubling, parse.reachable) costs ~17 full-size gather+scatter rounds
— ~27 ms per 64 KiB chunk on real hardware because XLA TPU gathers are
scalar-bound.  The chain itself is only ~#tokens (<= 64 K) steps of trivial
work, so a Pallas kernel walks it directly on the scalar core.

Mosaic constraints shape the kernel (measured on this toolchain):
* dynamic VMEM indexing must be 128-lane aligned => arrays are laid out as
  (rows, 128) and a step loads the whole row ``p >> 7``, extracting lane
  ``p & 127`` with an iota-mask reduction (registers only);
* tokens are accumulated into (1, 128) vector registers via masked select
  and flushed with one aligned row store per 128 tokens;
* vmapping a pallas_call with scalar operands is unsupported, so batching is
  a grid dimension over chunks (custom_vmap routes jax.vmap here).

Inputs are packed so each step needs a single load: jump[i] = (next[i]-i)
| dist[i] << 9.  Outputs: packed tokens (pos | length << 17), distances, and
the token count (carried in lane 0 of a trailing output row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _walk_kernel(scalars_ref, jump_ref, out_ref, dist_ref):
    b = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    start = scalars_ref[b, 0]
    n_total = scalars_ref[b, 1]
    num_blocks = out_ref.shape[1] - 1  # last row carries the count

    def block_step(state):
        blk, p, count = state
        vec_pos = jnp.zeros((1, LANES), jnp.int32)
        vec_dist = jnp.zeros((1, LANES), jnp.int32)

        def tok_step(j, inner):
            p, count, vec_pos, vec_dist = inner
            live = p < n_total
            row = jump_ref[0, pl.ds(p >> 7, 1), :]
            packed = pltpu.roll(row, -(p & (LANES - 1)), 1)[0, 0]
            step = packed & 0x1FF
            dist = packed >> 9
            tok = jnp.where(live, p | (step << 17), 0)
            vec_pos = jnp.where(lane == j, tok, vec_pos)
            vec_dist = jnp.where(lane == j, jnp.where(live, dist, 0), vec_dist)
            p = jnp.where(live, p + jnp.maximum(step, 1), p)
            count = count + live.astype(jnp.int32)
            return p, count, vec_pos, vec_dist

        p, count, vec_pos, vec_dist = jax.lax.fori_loop(
            0, LANES, tok_step, (p, count, vec_pos, vec_dist)
        )
        out_ref[0, pl.ds(blk, 1), :] = vec_pos
        dist_ref[0, pl.ds(blk, 1), :] = vec_dist
        return blk + 1, p, count

    def cond(state):
        blk, p, _ = state
        return (p < n_total) & (blk < num_blocks)

    blk, p, count = jax.lax.while_loop(cond, block_step, (0, start, 0))
    out_ref[0, pl.ds(num_blocks, 1), :] = jnp.where(lane == 0, count, 0)


def _walk_batched(jumps, starts, n_totals, cap: int, interpret: bool = False):
    """Grid-over-chunks walk. jumps: int32[B, N] with N % 128 == 0."""
    B, N = jumps.shape
    R = N // LANES
    OB = cap // LANES + 1
    scalars = jnp.stack([starts.astype(jnp.int32), n_totals.astype(jnp.int32)], axis=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, OB, LANES), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, OB, LANES), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    out, dist = pl.pallas_call(
        _walk_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, OB, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, OB, LANES), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scalars, jumps.reshape(B, R, LANES))
    toks = out[:, :-1, :].reshape(B, cap)
    dists = dist[:, :-1, :].reshape(B, cap)
    counts = out[:, -1, 0]
    return toks, dists, counts


def _parse_walk_impl(jump_packed, start, n_total, *, cap: int, interpret: bool = False):
    toks, dists, counts = _walk_batched(
        jump_packed[None], jnp.asarray(start, jnp.int32)[None],
        jnp.asarray(n_total, jnp.int32)[None], cap, interpret=interpret,
    )
    return toks[0], dists[0], counts[0]


def parse_walk_interpret(jump_packed, start, n_total, cap: int):
    """Interpreter-mode variant: tests the kernel semantics on any backend."""
    return _parse_walk_impl(jump_packed, start, n_total, cap=cap, interpret=True)


def _make_parse_walk(cap: int):
    import functools

    @jax.custom_batching.custom_vmap
    def pw(jump_packed, start, n_total):
        return _parse_walk_impl(jump_packed, start, n_total, cap=cap)

    @pw.def_vmap
    def pw_vmap(axis_size, in_batched, jump_packed, start, n_total):
        jb, sb, nb = in_batched
        if not jb:
            jump_packed = jnp.broadcast_to(jump_packed, (axis_size,) + jump_packed.shape)
        start = jnp.broadcast_to(jnp.asarray(start, jnp.int32), (axis_size,)) if not sb else start
        n_total = jnp.broadcast_to(jnp.asarray(n_total, jnp.int32), (axis_size,)) if not nb else n_total
        out = _walk_batched(jump_packed, start, n_total, cap)
        return out, (True, True, True)

    return pw


_CACHE = {}


def parse_walk(jump_packed, start, n_total, cap: int):
    """Walk the parse chain on the TPU scalar core (vmap-aware).

    Args:
      jump_packed: int32[N] with (next[i]-i) | dist[i] << 9; N % 128 == 0.
      start: scalar first parse position.
      n_total: scalar end of valid data.
      cap: static max token count (the emit size, multiple of 128).

    Returns:
      (packed int32[cap] = pos | length << 17, dist int32[cap], count).
      Slots >= count are 0.
    """
    fn = _CACHE.get(cap)
    if fn is None:
        fn = _CACHE[cap] = _make_parse_walk(cap)
    return fn(jump_packed, jnp.asarray(start, jnp.int32), jnp.asarray(n_total, jnp.int32))
