"""Parse resolution: greedy/lazy selection + parallel token extraction.

The reference resolves greedy vs lazy with a sequential per-byte state machine
(``process_chunk_lazy``, lz77.rs:305-486).  The key observation for the TPU
reformulation: both policies are *local* decisions once every position's best
match is known —

* greedy: take the match at i iff one exists;
* lazy (zlib-style deferral): at i with match length L, if L is below the
  ``lazy_if_less_than`` threshold and position i+1 has a strictly longer
  match, emit a literal and move to i+1 (where the same rule applies again,
  reproducing chained deferral).

Encoding each decision as a jump ``next[i]`` (i+1 for a literal, i+len for a
match) turns the parse into the orbit of the start position under ``next``,
which is computed with log-depth pointer doubling — no sequential scan.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import MIN_MATCH, TOO_FAR


def build_jumps(best_len, best_dist, n_total, lazy: bool, lazy_if_less_than: int):
    """next[i] jump table over positions 0..N-1 (plus a sink at N).

    Matches of length 3 at distance > TOO_FAR are dropped, mirroring
    match_too_far (lz77.rs:274-278).
    """
    N = best_len.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)

    length = jnp.where((best_len == MIN_MATCH) & (best_dist > TOO_FAR), 0, best_len)
    has_match = length >= MIN_MATCH

    if lazy:
        # Match length available at i+1 (0 beyond the end).
        next_len = jnp.concatenate([length[1:], jnp.zeros(1, dtype=length.dtype)])
        defer = has_match & (length < lazy_if_less_than) & (next_len > length)
        take = has_match & ~defer
    else:
        take = has_match

    nxt = jnp.where(take, idx + length, idx + 1)
    nxt = jnp.minimum(nxt, N)
    # Sink: position N maps to itself.
    return jnp.concatenate([nxt, jnp.full(1, N, dtype=jnp.int32)])


def reachable(nxt, start: int):
    """Boolean mask of positions in the orbit of ``start`` under ``nxt``.

    Log-depth pointer doubling: after step s the mask covers all
    ``nxt^m(start)`` with m < 2**(s+1).
    """
    n1 = nxt.shape[0]  # N + 1
    reach = jnp.zeros(n1, dtype=jnp.bool_).at[start].set(True)
    hop = nxt
    steps = max(1, (n1 - 1).bit_length())
    for _ in range(steps):
        stepped = jnp.zeros(n1, dtype=jnp.bool_).at[hop].max(reach)
        reach = reach | stepped
        hop = hop[hop]
    return reach


def extract_tokens(reach, nxt, best_dist, buf, emit_start: int, n_total, cap: int):
    """Compact parse positions into dense token slots (stream order).

    Two packed scatters (unique indices): scatters are scalar-unit bound on
    TPU, so length+literal ride one int32 and distance the other.

    Returns a dict of token arrays of static size ``cap``:
      length: match length (1 => literal)
      lit:    literal byte (valid when length == 1)
      dist:   match distance (0 for literals)
      count:  number of tokens
    """
    N = nxt.shape[0] - 1
    pos_all = jnp.arange(emit_start, N, dtype=jnp.int32)
    is_tok = reach[emit_start:N] & (pos_all < n_total)
    order = jnp.cumsum(is_tok.astype(jnp.int32)) - 1
    count = jnp.sum(is_tok.astype(jnp.int32))

    slot = jnp.where(is_tok, order, cap)  # masked-out => dropped
    length_all = nxt[emit_start:N] - pos_all
    lit_all = buf[emit_start:N].astype(jnp.int32)  # static slice, no gather
    pack_a = length_all | (lit_all << 9)
    a = jnp.zeros(cap, dtype=jnp.int32).at[slot].set(pack_a, mode="drop")
    dist_all = jnp.where(length_all >= MIN_MATCH, best_dist[emit_start:N], 0)
    dist = jnp.zeros(cap, dtype=jnp.int32).at[slot].set(dist_all, mode="drop")
    return {"length": a & 0x1FF, "lit": a >> 9, "dist": dist, "count": count}
