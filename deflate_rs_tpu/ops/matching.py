"""Vectorized longest-match search.

Replaces the reference's per-byte hash-chain walk (``longest_match``,
matching.rs:87 — its hottest function) with three data-parallel stages:

1. **Candidates**: for every position, the K most recent prior positions with
   the same 3-byte hash (from the stable hash ranking, = the first K links of
   the reference's chain).
2. **Probe**: compare the first 8 bytes of every (position, candidate) pair
   using packed 4-byte words — the position side is a shifted slice (free),
   only the candidate side gathers.
3. **Extend**: the best candidate per position is extended 4 bytes per step
   under a while-loop that runs only while any lane is still matching.

Overlapping matches (dist < len, e.g. RLE runs at distance 1) compare
correctly because both sides read the original buffer, which is exactly the
byte-copy semantics of DEFLATE back-references.

Any parse found this way is legal DEFLATE; only compressed size depends on the
candidate policy, mirroring the reference's note that insertion order only
affects which (valid) match is found.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import MAX_MATCH, WINDOW_SIZE
from .hashing import INVALID_KEY


def pack_words(data_padded):
    """P[i] = data[i] | data[i+1]<<8 | data[i+2]<<16 | data[i+3]<<24 (uint32).

    ``data_padded`` must have at least 3 bytes of padding beyond the last index
    that will be read.
    """
    d = data_padded.astype(jnp.uint32)
    return d[:-3] | (d[1:-2] << 8) | (d[2:-1] << 16) | (d[3:] << 24)


def _matched_bytes(x):
    """Number of matching low-order bytes in an XOR'd packed word (0..4)."""
    m0 = (x & 0x000000FF) == 0
    m1 = (x & 0x0000FFFF) == 0
    m2 = (x & 0x00FFFFFF) == 0
    m3 = x == 0
    return m0.astype(jnp.int32) + m1 + m2 + m3


def find_matches(packed, keys, perm, rank, n_total, num_checks: int):
    """Best (length, distance) at every position.

    Args:
      packed: uint32[>= N + MAX_MATCH] packed words over the padded buffer.
      keys: int32[N] hash sort keys (INVALID_KEY for unusable positions).
      perm, rank: from rank_by_hash(keys).
      n_total: dynamic count of valid bytes in the buffer.
      num_checks: static K, the vectorized analogue of the reference's
        ``max_hash_checks`` chain-walk budget.

    Returns:
      (best_len, best_dist): int32[N]; best_len == 0 where no match of length
      >= 3 exists.  Lengths are capped at min(258, n_total - i).
    """
    N = keys.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    max_len = jnp.clip(n_total - idx, 0, MAX_MATCH)

    # --- candidates -------------------------------------------------------
    ks = jnp.arange(1, num_checks + 1, dtype=jnp.int32)
    cand_rank = rank[:, None] - ks[None, :]  # (N, K)
    in_range = cand_rank >= 0
    cand = perm[jnp.clip(cand_rank, 0, N - 1)]
    ok = (
        in_range
        & (keys[cand] == keys[:, None])
        & (keys[:, None] < INVALID_KEY)
        & ((idx[:, None] - cand) <= WINDOW_SIZE)
    )

    # --- 8-byte probe -----------------------------------------------------
    w0_i = packed[:N]
    w4_i = packed[4 : N + 4]
    w0_c = packed[cand]
    w4_c = packed[jnp.minimum(cand + 4, packed.shape[0] - 1)]
    l0 = _matched_bytes(w0_i[:, None] ^ w0_c)
    l4 = _matched_bytes(w4_i[:, None] ^ w4_c)
    l8 = l0 + jnp.where(l0 == 4, l4, 0)
    l8 = jnp.where(ok, l8, -1)

    best_k = jnp.argmax(l8, axis=1)  # first occurrence = most recent candidate
    best_l8 = jnp.take_along_axis(l8, best_k[:, None], axis=1)[:, 0]
    best_cand = jnp.take_along_axis(cand, best_k[:, None], axis=1)[:, 0]
    best_dist = idx - best_cand

    # --- extension of the winning candidate, 4 bytes per step -------------
    cur = jnp.minimum(jnp.maximum(best_l8, 0), max_len)
    limit = jnp.minimum(max_len, MAX_MATCH)
    active = (best_l8 == 8) & (cur < limit)

    def cond(state):
        cur, active = state
        return jnp.any(active)

    def body(state):
        cur, active = state
        wi = packed[jnp.where(active, idx + cur, 0)]
        wc = packed[jnp.where(active, best_cand + cur, 0)]
        m = _matched_bytes(wi ^ wc)
        inc = jnp.where(active, jnp.minimum(m, limit - cur), 0)
        cur = cur + inc
        active = active & (m == 4) & (cur < limit)
        return cur, active

    cur, _ = jax.lax.while_loop(cond, body, (cur, active))

    best_len = jnp.where((best_l8 >= 3) & (cur >= 3), cur, 0)
    best_dist = jnp.where(best_len > 0, best_dist, 0)
    return best_len, best_dist


def find_rle_matches(data_padded, n_total, N: int):
    """Distance-1 run matching (the reference's RLE mode, rle.rs:23-63).

    A match of length L at position i with distance 1 exists iff bytes
    i-1..i+L-1 are all equal.  Computed via distance-to-next-unequal-pair.
    """
    d = data_padded.astype(jnp.int32)
    idx = jnp.arange(N, dtype=jnp.int32)
    # e[i] = 1 iff d[i] == d[i-1] (i >= 1).
    eq = jnp.concatenate([jnp.zeros(1, dtype=jnp.bool_), d[1:N] == d[: N - 1]])
    breaks = jnp.where(eq, N + MAX_MATCH, idx)
    next_break = jax.lax.associative_scan(jnp.minimum, breaks, reverse=True)
    run = next_break - idx  # consecutive equal-pairs starting at i
    max_len = jnp.clip(n_total - idx, 0, MAX_MATCH)
    length = jnp.minimum(run, max_len)
    best_len = jnp.where(length >= 3, length, 0)
    best_dist = jnp.where(best_len > 0, 1, 0)
    return best_len, best_dist
