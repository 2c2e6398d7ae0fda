"""Vectorized longest-match search, gather-free on the hot path.

Replaces the reference's per-byte hash-chain walk (``longest_match``,
matching.rs:87 — its hottest function).  TPU constraint that shapes this
design (docs/perf_notes.md): XLA TPU gathers/scatters execute ~1 element per
~10 ns (scalar-unit bound), so per-candidate gathers are unaffordable.  The
hot path therefore uses only sorts, shifts and elementwise ops:

1. **Payload sort**: positions are sorted by 3-byte hash with their probe
   words (the first 16 bytes, packed) carried as sort payloads — a
   multi-operand ``lax.sort``, which TPUs run as a vectorized sorting
   network.  After the sort, the k-th most recent same-hash candidate of a
   position is simply the row k above it: the entire hash-chain neighborhood
   becomes *shifted slices*, no gathers.
2. **Probe**: for k = 1..K, compare each row's probe words against the row
   k above, tracking the best (length, distance) as a packed score.
3. **Periodic-run matcher**: distances 1..4 are handled exactly in position
   space with reverse min-scans (covers RLE and small-period data where
   probe saturation would otherwise be common).
4. **Residual extension**: the few positions whose probe saturated (16
   bytes) and that aren't explained by a small-period run are compacted
   into a fixed budget and extended with per-element gathers — the only
   gathers in the matcher, on a tiny working set.
5. One packed scatter (unique indices) maps results back to position order.

Any parse found this way is legal DEFLATE; only compressed size depends on
the candidate policy (same argument as the reference's insertion-order note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import MAX_MATCH, WINDOW_SIZE
from .hashing import INVALID_KEY, hash3

# Probe window carried through the sort, in 4-byte words.
PROBE_WORDS = 4
PROBE_BYTES = 4 * PROBE_WORDS
# Small-period distances handled exactly by the run matcher.
RUN_DISTS = 4


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


def _probe_len(words_a, words_b):
    """Matched-byte count between two probe windows (lists of word arrays)."""
    total = None
    for w, (a, b) in enumerate(zip(words_a, words_b)):
        m = _matched_bytes(a ^ b)
        total = m if total is None else total + jnp.where(total == 4 * w, m, 0)
    return total


def find_matches(buf, N: int, n_total, hstart, num_checks: int, extend_top: int,
                 extension_budget: int):
    """Best (length, distance) at every position of one chunk buffer.

    Args:
      buf: uint8[N + PAD] chunk buffer (history + payload + padding).
      N: static number of positions.
      n_total: dynamic end of valid bytes.
      hstart: dynamic first valid position (history start).
      num_checks: static K — how many sorted-space predecessors to probe.
      extend_top: static M — how many best candidates to fully extend for
        probe-saturated positions.
      extension_budget: static cap on how many positions get full extension
        per chunk (overflow keeps the 16-byte probe length — still a valid,
        just not maximal, match).

    Returns:
      (best_len, best_dist): int32[N]; best_len == 0 where no match of
      length >= 3 exists.  Lengths capped at min(258, n_total - i).
    """
    idx = jnp.arange(N, dtype=jnp.int32)
    limit = jnp.clip(n_total - idx, 0, MAX_MATCH)

    # ---------------------------------------------------------------- hash
    h = hash3(buf, N)
    hashable = (idx >= hstart) & (idx <= n_total - 3)
    keys = jnp.where(hashable, h, INVALID_KEY)

    packed = pack_words(buf)
    probe_pos = [packed[4 * w : N + 4 * w] for w in range(PROBE_WORDS)]

    # -------------------------------------- exact small-period run matching
    # For d in 1..RUN_DISTS: length of the run of buf[j] == buf[j-d] starting
    # at i, via distance-to-next-mismatch (reverse min-scan).  Exact to 258.
    # Computed up front so it can ride the hash sort as a payload (it vetoes
    # extension for positions a run already explains).
    run_len = jnp.zeros(N, jnp.int32)
    run_dist = jnp.zeros(N, jnp.int32)
    big = N + MAX_MATCH
    for d in range(1, RUN_DISTS + 1):
        eq = jnp.concatenate(
            [jnp.zeros((d,), jnp.bool_), buf[d:N] == buf[: N - d]]
        )
        eq = eq & (idx - d >= hstart) & (idx < n_total)
        breaks = jnp.where(eq, big, idx)
        next_break = jax.lax.associative_scan(jnp.minimum, breaks, reverse=True)
        length = jnp.minimum(next_break - idx, limit)
        better = length > run_len  # prefer smaller d on ties (first wins)
        run_len = jnp.where(better, length, run_len)
        run_dist = jnp.where(better, d, run_dist)
    has_run = run_len >= 3

    # ------------------------------------------------- payload sort by hash
    sorted_ops = jax.lax.sort(
        [keys, idx, run_len] + probe_pos, num_keys=1, is_stable=True
    )
    skey, spos, srun = sorted_ops[0], sorted_ops[1], sorted_ops[2]
    sprobe = sorted_ops[3:]

    # ------------------------------------- probe K sorted-space predecessors
    # Row r-k is the k-th most recent prior position with this hash.  Rolled
    # into a fori_loop (dynamic-sliced shifts) to keep the graph small; each
    # iteration is pure elementwise work over shifted rows — no gathers.
    K = num_checks
    M = max(1, extend_top)
    valid_row = skey < INVALID_KEY

    skey_ext = jnp.concatenate([jnp.full((K,), INVALID_KEY + 1, skey.dtype), skey])
    spos_ext = jnp.concatenate([jnp.zeros((K,), spos.dtype), spos])
    sprobe_ext = [jnp.concatenate([jnp.zeros((K,), w.dtype), w]) for w in sprobe]

    def probe_step(k, tops):
        start = K - k
        pk = jax.lax.dynamic_slice(skey_ext, [start], [N])
        ppos = jax.lax.dynamic_slice(spos_ext, [start], [N])
        dist = spos - ppos
        ok = (skey == pk) & valid_row & (dist <= WINDOW_SIZE)
        lp = _probe_len(
            sprobe, [jax.lax.dynamic_slice(w, [start], [N]) for w in sprobe_ext]
        )
        score = jnp.where(ok & (lp >= 3), (lp << 16) | (WINDOW_SIZE + 1 - dist), 0)
        # Insert into the running top-M slots (bubble insertion).
        out = []
        for m in range(M):
            slot = tops[m]
            take = score > slot
            score, slot = jnp.where(take, slot, score), jnp.where(take, score, slot)
            out.append(slot)
        return tuple(out)

    tops0 = tuple(jnp.zeros((N,), jnp.int32) for _ in range(M))
    tops = list(jax.lax.fori_loop(1, K + 1, probe_step, tops0))

    def unpack(score):
        ln = score >> 16
        dist = jnp.where(score > 0, WINDOW_SIZE + 1 - (score & 0xFFFF), 0)
        return ln, dist

    # --------------------------------------- residual full-width extension
    # Positions whose best probe saturated and whose run match doesn't
    # already explain the whole remaining span get exact extension.  A second
    # stable sort brings them to the front (compaction without scatters);
    # only the first `extension_budget` are extended — overflow keeps the
    # probe-measured length (valid, just not maximal).
    slim = jnp.clip(n_total - spos, 0, MAX_MATCH)
    b0_len_s, _ = unpack(tops[0])
    needs_ext = (b0_len_s >= PROBE_BYTES) & (slim > PROBE_BYTES) & (srun < slim)

    need_sorted = jax.lax.sort(
        [(~needs_ext).astype(jnp.int32), spos, slim] + tops, num_keys=1, is_stable=True
    )
    need2, spos2, slim2 = need_sorted[0], need_sorted[1], need_sorted[2]
    tops2 = need_sorted[3:]

    CE = extension_budget
    row2 = jnp.arange(N, dtype=jnp.int32)
    in_budget = (need2 == 0) & (row2 < CE)

    epos = jnp.where(in_budget[:CE], spos2[:CE], -1)
    elim = slim2[:CE]
    cand_cols, init_cols = [], []
    for t in tops2:
        ln, dist = unpack(t[:CE])
        cand_cols.append(spos2[:CE] - dist)
        init_cols.append(jnp.where((epos >= 0) & (ln >= 3), jnp.minimum(ln, elim), 0))

    if jax.default_backend() == "tpu":
        # Scalar-core extension kernel (extend_walk.py): evaluates every
        # candidate of every compacted lane exactly.
        from .extend_walk import extend_matches

        res = extend_matches(packed, epos, elim, cand_cols, init_cols)
        ebest_len = res >> 16
        ebest_dist = res & 0xFFFF
    else:
        ecand = jnp.stack(cand_cols, axis=1)  # (CE, M)
        einit = jnp.stack(init_cols, axis=1)
        eok = einit >= PROBE_BYTES

        cur = jnp.where(eok, einit, 0)
        active = eok & (cur < elim[:, None])

        def cond(state):
            cur, active = state
            return jnp.any(active)

        def body(state):
            cur, active = state
            wi = packed[jnp.where(active, epos[:, None] + cur, 0)]
            wc = packed[jnp.where(active, ecand + cur, 0)]
            m = _matched_bytes(wi ^ wc)
            inc = jnp.where(active, jnp.minimum(m, elim[:, None] - cur), 0)
            cur = cur + inc
            active = active & (m == 4) & (cur < elim[:, None])
            return cur, active

        cur, _ = jax.lax.while_loop(cond, body, (cur, active))
        # Unextended candidates keep their exact probe-measured lengths so
        # backends agree on semantics.
        cur = jnp.where(eok, cur, einit)

        edists = jnp.stack([epos - c for c in cand_cols], axis=1)
        escore = jnp.where(einit > 0, cur * (WINDOW_SIZE * 2) - edists, -1)
        ebest = jnp.argmax(escore, axis=1)
        ebest_len = jnp.take_along_axis(cur, ebest[:, None], axis=1)[:, 0]
        ebest_dist = jnp.take_along_axis(edists, ebest[:, None], axis=1)[:, 0]
        ebest_len = jnp.where(escore.max(axis=1) > 0, ebest_len, 0)
        ebest_dist = jnp.where(ebest_len > 0, ebest_dist, 0)

    # ------------------------------------------------ final pick and unsort
    # Extended rows take the kernel result; everything else keeps its best
    # probe answer (exact when unsaturated; 16-byte floor on budget overflow).
    ext_len_full = jnp.concatenate([ebest_len, jnp.zeros(N - CE, jnp.int32)])
    ext_dist_full = jnp.concatenate([ebest_dist, jnp.zeros(N - CE, jnp.int32)])
    b_len2, b_dist2 = unpack(tops2[0])
    use_ext = in_budget & (ext_len_full > 0)
    fin_len2 = jnp.where(use_ext, ext_len_full, b_len2)
    fin_dist2 = jnp.where(use_ext, ext_dist_full, b_dist2)
    fin_packed2 = (jnp.minimum(fin_len2, slim2) << 16) | fin_dist2

    fin = jnp.zeros(N, jnp.int32).at[spos2].set(fin_packed2, unique_indices=True)
    best_len = fin >> 16
    best_dist = fin & 0xFFFF

    # ------------------------------------------------------------- combine
    better = (run_len > best_len) | (
        (run_len == best_len) & has_run & (run_dist < best_dist)
    )
    best_len = jnp.where(better, run_len, best_len)
    best_dist = jnp.where(better, run_dist, best_dist)

    best_len = jnp.minimum(best_len, limit)
    good = best_len >= 3
    return jnp.where(good, best_len, 0), jnp.where(good, best_dist, 0)




def find_rle_matches(data_padded, n_total, hstart, N: int):
    """Distance-1 run matching only (the reference's RLE mode, rle.rs:23-63)."""
    idx = jnp.arange(N, dtype=jnp.int32)
    eq = jnp.concatenate(
        [jnp.zeros((1,), jnp.bool_), data_padded[1:N] == data_padded[: N - 1]]
    )
    eq = eq & (idx - 1 >= hstart) & (idx < n_total)
    big = N + MAX_MATCH
    breaks = jnp.where(eq, big, idx)
    next_break = jax.lax.associative_scan(jnp.minimum, breaks, reverse=True)
    max_len = jnp.clip(n_total - idx, 0, MAX_MATCH)
    length = jnp.minimum(next_break - idx, max_len)
    best_len = jnp.where(length >= 3, length, 0)
    best_dist = jnp.where(best_len > 0, 1, 0)
    return best_len, best_dist
