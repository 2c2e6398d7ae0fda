"""Long-range match anchors (content-defined, gather-free).

The main matcher (matching.py) measures candidate matches through a sorted
probe window of 4*probe_words bytes; among LCP TIES it prefers the nearest
candidate.  On highly redundant inputs (whole-file copies: license texts,
JSON configs) the tie group at every position is full of short-lived near
candidates, so the chosen distance varies position to position, the
chain/stride extensions never compose, and a 258-byte truth is emitted as
~10 capped matches — measured -8.6%/-48% vs zlib-6 before this module.

The recovery is a second, sparse matcher that is robust to copy alignment:

1. every position gets a 4-byte rolling hash; positions that are the strict
   window minimum of that hash are ANCHORS (content-defined — two copies of
   the same bytes select the same anchors regardless of their absolute
   offsets; ~N/w density);
2. anchors are compacted by one (hash, position)-key sort and scanned like
   the main matcher: K nearest same-hash anchors on both sides, match length
   measured EXACTLY over 8 carried content words via the running-min LCP —
   at anchor density the deep candidates are whole-copy repeats, not tie
   noise, and verification kills false hash collisions;
3. anchor matches return to position space (one hinted scatter over unique
   anchor positions) and CARRY forward: a match (l, d) at anchor j implies
   (l - (i - j), d) at every i in (j, j + l - 3] — one associative max-scan
   with the distance as payload;
4. the caller takes the longer of (main, anchor-carried) per position and
   lets stride composition (matching.stride_extend) fuse consecutive
   same-distance claims into full-length matches.

Anchor lengths are measured byte compares — never overclaimed — so any
resulting parse stays legal DEFLATE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import MAX_MATCH, WINDOW_SIZE
from .matching import _matched_bytes, pack_words

ANCHOR_WINDOW = 8  # one anchor per ~2w positions (window minima)
ANCHOR_WORDS = 8  # content words carried per anchor (32-byte verification)
ANCHOR_K = 8  # sorted-space neighbors scanned each side
_FAR = 1 << 30


def _rolling_hash4(buf, N: int):
    """Multiplicative 4-byte rolling hash per position (uint32)."""
    w = pack_words(buf)[:N]
    return (w * jnp.uint32(2654435761)) ^ (w >> 15)


def find_anchor_matches(buf, N: int, n_total, hstart, *, window: int = ANCHOR_WINDOW,
                        words: int = ANCHOR_WORDS, K: int = ANCHOR_K):
    """(best_len, best_dist) per position from sparse long-range anchors.

    Lengths are capped at 4*words (the verified span); the caller's stride
    composition recovers the rest.  Positions that are not anchors get their
    claims from the carry scan; uncovered positions get 0.
    """
    idx = jnp.arange(N, dtype=jnp.int32)
    limit = jnp.clip(n_total - idx, 0, MAX_MATCH)
    valid = (idx >= hstart) & (idx <= n_total - 4)

    v = _rolling_hash4(buf, N)
    # Strict window minimum (left-strict, right-non-strict: a deterministic
    # tiebreak), so anchor choice is content-defined — two copies of the
    # same bytes select the same anchors regardless of absolute offset.
    big = jnp.where(valid, v, jnp.uint32(0xFFFFFFFF))
    is_min = jnp.ones(N, jnp.bool_)
    for s in range(1, window):
        left = jnp.concatenate([jnp.full(s, 0xFFFFFFFF, jnp.uint32), big[:-s]])
        right = jnp.concatenate([big[s:], jnp.full(s, 0xFFFFFFFF, jnp.uint32)])
        is_min = is_min & (big < left) & (big <= right)
    anchor = is_min & valid

    # ------------------------------- compact anchors by one (hash,pos) sort
    # Invalid rows ride with +FAR positions so the scan's positional checks
    # exclude them (same policy as matching.find_matches invalid keys).
    key = jnp.where(anchor, v, jnp.uint32(0xFFFFFFFF))
    pos_key = jnp.where(anchor, idx, jnp.int32(_FAR))
    packed = pack_words(buf)
    pays = [packed[4 * w : N + 4 * w] for w in range(words)]
    ops = jax.lax.sort([key, pos_key] + pays, num_keys=2, is_stable=False)
    apos = ops[1]
    apay = list(ops[2:])

    # ----------------------- K-deep scan over sorted anchors (LCP verified)
    al = None
    for w, p in enumerate(apay):
        prev = jnp.concatenate([jnp.zeros((1,), p.dtype), p[:-1]])
        m = _matched_bytes(p ^ prev)
        al = m if al is None else al + jnp.where(al == 4 * w, m, 0)
    al = al.at[0].set(0)

    al_b = jnp.concatenate([jnp.zeros((K,), jnp.int32), al])
    pos_b = jnp.concatenate([jnp.full((K,), -_FAR, jnp.int32), apos])
    al_f = jnp.concatenate([al, jnp.zeros((K,), jnp.int32)])
    pos_f = jnp.concatenate([apos, jnp.full((K,), _FAR, jnp.int32)])

    cap = 4 * words

    def tiescore(run, dist):
        # Distance tiebreak at equal verified length: when verification hit
        # its CAP the true length is unknown and near candidates are usually
        # short-lived local repeats — prefer the FARTHEST (whole-copy
        # distances are stable across a repeat region, which is what lets
        # stride composition fuse the claims to full length).  When the
        # match provably ends below the cap, prefer the nearest (cheapest
        # distance bits).  Measured on the json corpus: near-tiebreak
        # anchors compose to >=250 bytes at 5 positions; far-tiebreak at
        # thousands.
        return jnp.where(run >= cap, dist, WINDOW_SIZE + 1 - dist)

    def step(k, carry):
        runb, runf, best = carry
        ab = jax.lax.dynamic_slice(al_b, [K - k + 1], [N])
        cb = jax.lax.dynamic_slice(pos_b, [K - k], [N])
        af = jax.lax.dynamic_slice(al_f, [k], [N])
        cf = jax.lax.dynamic_slice(pos_f, [k], [N])
        runb = jnp.minimum(runb, ab)
        runf = jnp.minimum(runf, af)
        db = apos - cb
        df = apos - cf
        okb = (db >= 1) & (db <= WINDOW_SIZE) & (cb >= hstart) & (runb >= 4)
        okf = (df >= 1) & (df <= WINDOW_SIZE) & (cf >= hstart) & (runf >= 4)
        sb = jnp.where(okb, (runb << 16) | tiescore(runb, db), 0)
        sf = jnp.where(okf, (runf << 16) | tiescore(runf, df), 0)
        return runb, runf, jnp.maximum(best, jnp.maximum(sb, sf))

    init = apos * 0 + 4 * words
    _, _, best = jax.lax.fori_loop(1, K + 1, step, (init, init, apos * 0))

    # ------------------------------------ back to position space (scatter)
    # Anchor positions are unique; invalid rows target index N (dropped).
    tgt = jnp.clip(apos, 0, N)
    tgt = jnp.where(apos == _FAR, N, tgt)
    score_pos = jnp.zeros(N + 1, jnp.int32).at[tgt].set(
        best, mode="drop", unique_indices=True
    )[:N]
    raw_len = score_pos >> 16
    a_len = jnp.minimum(raw_len, limit)
    # Invert tiescore: capped entries carry the distance directly, uncapped
    # ones carry WINDOW+1-dist.
    low = score_pos & 0xFFFF
    a_dist = jnp.where(
        score_pos > 0,
        jnp.where(raw_len >= cap, low, WINDOW_SIZE + 1 - low),
        0,
    )

    # -------------------------------- carry claims forward between anchors
    # (l, d) at j implies (l - (i-j), d) at i: running max of l + j with the
    # distance as payload (associative).
    a = jnp.where(a_len >= 4, a_len + idx, -1)

    def comb(x, y):
        ax, dx = x
        ay, dy = y
        take_y = ay >= ax
        return jnp.where(take_y, ay, ax), jnp.where(take_y, dy, dx)

    am, dm = jax.lax.associative_scan(comb, (a, a_dist))
    c_len = jnp.minimum(am - idx, limit)
    good = (am > 0) & (c_len >= 4) & (dm > 0)
    # Distances of CAPPED anchor claims (verification ran out, so the true
    # match is longer): the candidate set for the dominant-distance pass.
    # Capped entries encode the distance directly in the low 16 bits.
    d_cand = jnp.where((best >> 16) >= cap, best & 0xFFFF, 0)
    return jnp.where(good, c_len, 0), jnp.where(good, dm, 0), d_cand


def dominant_distance_lengths(buf, N: int, n_total, hstart, d_cand, *,
                              num_dom: int = 8):
    """EXACT per-position match lengths at the most frequent candidate
    distances.

    Composition by distance-equality (stride_extend) cannot bridge the gaps
    between sparse anchors; this pass instead takes the ``num_dom`` most
    frequent capped-claim distances (whole-copy repeats concentrate on a few
    distances) and, for each, computes the exact run length of
    ``buf[i] == buf[i-d]`` at EVERY position with one batched shifted
    compare + one batched reverse min-scan — full-length matches (up to 258)
    wherever those distances truly run, at O(num_dom) vector ops and no
    gathers.

    Args:
      d_cand: int32[A] candidate distances (0 = none), any order.

    Returns (best_len, best_dist): int32[N], 0 where no claim; lengths are
    exact byte-compare runs — never overclaimed.
    """
    idx = jnp.arange(N, dtype=jnp.int32)
    limit = jnp.clip(n_total - idx, 0, MAX_MATCH)

    # Frequency of each distinct candidate distance (sort + run bounds).
    A = d_cand.shape[0]
    sd = jnp.sort(d_cand)
    ii = jnp.arange(A, dtype=jnp.int32)
    change = jnp.concatenate([jnp.ones(1, bool), sd[1:] != sd[:-1]])
    start = jax.lax.cummax(jnp.where(change, ii, 0), axis=0)
    end = jax.lax.cummin(
        jnp.where(jnp.concatenate([change[1:], jnp.ones(1, bool)]), ii + 1, A),
        axis=0, reverse=True,
    )
    freq = jnp.where(change & (sd > 0), end - start, 0)
    _, top_i = jax.lax.top_k(freq, num_dom)
    doms = jnp.take(sd, top_i)  # [M] distances (may include 0 = inert)

    # buf[i - d] for each dominant d: dynamic slice of a left-extended copy.
    bufe = jnp.concatenate([jnp.zeros(WINDOW_SIZE, buf.dtype), buf[:N]])

    def shifted(d):
        return jax.lax.dynamic_slice(bufe, [WINDOW_SIZE - d], [N])

    sh = jax.vmap(shifted)(doms)  # [M, N]
    ok = (
        (buf[None, :N] == sh)
        & (idx[None, :] < n_total)
        & (idx[None, :] - doms[:, None] >= hstart)
        & (doms[:, None] > 0)
    )
    first_bad = jax.lax.cummin(
        jnp.where(ok, N, idx[None, :] * jnp.ones((num_dom, 1), jnp.int32)),
        axis=1, reverse=True,
    )
    lens = jnp.minimum(first_bad - idx[None, :], limit[None, :])  # [M, N]
    score = jnp.where(
        lens >= 3, (lens << 16) | (WINDOW_SIZE + 1 - doms[:, None]), 0
    )
    best = jnp.max(score, axis=0)
    b_len = best >> 16
    b_dist = jnp.where(best > 0, WINDOW_SIZE + 1 - (best & 0xFFFF), 0)
    return b_len, b_dist
