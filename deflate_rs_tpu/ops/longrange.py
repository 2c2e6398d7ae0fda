"""Long-range match recovery: exact lengths at locally dominant distances.

The main matcher (matching.py) measures candidate matches through a probe
window of 4*probe_words bytes; chain/stride extension recovers longer
matches only where consecutive positions agree on a distance.  On corpora of
concatenated similar-but-not-identical files (license texts, JSON configs,
Python sources) the tie group at every position is full of short-lived near
candidates, so chosen distances vary position to position and long matches
are emitted as ~probe-window fragments — measured token histograms showed a
4x pile-up in the 17-32-byte bucket vs zlib-6's parse on the json corpus
(scripts/parse_diff.py), costing up to 36% in size.

The recovery exploits locality of repeat structure instead of per-candidate
measurement (TPU gathers are scalar-bound, ~10 ns/element — off the table):

1. HARVEST: every position whose claim hit the probe cap contributes its
   chosen distance as a candidate (the true length there is unknown).
2. DOMINANTS: reshape candidates to [num_seg, *] segment rows; each row's
   top ``num_dom`` distances by frequency come from one batched row sort +
   run-length counting + top_k.  Within a ~4 KiB segment the capped claims
   concentrate on a handful of file-to-file offsets.
3. MEASURE: for each (segment, dominant distance), the exact run length of
   ``buf[i] == buf[i-d]`` at EVERY position of the segment: one dynamic
   slice + shifted compare + batched reverse min-scan over L + MAX_MATCH
   bytes (runs may extend past the segment end).  Lengths are exact byte
   runs — never overclaimed, so any resulting parse stays legal DEFLATE.

The reference reaches the same matches by walking per-position hash chains
to depth 1768 with full byte compares (matching.rs:87,
compression_options.rs:126-133); this pass replaces that reach for the
price of ~num_seg*num_dom vectorized row scans.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import MAX_MATCH, WINDOW_SIZE


def local_dominant_lengths(buf, N: int, n_total, hstart, d_cand, *,
                           num_dom: int = 8, num_seg: int = 16):
    """EXACT per-position match lengths at each SEGMENT's dominant distances.

    Args:
      buf: uint8[N + PAD] chunk buffer (history + payload + padding).
      N: static number of positions (must divide by num_seg).
      n_total: dynamic end of valid bytes.
      hstart: dynamic first valid position.
      d_cand: int32[k*N] candidate distances (0 = none), position-major so
        entries k*i..k*i+k-1 belong to position i — the distances whose
        claims hit a measurement cap upstream.
      num_dom: distances measured per segment (top-M by frequency).
      num_seg: segment count (segment length = N // num_seg).

    Returns (best_len, best_dist): int32[N], 0 where no claim.
    """
    S = num_seg
    M = num_dom
    assert N % S == 0 and d_cand.shape[0] % S == 0
    L = N // S
    LC = d_cand.shape[0] // S  # candidate row width (k * L)
    L2 = L + MAX_MATCH + 6
    idx = jnp.arange(N, dtype=jnp.int32)
    limit = jnp.clip(n_total - idx, 0, MAX_MATCH)

    # ---------------- per-segment top-M candidate distances by frequency
    rows = jnp.sort(d_cand.reshape(S, LC), axis=1)
    ii = jnp.arange(LC, dtype=jnp.int32)[None, :]
    change = jnp.concatenate(
        [jnp.ones((S, 1), bool), rows[:, 1:] != rows[:, :-1]], axis=1
    )
    start = jax.lax.cummax(jnp.where(change, ii, 0), axis=1)
    end = jax.lax.cummin(
        jnp.where(jnp.concatenate([change[:, 1:], jnp.ones((S, 1), bool)], axis=1),
                  ii + 1, LC),
        axis=1, reverse=True,
    )
    freq = jnp.where(change & (rows > 0), end - start, 0)
    _, top_i = jax.lax.top_k(freq, M)
    doms = jnp.take_along_axis(rows, top_i, axis=1)  # [S, M] (0 = inert)

    # --------------- exact runs at each (segment, dominant distance) pair
    # Right-pad so the LAST segment's L2-long slice stays in bounds: XLA
    # dynamic_slice CLAMPS an out-of-bounds start, silently misaligning the
    # compare window (a real bug caught by roundtrip: claims became
    # overclaims for last-segment positions).
    bufe = jnp.concatenate(
        [jnp.zeros(WINDOW_SIZE, buf.dtype), buf, jnp.zeros(L2, buf.dtype)]
    )

    # The scan is the cost driver (elementwise compares fuse to ~free; the
    # cumulative min does not), so the run scan happens at WORD granularity
    # — L2/4 elements per (segment, distance) instead of L2.  Byte
    # precision is preserved at both ends: run starts via elementwise
    # prefix-ANDs, run ends by packing the first bad word's byte prefix
    # into the scanned value.  Runs are exact byte runs.
    assert L2 % 4 == 0
    LW = L2 // 4

    def seg_runs(s, ds):
        base = jax.lax.dynamic_slice(bufe, [WINDOW_SIZE + s * L], [L2])
        li = s * L + jnp.arange(L2, dtype=jnp.int32)

        def one(d):
            # Validity is NOT masked per byte here: a claim at start i only
            # needs i - d >= hstart (later bytes x > i then satisfy it too)
            # and the final limit clip bounds every claim by n_total - i, so
            # start-time masking (below, in position space) suffices —
            # saving ~1/3 of the per-distance compare work.
            sh = jax.lax.dynamic_slice(bufe, [WINDOW_SIZE + s * L - d], [L2])
            okb = base == sh
            # Byte prefix runs: pa[t][i] = bytes i..i+t all ok (shifted ANDs).
            ok1 = jnp.concatenate([okb[1:], jnp.zeros(1, bool)])
            ok2 = jnp.concatenate([okb[2:], jnp.zeros(2, bool)])
            ok3 = jnp.concatenate([okb[3:], jnp.zeros(3, bool)])
            pa1 = okb & ok1
            pa2 = pa1 & ok2
            pa3 = pa2 & ok3
            o = li & 3
            # Consecutive ok bytes from i to the end of its word (0..4-o).
            gap = (
                okb.astype(jnp.int32)
                + (pa1 & (o <= 2)).astype(jnp.int32)
                + (pa2 & (o <= 1)).astype(jnp.int32)
                + (pa3 & (o == 0)).astype(jnp.int32)
            )
            # Word-level scan carrying the bad word's BYTE PREFIX packed
            # into the scanned value, so run ends stay byte-exact: for the
            # first not-fully-ok word, min picks j*8 + prefix(j); unpacking
            # yields both the word index and its leading ok bytes.
            okw = jnp.all(okb.reshape(LW, 4), axis=1)
            prefix = gap.reshape(LW, 4)[:, 0]  # 0..4; ==4 only when okw
            wi = jnp.arange(LW, dtype=jnp.int32)
            pval = jnp.where(okw, jnp.int32(LW * 8), wi * 8 + prefix)
            pmin = jax.lax.cummin(pval, axis=0, reverse=True)
            # Bytes matched from the start of word j onward (exact).
            from_word = 4 * ((pmin >> 3) - wi) + (pmin & 7)
            fw_next = jnp.concatenate([from_word[1:], jnp.zeros(1, jnp.int32)])
            fw_b = jnp.broadcast_to(fw_next[:, None], (LW, 4)).reshape(L2)
            full = gap == 4 - o
            return jnp.where(full, gap + fw_b, gap)

        return jax.vmap(one)(ds)  # [M, L2]

    runs = jax.vmap(seg_runs)(jnp.arange(S, dtype=jnp.int32), doms)  # [S,M,L2]
    runs = runs[:, :, :L]  # claims for positions owned by the segment
    lens = jnp.minimum(runs.reshape(S, M, L), limit.reshape(S, 1, L))
    # Start-time validity (see the note in one()): source inside history,
    # start inside payload, real distance.
    pos = idx.reshape(S, 1, L)
    ok_claim = (
        (lens >= 3)
        & (doms[:, :, None] > 0)
        & (pos - doms[:, :, None] >= hstart)
        & (pos < n_total)
    )
    score = jnp.where(
        ok_claim,
        (lens << 16) | (WINDOW_SIZE + 1 - doms[:, :, None]),
        0,
    )
    best = jnp.max(score, axis=1).reshape(N)
    b_len = best >> 16
    b_dist = jnp.where(best > 0, WINDOW_SIZE + 1 - (best & 0xFFFF), 0)
    return b_len, b_dist
