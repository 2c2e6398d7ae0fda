"""Run-length encoding of code-length arrays for dynamic block headers.

DEFLATE transmits the litlen+dist code lengths through a 19-symbol alphabet
with repeat codes (16 = copy previous 3-6, 17 = zeros 3-10, 18 = zeros
11-138).  The reference encodes runs with a sequential greedy loop
(``encode_lengths_m``, length_encode.rs:82-155).  Here the same greedy
chunking is evaluated *per position* in closed form: a position emits a symbol
iff it is a greedy chunk start within its run, which is pure arithmetic on
(run start, run length, offset) — no scan, fully parallel.

Greedy policy (matching the reference's):
  zero run r:    chunks of min(138, rem) while rem >= 11; then one 17 if
                 3 <= rem <= 10; else rem literal zeros.
  nonzero run r: one literal, then chunks of min(6, rem) while rem >= 3;
                 trailing 1-2 copies become literals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Static capacity: hlit (<=286) + hdist (<=30).
CL_CAP = 320


def encode_code_lengths(cl, hn):
    """RLE-encode the concatenated code-length array.

    Args:
      cl: int32[CL_CAP]; entries at index >= hn are ignored.
      hn: dynamic number of valid entries (hlit + hdist).

    Returns dict:
      sym:   int32[CL_CAP] RLE symbols (0..18) in stream order
      cnt:   int32[CL_CAP] repeat counts (for syms 16/17/18; else 1)
      n:     number of RLE symbols emitted
      freq:  int32[19] histogram of emitted symbols
      extra_bits: int32[CL_CAP] extra-bit widths per emitted symbol
      extra_vals: int32[CL_CAP] extra-bit values per emitted symbol
    """
    CAP = cl.shape[0]
    idx = jnp.arange(CAP, dtype=jnp.int32)
    v = jnp.where(idx < hn, cl, -1)

    prev = jnp.concatenate([jnp.full(1, -2, jnp.int32), v[:-1]])
    bd = v != prev  # run starts (position 0 always starts a run)
    big = CAP + 1
    start = jax.lax.cummax(jnp.where(bd, idx, -1))
    # nb[i] = nearest boundary at-or-after i; shifting by one gives the
    # nearest boundary strictly after i.
    nb = jax.lax.associative_scan(jnp.minimum, jnp.where(bd, idx, big), reverse=True)
    next_start = jnp.concatenate([nb[1:], jnp.full(1, big, jnp.int32)])
    run_len = jnp.minimum(next_start, hn) - start
    off = idx - start

    valid = v >= 0

    # --- zero runs --------------------------------------------------------
    base = off - off % 138
    rem_b = run_len - base
    in18 = rem_b >= 11
    z_emit18 = in18 & (off % 138 == 0)
    z_cnt18 = jnp.minimum(138, rem_b)
    tail_rem = rem_b  # for tail positions, base == tail start
    z_emit17 = ~in18 & (tail_rem >= 3) & (off == base)
    z_lit = ~in18 & (tail_rem < 3)

    is_zero = valid & (v == 0)
    zero_emit = is_zero & (z_emit18 | z_emit17 | z_lit)
    zero_sym = jnp.where(z_emit18, 18, jnp.where(z_emit17, 17, 0))
    zero_cnt = jnp.where(z_emit18, z_cnt18, jnp.where(z_emit17, tail_rem, 1))

    # --- nonzero runs -----------------------------------------------------
    o2 = off - 1
    base2 = o2 - o2 % 6
    rem_b2 = (run_len - 1) - base2
    in16 = rem_b2 >= 3
    nz_emit16 = in16 & (o2 % 6 == 0)
    nz_cnt16 = jnp.minimum(6, rem_b2)
    nz_lit = ~in16

    is_nz = valid & (v > 0)
    first = off == 0
    nz_emit = is_nz & (first | nz_emit16 | nz_lit)
    nz_sym = jnp.where(first, v, jnp.where(nz_emit16, 16, v))
    nz_cnt = jnp.where(first | nz_lit, 1, nz_cnt16)

    emit = zero_emit | nz_emit
    sym = jnp.where(is_zero, zero_sym, nz_sym)
    cnt = jnp.where(is_zero, zero_cnt, nz_cnt)
    sym = jnp.where(emit, sym, 0)
    cnt = jnp.where(emit, cnt, 0)

    # --- compact into stream order ---------------------------------------
    order = jnp.cumsum(emit.astype(jnp.int32)) - 1
    slot = jnp.where(emit, order, CAP)
    out_sym = jnp.zeros(CAP, jnp.int32).at[slot].set(sym, mode="drop")
    out_cnt = jnp.zeros(CAP, jnp.int32).at[slot].set(cnt, mode="drop")
    n = jnp.sum(emit.astype(jnp.int32))

    freq = jnp.zeros(19, jnp.int32).at[jnp.where(emit, sym, 0)].add(
        emit.astype(jnp.int32), mode="drop"
    )

    used = jnp.arange(CAP) < n
    eb = jnp.where(
        out_sym == 16, 2, jnp.where(out_sym == 17, 3, jnp.where(out_sym == 18, 7, 0))
    )
    ev = jnp.where(out_sym == 18, out_cnt - 11, jnp.where(out_sym >= 16, out_cnt - 3, 0))
    return {
        "sym": out_sym,
        "cnt": out_cnt,
        "n": n,
        "freq": freq,
        "extra_bits": jnp.where(used, eb, 0),
        "extra_vals": jnp.where(used, ev, 0),
    }
