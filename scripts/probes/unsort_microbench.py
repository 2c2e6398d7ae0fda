"""Microbench: sort vs hinted scatter for the pipeline's two compactions.

RECONCILIATION TABLE (VERDICT r4 weak 2): round-1 notes recorded "hinted
scatter-set (unique+sorted) 0.046 ms vs scatter-add 1.28 ms at 148 K
updates, applied to the matcher's permutation unsort", while matching.py
says the sort-based unsort measured ~2x FASTER than the scatter.  Both
cannot be current truth.  The resolution this probe encodes: the round-1
0.046 number was measured with BOTH hints set on a permutation — but a
permutation is unique and NOT sorted, so indices_are_sorted=True was a
lie to the compiler there (spec-UB; it happened to return plausible
numbers).  The honest variants are measured side by side here:

  UNSORT (matcher: indices = permutation of iota, unique, unsorted):
    a) scatter-set, unique hint only (honest)
    b) sort by position key                      (shipped, matching.py:196)
    c) scatter-add, unique hint (lowering comparison)
  PACK BOUNDARY (bitpack: word index per field, nondecreasing, ~1 field
  run per output word; the compaction keeps the LAST field of each word):
    d) 1-key sort partition                      (shipped, bitpack.py:101)
    e) scatter-set keyed by word for ALL rows, indices_are_sorted=True
       (honest: keys ARE nondecreasing; duplicates rely on in-order
       update application — checked against (d) for equality)
    f) scatter-set of boundary rows only to key where(boundary, word, W),
       unique-ish (duplicates only at the dead slot W), unsorted

Run on the TPU backend; prints ms/chunk for B x N arrays and equality
checks for the pack variants.
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import jax.numpy as jnp  # noqa: E402

from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402


def main():
    B = int(os.environ.get("UB_BATCH", "16"))
    N = int(os.environ.get("UB_N", str(98304)))
    rng = np.random.default_rng(0)
    spos = np.stack([rng.permutation(N).astype(np.int32) for _ in range(B)])
    best = rng.integers(0, 1 << 30, (B, N), dtype=np.int32)
    spos_d, best_d = jax.device_put(spos), jax.device_put(best)

    def a_scatter(sp, b):
        return jnp.zeros(N, jnp.int32).at[sp].set(b, unique_indices=True)

    def b_sort(sp, b):
        return jax.lax.sort([sp, b], num_keys=1, is_stable=False)[1]

    def c_add(sp, b):
        return jnp.zeros(N, jnp.int32).at[sp].add(b, unique_indices=True)

    print("== unsort (permutation indices: unique, NOT sorted) ==")
    for name, fn in [("scatter", a_scatter), ("sort", b_sort), ("scatter_add", c_add)]:
        t = sync_time(jax.vmap(fn), spos_d, best_d, iters=6)
        print(f"{name:12s}: {t*1e3/B:7.3f} ms/chunk  (B={B} N={N})", flush=True)

    # ---- pack-boundary pattern: F fields, nondecreasing word index,
    # keep the LAST field's running-sum value per word (bitpack.py).
    F = int(os.environ.get("UB_FIELDS", str(150_000)))
    W = int(os.environ.get("UB_WORDS", str((9 * 65536) // 32 + 2048)))
    used = int(os.environ.get("UB_USED", str(12_000)))  # words with fields
    # ~F/used fields per used word, like a text chunk's pack.
    word = np.sort(rng.integers(0, used, (B, F)).astype(np.int32), axis=1)
    word[:, 0] = 0
    # gap-free: every word 0..used-1 appears (force by construction)
    word = np.maximum.accumulate(word, axis=1)
    ps = rng.integers(0, 1 << 31, (B, F), dtype=np.uint32).astype(np.uint32)
    word_d, ps_d = jax.device_put(word), jax.device_put(ps)

    def d_sortpack(w, p):
        nxt = jnp.concatenate([w[1:], jnp.full(1, -1, jnp.int32)])
        boundary = w != nxt
        key = jnp.where(boundary, w, jnp.int32(W))
        srt = jax.lax.sort([key, p], num_keys=1, is_stable=False)
        return srt[1][:W]

    def e_scatter_all(w, p):
        return (
            jnp.zeros(W, jnp.uint32)
            .at[w].set(p, indices_are_sorted=True, mode="drop")
        )

    def f_scatter_bnd(w, p):
        nxt = jnp.concatenate([w[1:], jnp.full(1, -1, jnp.int32)])
        boundary = w != nxt
        key = jnp.where(boundary, w, jnp.int32(W))
        buf = jnp.zeros(W + 1, jnp.uint32).at[key].set(p, unique_indices=True)
        return buf[:W]

    print("== pack boundary (nondecreasing word keys) ==")
    ref = jax.vmap(d_sortpack)(word_d, ps_d)
    for name, fn in [("sort_pack", d_sortpack), ("scatter_all", e_scatter_all),
                     ("scatter_bnd", f_scatter_bnd)]:
        out = jax.vmap(fn)(word_d, ps_d)
        # equality on the words that have fields (junk differs beyond)
        eq = bool(jnp.all(out[:, :used] == ref[:, :used]))
        t = sync_time(jax.vmap(fn), word_d, ps_d, iters=6)
        print(f"{name:12s}: {t*1e3/B:7.3f} ms/chunk  equal_to_sort={eq}",
              flush=True)


if __name__ == "__main__":
    main()
