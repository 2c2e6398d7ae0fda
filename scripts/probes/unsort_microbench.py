"""Microbench: 3 ways to un-permute the matcher's per-position scores.

The matcher computes best-match scores in sorted (suffix/hash) space and
must return them in position space.  Candidates:
  a) scatter:   zeros.at[spos].set(best)    (current; XLA scatter)
  b) sort:      lax.sort([spos, best])      (sorting network, no scatter)
  c) scatter-add variant of (a) via .add    (sometimes lowers differently)

Run on the TPU backend; prints ms/chunk for B x N arrays.
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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

    for name, fn in [("scatter", a_scatter), ("sort", b_sort), ("scatter_add", c_add)]:
        t = sync_time(jax.vmap(fn), spos_d, best_d, iters=6)
        print(f"{name:12s}: {t*1e3/B:7.3f} ms/chunk  (B={B} N={N})")


if __name__ == "__main__":
    main()
