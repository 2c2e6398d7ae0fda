"""Sort-operand microbenchmark: can u64-packed keys beat 4x u32 keys?

The 7-operand content sort is the matcher's largest op.  XLA TPU sorts
cost per KEY (comparator depth); packing two u32 content words into one
u64 halves the key count if the emulated 64-bit compare is cheaper than
two 32-bit comparator stages.  Measure, don't guess.
"""

from __future__ import annotations

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
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402


def main():
    B = int(os.environ.get("STAGE_BATCH", "16"))
    N = 98304
    rng = np.random.default_rng(0)
    k = [jax.device_put(rng.integers(0, 1 << 32, (B, N), dtype=np.uint64).astype(np.uint32))
         for _ in range(4)]
    idx = jax.device_put(np.tile(np.arange(N, dtype=np.int32), (B, 1)))
    pay = [jax.device_put(rng.integers(0, 1 << 32, (B, N), dtype=np.uint64).astype(np.uint32))
           for _ in range(2)]

    def sort_u32(k0, k1, k2, k3, idx, p0, p1):
        return jax.lax.sort([k0, k1, k2, k3, idx, p0, p1], num_keys=4,
                            is_stable=True)[4]

    def sort_u64(k0, k1, k2, k3, idx, p0, p1):
        a = (k0.astype(jnp.uint64) << 32) | k1.astype(jnp.uint64)
        b = (k2.astype(jnp.uint64) << 32) | k3.astype(jnp.uint64)
        return jax.lax.sort([a, b, idx, p0, p1], num_keys=2, is_stable=True)[2]

    for name, fn in (("4x u32 keys", sort_u32), ("2x u64 keys", sort_u64)):
        t = sync_time(jax.vmap(fn), *k, idx, *pay, iters=12)
        print(f"{name}: {t*1e3/B:7.3f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
