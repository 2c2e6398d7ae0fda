"""Microbenchmark: reverse suffix-min formulations on TPU.

chain_extend (matching.py) needs suffix_min over N=98304 int32 per chunk.
Candidates:
  (a) jax.lax.associative_scan(min, reverse=True)   -- current
  (b) jax.lax.cummin(reverse=True)                  -- XLA cumulative op
  (c) two-level reshape: within-row doubling (log C full passes) + row carry
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

import jax.numpy as jnp  # noqa: E402

from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402

B = int(os.environ.get("STAGE_BATCH", "16"))
N = 98304
BIG = np.int32(2**31 - 1)


def f_assoc(x):
    return jax.lax.associative_scan(jnp.minimum, x, reverse=True)


def f_cummin(x):
    return jax.lax.cummin(x, axis=0, reverse=True)


def two_level(x, C: int):
    R = x.shape[0] // C
    a = x.reshape(R, C)
    s = a
    k = 1
    while k < C:
        shifted = jnp.concatenate([s[:, k:], jnp.full((R, k), BIG, s.dtype)], axis=1)
        s = jnp.minimum(s, shifted)
        k <<= 1
    row_min = s[:, 0]
    carry = jax.lax.associative_scan(jnp.minimum, row_min, reverse=True)
    carry_excl = jnp.concatenate([carry[1:], jnp.full((1,), BIG, carry.dtype)])
    return jnp.minimum(s, carry_excl[:, None]).reshape(-1)


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, 1 << 30, (B, N)).astype(np.int32))
    print(f"platform={jax.devices()[0].platform} B={B} N={N}")

    ref = np.minimum.accumulate(np.asarray(x)[:, ::-1], axis=1)[:, ::-1]
    for name, fn in [
        ("assoc_scan", f_assoc),
        ("lax.cummin", f_cummin),
        ("two_level_128", lambda v: two_level(v, 128)),
        ("two_level_512", lambda v: two_level(v, 512)),
    ]:
        out = jax.jit(jax.vmap(fn))(x)
        ok = bool(np.array_equal(np.asarray(out), ref))
        t = sync_time(jax.vmap(fn), x, iters=8)
        print(f"{name:14s}: {t*1e3/B:8.4f} ms/chunk  correct={ok}")


if __name__ == "__main__":
    main()
