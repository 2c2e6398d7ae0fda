"""Decompose the LR block's ~1 ms: selection vs table prep vs kernel vs
finish vs the post-LR extend pass (TPU, B=16, default shapes)."""

from __future__ import annotations

import functools
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from deflate_rs_tpu.constants import MAX_MATCH, WINDOW_SIZE  # noqa: E402
from deflate_rs_tpu.ops.chunk_encode import HALO  # noqa: E402
from deflate_rs_tpu.ops import longrange as lr  # noqa: E402
from deflate_rs_tpu.ops.lr_kernel import SEG_ROWS, lr_measure_batched  # noqa: E402
from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402
from scripts.stage_timing import build_inputs  # noqa: E402

B = 16
E = 65536
N = HALO + E
S, M, ST = 32, 32, 2


def selection(d_cand):
    return lr._select_dominants(d_cand, S, M, ST)[0]


def tables(buf):
    slack = 4 * (SEG_ROWS + 1) * 128 + 64
    d8 = jnp.concatenate(
        [jnp.zeros(WINDOW_SIZE, buf.dtype), buf, jnp.zeros(slack, buf.dtype)]
    ).astype(jnp.uint32)
    P = d8[:-3] | (d8[1:-2] << 8) | (d8[2:-1] << 16) | (d8[3:] << 24)
    NPw = (P.shape[0] - 4) // 4
    NPr = -(-NPw // 128) + 1
    phases = jnp.stack([P[r : r + 4 * NPw : 4] for r in range(4)])
    phases_rows = jnp.concatenate(
        [phases, jnp.zeros((4, NPr * 128 - NPw), jnp.uint32)], axis=1
    ).reshape(4 * NPr, 128)
    BR = N // (4 * 128) + SEG_ROWS
    base_rows = P[WINDOW_SIZE : WINDOW_SIZE + 4 * BR * 128 : 4].reshape(BR, 128)
    return phases_rows, base_rows


def full(buf, d_cand):
    return lr.local_dominant_lengths_tpu(
        buf, N, jnp.int32(N), jnp.int32(0), d_cand,
        num_dom=M, num_seg=S, harvest_stride=ST,
    )


def main():
    bufs, hist, ns, lasts = build_inputs(B, E)
    rng = np.random.default_rng(0)
    d_cand = jax.device_put(rng.integers(0, 8192, (B, N), dtype=np.int32))
    doms = jax.device_put(rng.integers(1, 8192, (B, S, M), dtype=np.int32))

    print(f"platform={jax.default_backend()} B={B} S={S} M={M} stride={ST}")
    t = sync_time(jax.jit(jax.vmap(selection)), d_cand, iters=10)
    print(f"selection     : {t*1e3/B:7.3f} ms/chunk", flush=True)
    tab = jax.jit(jax.vmap(tables))
    t = sync_time(tab, bufs, iters=10)
    print(f"table prep    : {t*1e3/B:7.3f} ms/chunk", flush=True)
    ph, br = tab(bufs)
    ph, br = jax.device_put(ph), jax.device_put(br)

    def kern(d, p, b):
        return lr_measure_batched(d, p, b, N)

    t = sync_time(jax.jit(kern), doms, ph, br, iters=10)
    print(f"kernel alone  : {t*1e3/B:7.3f} ms/chunk", flush=True)
    t = sync_time(jax.jit(jax.vmap(full)), bufs, d_cand, iters=10)
    print(f"full LR pass  : {t*1e3/B:7.3f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
