"""Decompose the global-union LR pass cost on TPU (r4 item 1).

Variants at D distances over NW words: collect loop only; + compare/mb;
full with batched reverse cummin; full with MAX_MATCH-capped (cnt, tail_mb)
doubling (7 levels — runs never need more than 66 words).
"""

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
from deflate_rs_tpu.ops.longrange import _matched_low_bytes  # noqa: E402
from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402
from scripts.stage_timing import build_inputs  # noqa: E402

B = int(os.environ.get("STAGE_BATCH", "16"))
E = 65536
N = HALO + E
D = int(os.environ.get("LR_D", "128"))
NQ4 = N // 4
NW = NQ4 + (MAX_MATCH + 6) // 4 + 1


def prep(buf):
    d8 = jnp.concatenate(
        [jnp.zeros(WINDOW_SIZE, buf.dtype), buf, jnp.zeros(4 * NW + 8, buf.dtype)]
    ).astype(jnp.uint32)
    P = d8[:-3] | (d8[1:-2] << 8) | (d8[2:-1] << 16) | (d8[3:] << 24)
    NP = (P.shape[0] - 4) // 4
    phases = jnp.stack([P[r : r + 4 * NP : 4] for r in range(4)])
    base = (P[WINDOW_SIZE::4])[:NW]
    return phases, base


def collect(buf, dlist):
    phases, base = prep(buf)

    def body(t, sh_all):
        d = jax.lax.dynamic_index_in_dim(dlist, t, keepdims=False)
        off = WINDOW_SIZE - d
        row = jax.lax.dynamic_slice(phases, [off & 3, off >> 2], [1, NW])
        return jax.lax.dynamic_update_slice(sh_all, row, [t, 0])

    sh_all = jax.lax.fori_loop(0, D, body, jnp.zeros((D, NW), jnp.uint32))
    return sh_all, base


def collect_only(buf, dlist):
    sh_all, base = collect(buf, dlist)
    return jnp.sum(sh_all)


def collect_mb(buf, dlist):
    sh_all, base = collect(buf, dlist)
    x = base[None, :] ^ sh_all
    return jnp.sum(_matched_low_bytes(x))


def full_cummin(buf, dlist):
    sh_all, base = collect(buf, dlist)
    x = base[None, :] ^ sh_all
    mb = _matched_low_bytes(x)
    wi = jnp.arange(NW, dtype=jnp.int32)
    pval = jnp.where(x == 0, jnp.int32(NW * 8), wi[None, :] * 8 + mb)
    pmin = jax.lax.cummin(pval, axis=1, reverse=True)
    run0 = 4 * ((pmin >> 3) - wi[None, :]) + (pmin & 7)
    return jnp.max(run0, axis=0).sum()


def full_doubling(buf, dlist):
    sh_all, base = collect(buf, dlist)
    x = base[None, :] ^ sh_all
    mb = _matched_low_bytes(x)
    full = x == 0
    cnt = full.astype(jnp.int32)
    tmb = jnp.where(full, 0, mb)
    step = 1
    while step <= 64:
        cnt_s = jnp.concatenate(
            [cnt[:, step:], jnp.zeros((D, step), jnp.int32)], axis=1)
        tmb_s = jnp.concatenate(
            [tmb[:, step:], jnp.zeros((D, step), jnp.int32)], axis=1)
        ext = cnt == step
        cnt = jnp.where(ext, cnt + cnt_s, cnt)
        tmb = jnp.where(ext, tmb_s, tmb)
        step *= 2
    run0 = 4 * cnt + tmb
    return jnp.max(run0, axis=0).sum()


def main():
    bufs, hist, ns, lasts = build_inputs(B, E)
    rng = np.random.default_rng(0)
    dl = jax.device_put(rng.integers(1, 30000, (B, D), dtype=np.int32))
    print(f"platform={jax.default_backend()} B={B} D={D} NW={NW}")
    for name, fn in [("collect", collect_only), ("collect+mb", collect_mb),
                     ("full cummin", full_cummin),
                     ("full dbl-cap66", full_doubling)]:
        t = sync_time(jax.jit(jax.vmap(fn)), bufs, dl, iters=8)
        print(f"{name:15s}: {t*1e3/B:7.3f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
