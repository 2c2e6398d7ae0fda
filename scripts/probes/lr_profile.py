"""Sub-stage profile of ops/longrange.py on the current backend.

Times: harvest (segment sort + run count + top_k) alone, measurement alone
(host-fixed dominant distances), and the full pass, at several (M, S).
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

from deflate_rs_tpu.constants import MAX_MATCH, WINDOW_SIZE  # noqa: E402
from deflate_rs_tpu.ops import longrange as lr  # noqa: E402
from deflate_rs_tpu.ops.chunk_encode import HALO, PAD  # noqa: E402
from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402


def harvest_only(d_cand, S, M):
    LC = d_cand.shape[0] // S
    rows = jnp.sort(d_cand.reshape(S, LC), axis=1)
    ii = jnp.arange(LC, dtype=jnp.int32)[None, :]
    change = jnp.concatenate([jnp.ones((S, 1), bool), rows[:, 1:] != rows[:, :-1]], axis=1)
    start = jax.lax.cummax(jnp.where(change, ii, 0), axis=1)
    end = jax.lax.cummin(
        jnp.where(jnp.concatenate([change[:, 1:], jnp.ones((S, 1), bool)], axis=1), ii + 1, LC),
        axis=1, reverse=True)
    freq = jnp.where(change & (rows > 0), end - start, 0)
    _, top_i = jax.lax.top_k(freq, M)
    return jnp.take_along_axis(rows, top_i, axis=1)


def measure_only(buf, N, n_total, hstart, doms, S=16, M=8):
    """The measurement half with given doms [S, M]."""
    L = N // S
    L2 = L + MAX_MATCH + 6
    LW = L2 // 4
    idx = jnp.arange(N, dtype=jnp.int32)
    limit = jnp.clip(n_total - idx, 0, MAX_MATCH)
    bufe = jnp.concatenate([jnp.zeros(WINDOW_SIZE, buf.dtype), buf, jnp.zeros(L2, buf.dtype)])

    def seg_runs(s, ds):
        base = jax.lax.dynamic_slice(bufe, [WINDOW_SIZE + s * L], [L2])
        li = s * L + jnp.arange(L2, dtype=jnp.int32)

        def one(d):
            sh = jax.lax.dynamic_slice(bufe, [WINDOW_SIZE + s * L - d], [L2])
            okb = (base == sh) & (li < n_total) & (li - d >= hstart) & (d > 0)
            ok1 = jnp.concatenate([okb[1:], jnp.zeros(1, bool)])
            ok2 = jnp.concatenate([okb[2:], jnp.zeros(2, bool)])
            ok3 = jnp.concatenate([okb[3:], jnp.zeros(3, bool)])
            pa1 = okb & ok1
            pa2 = pa1 & ok2
            pa3 = pa2 & ok3
            o = li & 3
            gap = (okb.astype(jnp.int32) + (pa1 & (o <= 2)) + (pa2 & (o <= 1)) + (pa3 & (o == 0)))
            okw = jnp.all(okb.reshape(LW, 4), axis=1)
            prefix = gap.reshape(LW, 4)[:, 0]
            wi = jnp.arange(LW, dtype=jnp.int32)
            pval = jnp.where(okw, jnp.int32(LW * 8), wi * 8 + prefix)
            pmin = jax.lax.cummin(pval, axis=0, reverse=True)
            from_word = 4 * ((pmin >> 3) - wi) + (pmin & 7)
            fw_next = jnp.concatenate([from_word[1:], jnp.zeros(1, jnp.int32)])
            fw_b = jnp.broadcast_to(fw_next[:, None], (LW, 4)).reshape(L2)
            return jnp.where(gap == 4 - o, gap + fw_b, gap)

        return jax.vmap(one)(ds)

    runs = jax.vmap(seg_runs)(jnp.arange(S, dtype=jnp.int32), doms)
    runs = runs[:, :, :L]
    lens = jnp.minimum(runs.reshape(S, M, L), limit.reshape(S, 1, L))
    return jnp.max(jnp.where(lens >= 3, lens, 0), axis=1).reshape(N)


def main():
    B = int(os.environ.get("STAGE_BATCH", "16"))
    E = 65536
    N = HALO + E
    rng = np.random.default_rng(0)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "tests", "data", "pg11.txt"), "rb") as f:
        text = f.read()
    data = (text * ((B * (N + PAD)) // len(text) + 1))[: B * (N + PAD)]
    bufs = jax.device_put(np.frombuffer(data, np.uint8).reshape(B, N + PAD))
    dc = jax.device_put(rng.integers(0, 4096, (B, N), dtype=np.int32) * (rng.random((B, N)) < 0.2))
    print(f"platform={jax.default_backend()} B={B} N={N}")

    for S, M in ((16, 8), (32, 32)):
        f_h = jax.jit(jax.vmap(functools.partial(harvest_only, S=S, M=M)))
        t = sync_time(f_h, dc, iters=12)
        print(f"S{S} M{M} harvest : {t*1e3/B:7.3f} ms/chunk", flush=True)

        doms = jax.device_put(rng.integers(1, 8192, (B, S, M), dtype=np.int32))
        f_m = jax.jit(jax.vmap(
            lambda b, d, S=S, M=M: measure_only(
                b, N, jnp.int32(N), jnp.int32(0), d, S, M)))
        t = sync_time(f_m, bufs, doms, iters=12)
        print(f"S{S} M{M} measure : {t*1e3/B:7.3f} ms/chunk", flush=True)

        f_full = jax.jit(jax.vmap(
            lambda b, c, S=S, M=M: lr.local_dominant_lengths(
                b, N, jnp.int32(N), jnp.int32(0), c, num_dom=M, num_seg=S)[0]))
        t = sync_time(f_full, bufs, dc, iters=12)
        print(f"S{S} M{M} full    : {t*1e3/B:7.3f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
