"""Isolate the cost drivers inside longrange.local_dominant_lengths (TPU).

Variants: full pass; dominants-selection only; measurement only (fixed
dominants); measurement with the cummin scan removed (compare+gap only);
measurement with slices replaced by whole-buffer shifts.  B=16, 64 KiB.
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
from deflate_rs_tpu.ops.chunk_encode import HALO, PAD  # noqa: E402
from deflate_rs_tpu.ops.longrange import local_dominant_lengths  # noqa: E402
from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402
from scripts.stage_timing import build_inputs  # noqa: E402

B = int(os.environ.get("STAGE_BATCH", "16"))
E = 65536
N = HALO + E
S = int(os.environ.get("LR_S", "32"))
M = int(os.environ.get("LR_M", "32"))
L = N // S
L2 = L + MAX_MATCH + 6
LW = L2 // 4


def dominants_only(buf, d_cand):
    LC = d_cand.shape[0] // S
    rows = jnp.sort(d_cand.reshape(S, LC), axis=1)
    ii = jnp.arange(LC, dtype=jnp.int32)[None, :]
    change = jnp.concatenate(
        [jnp.ones((S, 1), bool), rows[:, 1:] != rows[:, :-1]], axis=1)
    start = jax.lax.cummax(jnp.where(change, ii, 0), axis=1)
    end = jax.lax.cummin(
        jnp.where(jnp.concatenate([change[:, 1:], jnp.ones((S, 1), bool)], axis=1),
                  ii + 1, LC), axis=1, reverse=True)
    freq = jnp.where(change & (rows > 0), end - start, 0)
    _, top_i = jax.lax.top_k(freq, M)
    return jnp.take_along_axis(rows, top_i, axis=1)


def measure_only(buf, doms):
    """The seg_runs measurement at FIXED dominants (full scan)."""
    bufe = jnp.concatenate(
        [jnp.zeros(WINDOW_SIZE, buf.dtype), buf, jnp.zeros(L2, buf.dtype)])

    def seg_runs(s, ds):
        base = jax.lax.dynamic_slice(bufe, [WINDOW_SIZE + s * L], [L2])
        li = s * L + jnp.arange(L2, dtype=jnp.int32)

        def one(d):
            sh = jax.lax.dynamic_slice(bufe, [WINDOW_SIZE + s * L - d], [L2])
            okb = base == sh
            ok1 = jnp.concatenate([okb[1:], jnp.zeros(1, bool)])
            ok2 = jnp.concatenate([okb[2:], jnp.zeros(2, bool)])
            ok3 = jnp.concatenate([okb[3:], jnp.zeros(3, bool)])
            pa1 = okb & ok1
            pa2 = pa1 & ok2
            pa3 = pa2 & ok3
            o = li & 3
            gap = (okb.astype(jnp.int32) + (pa1 & (o <= 2)) + (pa2 & (o <= 1))
                   + (pa3 & (o == 0)))
            okw = jnp.all(okb.reshape(LW, 4), axis=1)
            prefix = gap.reshape(LW, 4)[:, 0]
            wi = jnp.arange(LW, dtype=jnp.int32)
            pval = jnp.where(okw, jnp.int32(LW * 8), wi * 8 + prefix)
            pmin = jax.lax.cummin(pval, axis=0, reverse=True)
            from_word = 4 * ((pmin >> 3) - wi) + (pmin & 7)
            fw_next = jnp.concatenate([from_word[1:], jnp.zeros(1, jnp.int32)])
            fw_b = jnp.broadcast_to(fw_next[:, None], (LW, 4)).reshape(L2)
            full = gap == 4 - o
            return jnp.where(full, gap + fw_b, gap)

        return jax.vmap(one)(ds)

    runs = jax.vmap(seg_runs)(jnp.arange(S, dtype=jnp.int32), doms)
    return jnp.max(runs[:, :, :L], axis=1)


def measure_noscan(buf, doms):
    """Measurement with the cummin REMOVED (compare + gap only)."""
    bufe = jnp.concatenate(
        [jnp.zeros(WINDOW_SIZE, buf.dtype), buf, jnp.zeros(L2, buf.dtype)])

    def seg_runs(s, ds):
        base = jax.lax.dynamic_slice(bufe, [WINDOW_SIZE + s * L], [L2])

        def one(d):
            sh = jax.lax.dynamic_slice(bufe, [WINDOW_SIZE + s * L - d], [L2])
            okb = base == sh
            ok1 = jnp.concatenate([okb[1:], jnp.zeros(1, bool)])
            pa1 = okb & ok1
            gap = okb.astype(jnp.int32) + pa1
            return gap

        return jax.vmap(one)(ds)

    runs = jax.vmap(seg_runs)(jnp.arange(S, dtype=jnp.int32), doms)
    return jnp.max(runs[:, :, :L], axis=1)


def measure_assoc(buf, doms):
    """Measurement with cummin replaced by associative_scan."""
    bufe = jnp.concatenate(
        [jnp.zeros(WINDOW_SIZE, buf.dtype), buf, jnp.zeros(L2, buf.dtype)])

    def seg_runs(s, ds):
        base = jax.lax.dynamic_slice(bufe, [WINDOW_SIZE + s * L], [L2])
        li = s * L + jnp.arange(L2, dtype=jnp.int32)

        def one(d):
            sh = jax.lax.dynamic_slice(bufe, [WINDOW_SIZE + s * L - d], [L2])
            okb = base == sh
            ok1 = jnp.concatenate([okb[1:], jnp.zeros(1, bool)])
            pa1 = okb & ok1
            o = li & 3
            gap = okb.astype(jnp.int32) + pa1
            okw = jnp.all(okb.reshape(LW, 4), axis=1)
            prefix = gap.reshape(LW, 4)[:, 0]
            wi = jnp.arange(LW, dtype=jnp.int32)
            pval = jnp.where(okw, jnp.int32(LW * 8), wi * 8 + prefix)
            pmin = jax.lax.associative_scan(jnp.minimum, pval, reverse=True)
            from_word = 4 * ((pmin >> 3) - wi) + (pmin & 7)
            fw_next = jnp.concatenate([from_word[1:], jnp.zeros(1, jnp.int32)])
            fw_b = jnp.broadcast_to(fw_next[:, None], (LW, 4)).reshape(L2)
            full = gap == 4 - o
            return jnp.where(full, gap + fw_b, gap)

        return jax.vmap(one)(ds)

    runs = jax.vmap(seg_runs)(jnp.arange(S, dtype=jnp.int32), doms)
    return jnp.max(runs[:, :, :L], axis=1)


def measure_doubling(buf, doms):
    """Measurement with the scan replaced by MAX_MATCH-capped log doubling:
    consecutive-ok-word counts via 7 shifted passes (runs only ever need to
    reach 258 bytes = 65 words)."""
    bufe = jnp.concatenate(
        [jnp.zeros(WINDOW_SIZE, buf.dtype), buf, jnp.zeros(L2, buf.dtype)])

    def seg_runs(s, ds):
        base = jax.lax.dynamic_slice(bufe, [WINDOW_SIZE + s * L], [L2])
        li = s * L + jnp.arange(L2, dtype=jnp.int32)

        def one(d):
            sh = jax.lax.dynamic_slice(bufe, [WINDOW_SIZE + s * L - d], [L2])
            okb = base == sh
            ok1 = jnp.concatenate([okb[1:], jnp.zeros(1, bool)])
            pa1 = okb & ok1
            o = li & 3
            gap = okb.astype(jnp.int32) + pa1
            okw = jnp.all(okb.reshape(LW, 4), axis=1)
            # capped doubling: cnt[i] = consecutive ok words from i, <= 66
            cnt = okw.astype(jnp.int32)
            step = 1
            while step <= 64:
                nxt = jnp.concatenate(
                    [cnt[step:], jnp.zeros(step, jnp.int32)])
                cnt = cnt + jnp.where(cnt == step, nxt, 0)
                step *= 2
            from_word = 4 * cnt
            fw_next = jnp.concatenate([from_word[1:], jnp.zeros(1, jnp.int32)])
            fw_b = jnp.broadcast_to(fw_next[:, None], (LW, 4)).reshape(L2)
            full = gap == 4 - o
            return jnp.where(full, gap + fw_b, gap)

        return jax.vmap(one)(ds)

    runs = jax.vmap(seg_runs)(jnp.arange(S, dtype=jnp.int32), doms)
    return jnp.max(runs[:, :, :L], axis=1)


def measure_flat(buf, doms_flat):
    """Whole-buffer shifted compares per UNIQUE distance (no per-seg slices):
    D distances, each one N-length compare + N/4 cummin."""
    D = doms_flat.shape[0]
    NW = N // 4
    bufp = jnp.concatenate([buf[:N], jnp.zeros(8, buf.dtype)])
    bufh = jnp.concatenate([jnp.zeros(WINDOW_SIZE, buf.dtype), buf[:N]])
    wi = jnp.arange(NW, dtype=jnp.int32)

    def one(d):
        sh = jax.lax.dynamic_slice(bufh, [WINDOW_SIZE - d], [N])
        okb = bufp[:N] == sh
        okw = jnp.all(okb.reshape(NW, 4), axis=1)
        pval = jnp.where(okw, jnp.int32(NW * 8), wi * 8)
        pmin = jax.lax.cummin(pval, axis=0, reverse=True)
        return pmin

    return jax.vmap(one)(doms_flat)


def main():
    bufs, hist, ns, lasts = build_inputs(B, E)
    rng = np.random.default_rng(0)
    d_cand = jax.device_put(
        rng.integers(0, 4096, (B, N), dtype=np.int32))
    doms = jax.device_put(rng.integers(1, 8192, (B, S, M), dtype=np.int32))
    doms_flat = jax.device_put(rng.integers(1, 8192, (B, S * M // 8), dtype=np.int32))
    n_total = jax.device_put(np.full(B, N, np.int32))
    hs = jax.device_put(np.zeros(B, np.int32))

    def full_one(buf, nt, h, dc):
        return local_dominant_lengths(buf, N, nt, h, dc, num_dom=M, num_seg=S)

    full = jax.jit(jax.vmap(full_one))
    print(f"platform={jax.default_backend()} B={B} S={S} M={M} L2={L2}")
    t = sync_time(full, bufs, n_total, hs, d_cand, iters=8)
    print(f"full pass      : {t*1e3/B:7.3f} ms/chunk", flush=True)
    t = sync_time(jax.jit(jax.vmap(dominants_only)), bufs, d_cand, iters=8)
    print(f"dominants only : {t*1e3/B:7.3f} ms/chunk", flush=True)
    t = sync_time(jax.jit(jax.vmap(measure_only)), bufs, doms, iters=8)
    print(f"measure full   : {t*1e3/B:7.3f} ms/chunk", flush=True)
    t = sync_time(jax.jit(jax.vmap(measure_noscan)), bufs, doms, iters=8)
    print(f"measure noscan : {t*1e3/B:7.3f} ms/chunk", flush=True)
    t = sync_time(jax.jit(jax.vmap(measure_assoc)), bufs, doms, iters=8)
    print(f"measure assoc  : {t*1e3/B:7.3f} ms/chunk", flush=True)
    t = sync_time(jax.jit(jax.vmap(measure_doubling)), bufs, doms, iters=8)
    print(f"measure dbl258 : {t*1e3/B:7.3f} ms/chunk", flush=True)
    t = sync_time(jax.jit(jax.vmap(measure_flat)), bufs, doms_flat, iters=8)
    print(f"flat D={S*M//8:3d}     : {t*1e3/B:7.3f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
