"""Honest per-stage timing of the chunk encoder on the current backend.

Reconstructs the encode_chunk pipeline stage by stage, jitting each stage
separately with real (device-resident) inputs chained from the previous
stage, and timing with the fetch-barrier discipline (utils/profiling.py —
block_until_ready is unreliable on the tunnel platform).

Usage:
  python scripts/stage_timing.py            # full batched encoder only
  python scripts/stage_timing.py --stages   # per-stage breakdown (compiles
                                            # each stage: slow first run,
                                            # cached afterwards)
Env: STAGE_BATCH (default 16), STAGE_PRESET (default|high|fast).
"""

from __future__ import annotations

import argparse
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

from deflate_rs_tpu.compression_options import CompressionOptions  # noqa: E402
from deflate_rs_tpu.ops import chunk_encode as ce  # noqa: E402
from deflate_rs_tpu.ops import matching as mt  # noqa: E402
from deflate_rs_tpu.ops.hashing import INVALID_KEY, hash3  # noqa: E402
from deflate_rs_tpu.ops.parse import build_jumps  # noqa: E402
from deflate_rs_tpu.ops.parse_scan import parse_scan_batched  # noqa: E402
from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402


def build_inputs(B, E):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "tests", "data", "pg11.txt"), "rb") as f:
        text = f.read()
    data = (text * ((B * E) // len(text) + 1))[: B * E]
    arr = np.frombuffer(data, np.uint8)
    bufs = np.zeros((B, ce.HALO + E + ce.PAD), np.uint8)
    for i in range(B):
        off = i * E
        h = min(off, ce.HALO)
        if h:
            bufs[i, ce.HALO - h : ce.HALO] = arr[off - h : off]
        bufs[i, ce.HALO : ce.HALO + E] = arr[off : off + E]
    hist = np.minimum(np.arange(B) * E, ce.HALO).astype(np.int32)
    ns = np.full(B, E, np.int32)
    lasts = np.zeros(B, bool)
    return (
        jax.device_put(bufs),
        jax.device_put(hist),
        jax.device_put(ns),
        jax.device_put(lasts),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", action="store_true")
    args = ap.parse_args()

    B = int(os.environ.get("STAGE_BATCH", "16"))
    E = int(os.environ.get("STAGE_EMIT", "65536"))
    preset = os.environ.get("STAGE_PRESET", "default")
    opts = getattr(CompressionOptions, preset)()
    if E > 65536 and opts.max_hash_checks:
        import dataclasses

        opts = dataclasses.replace(opts, chain_scale=max(1, E // 65536))
    K, PW = opts.num_candidates, opts.probe_words
    N = ce.HALO + E

    bufs, hist, ns, lasts = build_inputs(B, E)
    print(f"platform={jax.devices()[0].platform} B={B} E={E} preset={preset} K={K} PW={PW}")

    full = jax.vmap(functools.partial(
        ce.encode_chunk, emit_size=E, options=opts, with_checksums=False
    ))
    t = sync_time(full, bufs, hist, ns, lasts, iters=4)
    print(f"FULL encode: {t*1e3/B:8.3f} ms/chunk   ({B*E/t/1e9:.4f} GB/s batched)")
    if not args.stages:
        return

    hstart = ce.HALO - hist
    n_total = ce.HALO + ns

    def vb(fn):
        return jax.vmap(fn)

    # -- matcher sub-stages ------------------------------------------------
    def s_sortprep(buf, n_total, hstart):
        idx = jnp.arange(N, dtype=jnp.int32)
        h = hash3(buf, N)
        keys = jnp.where((idx >= hstart) & (idx <= n_total - 3), h, INVALID_KEY)
        packed = mt.pack_words(buf)
        probes = [packed[4 * w : N + 4 * w] for w in range(PW)]
        out = jax.lax.sort([keys, idx] + probes, num_keys=1, is_stable=True)
        return tuple(out)

    t = sync_time(vb(lambda b, nt, hs: s_sortprep(b, nt, hs)), bufs, n_total, hstart, iters=4)
    print(f"hash+sort   : {t*1e3/B:8.3f} ms/chunk")
    sorted_ops = jax.jit(vb(lambda b, nt, hs: s_sortprep(b, nt, hs)))(bufs, n_total, hstart)

    def s_probe(*ops):
        skey, spos = ops[0], ops[1]
        sprobe = list(ops[2:])
        valid = skey < INVALID_KEY
        skey_e = jnp.concatenate([jnp.full((K,), INVALID_KEY + 1, skey.dtype), skey])
        spos_e = jnp.concatenate([jnp.zeros((K,), spos.dtype), spos])
        spr_e = [jnp.concatenate([jnp.zeros((K,), w.dtype), w]) for w in sprobe]

        def step(k, best):
            st = K - k
            pk = jax.lax.dynamic_slice(skey_e, [st], [N])
            pp = jax.lax.dynamic_slice(spos_e, [st], [N])
            dist = spos - pp
            ok = (skey == pk) & valid & (dist <= 32768)
            lp = mt._probe_len(sprobe, [jax.lax.dynamic_slice(w, [st], [N]) for w in spr_e])
            sc = jnp.where(ok & (lp >= 3), (lp << 16) | (32769 - dist), 0)
            return jnp.maximum(best, sc)

        return jax.lax.fori_loop(1, K + 1, step, jnp.zeros((N,), jnp.int32))

    t = sync_time(vb(s_probe), *sorted_ops, iters=4)
    print(f"probe K={K:<4d}: {t*1e3/B:8.3f} ms/chunk")
    best = jax.jit(vb(s_probe))(*sorted_ops)

    def s_unsort_chain(best, spos, n_total):
        idx = jnp.arange(N, dtype=jnp.int32)
        limit = jnp.clip(n_total - idx, 0, 258)
        sp = jnp.zeros(N, jnp.int32).at[spos].set(best, unique_indices=True)
        blen = jnp.minimum(sp >> 16, limit)
        bdist = jnp.where(sp > 0, 32769 - (sp & 0xFFFF), 0)
        bl = mt.chain_extend(blen, bdist, limit, N)
        good = bl >= 3
        return jnp.where(good, bl, 0), jnp.where(good, bdist, 0)

    t = sync_time(vb(s_unsort_chain), best, sorted_ops[1], n_total, iters=4)
    print(f"unsort+chain: {t*1e3/B:8.3f} ms/chunk")
    best_len, best_dist = jax.jit(vb(s_unsort_chain))(best, sorted_ops[1], n_total)

    def s_jumps(bl, bd):
        return build_jumps(bl[ce.HALO:], bd[ce.HALO:], lazy=True, lazy_if_less_than=32)

    t = sync_time(vb(s_jumps), best_len, best_dist, iters=4)
    print(f"build_jumps : {t*1e3/B:8.3f} ms/chunk")
    steps = jax.jit(vb(s_jumps))(best_len, best_dist)

    t = sync_time(lambda s, n: parse_scan_batched(s, n), steps, ns, iters=4)
    print(f"parse_scan  : {t*1e3/B:8.3f} ms/chunk")

    # -- downstream: time the remainder as one piece by re-running the full
    # encoder minus the cost of the stages above (reported for reference).
    from deflate_rs_tpu.ops.checksum import adler32_parts_device, crc32_raw_device

    def s_cksum(buf, n):
        s1, s2 = adler32_parts_device(buf[ce.HALO : ce.HALO + E], n)
        return s1, s2, crc32_raw_device(buf[ce.HALO : ce.HALO + E], n)

    t = sync_time(vb(s_cksum), bufs, ns, iters=4)
    print(f"checksums   : {t*1e3/B:8.3f} ms/chunk")


if __name__ == "__main__":
    main()
