"""Per-stage timing of the CURRENT (suffix-sort) default encode pipeline.

Times each stage of ops/chunk_encode.py's default-preset path with real
chained device inputs and the fetch-barrier discipline.  Complements
scripts/stage_timing.py (which still times the hash-matcher variant).

Env: STAGE_BATCH (default 16), STAGE_EMIT (default 65536).
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

from deflate_rs_tpu.compression_options import CompressionOptions  # noqa: E402
from deflate_rs_tpu.ops import chunk_encode as ce  # noqa: E402
from deflate_rs_tpu.ops import matching as mt  # noqa: E402
from deflate_rs_tpu.ops.parse import build_jumps  # noqa: E402
from deflate_rs_tpu.ops.parse_scan import parse_scan_batched  # noqa: E402
from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402
from scripts.stage_timing import build_inputs  # noqa: E402


def main():
    B = int(os.environ.get("STAGE_BATCH", "16"))
    E = int(os.environ.get("STAGE_EMIT", "65536"))
    IT = int(os.environ.get("STAGE_ITERS", "16"))
    opts = CompressionOptions.default()
    K, PW = opts.num_candidates, opts.probe_words
    NKEY = min(4, PW)
    N = ce.HALO + E

    bufs, hist, ns, lasts = build_inputs(B, E)
    hstart = ce.HALO - hist
    n_total = ce.HALO + ns
    print(f"platform={jax.devices()[0].platform} B={B} E={E} K={K} PW={PW}")

    full = jax.vmap(
        functools.partial(ce.encode_chunk, emit_size=E, options=opts, with_checksums=False)
    )
    t_full = sync_time(full, bufs, hist, ns, lasts, iters=IT)
    print(f"FULL encode : {t_full*1e3/B:8.3f} ms/chunk ({B*E/t_full/1e9:.4f} GB/s)")

    def vb(fn):
        return jax.vmap(fn)

    # ---- stage 1: key build + content sort
    def s_sort(buf, nt, hs):
        idx = jnp.arange(N, dtype=jnp.int32)
        valid = (idx >= hs) & (idx <= nt - 3)
        d = buf.astype(jnp.uint32)
        be = (d[:-3] << 24) | (d[1:-2] << 16) | (d[2:-1] << 8) | d[3:]
        keys = [
            jnp.where(valid, be[4 * w : N + 4 * w], jnp.uint32(0xFFFFFFFF))
            for w in range(NKEY)
        ]
        packed = mt.pack_words(buf)
        pay = [packed[4 * w : N + 4 * w] for w in range(NKEY, PW)]
        return tuple(jax.lax.sort(keys + [idx] + pay, num_keys=NKEY, is_stable=True))

    t = sync_time(vb(s_sort), bufs, n_total, hstart, iters=IT)
    print(f"content sort: {t*1e3/B:8.3f} ms/chunk")
    sorted_ops = jax.jit(vb(s_sort))(bufs, n_total, hstart)

    # ---- stage 2: LCP + K-deep running-min scan
    def s_scan(*ops_and_dims):
        ops = ops_and_dims[:-2]
        hs, nt = ops_and_dims[-2], ops_and_dims[-1]
        skeys = list(ops[:NKEY])
        spos = ops[NKEY]
        spay = list(ops[NKEY + 1 :])
        return mt.sa_scan_xla(skeys, spos, spay, hs, nt, K, PW)

    t = sync_time(vb(s_scan), *sorted_ops, hstart, n_total, iters=IT)
    print(f"sa K-scan   : {t*1e3/B:8.3f} ms/chunk")
    best = jax.jit(vb(s_scan))(*sorted_ops, hstart, n_total)

    # ---- stage 3: unsort + chain extension
    def s_unsort(best, spos, nt):
        idx = jnp.arange(N, dtype=jnp.int32)
        limit = jnp.clip(nt - idx, 0, 258)
        score_pos = jax.lax.sort([spos, best], num_keys=1, is_stable=False)[1]
        blen = jnp.minimum(score_pos >> 16, limit)
        bdist = jnp.where(score_pos > 0, 32769 - (score_pos & 0xFFFF), 0)
        bl = mt.chain_extend(blen, bdist, limit, N)
        good = bl >= 3
        return jnp.where(good, bl, 0), jnp.where(good, bdist, 0)

    t = sync_time(vb(s_unsort), best, sorted_ops[NKEY], n_total, iters=IT)
    print(f"unsort+chain: {t*1e3/B:8.3f} ms/chunk")
    best_len, best_dist = jax.jit(vb(s_unsort))(best, sorted_ops[NKEY], n_total)

    # ---- stage 4: jump build
    def s_jumps(bl, bd):
        return build_jumps(
            bl[ce.HALO :], bd[ce.HALO :], lazy=opts.lazy,
            lazy_if_less_than=min(opts.lazy_if_less_than, 258),
        )

    t = sync_time(vb(s_jumps), best_len, best_dist, iters=IT)
    print(f"build_jumps : {t*1e3/B:8.3f} ms/chunk")
    steps = jax.jit(vb(s_jumps))(best_len, best_dist)

    # ---- stage 5: parse scan kernel
    t = sync_time(lambda s, n: parse_scan_batched(s, n), steps, ns, iters=IT)
    print(f"parse_scan  : {t*1e3/B:8.3f} ms/chunk")

    # ---- floor: trivial elementwise fn (measures the timing harness RTT floor)
    t = sync_time(lambda b: b.astype(jnp.int32) + 1, bufs, iters=IT)
    print(f"floor(triv) : {t*1e3/B:8.3f} ms/chunk")

    # ---- downstream proxy: huffman_only FULL (no matcher; all-literal tokens
    # = worst-case field count through entropy+pack)
    ho = CompressionOptions.huffman_only()
    full_ho = jax.vmap(
        functools.partial(ce.encode_chunk, emit_size=E, options=ho, with_checksums=False)
    )
    t = sync_time(full_ho, bufs, hist, ns, lasts, iters=IT)
    print(f"FULL huffonly: {t*1e3/B:8.3f} ms/chunk")

    # ---- bitpack alone on a worst-case-shaped field list
    from deflate_rs_tpu.ops.bitpack import pack_fields
    F = 2 * E + 4096
    NW = ce.out_words(E, force_fixed=False)
    rng = np.random.default_rng(0)
    vals = jax.device_put(np.tile(rng.integers(0, 1 << 16, (1, F), dtype=np.int64).astype(np.uint32), (B, 1)))
    nb = jax.device_put(np.tile(rng.integers(0, 10, (1, F), dtype=np.int64).astype(np.int32), (B, 1)))
    t = sync_time(jax.vmap(lambda v, n: pack_fields(v, n, NW)), vals, nb, iters=IT)
    print(f"bitpack     : {t*1e3/B:8.3f} ms/chunk   (F={F}, NW={NW})")


if __name__ == '__main__':
    main()
