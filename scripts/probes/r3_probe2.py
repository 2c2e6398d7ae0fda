"""Round-3 probes, part 2: pack sub-stages + matcher-vs-downstream split.

r3_probe.py showed pack_fields costs ~0.24 ms/chunk floor-corrected while its
sort component should be ~0.05 (1 key); this isolates where the rest lives,
and splits FULL encode into matcher-composite vs downstream-residual so the
optimization budget lands on the real halves.

Env: STAGE_BATCH (16), STAGE_EMIT (65536), STAGE_ITERS (16).
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
from deflate_rs_tpu.ops.bitpack import pack_fields  # noqa: E402
from deflate_rs_tpu.ops.matching import find_matches  # noqa: E402
from deflate_rs_tpu.ops.parse import build_jumps  # noqa: E402
from deflate_rs_tpu.ops.parse_scan import parse_scan_batched  # noqa: E402
from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402
from scripts.stage_timing import build_inputs  # noqa: E402

B = int(os.environ.get("STAGE_BATCH", "16"))
E = int(os.environ.get("STAGE_EMIT", "65536"))
IT = int(os.environ.get("STAGE_ITERS", "16"))
N = ce.HALO + E


def main():
    rng = np.random.default_rng(0)
    opts = CompressionOptions.default()
    print(f"platform={jax.devices()[0].platform} B={B} E={E} iters={IT}", flush=True)

    x = jax.device_put(np.ones((B, 8), np.int32))
    floor = sync_time(lambda v: v + 1, x, iters=IT)
    print(f"floor(triv) : {floor*1e3/B:8.4f} ms/chunk", flush=True)

    # ------------------------------------------------- pack sub-stages
    F = 2 * E + 4096
    NW = ce.out_words(E)
    vals = jax.device_put(rng.integers(0, 1 << 16, (B, F), np.uint32).astype(np.uint32))
    w = rng.integers(0, 17, (B, F)).astype(np.int32)
    w[rng.random((B, F)) < 0.45] = 0
    nbits = jax.device_put(w)

    def p_offsets(values, nb):
        nb = nb.astype(jnp.uint32)
        ends = jnp.cumsum(nb, dtype=jnp.uint32)
        offs = ends - nb
        return offs, ends[-1]

    def p_contrib(values, nb):
        nb = nb.astype(jnp.uint32)
        mask = jnp.where(nb == 0, 0, jnp.left_shift(2, nb - 1).astype(jnp.uint32) - 1)
        v = values & mask
        ends = jnp.cumsum(nb, dtype=jnp.uint32)
        offs = ends - nb
        word = (offs >> 5).astype(jnp.int32)
        sh = offs & 31
        lo = v << sh
        hi = jnp.where(sh == 0, 0, v >> (32 - sh)).astype(jnp.uint32)
        nxt = jnp.concatenate([word[1:], jnp.full(1, -1, jnp.int32)])
        boundary = word != nxt
        hi_b = jnp.where(boundary, hi, 0)
        s = jnp.cumsum(hi_b, dtype=jnp.uint32) - hi_b
        ps = jnp.cumsum(lo, dtype=jnp.uint32) + s
        return ps, boundary

    def p_sort_only(values, nb):
        ps, boundary = p_contrib(values, nb)
        srt = jax.lax.sort([(~boundary).astype(jnp.int32), ps], num_keys=1, is_stable=True)
        return srt[1][:NW]

    for name, fn in [("pack offsets(1 cumsum)", p_offsets),
                     ("pack contrib(3 cumsum)", p_contrib),
                     ("pack contrib+sort", p_sort_only),
                     ("pack FULL", lambda v, b: pack_fields(v, b, NW))]:
        t = sync_time(jax.vmap(fn), vals, nbits, iters=IT)
        print(f"{name:24s}: {t*1e3/B:8.4f} ms/chunk", flush=True)

    # int32 cumsum vs uint32 cumsum (lowering difference probe)
    def c_u32(v, b):
        return jnp.cumsum(b.astype(jnp.uint32), dtype=jnp.uint32)[-1]

    def c_i32(v, b):
        return jnp.cumsum(b, dtype=jnp.int32)[-1]

    for name, fn in [("cumsum u32", c_u32), ("cumsum i32", c_i32)]:
        t = sync_time(jax.vmap(fn), vals, nbits, iters=IT)
        print(f"{name:24s}: {t*1e3/B:8.4f} ms/chunk", flush=True)

    # ------------------------------------- matcher composite vs FULL
    bufs, hist, ns, lasts = build_inputs(B, E)
    hstart = ce.HALO - hist
    n_total = ce.HALO + ns

    def matcher_composite(buf, nt, hs, n):
        bl, bd = find_matches(buf, N, nt, hs, opts.num_candidates,
                              probe_words=opts.probe_words)
        steps = build_jumps(bl[ce.HALO:], bd[ce.HALO:], lazy=opts.lazy,
                            lazy_if_less_than=min(opts.lazy_if_less_than, 258))
        return steps, bd

    def matcher_and_parse(buf, nt, hs, n):
        steps, bd = matcher_composite(buf, nt, hs, n)
        return steps, bd, n

    def mp(bufs, n_total, hstart, ns):
        steps, bd, n = jax.vmap(matcher_and_parse)(bufs, n_total, hstart, ns)
        tok = parse_scan_batched(steps, n)
        return jnp.sum(tok.astype(jnp.int32), axis=1)

    t = sync_time(mp, bufs, n_total, hstart, ns, iters=IT)
    print(f"matcher+parse composite : {t*1e3/B:8.4f} ms/chunk", flush=True)

    full = jax.vmap(functools.partial(
        ce.encode_chunk, emit_size=E, options=opts, with_checksums=False))
    t = sync_time(full, bufs, hist, ns, lasts, iters=IT)
    print(f"FULL default            : {t*1e3/B:8.4f} ms/chunk "
          f"({B*E/t/1e9:.4f} GB/s)", flush=True)

    import dataclasses
    for nk in (1, 2):
        o2 = dataclasses.replace(opts, sort_nkey=nk)
        full2 = jax.vmap(functools.partial(
            ce.encode_chunk, emit_size=E, options=o2, with_checksums=False))
        t = sync_time(full2, bufs, hist, ns, lasts, iters=IT)
        print(f"FULL default nk={nk}       : {t*1e3/B:8.4f} ms/chunk "
              f"({B*E/t/1e9:.4f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
