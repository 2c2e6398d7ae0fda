"""TPU stage ablation for the FAST preset (VERDICT r3 item 2).

Fast's target is <= 0.5 ms/chunk at B=32 with pg11 <= 72,095 (zlib-1).
The preset already runs nq=1 / nk=1 / PW=4 / greedy K=1 / no long-range;
this probe measures where the remaining ~0.7 ms/chunk lives by ablating
stages that are plausibly skippable for a throughput preset, plus matcher-
only and downstream-only bounds.  Fetch-barrier timed, fresh numbers per
variant in ONE process (variants share the input uploads).
"""

from __future__ import annotations

import functools
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from deflate_rs_tpu.compression_options import CompressionOptions  # noqa: E402
from deflate_rs_tpu.ops import chunk_encode as ce  # noqa: E402
from deflate_rs_tpu.ops.matching import find_matches  # noqa: E402
from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402
from scripts.stage_timing import build_inputs  # noqa: E402


def main():
    B = int(os.environ.get("STAGE_BATCH", "32"))
    E = int(os.environ.get("STAGE_EMIT", "65536"))
    bufs, hist, ns, lasts = build_inputs(B, E)
    fast = CompressionOptions.fast()
    N = ce.HALO + E

    def enc(opts):
        return jax.jit(jax.vmap(functools.partial(
            ce.encode_chunk, emit_size=E, options=opts, with_checksums=False)))

    def matcher_only(buf, h, n, last):
        bl, bd = find_matches(buf, N, ce.HALO + n, ce.HALO - h,
                              fast.num_candidates,
                              probe_words=fast.probe_words,
                              nkey=fast.resolved_sort_nkey)
        return bl.sum() + bd.sum()

    variants = [
        ("full fast", enc(fast)),
        ("matcher only", jax.jit(jax.vmap(matcher_only))),
        ("huffman_only (downstream bound)", enc(CompressionOptions.huffman_only())),
    ]
    print(f"platform={jax.default_backend()} B={B} E={E}", flush=True)
    for name, fn in variants:
        t = sync_time(fn, bufs, hist, ns, lasts, iters=16)
        print(f"{name:34s}: {t*1e3/B:7.3f} ms/chunk ({E/(t/B)/1e9:.4f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()
