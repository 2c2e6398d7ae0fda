"""TPU device cost of budgeted long-range configs for DEFAULT (r4 item 1).

Full default encode, fetch-barrier timed, B=16, 64 KiB chunks, pg11 text.
"""

from __future__ import annotations

import functools
import os
import sys
from dataclasses import replace

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
from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402
from scripts.stage_timing import build_inputs  # noqa: E402


def main():
    B = int(os.environ.get("STAGE_BATCH", "16"))
    E = int(os.environ.get("STAGE_EMIT", "65536"))
    bufs, hist, ns, lasts = build_inputs(B, E)
    base = CompressionOptions.default()
    high = CompressionOptions.high()
    variants = {
        # NOTE: since the r4 auto flip, the plain default resolves
        # long_range=ON — lr-off must be pinned explicitly (an earlier
        # version of this probe compared default against itself).
        "lr-off": replace(base, long_range="off"),
        "M32S32x1st4": replace(base, long_range="on", num_dom=32, dom_segs=32,
                               dom_iters=1, lr_stride=4),
        "M32S32x1st1": replace(base, long_range="on", num_dom=32, dom_segs=32,
                               dom_iters=1, lr_stride=1),
        "default(st2)": base,  # the production config: M32/S32/x1/stride2
        "high(M48S32x2)": high,
    }
    print(f"platform={jax.default_backend()} B={B} E={E}")
    for name, opts in variants.items():
        fn = jax.jit(jax.vmap(functools.partial(
            ce.encode_chunk, emit_size=E, options=opts, with_checksums=False)))
        t = sync_time(fn, bufs, hist, ns, lasts, iters=12)
        print(f"{name:10s}: {t*1e3/B:7.3f} ms/chunk ({E/(t/B)/1e9:.4f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()
