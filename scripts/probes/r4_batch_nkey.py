"""Round-4 follow-ups: default nk=3 composite, default B=32, fast B=64.

r3 recorded "nk=3 ratio-identical on pg11, device parity" and "device best
batch is 16"; both claims predate the LR kernel, density gating and nq=8 —
the stage mix changed, so re-measure.  Fetch-barrier, pg11 text.
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


def run(name, opts, B, E=65536):
    bufs, hist, ns, lasts = build_inputs(B, E)
    fn = jax.jit(jax.vmap(functools.partial(
        ce.encode_chunk, emit_size=E, options=opts, with_checksums=False)))
    t = sync_time(fn, bufs, hist, ns, lasts, iters=max(8, 256 // B))
    print(f"{name:24s}: {t*1e3/B:7.3f} ms/chunk ({E/(t/B)/1e9:.4f} GB/s)",
          flush=True)


def main():
    d = CompressionOptions.default()
    f = CompressionOptions.fast()
    print(f"platform={jax.default_backend()}", flush=True)
    run("default B=16", d, 16)
    run("default B=32", d, 32)
    run("default nk3 B=16", replace(d, sort_nkey=3), 16)
    run("fast B=32", f, 32)
    run("fast B=64", f, 64)


if __name__ == "__main__":
    main()
