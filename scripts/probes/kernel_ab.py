"""A/B the fused hist/field kernels inside the full Default encode (TPU).

Same encode, kernels toggled via their env escape hatches — read at TRACE
time, so each variant runs in a fresh subprocess.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = r"""
import functools, os, sys
sys.path.insert(0, %(repo)r)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
from deflate_rs_tpu.compression_options import CompressionOptions
from deflate_rs_tpu.ops import chunk_encode as ce
from deflate_rs_tpu.utils.profiling import sync_time
from scripts.stage_timing import build_inputs

B, E = 16, 65536
bufs, hist, ns, lasts = build_inputs(B, E)
for name, opts in [("default", CompressionOptions.default()),
                   ("fast", CompressionOptions.fast())]:
    fn = jax.jit(jax.vmap(functools.partial(
        ce.encode_chunk, emit_size=E, options=opts, with_checksums=False)))
    t = sync_time(fn, bufs, hist, ns, lasts, iters=12)
    print(f"%(tag)s {name}: {t*1e3/B:7.3f} ms/chunk ({E/(t/B)/1e9:.4f} GB/s)",
          flush=True)
"""


def run(tag, env_extra):
    env = dict(os.environ, **env_extra)
    code = CHILD % {"repo": REPO, "tag": tag}
    subprocess.run([sys.executable, "-c", code], env=env, check=True)


def main():
    run("kernels-ON ", {})
    run("kernels-OFF", {"DEFLATE_TPU_HIST_KERNEL": "0",
                        "DEFLATE_TPU_FIELD_KERNEL": "0"})
    run("hist-only  ", {"DEFLATE_TPU_FIELD_KERNEL": "0"})
    run("field-only ", {"DEFLATE_TPU_HIST_KERNEL": "0"})


if __name__ == "__main__":
    main()
