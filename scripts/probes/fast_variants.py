"""FAST preset variant timing at B=32 (VERDICT r3 item 2 follow-up).

fast_stage_ablation measured full fast 0.634 / matcher-only 0.341 ms/chunk
at B=32: downstream ~0.29, matcher ~0.27 above the ~0.07 floor.  This probe
measures the candidate cuts:
  * stored_payload_fields=False — the CORPUS path's config (the host
    re-emits stored chunks from raw payload): drops E/4 fields from the
    pack partition and the stored-word machinery.
  * hist kernel ON — retry at B=32 (measured +0.037 loss at B=16).
  * PW3 — one fewer sort operand + LCP word (ratio cost known: ~1%).
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
    B = int(os.environ.get("STAGE_BATCH", "32"))
    E = int(os.environ.get("STAGE_EMIT", "65536"))
    bufs, hist, ns, lasts = build_inputs(B, E)
    fast = CompressionOptions.fast()

    def enc(opts, **kw):
        return jax.jit(jax.vmap(functools.partial(
            ce.encode_chunk, emit_size=E, options=opts,
            with_checksums=False, **kw)))

    variants = [
        ("fast", enc(fast)),
        ("fast corpus-cfg (no stored fields)", enc(fast, stored_payload_fields=False)),
        ("fast PW3 corpus-cfg",
         enc(replace(fast, probe_words_override=3), stored_payload_fields=False)),
    ]
    print(f"platform={jax.default_backend()} B={B} E={E}", flush=True)
    for name, fn in variants:
        t = sync_time(fn, bufs, hist, ns, lasts, iters=16)
        print(f"{name:36s}: {t*1e3/B:7.3f} ms/chunk ({E/(t/B)/1e9:.4f} GB/s)",
              flush=True)
    os.environ["DEFLATE_TPU_HIST_KERNEL"] = "1"
    fn = enc(replace(fast, sort_nkey=1), stored_payload_fields=False)
    t = sync_time(fn, bufs, hist, ns, lasts, iters=16)
    print(f"{'fast corpus-cfg + hist kernel':36s}: {t*1e3/B:7.3f} ms/chunk "
          f"({E/(t/B)/1e9:.4f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
