"""Queue-depth / batch sweep for the corpus engine, one warmup for all.

Times compress_corpus on the bench corpus at several queue depths (and
optionally batch sizes) after a single compile/warmup, so each timed point
costs seconds instead of a full bench.py launch.  Prints one line per
configuration plus the link-duplex floor estimate for context.

Env: QD_MB (default 16), QD_LIST (default "3,6,8"), QD_BATCH (default 32),
QD_REPS (default 2 — best-of).
"""

from __future__ import annotations

import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from bench import build_corpus  # noqa: E402
from deflate_rs_tpu.parallel.corpus import compress_corpus  # noqa: E402


def main():
    total_mb = int(os.environ.get("QD_MB", "16"))
    qds = [int(x) for x in os.environ.get("QD_LIST", "3,6,8").split(",")]
    batch = int(os.environ.get("QD_BATCH", "32"))
    reps = int(os.environ.get("QD_REPS", "2"))
    chunk = 64 << 10

    data = build_corpus(total_mb << 20)
    n = len(data)
    print(f"platform={jax.devices()[0].platform} corpus={total_mb} MiB batch={batch}")

    warm = compress_corpus(data[: chunk * batch], batch_size=batch, chunk_size=chunk)
    assert zlib.decompress(warm.deflate, wbits=-15) == data[: chunk * batch]

    for qd in qds:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            res = compress_corpus(
                data, batch_size=batch, chunk_size=chunk, queue_depth=qd
            )
            best = min(best, time.perf_counter() - t0)
        assert zlib.decompress(res.deflate, wbits=-15) == data
        print(
            f"qd={qd}: best {best:.3f}s  {n / best / 1e9:.4f} GB/s  "
            f"(out {len(res.deflate) >> 20} MiB)"
        )


if __name__ == "__main__":
    main()
