"""Device-time-per-byte sweep over device chunk sizes.

The 64 KiB default was chosen when the encoder ran ~4 ms/chunk; at
1.26 ms/chunk the fixed per-chunk costs (halo hashing, tables, headers,
parse segments, fetch barrier share) weigh more, so larger chunks may now
win per byte even though the matcher sort grows n log^2 n.  Measures the
FULL batched encode at several emit sizes with the corpus path's own
option scaling (chain_scale, PW) applied, plus compressed ratio on pg11
tiling so the quality trade is visible next to the speed number.

Env: CS_LIST (default "65536,131072,262144"), CS_MB total payload per
measurement (default 4 MiB — equal bytes per point, batch = MB/chunk).
"""

from __future__ import annotations

import dataclasses
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

from deflate_rs_tpu.compression_options import CompressionOptions  # noqa: E402
from deflate_rs_tpu.models.deflate import FULL_EMIT  # noqa: E402
from deflate_rs_tpu.ops import chunk_encode as ce  # noqa: E402
from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402


def corpus_options(E: int) -> CompressionOptions:
    """The exact option scaling parallel/corpus.py applies at chunk size E."""
    opts = CompressionOptions.default()
    if E > FULL_EMIT and opts.max_hash_checks:
        opts = dataclasses.replace(opts, chain_scale=max(1, E // FULL_EMIT))
    return opts


def main():
    sizes = [int(x) for x in os.environ.get("CS_LIST", "65536,131072,262144").split(",")]
    total = int(os.environ.get("CS_MB", "4")) << 20
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "tests", "data", "pg11.txt"), "rb") as f:
        text = f.read()
    data = (text * (total // len(text) + 1))[:total]
    arr = np.frombuffer(data, np.uint8)
    print(f"platform={jax.devices()[0].platform} payload={total >> 20} MiB (pg11 tiled)")

    for E in sizes:
        B = total // E
        opts = corpus_options(E)
        raw = np.zeros((B, ce.HALO + E + ce.PAD), np.uint8)
        for i in range(B):
            off = i * E
            h = min(off, ce.HALO)
            raw[i, ce.HALO - h : ce.HALO] = arr[off - h : off]
            raw[i, ce.HALO : ce.HALO + E] = arr[off : off + E]
        bufs = jax.device_put(raw)
        hist = jax.device_put(np.minimum(np.arange(B) * E, ce.HALO).astype(np.int32))
        ns = jax.device_put(np.full(B, E, np.int32))
        lasts = jax.device_put(np.zeros(B, bool))
        enc = jax.vmap(
            functools.partial(ce.encode_chunk, emit_size=E, options=opts, with_checksums=False)
        )
        t = sync_time(enc, bufs, hist, ns, lasts, iters=8)
        out = jax.jit(enc)(bufs, hist, ns, lasts)
        bits = int(np.asarray(out["total_bits"]).sum())
        print(
            f"E={E >> 10:4d}Ki B={B:3d} K={opts.num_candidates} PW={opts.probe_words}: "
            f"{t * 1e3 / B:7.3f} ms/chunk  {total / t / 1e9:.4f} GB/s  "
            f"ratio={bits / 8 / total:.4f}"
        )


if __name__ == "__main__":
    main()
