"""Architecture-ceiling demonstration: the chip's max-throughput configs.

VERDICT r4 item 4a: the 0.08-0.1 GB/s/chip window-exact ceiling claim
(docs/perf_notes.md round-3 revision) needs a DEMONSTRATED upper bound to
anchor the fleet math — a configuration tuned for throughput, not ratio:

  * huffman_only: no match search at all (the reference's own
    throughput-floor preset, compression_options.rs:155-162) — measures
    the entropy+pack downstream alone.
  * huffman_only + proxy split scoring + nq=1: drops the exact
    package-merge scoring of 10 ranges to one block — the cheapest legal
    DEFLATE this pipeline can emit with dynamic codes.
  * fast (greedy K=1) at the best chunk tier from r5_device_ab.

Each row reports ms per 64 KiB-equivalent and GB/s (fetch-barrier,
device-resident inputs, best-of-3).  Ratio on pg11 is printed so the
throughput/ratio trade is recorded next to the number.
"""

from __future__ import annotations

import functools
import os
import sys
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np  # noqa: E402

from deflate_rs_tpu.compression_options import (  # noqa: E402
    CompressionOptions, MatchingType,
)
from deflate_rs_tpu.ops import chunk_encode as ce  # noqa: E402
from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402


def build_inputs(data: bytes, B: int, E: int):
    unit = data * ((B * E + ce.HALO + ce.PAD) // len(data) + 1)
    raw = np.frombuffer(unit[: B * E + ce.HALO + ce.PAD], np.uint8)
    bufs = jax.device_put(np.stack(
        [raw[i * E : i * E + ce.HALO + E + ce.PAD] for i in range(B)]))
    hist = jax.device_put(np.full(B, ce.HALO, np.int32))
    ns = jax.device_put(np.full(B, E, np.int32))
    lasts = jax.device_put(np.zeros(B, bool))
    return bufs, hist, ns, lasts


TURBO = CompressionOptions(
    max_hash_checks=0, lazy_if_less_than=0,
    matching_type=MatchingType.Greedy, split_scoring="proxy",
    block_split="1",
)

CONFIGS = [
    ("huffman_only(exact,nq4)", CompressionOptions.huffman_only(), 65536, 32),
    ("huffman_only(proxy,nq1)", TURBO, 65536, 32),
    ("huffman_only(proxy,nq1,256Ki)", TURBO, 262144, 8),
    ("fast(64Ki)", CompressionOptions.fast(), 65536, 32),
]


def main():
    data = open(os.path.join(REPO, "tests", "data", "pg11.txt"), "rb").read()
    print(f"platform={jax.default_backend()}")
    for name, opts, E, B in CONFIGS:
        args = build_inputs(data, B, E)
        enc = jax.vmap(functools.partial(
            ce.encode_chunk, emit_size=E, options=opts, with_checksums=False))
        runs = [sync_time(enc, *args, iters=12) * 1e3 / B for _ in range(3)]
        best = min(runs)
        gbps = E / (best * 1e-3) / 1e9
        print(f"{name:30s} E={E>>10:4d}Ki B={B:2d}: {best*65536/E:7.3f} ms/64Ki "
              f"= {gbps:.4f} GB/s  runs={[round(r, 3) for r in runs]}",
              flush=True)


if __name__ == "__main__":
    main()
