"""Round-5 composite device A/B: default LR budget variants + fast tiers.

Two decisions this probe feeds (VERDICT r4 items 1, 3, 5):

1. The tar_tree corpus exposed a default-contract hole (1.0017 of zlib-6);
   two LR budget raises close it on EVERY corpus with margin (CPU ratio
   sweep, docs/perf_notes.md round 5): num_dom 32->48 + stride 2->1, or
   dom_segs 32->64 + stride 2->1.  This measures their composite device
   cost on TEXT (pg11 — density-gated, the throughput-critical case) and
   on a DENSE harvest (tiled json — worst case), so the cheaper fix ships.

2. Fast chunk tiers: K=1 greedy needs no chain-budget scaling, so larger
   chunks amortize the per-chunk dispatch/stage floor without the matcher
   growth that killed the default-tier experiment (r3: 0.057 GB/s).
   Measures ms per 64 KiB-equivalent at E=64Ki/128Ki/256Ki.

Usage: python scripts/probes/r5_device_ab.py [text|dense|fast|all]
"""

from __future__ import annotations

import functools
import glob
import os
import sys

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

from deflate_rs_tpu.compression_options import CompressionOptions  # noqa: E402
from deflate_rs_tpu.ops import chunk_encode as ce  # noqa: E402
from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402


def build_inputs(data: bytes, B: int, E: int):
    unit = (data * ((B * E + ce.HALO + ce.PAD) // len(data) + 1))
    raw = np.frombuffer(unit[: B * E + ce.HALO + ce.PAD], np.uint8)
    bufs = jax.device_put(np.stack(
        [raw[i * E : i * E + ce.HALO + E + ce.PAD] for i in range(B)]))
    hist = jax.device_put(np.full(B, ce.HALO, np.int32))
    ns = jax.device_put(np.full(B, E, np.int32))
    lasts = jax.device_put(np.zeros(B, bool))
    return bufs, hist, ns, lasts


def measure(opts, args, E, iters=12):
    enc = jax.vmap(functools.partial(
        ce.encode_chunk, emit_size=E, options=opts, with_checksums=False))
    B = int(args[1].shape[0])
    runs = [sync_time(enc, *args, iters=iters) * 1e3 / B for _ in range(3)]
    return min(runs), runs


def corpus_bytes(kind: str) -> bytes:
    if kind == "text":
        return open(os.path.join(REPO, "tests", "data", "pg11.txt"), "rb").read()
    js = []
    for p in sorted(glob.glob("/usr/share/gdal/*.json"))[:200]:
        js.append(open(p, "rb").read())
        if sum(map(len, js)) > (1 << 20):
            break
    return b"".join(js)


VARIANTS = {
    # Round-5 default: S=64, stride 1, run-based selection (one sort).
    "r5-default(S64st1run)": CompressionOptions.default(),
    # Round-4 config reconstructed through the knobs (freq sel, S32, st2).
    "r4-config(S32st2freq)": CompressionOptions(
        dom_segs=32, lr_stride=2, lr_sel="freq"),
    "lr-off": CompressionOptions(long_range="off"),
    # The freq-sel variant of the round-5 budget (selection-cost A/B).
    "S64st1freq": CompressionOptions(lr_sel="freq"),
}


def run_variants(kind: str):
    data = corpus_bytes(kind)
    B, E = 16, 65536
    args = build_inputs(data, B, E)
    print(f"== default LR variants on {kind} (B={B}, E=64Ki) ==", flush=True)
    for name, o in VARIANTS.items():
        best, runs = measure(o, args, E)
        print(f"{name:22s}: {best:7.3f} ms/chunk  runs={[round(r,3) for r in runs]}",
              flush=True)


def run_fast_tiers():
    data = corpus_bytes("text")
    print("== fast chunk tiers (ms per 64Ki-equivalent) ==", flush=True)
    fast = CompressionOptions.fast()
    for E, B in ((65536, 32), (131072, 16), (262144, 8)):
        args = build_inputs(data, B, E)
        best, runs = measure(fast, args, E)
        per64 = best * 65536 / E
        print(f"E={E>>10:4d}Ki B={B:2d}: {per64:7.3f} ms/64Ki "
              f"({B*E/ (best*1e-3*B) /1e9:.4f} GB/s)  runs={[round(r,3) for r in runs]}",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("text", "all"):
        run_variants("text")
    if which in ("dense", "all"):
        run_variants("dense")
    if which in ("fast", "all"):
        run_fast_tiers()
