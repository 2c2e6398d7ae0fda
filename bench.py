"""Headline benchmark: single-chip encode throughput at Compression::Default.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is measured GB/s against the 1 GB/s/chip north star
(BASELINE.json).  Corpus: a Silesia-like mix (text / structured binary /
random / runs) tiled to ~32 MiB, since the real Silesia corpus is not
available in this image (zero egress).

Runs on whatever platform JAX resolves (the TPU chip under the driver; CPU if
forced).  The timed region is the full device pipeline per 64 KiB chunk
batch: LZ77 + Huffman + bit packing + checksums, with all outputs
materialized on device.
"""

import json
import os
import sys
import time

import numpy as np


def build_corpus(total_bytes: int) -> bytes:
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "tests", "data", "pg11.txt"), "rb") as f:
        text = f.read()
    rng = np.random.default_rng(1234)
    # Structured binary: record-ish data with repeated fields.
    rec = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    structured = b"".join(
        rec[:48] + int(i).to_bytes(8, "little") + rng.integers(0, 256, 8, dtype=np.uint8).tobytes()
        for i in range(4096)
    )
    rand = rng.integers(0, 256, 1 << 20, dtype=np.uint8).tobytes()
    runs = (b"\x00" * 4096 + b"\xff" * 2048 + b"ab" * 1024) * 64
    # Roughly Silesia-like mix: mostly text/structured, some incompressible.
    unit = text * 8 + structured * 2 + rand + runs
    reps = total_bytes // len(unit) + 1
    return (unit * reps)[:total_bytes]


def main():
    import jax

    # Persistent compilation cache: the fused encoder takes minutes to build
    # through the remote-compile tunnel; cache it across bench runs.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import deflate_rs_tpu  # noqa: F401  (path check)
    from deflate_rs_tpu.compression_options import CompressionOptions
    from deflate_rs_tpu.ops.chunk_encode import HALO, PAD, get_batch_encoder

    platform = jax.devices()[0].platform
    emit = 65536
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    total_mb = int(os.environ.get("BENCH_MB", "8"))

    data = build_corpus(total_mb << 20)
    n = len(data)
    arr = np.frombuffer(data, np.uint8)

    # Build all chunk buffers (host side, not timed: this is I/O staging).
    offs = list(range(0, n, emit))
    nchunks = len(offs) - len(offs) % batch  # whole batches only
    bufs = np.zeros((nchunks, HALO + emit + PAD), np.uint8)
    for i in range(nchunks):
        off = offs[i]
        h = min(off, HALO)
        if h:
            bufs[i, HALO - h : HALO] = arr[off - h : off]
        bufs[i, HALO : HALO + emit] = arr[off : off + emit]
    hist = np.minimum(np.asarray(offs[:nchunks]), HALO).astype(np.int32)
    ns = np.full(nchunks, emit, np.int32)
    lasts = np.zeros(nchunks, bool)

    encoder = get_batch_encoder(CompressionOptions.default(), emit)

    nb = nchunks // batch
    dev_batches = [
        (
            jax.device_put(bufs[k * batch : (k + 1) * batch]),
            jax.device_put(hist[k * batch : (k + 1) * batch]),
            jax.device_put(ns[k * batch : (k + 1) * batch]),
            jax.device_put(lasts[k * batch : (k + 1) * batch]),
        )
        for k in range(nb)
    ]

    # Warmup / compile.  NOTE: on the tunnel-attached TPU platform,
    # block_until_ready returns before execution completes, so we force
    # synchronization with a device->host fetch.  Executions are FIFO per
    # device, so fetching the *last* output waits for everything before it.
    out = encoder(*dev_batches[0])
    np.asarray(out["total_bits"])

    t0 = time.perf_counter()
    outs = []
    for b in dev_batches:
        outs.append(encoder(*b))
    np.asarray(outs[-1]["total_bits"])  # sync barrier (FIFO queue)
    t1 = time.perf_counter()

    encoded_bytes = nb * batch * emit
    secs = t1 - t0
    gbps = encoded_bytes / secs / 1e9

    # Sanity: spot-check one chunk roundtrips.
    import zlib

    w = np.asarray(outs[0]["words"][0])
    tb = int(outs[0]["total_bits"][0])
    piece = w.astype("<u4").tobytes()[: (tb + 7) // 8]
    first = arr[:emit].tobytes()
    dec = zlib.decompressobj(wbits=-15).decompress(piece)
    assert dec == first, "bench output failed roundtrip spot check"

    comp = sum(int(t) for o in outs for t in np.asarray(o["total_bits"])) // 8
    print(
        json.dumps(
            {
                "metric": "encode_gbps_silesia_like_default",
                "value": round(gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(gbps / 1.0, 4),
                "platform": platform,
                "encoded_mb": encoded_bytes >> 20,
                "seconds": round(secs, 3),
                "ratio": round(comp / encoded_bytes, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
