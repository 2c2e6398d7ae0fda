""">= 512 MiB real-corpus soak through the CPU-mesh sharded path (r4 item 4).

Streams a real-file corpus through the sharded encoder in multi-batch
steps, assembles every process-local segment via assemble_local (the int64
global-offset path), stitches segments at their offsets, and validates the
full stream against stdlib zlib plus the combined checksums.  This is the
bookkeeping soak the 10 GB BASELINE config needs: many steps, offsets
crossing batch boundaries, stored and Huffman chunks mixed.

Default preset is the contract; SOAK_PRESET=fast trades ratio for wall
time.  Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python scripts/sharded_soak.py
"""

from __future__ import annotations

import glob
import os
import sys
import time
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from deflate_rs_tpu import constants as C  # noqa: E402
from deflate_rs_tpu.compression_options import CompressionOptions  # noqa: E402
from deflate_rs_tpu.ops import checksum as ck  # noqa: E402
from deflate_rs_tpu.ops.chunk_encode import HALO, PAD  # noqa: E402
from deflate_rs_tpu.parallel.mesh import make_mesh  # noqa: E402
from deflate_rs_tpu.parallel.sharded import (  # noqa: E402
    assemble_local, global_offsets, make_sharded_encoder, replicated_host,
)


def build_corpus(total: int) -> bytes:
    pieces = []
    for path in ("/usr/lib/x86_64-linux-gnu/libc.so.6", "/bin/bash",
                 "/usr/bin/perl"):
        if os.path.exists(path):
            with open(path, "rb") as f:
                pieces.append(f.read())
    for p in sorted(glob.glob("/usr/share/doc/*/copyright"))[:300]:
        try:
            with open(p, "rb") as f:
                pieces.append(f.read())
        except OSError:
            pass
    with open(os.path.join(REPO, "tests", "data", "pg11.txt"), "rb") as f:
        pieces.append(f.read())
    rng = np.random.default_rng(0)
    pieces.append(rng.integers(0, 256, 1 << 20, dtype=np.uint8).tobytes())
    unit = b"".join(pieces)
    return (unit * (total // len(unit) + 1))[:total]


def main():
    total_mb = int(os.environ.get("SOAK_MB", "512"))
    emit = 65536
    B = 32  # chunks per sharded step (4 per device)
    preset = os.environ.get("SOAK_PRESET", "default")
    opts = getattr(CompressionOptions, preset)()
    mesh = make_mesh(8)
    step = make_sharded_encoder(mesh, opts, emit)
    data = build_corpus(total_mb << 20)
    n = len(data)
    nsteps = -(-n // (emit * B))
    print(f"soak: {n >> 20} MiB, {nsteps} sharded steps of {B} x 64 KiB, "
          f"preset={preset}", flush=True)

    out_buf = bytearray()
    adler = ck.ADLER_INIT
    crc_raw = 0
    stream_off = 0
    t0 = time.perf_counter()
    for si in range(nsteps):
        base = si * emit * B
        bufs = np.zeros((B, HALO + emit + PAD), np.uint8)
        hist = np.zeros(B, np.int32)
        ns = np.zeros(B, np.int32)
        lasts = np.zeros(B, bool)
        for i in range(B):
            off = base + i * emit
            ln = max(0, min(n - off, emit))
            h = min(off, HALO)
            if h and ln:
                bufs[i, HALO - h : HALO] = np.frombuffer(data, np.uint8, h, off - h)
            if ln:
                bufs[i, HALO : HALO + ln] = np.frombuffer(data, np.uint8, ln, off)
            hist[i], ns[i], lasts[i] = h, ln, off + ln >= n
        out = step(bufs, hist, ns, lasts)
        nb = np.asarray(out["nbytes"])
        offs = global_offsets(replicated_host(out["all_nbytes"]))
        # Single process: assemble_local covers all shards; its offset must
        # equal the running stream offset.
        payloads = [data[base + i * emit : base + i * emit + int(ns[i])]
                    for i in range(B)]
        # Global-row indexing inside assemble_local is per-step here.
        seg, seg_off = assemble_local(out, payloads=payloads, is_lasts=lasts)
        assert seg_off == 0  # offsets are per step; stitching is sequential
        # Offsets must tile the step's segment exactly (the int64 path).
        assert int(offs[-1] + nb[-1]) == len(seg)
        # Drop tail padding chunks' bytes (ln == 0 chunks emit only a sync
        # marker); real chunks are a prefix of the step.
        nreal = max(0, min(B, -(-(n - base) // emit))) if n > base else 0
        real = int(nb[:nreal].sum())
        out_buf += seg[:real]
        stream_off += real
        s1 = np.asarray(out["s1"]); s2 = np.asarray(out["s2"])
        crc = np.asarray(out["crc_raw"])
        for i in range(B):
            ln = int(ns[i])
            if ln == 0:
                continue
            adler = ck.adler32_combine(adler, int(s1[i]), int(s2[i]), ln)
            crc_raw = ck.crc32_combine_raw(crc_raw, int(crc[i]), ln)
        if si % 50 == 0 or si == nsteps - 1:
            el = time.perf_counter() - t0
            done = min(n, base + emit * B)
            print(f"  step {si + 1}/{nsteps}: {done >> 20} MiB in {el:.0f}s "
                  f"({done / el / 1e6:.1f} MB/s)", flush=True)

    stream = bytes(out_buf)
    t_total = time.perf_counter() - t0
    assert zlib.decompress(stream, wbits=-15) == data, "soak roundtrip failed"
    assert ck.adler32_value(adler) == zlib.adler32(data)
    assert ck.crc32_from_raw(crc_raw, n) == zlib.crc32(data)
    print(f"SOAK PASS: {n} -> {len(stream)} bytes "
          f"(ratio {len(stream)/n:.4f}) in {t_total:.0f}s; "
          f"offsets int64, checksums combined OK", flush=True)


if __name__ == "__main__":
    main()
