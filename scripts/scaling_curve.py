"""Strong-scaling proxy on the virtual CPU mesh (VERDICT r3 item 5).

Fixed corpus, the SAME sharded encode step run on 1/2/4/8 virtual devices:
wall time per step after warmup.  CPU devices are threads of one host, so
absolute numbers mean nothing — the SHAPE of the curve bounds the sharding
machinery's overhead (collectives + compaction + plumbing): if per-step
wall time stays ~flat as devices shrink toward 1 (each device doing n x the
work), the parallel fraction is ~1 and the ≥80% 1→4-host scaling target is
bounded by hardware, not by this code.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python scripts/scaling_curve.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from deflate_rs_tpu.compression_options import CompressionOptions  # noqa: E402
from deflate_rs_tpu.ops.chunk_encode import HALO, PAD  # noqa: E402
from deflate_rs_tpu.parallel.mesh import make_mesh  # noqa: E402
from deflate_rs_tpu.parallel.sharded import make_sharded_encoder  # noqa: E402


def build_batch(data: bytes, emit: int, B: int):
    bufs = np.zeros((B, HALO + emit + PAD), np.uint8)
    hist = np.zeros(B, np.int32)
    ns = np.zeros(B, np.int32)
    lasts = np.zeros(B, bool)
    n = len(data)
    for i in range(B):
        off = i * emit
        ln = max(0, min(n - off, emit))
        h = min(off, HALO)
        if h:
            bufs[i, HALO - h : HALO] = np.frombuffer(data, np.uint8, h, off - h)
        if ln:
            bufs[i, HALO : HALO + ln] = np.frombuffer(data, np.uint8, ln, off)
        hist[i], ns[i], lasts[i] = h, ln, off + ln >= n
    return bufs, hist, ns, lasts


def main():
    emit = int(os.environ.get("SCALE_EMIT", "65536"))
    B = int(os.environ.get("SCALE_CHUNKS", "32"))  # 4/chunk/device at 8 dev
    reps = int(os.environ.get("SCALE_REPS", "3"))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "tests", "data", "pg11.txt"), "rb") as f:
        text = f.read()
    data = (text * ((emit * B) // len(text) + 1))[: emit * B]
    args = build_batch(data, emit, B)
    opts = CompressionOptions.default()

    print(f"fixed corpus {len(data)>>20} MiB, {B} chunks of {emit>>10} KiB, "
          f"default preset")
    base = None
    for nd in (1, 2, 4, 8):
        mesh = make_mesh(nd)
        step = make_sharded_encoder(mesh, opts, emit)
        out = step(*args)  # compile + warmup
        jax.block_until_ready(out["nbytes"])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = step(*args)
            jax.block_until_ready(out["cw_head"])
            best = min(best, time.perf_counter() - t0)
        if base is None:
            base = best
        # Ideal strong scaling: t(nd) = t(1)/nd.  Efficiency vs 1 device.
        eff = base / (best * nd)
        print(f"devices={nd}: {best*1e3:8.1f} ms/step  "
              f"speedup={base/best:5.2f}x  efficiency={eff*100:5.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
