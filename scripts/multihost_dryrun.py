"""Multi-host dryrun: N coordinated CPU processes run the sharded encoder.

Validates the ``jax.distributed`` wiring (SURVEY.md §2 collective-backend
row) without multi-host hardware: the parent launches N child processes that
join one JAX runtime via ``init_distributed`` (coordinator on localhost),
build a process-spanning mesh over N x D virtual CPU devices, run the
shard_mapped encode step (all-gather + offset scan crossing process
boundaries), and each process validates the full stream after a
``process_allgather``.

Usage:  python scripts/multihost_dryrun.py            # parent: spawns 2
        python scripts/multihost_dryrun.py --procs 2 --devices-per-proc 4
Exit code 0 iff every process validated the stream.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(coordinator: str, num_procs: int, pid: int, dev_per_proc: int,
          emit: int) -> int:
    # JAX_PLATFORMS / XLA_FLAGS are set by the parent BEFORE the interpreter
    # starts (a sitecustomize may import jax at startup); the config.update
    # below re-asserts CPU in case an env-pinned platform won the race.
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from deflate_rs_tpu.parallel.mesh import init_distributed

    init_distributed(coordinator_address=coordinator, num_processes=num_procs, process_id=pid)

    import zlib

    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deflate_rs_tpu.compression_options import CompressionOptions
    from deflate_rs_tpu.ops.chunk_encode import HALO, PAD
    from deflate_rs_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from deflate_rs_tpu.parallel.sharded import make_sharded_encoder

    n_global = num_procs * dev_per_proc
    assert len(jax.devices()) == n_global, (len(jax.devices()), n_global)
    assert jax.process_count() == num_procs

    # Default 65536: the production chunk tier (VERDICT r3 item 5 — no toy
    # shapes in the recorded multihost evidence); --emit overrides.
    mesh = make_mesh()
    # Full word rows for the allgathered global roundtrip below; the
    # production compacted mode is exercised separately via assemble_local.
    step = make_sharded_encoder(mesh, CompressionOptions.default(), emit,
                                compact=False)
    step_c = make_sharded_encoder(mesh, CompressionOptions.default(), emit)

    # One chunk per global device; every process builds the same global
    # numpy input and contributes its addressable shards.  Mixed content so
    # the cross-process step exercises stored + dynamic + split paths.
    rng = np.random.default_rng(0)
    unit = (
        (b"multi-host dry run payload %d / " % 7 * ((emit // 32) + 1))[:emit]
        + rng.integers(0, 256, emit, dtype=np.uint8).tobytes()
    )
    data = (unit * ((emit * n_global) // len(unit) + 1))[: emit * n_global]
    B = n_global
    bufs = np.zeros((B, HALO + emit + PAD), np.uint8)
    hist = np.zeros(B, np.int32)
    ns = np.zeros(B, np.int32)
    lasts = np.zeros(B, bool)
    for i in range(B):
        off = i * emit
        ln = min(len(data) - off, emit)
        h = min(off, HALO)
        if h:
            bufs[i, HALO - h : HALO] = np.frombuffer(data, np.uint8, h, off - h)
        bufs[i, HALO : HALO + ln] = np.frombuffer(data, np.uint8, ln, off)
        hist[i], ns[i], lasts[i] = h, ln, off + ln >= len(data)

    sh = NamedSharding(mesh, P(DATA_AXIS))

    def to_global(x):
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    out = step(to_global(bufs), to_global(hist), to_global(ns), to_global(lasts))

    # Each process sees only its shards; allgather for global validation.
    from deflate_rs_tpu.parallel.sharded import global_offsets, replicated_host

    words = multihost_utils.process_allgather(out["words"], tiled=True)
    nbytes = multihost_utils.process_allgather(out["nbytes"], tiled=True)
    offsets = global_offsets(replicated_host(out["all_nbytes"]))

    assert offsets[0] == 0 and (offsets[1:] == (offsets + nbytes)[:-1]).all(), (
        "offset scan does not tile the stream"
    )
    stream = b"".join(
        np.ascontiguousarray(words[i]).view(np.uint8)[: int(nbytes[i])].tobytes()
        for i in range(B)
    )
    assert zlib.decompress(stream, wbits=-15) == data, "multi-host roundtrip failed"

    # The production multi-host writeout path: each process runs the
    # COMPACTED encoder (used-prefix fetch), assembles ONLY its addressable
    # shards, and gets the global byte offset to pwrite at.  Validated
    # against the allgathered stream: the segments must tile it.
    from deflate_rs_tpu.parallel.sharded import assemble_local

    out_c = step_c(to_global(bufs), to_global(hist), to_global(ns), to_global(lasts))
    seg, seg_off = assemble_local(out_c, is_lasts=lasts)
    assert stream[seg_off : seg_off + len(seg)] == seg, (
        f"[proc {pid}] local segment does not match its stream window"
    )
    expect_len = int(nbytes[pid * dev_per_proc : (pid + 1) * dev_per_proc].sum())
    assert len(seg) == expect_len, (len(seg), expect_len)

    print(
        f"[proc {pid}] OK: {num_procs} processes x {dev_per_proc} devices, "
        f"{len(data)} -> {len(stream)} bytes, offsets tiled, roundtrip passed, "
        f"local segment {len(seg)} B @ {seg_off}",
        flush=True,
    )
    return 0


def parent(num_procs: int, dev_per_proc: int, emit: int) -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={dev_per_proc}",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--coordinator", coordinator, "--procs", str(num_procs),
             "--pid", str(i), "--devices-per-proc", str(dev_per_proc),
             "--emit", str(emit)],
            env=env,
        )
        for i in range(num_procs)
    ]
    rc = 0
    for p in procs:
        try:
            rc |= p.wait(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            rc |= 1
    print("multihost_dryrun:", "PASS" if rc == 0 else "FAIL")
    return rc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--coordinator")
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--emit", type=int, default=65536)
    args = ap.parse_args()
    if args.child:
        return child(args.coordinator, args.procs, args.pid,
                     args.devices_per_proc, args.emit)
    return parent(args.procs, args.devices_per_proc, args.emit)


if __name__ == "__main__":
    sys.exit(main())
