"""Measure host<->device link characteristics on the current backend.

Times device_put (upload), device->host fetch (download), and small-fetch
round-trip latency with the fetch-barrier discipline.  On the axon tunnel
platform these bound the e2e corpus throughput regardless of chip speed.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    dev = jax.devices()[0]
    print(f"platform={dev.platform}")
    sizes = [1 << 16, 1 << 20, 1 << 23]
    f = jax.jit(lambda x: x + 1)
    # warm
    _ = np.asarray(f(jax.device_put(np.zeros(1024, np.uint8))))

    for s in sizes:
        host = np.random.randint(0, 255, s, dtype=np.uint8)
        t0 = time.perf_counter()
        d = jax.device_put(host)
        d2 = f(d)
        _ = np.asarray(d2[-8:])  # barrier: tiny dependent fetch
        t1 = time.perf_counter()
        up = t1 - t0
        t0 = time.perf_counter()
        back = np.asarray(d2)
        t1 = time.perf_counter()
        down = t1 - t0
        print(
            f"size {s>>10:6d} KiB: upload+exec {up*1e3:7.2f} ms ({s/up/1e6:7.1f} MB/s)"
            f"   fetch {down*1e3:7.2f} ms ({s/down/1e6:7.1f} MB/s)"
        )

    # round-trip latency: tiny dependent fetch
    small = jax.device_put(np.zeros(128, np.uint8))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = np.asarray(f(small)[:4])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"small RTT: median {ts[5]*1e3:.2f} ms  min {ts[0]*1e3:.2f} ms")


if __name__ == "__main__":
    main()
