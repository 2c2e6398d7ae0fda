"""Profiling helpers (aux subsystem, SURVEY.md §5).

The reference's only perf tooling is cargo-bench microbenches; here we add
what a TPU pipeline actually needs:

* :func:`trace` — jax.profiler trace context (view with TensorBoard/XProf);
* :func:`sync_time` — honest wall timing.  On the tunnel-attached TPU
  platform ``block_until_ready`` can return before execution finishes
  (docs/perf_notes.md), so the only reliable barrier is a device->host fetch
  of a value data-dependent on the computation; executions are FIFO per
  device, so fetching the last output waits for everything queued before it.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/deflate_tpu_trace"):
    """jax.profiler trace around a block of device work."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def force_sync(pytree) -> int:
    """Barrier: reduce one leaf and fetch it. Returns the fetched value."""
    leaf = jax.tree.leaves(pytree)[0]
    return int(jnp.sum(leaf.astype(jnp.int32)))


def sync_time(fn, *args, iters: int = 5, warmup: bool = True):
    """Time ``fn(*args)`` with a real device barrier; returns seconds/call."""
    compiled = jax.jit(fn).lower(*args).compile()
    if warmup:
        force_sync(compiled(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = compiled(*args)
    force_sync(out)
    return (time.perf_counter() - t0) / iters
