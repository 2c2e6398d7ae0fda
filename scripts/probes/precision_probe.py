"""Pending experiment #4 (docs/perf_notes.md): is HIGHEST-precision one-hot
table_lookup slower than DEFAULT on this chip, and is DEFAULT even exact?

table_lookup pins jax.lax.Precision.HIGHEST because a backend whose DEFAULT
lowers f32 dots to single-pass bf16 would round packed Huffman entries
(~2**21) into corrupt bitstreams.  If the chip's DEFAULT is both exact and
faster, a runtime probe could relax the pin.  Measure before deciding.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402


def lookup(table, idx, num, precision):
    oh = (idx[:, None] == jnp.arange(num)[None, :]).astype(jnp.float32)
    res = jnp.dot(oh, table.astype(jnp.float32), precision=precision,
                  preferred_element_type=jnp.float32)
    return res.astype(jnp.int32)


def main():
    B, E = 16, 65536
    rng = np.random.default_rng(0)
    # Worst-case packed Huffman entries: full 21-bit values.
    tab_np = rng.integers(0, 1 << 21, (286,), dtype=np.int32)
    # The table rides as a TRACED argument (device_put + function parameter),
    # matching production: chunk_encode calls table_lookup with per-block
    # Huffman tables computed on device.  A host-constant table would let XLA
    # lower the dot differently (constant folding / different fusion), making
    # the probe unrepresentative (ADVICE.md round 2).
    tab = jax.device_put(tab_np)
    idx = jax.device_put(rng.integers(0, 286, (B, E), dtype=np.int32))

    for name, prec in [("DEFAULT", jax.lax.Precision.DEFAULT),
                       ("HIGHEST", jax.lax.Precision.HIGHEST)]:
        fn = jax.vmap(
            functools.partial(lookup, num=286, precision=prec), in_axes=(None, 0)
        )
        out = np.asarray(jax.jit(fn)(tab, idx))
        exact = bool((out == tab_np[np.asarray(idx)]).all())
        t = sync_time(jax.jit(fn), tab, idx, iters=16)
        print(f"{name:8s} exact={exact}  {t*1e3/B:.4f} ms/chunk-eq (one 65536x286 lookup)")


if __name__ == "__main__":
    main()
