"""Round-3 perf probes: sort-cost surface, pack variants, histogram dtypes.

Measures (fetch-barrier timing, utils/profiling.py) the primitives whose
costs decide the round-3 optimization plan:

  1. timing floor (trivial fn) at the probe's iters — so stage numbers can
     be floor-corrected;
  2. lax.sort cost over (num_keys, num_payloads) at the matcher's shape
     (N = HALO + E rows, uint32, vmapped over B) — round-2 notes disagree
     with the round-1 primitive table on whether keys or operands set the
     cost; settle it;
  3. bit-pack boundary compaction: the current 2-operand stable sort vs a
     hinted scatter-set (unique + sorted indices measured 28x faster than
     scatter-add in round 1);
  4. histogram one-hot dtype: f32 vs bf16 accumulation (counts <= 16384
     fit bf16's integer range only below 256 — NOT exact; measured for the
     record, usable only with an i32 fixup or f32 accumulate).

Env: STAGE_BATCH (16), STAGE_EMIT (65536), STAGE_ITERS (16).
"""

from __future__ import annotations

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

import jax.numpy as jnp  # noqa: E402

from deflate_rs_tpu.ops.bitpack import pack_fields  # noqa: E402
from deflate_rs_tpu.ops.chunk_encode import HALO, out_words  # noqa: E402
from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402

B = int(os.environ.get("STAGE_BATCH", "16"))
E = int(os.environ.get("STAGE_EMIT", "65536"))
IT = int(os.environ.get("STAGE_ITERS", "16"))
N = HALO + E


def main():
    rng = np.random.default_rng(0)
    print(f"platform={jax.devices()[0].platform} B={B} E={E} N={N} iters={IT}", flush=True)

    # ------------------------------------------------------------- 1. floor
    x = jax.device_put(np.ones((B, 8), np.int32))
    t = sync_time(lambda v: v + 1, x, iters=IT)
    print(f"floor(triv) : {t*1e3/B:8.4f} ms/chunk ({t*1e3:.3f} ms/call)", flush=True)

    # ------------------------------------------------- 2. sort cost surface
    words = jax.device_put(rng.integers(0, 1 << 32, (B, 8, N), np.uint64).astype(np.uint32))

    def sort_cfg(nk, npay):
        def f(w):
            ops = [w[i] for i in range(nk + npay)]
            return jax.lax.sort(ops, num_keys=nk, is_stable=True)[nk - 1]

        return jax.vmap(f)

    for nk, npay in [(1, 2), (1, 4), (1, 6), (2, 5), (3, 4), (4, 3), (4, 2), (4, 1)]:
        t = sync_time(sort_cfg(nk, npay), words, iters=IT)
        print(f"sort nk={nk} npay={npay} (ops={nk+npay}): {t*1e3/B:8.4f} ms/chunk", flush=True)

    # unstable variant of the production config
    def sort_unstable(w):
        ops = [w[i] for i in range(7)]
        return jax.lax.sort(ops, num_keys=4, is_stable=False)[3]

    t = sync_time(jax.vmap(sort_unstable), words, iters=IT)
    print(f"sort nk=4 npay=3 UNSTABLE    : {t*1e3/B:8.4f} ms/chunk", flush=True)

    # --------------------------------------------------- 3. pack variants
    F = 2 * E + 4096
    NW = out_words(E)
    vals = jax.device_put(rng.integers(0, 1 << 16, (B, F), np.uint32).astype(np.uint32))
    # realistic widths: ~45% zero, rest 1..16 bits
    w = rng.integers(0, 17, (B, F)).astype(np.int32)
    w[rng.random((B, F)) < 0.45] = 0
    nbits = jax.device_put(w)

    t = sync_time(jax.vmap(lambda v, b: pack_fields(v, b, NW)), vals, nbits, iters=IT)
    print(f"pack(sort)  : {t*1e3/B:8.4f} ms/chunk", flush=True)

    def pack_scatter(values, nb, num_words):
        values = jnp.concatenate([values, jnp.zeros(1, values.dtype)])
        nb = jnp.concatenate([nb, jnp.zeros(1, nb.dtype)]).astype(jnp.uint32)
        mask = jnp.where(nb == 0, 0, jnp.left_shift(2, nb - 1).astype(jnp.uint32) - 1)
        v = values.astype(jnp.uint32) & mask
        ends = jnp.cumsum(nb, dtype=jnp.uint32)
        offs = ends - nb
        total_bits = ends[-1]
        word = (offs >> 5).astype(jnp.int32)
        sh = offs & 31
        lo = v << sh
        hi = jnp.where(sh == 0, 0, v >> (32 - sh)).astype(jnp.uint32)
        nxt = jnp.concatenate([word[1:], jnp.full(1, -1, jnp.int32)])
        boundary = word != nxt
        hi_b = jnp.where(boundary, hi, 0)
        s = jnp.cumsum(hi_b, dtype=jnp.uint32) - hi_b
        ps = jnp.cumsum(lo, dtype=jnp.uint32) + s
        # boundary word indices are unique and ascending -> hinted scatter-set
        idx = jnp.where(boundary, word, num_words)
        t_ = jnp.zeros(num_words + 1, jnp.uint32).at[idx].set(
            ps, unique_indices=True, indices_are_sorted=True
        )[:num_words]
        t_prev = jnp.concatenate([jnp.zeros(1, jnp.uint32), t_[:-1]])
        out = t_ - t_prev
        widx = jnp.arange(num_words, dtype=jnp.uint32)
        return jnp.where(widx * 32 < total_bits, out, 0), total_bits.astype(jnp.int32)

    t = sync_time(jax.vmap(lambda v, b: pack_scatter(v, b, NW)), vals, nbits, iters=IT)
    print(f"pack(scatter): {t*1e3/B:8.4f} ms/chunk", flush=True)

    # sanity: identical outputs
    a = jax.jit(jax.vmap(lambda v, b: pack_fields(v, b, NW)))(vals, nbits)
    bb = jax.jit(jax.vmap(lambda v, b: pack_scatter(v, b, NW)))(vals, nbits)
    ok = bool(jnp.all(a[0] == bb[0])) and bool(jnp.all(a[1] == bb[1]))
    print(f"pack variants identical: {ok}", flush=True)

    # --------------------------------------------------- 4. histogram dtype
    sym = jax.device_put(rng.integers(0, 286, (B, E)).astype(np.int32))
    valid = jax.device_put(rng.random((B, E)) < 0.6)

    def hist_f32(s, m):
        oh = (s[:, None] == jnp.arange(286)[None, :]) & m[:, None]
        return jnp.sum(oh.astype(jnp.float32), axis=0).astype(jnp.int32)

    def hist_dot_f32(s, m):
        oh = jnp.where(
            (s[:, None] == jnp.arange(286)[None, :]) & m[:, None], 1.0, 0.0
        ).astype(jnp.float32)
        return jnp.dot(
            jnp.ones((E,), jnp.float32), oh, precision=jax.lax.Precision.HIGHEST
        ).astype(jnp.int32)

    def hist_dot_bf16(s, m):
        oh = jnp.where(
            (s[:, None] == jnp.arange(286)[None, :]) & m[:, None], 1.0, 0.0
        ).astype(jnp.bfloat16)
        return jnp.dot(
            jnp.ones((E,), jnp.bfloat16),
            oh,
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)

    for name, fn in [("hist sum f32", hist_f32), ("hist dot f32", hist_dot_f32),
                     ("hist dot bf16->f32", hist_dot_bf16)]:
        t = sync_time(jax.vmap(fn), sym, valid, iters=IT)
        print(f"{name:20s}: {t*1e3/B:8.4f} ms/chunk", flush=True)
    a = jax.jit(jax.vmap(hist_f32))(sym, valid)
    c = jax.jit(jax.vmap(hist_dot_bf16))(sym, valid)
    print(f"bf16 hist exact: {bool(jnp.all(a == c))}", flush=True)


if __name__ == "__main__":
    main()
