"""Microbenchmark: hash-matcher vs suffix-sort matcher primitives on TPU.

Times, with the fetch-barrier discipline:
  (a) the current 1-key 8-operand payload sort,
  (b) a 4-key 7-operand lexicographic sort (SA design),
  (c) the K=128 hash probe loop,
  (d) the SA adjacent-lcp + 2xK running-min scan.
"""

from __future__ import annotations

import functools
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

from deflate_rs_tpu.ops import chunk_encode as ce  # noqa: E402
from deflate_rs_tpu.ops import matching as mt  # noqa: E402
from deflate_rs_tpu.ops.hashing import INVALID_KEY, hash3  # noqa: E402
from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402

B = int(os.environ.get("STAGE_BATCH", "16"))
E = int(os.environ.get("STAGE_E", "65536"))
N = ce.HALO + E
K_HASH = 128
K_SA = int(os.environ.get("SA_K", "64"))
NKEY = 4
PW_TOTAL = 6


def build_bufs():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "tests", "data", "pg11.txt"), "rb") as f:
        text = f.read()
    data = (text * ((B * (N + ce.PAD)) // len(text) + 1))[: B * (N + ce.PAD)]
    return jax.device_put(
        np.frombuffer(data, np.uint8).reshape(B, N + ce.PAD).copy()
    )


def be_words(buf):
    d = buf.astype(jnp.uint32)
    return (d[:-3] << 24) | (d[1:-2] << 16) | (d[2:-1] << 8) | d[3:]


def sort_hash(buf):
    idx = jnp.arange(N, dtype=jnp.int32)
    h = hash3(buf, N)
    keys = jnp.where(idx <= N - 3, h, INVALID_KEY)
    packed = mt.pack_words(buf)
    probes = [packed[4 * w : N + 4 * w] for w in range(6)]
    return tuple(jax.lax.sort([keys, idx] + probes, num_keys=1, is_stable=True))


def sort_sa(buf):
    idx = jnp.arange(N, dtype=jnp.int32)
    be = be_words(buf)
    keys = [
        jnp.where(idx <= N - 3, be[4 * w : N + 4 * w], jnp.uint32(0xFFFFFFFF))
        for w in range(NKEY)
    ]
    packed = mt.pack_words(buf)
    pay = [packed[4 * w : N + 4 * w] for w in range(NKEY, PW_TOTAL)]
    return tuple(jax.lax.sort(keys + [idx] + pay, num_keys=NKEY, is_stable=True))


def probe_hash(*ops):
    skey, spos = ops[0], ops[1]
    sprobe = list(ops[2:])
    valid = skey < INVALID_KEY
    skey_e = jnp.concatenate([jnp.full((K_HASH,), INVALID_KEY + 1, skey.dtype), skey])
    spos_e = jnp.concatenate([jnp.zeros((K_HASH,), spos.dtype), spos])
    spr_e = [jnp.concatenate([jnp.zeros((K_HASH,), w.dtype), w]) for w in sprobe]

    def step(k, best):
        st = K_HASH - k
        pk = jax.lax.dynamic_slice(skey_e, [st], [N])
        pp = jax.lax.dynamic_slice(spos_e, [st], [N])
        dist = spos - pp
        ok = (skey == pk) & valid & (dist <= 32768)
        lp = mt._probe_len(sprobe, [jax.lax.dynamic_slice(w, [st], [N]) for w in spr_e])
        sc = jnp.where(ok & (lp >= 3), (lp << 16) | (32769 - dist), 0)
        return jnp.maximum(best, sc)

    return jax.lax.fori_loop(1, K_HASH + 1, step, jnp.zeros((N,), jnp.int32))


def clz_bytes(x):
    return jnp.minimum(jax.lax.clz(x.astype(jnp.uint32)) >> 3, 4).astype(jnp.int32)


def probe_sa(*ops):
    skeys = list(ops[:NKEY])
    spos = ops[NKEY]
    spay = list(ops[NKEY + 1 :])
    total = None
    for w in range(NKEY):
        a = skeys[w]
        b = jnp.concatenate([jnp.full(1, ~a[0], a.dtype), a[:-1]])
        m = clz_bytes(a ^ b)
        total = m if total is None else total + jnp.where(total == 4 * w, m, 0)
    for w, p in enumerate(spay, start=NKEY):
        b = jnp.concatenate([jnp.zeros(1, p.dtype), p[:-1]])
        m = mt._matched_bytes(p ^ b)
        total = total + jnp.where(total == 4 * w, m, 0)
    al = total.at[0].set(0)
    K = K_SA
    al_b = jnp.concatenate([jnp.zeros(K, al.dtype), al])
    spos_b = jnp.concatenate([jnp.full(K, 1 << 30, spos.dtype), spos])
    al_f = jnp.concatenate([al, jnp.zeros(K, al.dtype)])
    spos_f = jnp.concatenate([spos, jnp.full(K, 1 << 30, spos.dtype)])

    def step(k, carry):
        runb, runf, best = carry
        ab = jax.lax.dynamic_slice(al_b, [K - k + 1], [N])
        cb = jax.lax.dynamic_slice(spos_b, [K - k], [N])
        af = jax.lax.dynamic_slice(al_f, [k], [N])
        cf = jax.lax.dynamic_slice(spos_f, [k], [N])
        runb = jnp.minimum(runb, ab)
        runf = jnp.minimum(runf, af)
        db = spos - cb
        df = spos - cf
        okb = (db >= 1) & (db <= 32768) & (cb <= N - 3) & (runb >= 3)
        okf = (df >= 1) & (df <= 32768) & (cf <= N - 3) & (runf >= 3)
        sb = jnp.where(okb, (runb << 16) | (32769 - db), 0)
        sf = jnp.where(okf, (runf << 16) | (32769 - df), 0)
        return runb, runf, jnp.maximum(best, jnp.maximum(sb, sf))

    init = jnp.full(N, 4 * PW_TOTAL, jnp.int32)
    _, _, best = jax.lax.fori_loop(1, K + 1, step, (init, init, spos * 0))
    return best


def main():
    bufs = build_bufs()
    print(f"platform={jax.devices()[0].platform} B={B} E={E} N={N}")
    vb = jax.vmap

    t = sync_time(vb(sort_hash), bufs, iters=4)
    print(f"sort 1-key 8-op : {t*1e3/B:8.3f} ms/chunk")
    h_ops = jax.jit(vb(sort_hash))(bufs)

    t = sync_time(vb(sort_sa), bufs, iters=4)
    print(f"sort 4-key 7-op : {t*1e3/B:8.3f} ms/chunk")
    s_ops = jax.jit(vb(sort_sa))(bufs)

    t = sync_time(vb(probe_hash), *h_ops, iters=4)
    print(f"probe hash K128 : {t*1e3/B:8.3f} ms/chunk")

    t = sync_time(vb(probe_sa), *s_ops, iters=4)
    print(f"probe SA 2x{K_SA:<4d}: {t*1e3/B:8.3f} ms/chunk")


if __name__ == "__main__":
    main()
