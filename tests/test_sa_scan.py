"""Unit tests for the fused suffix-order LCP + K-scan kernel (interpret mode).

The kernel (ops/sa_scan.py) must produce packed scores identical to the XLA
formulation (ops/matching.sa_scan_xla) on the SAME sorted operands — it is a
pure fusion, not an approximation.  Inputs are constructed exactly the way
find_matches builds them (content-key sort of a chunk buffer).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deflate_rs_tpu.ops import matching as mt
from deflate_rs_tpu.ops.sa_scan import sa_scan_batched


def sorted_ops(buf, N, n_total, hstart, probe_words):
    """Replicate find_matches' sort-prep on one chunk buffer."""
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = (idx >= hstart) & (idx <= n_total - 3)
    NKEY = min(4, probe_words)
    d = jnp.asarray(buf).astype(jnp.uint32)
    be = (d[:-3] << 24) | (d[1:-2] << 16) | (d[2:-1] << 8) | d[3:]
    keys = [
        jnp.where(valid, be[4 * w : N + 4 * w], jnp.uint32(0xFFFFFFFF))
        for w in range(NKEY)
    ]
    packed = mt.pack_words(jnp.asarray(buf))
    pay = [packed[4 * w : N + 4 * w] for w in range(NKEY, probe_words)]
    ops = jax.lax.sort(keys + [idx] + pay, num_keys=NKEY, is_stable=True)
    return list(ops[:NKEY]), ops[NKEY], list(ops[NKEY:][1:])


def make_buf(rng, N, pad, kind):
    if kind == "text":
        data = open("tests/data/pg11.txt", "rb").read()
        raw = (data * (N // len(data) + 1))[:N]
        buf = np.frombuffer(raw, np.uint8)
    elif kind == "random":
        buf = rng.integers(0, 256, N, dtype=np.uint8)
    elif kind == "runs":
        buf = np.repeat(
            rng.integers(0, 4, N // 64 + 1, dtype=np.uint8), 64
        )[:N]
    else:  # periodic
        buf = np.tile(rng.integers(0, 256, 7, dtype=np.uint8), N // 7 + 1)[:N]
    return np.concatenate([buf, np.zeros(pad, np.uint8)])


@pytest.mark.parametrize("kind", ["text", "random", "runs", "periodic"])
@pytest.mark.parametrize("bounds", [(0, None), (1000, None), (0, 2000), (700, 3000)])
def test_sa_scan_matches_xla(kind, bounds):
    N, PAD, K, PW = 1024, 72, 16, 6
    rng = np.random.default_rng(42)
    buf = make_buf(rng, N, PAD, kind)
    hstart = bounds[0]
    n_total = bounds[1] if bounds[1] is not None else N
    n_total = min(n_total, N)

    skeys, spos, spay = sorted_ops(buf, N, n_total, hstart, PW)
    want = np.asarray(
        mt.sa_scan_xla(skeys, spos, spay, hstart, n_total, K, PW)
    )
    got = np.asarray(
        sa_scan_batched(
            jnp.stack(skeys)[None],
            spos[None],
            jnp.stack(spay)[None],
            jnp.array([hstart], jnp.int32),
            jnp.array([n_total], jnp.int32),
            nkey=len(skeys), npay=len(spay), K=K, init_lcp=4 * PW,
            interpret=True,
        )
    )[0]
    assert (got == want).all(), (
        f"{kind} bounds={bounds}: {np.sum(got != want)} mismatches, "
        f"first at {np.argmax(got != want)}"
    )


def test_sa_scan_batched_multi_chunk():
    N, PAD, K, PW = 512, 72, 8, 6
    rng = np.random.default_rng(7)
    kinds = ["text", "random", "runs", "periodic"]
    sk, sp, spy, hs, nt = [], [], [], [], []
    for kind in kinds:
        buf = make_buf(rng, N, PAD, kind)
        skeys, spos, spay = sorted_ops(buf, N, N, 0, PW)
        sk.append(jnp.stack(skeys))
        sp.append(spos)
        spy.append(jnp.stack(spay))
        hs.append(0)
        nt.append(N)
    got = np.asarray(
        sa_scan_batched(
            jnp.stack(sk), jnp.stack(sp), jnp.stack(spy),
            jnp.asarray(hs, jnp.int32), jnp.asarray(nt, jnp.int32),
            nkey=4, npay=PW - 4, K=K, init_lcp=4 * PW, interpret=True,
        )
    )
    for b, kind in enumerate(kinds):
        want = np.asarray(mt.sa_scan_xla(list(sk[b]), sp[b], list(spy[b]), 0, N, K, PW))
        assert (got[b] == want).all(), kind
