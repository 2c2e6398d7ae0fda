"""Pallas kernel semantics, validated in interpreter mode on the CPU backend.

The TPU path of chunk_encode uses two scalar-core kernels (parse_walk,
extend_walk) that never execute in the CPU test suite; these tests run their
interpreter-mode variants against the pure-XLA formulations / a Python model
so kernel regressions are caught without hardware.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from deflate_rs_tpu.ops.extend_walk import extend_matches_interpret
from deflate_rs_tpu.ops.parse_walk import parse_walk_interpret


def py_walk(next_off, dist, start, n_total):
    toks = []
    p = start
    while p < n_total:
        toks.append((p, max(int(next_off[p]), 1), int(dist[p])))
        p += max(int(next_off[p]), 1)
    return toks


@pytest.mark.parametrize("seed", range(3))
def test_parse_walk_matches_python(seed):
    rng = np.random.default_rng(seed)
    N, cap = 1024, 1024
    next_off = np.ones(N, np.int32)
    dist = np.zeros(N, np.int32)
    for _ in range(60):
        i = int(rng.integers(0, N))
        next_off[i] = int(rng.integers(3, 259))
        dist[i] = int(rng.integers(1, 32769))
    start = int(rng.integers(0, 64))
    n_total = int(rng.integers(N - 300, N))
    jump = jnp.asarray(next_off | (dist << 9))
    out, d, cnt = parse_walk_interpret(jump, start, n_total, cap)
    out, d = np.asarray(out), np.asarray(d)
    expect = py_walk(next_off, dist, start, n_total)
    assert int(cnt) == len(expect)
    for t, (pp, step, dd) in enumerate(expect):
        assert out[t] == (pp | (step << 17))
        assert d[t] == (dd if step >= 3 else dist[pp])


def test_extend_walk_matches_python():
    rng = np.random.default_rng(7)
    W = 2048
    data = rng.integers(0, 4, W, dtype=np.uint8)  # small alphabet => matches
    data[500:900] = data[100:500]  # a long guaranteed match
    padded = np.zeros(W + 8, np.uint8)
    padded[:W] = data
    packed = (
        padded[:-3].astype(np.uint32)
        | (padded[1:-2].astype(np.uint32) << 8)
        | (padded[2:-1].astype(np.uint32) << 16)
        | (padded[3:].astype(np.uint32) << 24)
    )

    CE, M = 128, 2
    epos = np.full(CE, -1, np.int32)
    elim = np.zeros(CE, np.int32)
    cands = [np.zeros(CE, np.int32) for _ in range(M)]
    inits = [np.zeros(CE, np.int32) for _ in range(M)]
    lanes = []
    for lane in range(40):
        pos = int(rng.integers(520, 880))
        epos[lane] = pos
        elim[lane] = min(258, W - pos)
        cands[0][lane] = pos - 400  # the planted long match
        inits[0][lane] = 16
        cand1 = max(pos - int(rng.integers(1, 32)), 0)
        cands[1][lane] = cand1
        # The contract guarantees init is a true probe measurement:
        # min(actual common prefix, probe window).
        pref = 0
        while pref < 16 and data[pos + pref] == data[cand1 + pref]:
            pref += 1
        inits[1][lane] = pref if int(rng.integers(0, 2)) else 0
        lanes.append(lane)

    res = np.asarray(
        extend_matches_interpret(
            jnp.asarray(packed), jnp.asarray(epos), jnp.asarray(elim),
            [jnp.asarray(c) for c in cands], [jnp.asarray(i) for i in inits],
        )
    )

    def true_len(pos, cand, lim):
        L = 0
        while L < lim and data[pos + L] == data[cand + L]:
            L += 1
        return L

    for lane in lanes:
        pos, lim = int(epos[lane]), int(elim[lane])
        best = (0, 0)
        for m in range(M):
            init = int(inits[m][lane])
            if init == 0:
                continue
            cand = int(cands[m][lane])
            # kernel semantics: init < 16 is exact (no extension)
            L = true_len(pos, cand, lim) if init >= 16 else min(init, lim)
            d = pos - cand
            if L > best[0] or (L == best[0] and d < best[1]):
                best = (L, d)
        got = (int(res[lane]) >> 16, int(res[lane]) & 0xFFFF)
        assert got == best, (lane, got, best)
    assert (res[np.asarray(epos) < 0] == 0).all()
