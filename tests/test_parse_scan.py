"""Unit tests for the lock-step segmented parse-scan kernel (interpret mode).

The kernel must reproduce, bit for bit, the sequential parse: the orbit of
position 0 under the jump table (the reference's per-byte driver loop shape,
lz77.rs:305-486, re-expressed as jumps).  Run in Pallas interpret mode so the
semantics are testable on the CPU backend.
"""

import numpy as np
import pytest

from deflate_rs_tpu.ops.parse_scan import parse_scan_batched


def serial_parse(steps, n):
    """The ground truth: walk the jump chain from 0."""
    out = np.zeros(len(steps), bool)
    p = 0
    while p < n:
        out[p] = True
        p += int(steps[p])
    return out


def make_steps(rng, E, match_frac=0.3, max_len=258):
    steps = np.ones(E, np.int32)
    is_m = rng.random(E) < match_frac
    steps[is_m] = rng.integers(3, max_len + 1, is_m.sum())
    return steps


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("nfrac", [1.0, 0.55, 0.0, 0.013])
def test_parse_scan_matches_serial(seed, nfrac):
    E = 512
    rng = np.random.default_rng(seed)
    B = 3
    steps = np.stack([make_steps(rng, E) for _ in range(B)])
    ns = np.full(B, int(E * nfrac), np.int32)
    got = np.asarray(parse_scan_batched(steps, ns, interpret=True))
    for b in range(B):
        want = serial_parse(steps[b], ns[b])
        assert (got[b] == want).all(), f"chunk {b} parse mismatch"


def test_parse_scan_all_literals_and_all_long():
    E = 512
    B = 2
    steps = np.stack([
        np.ones(E, np.int32),                 # every position a literal
        np.full(E, 258, np.int32),            # maximal jumps everywhere
    ])
    ns = np.array([E, E], np.int32)
    got = np.asarray(parse_scan_batched(steps, ns, interpret=True))
    for b in range(B):
        want = serial_parse(steps[b], ns[b])
        assert (got[b] == want).all()


def test_parse_scan_segment_boundary_overhangs():
    """Jumps engineered to straddle every segment boundary (L=32 here)."""
    E, L = 512, 32
    steps = np.ones(E, np.int32)
    # Place a match just before each boundary jumping deep into the next seg.
    for s in range(1, E // L):
        steps[s * L - 3] = 40
    got = np.asarray(parse_scan_batched(steps[None], np.array([E], np.int32),
                                        interpret=True))[0]
    want = serial_parse(steps, E)
    assert (got == want).all()
