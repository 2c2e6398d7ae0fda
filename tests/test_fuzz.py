"""Fuzz-style roundtrip tests.

Mirrors the reference's AFL regression replay (test.rs:148-161: every
AFL-found crash input recompressed at multiple levels) and its fuzz target's
compress->inflate->compare loop (deflate-fuzz-target/src/main.rs:4-20), with
stdlib zlib as the independent decoder and our own inflate as second oracle.
"""

import os
import glob
import zlib

import numpy as np
import pytest

import deflate_rs_tpu as dt
from deflate_rs_tpu import CompressionOptions
from deflate_rs_tpu.models.inflate import inflate

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
AFL_DIR = os.path.join(DATA_DIR, "afl")

LEVELS = [CompressionOptions.default(), CompressionOptions.fast()]


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(AFL_DIR, "*"))), ids=os.path.basename
)
def test_afl_corpus_replay(path):
    """Replay the reference's AFL crash corpus at Default+Fast (test.rs:148)."""
    with open(path, "rb") as f:
        data = f.read()
    for opts in LEVELS:
        out = dt.deflate_bytes_conf(data, opts)
        assert zlib.decompress(out, wbits=-15) == data


def _random_inputs(seed, n_cases):
    rng = np.random.default_rng(seed)
    for _ in range(n_cases):
        kind = rng.integers(0, 5)
        n = int(rng.integers(0, 70_000))
        if kind == 0:  # uniform random (incompressible)
            yield rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        elif kind == 1:  # runs
            vals = rng.integers(0, 256, 64, dtype=np.uint8)
            reps = rng.integers(1, 500, 64)
            yield b"".join(bytes([v]) * int(r) for v, r in zip(vals, reps))[:n]
        elif kind == 2:  # small alphabet (huffman-heavy)
            yield rng.choice(np.frombuffer(b"abcd\n", np.uint8), n).tobytes()
        elif kind == 3:  # periodic (stresses run/probe interplay)
            period = int(rng.integers(1, 40))
            unit = rng.integers(0, 256, period, dtype=np.uint8).tobytes()
            yield (unit * (n // max(period, 1) + 1))[:n]
        else:  # text-ish with repeats
            words = [bytes(rng.integers(97, 123, int(rng.integers(2, 12))).astype(np.uint8)) for _ in range(30)]
            yield b" ".join(words[int(i)] for i in rng.integers(0, 30, n // 6))[:n]


@pytest.mark.parametrize("seed", range(4))
def test_random_roundtrip(seed):
    for data in _random_inputs(seed, 6):
        for opts in LEVELS:
            out = dt.deflate_bytes_conf(data, opts)
            assert zlib.decompress(out, wbits=-15) == data


def test_random_roundtrip_own_inflate():
    for data in _random_inputs(99, 4):
        out = dt.deflate_bytes(data)
        assert inflate(out) == data


def test_pathological_extension_overflow():
    """More probe-saturated positions than the extension budget: output must
    stay valid (just potentially less compressed)."""
    unit = bytes(range(17))  # period 17 > RUN_DISTS, saturates the probe
    data = unit * 4000
    out = dt.deflate_bytes(data)
    assert zlib.decompress(out, wbits=-15) == data


@pytest.mark.parametrize("period", [2, 7, 13, 17, 64, 255])
def test_periodic_ratio_no_cliff(period):
    """Round-1's fixed extension budget truncated matches on periodic data
    (VERDICT.md weak #5).  The chain-extension matcher recovers full-length
    constant-distance runs, so periodic inputs must now compress to near the
    entropy floor — within 2x of zlib-6, not just 'valid'."""
    unit = bytes((i * 37 + 11) % 256 for i in range(period))
    data = unit * (200_000 // period)
    out = dt.deflate_bytes(data)
    assert zlib.decompress(out, wbits=-15) == data
    theirs = len(zlib.compress(data, 6)) - 6
    assert len(out) <= max(2 * theirs, theirs + 64), (period, len(out), theirs)


def test_mixed_content_ratio_tracks_zlib():
    """Chunks mixing text and binary must stay at-or-under zlib-6 (block
    splitting; VERDICT.md item 6)."""
    with open(os.path.join(DATA_DIR, "pg11.txt"), "rb") as f:
        text = f.read()
    rng = np.random.default_rng(3)
    blobs = [
        text[:30_000],
        rng.integers(0, 256, 20_000, dtype=np.uint8).tobytes(),
        b"\x00" * 10_000,
        text[30_000:60_000],
        bytes(range(256)) * 40,
        rng.integers(0, 4, 30_000, dtype=np.uint8).tobytes(),
    ]
    data = b"".join(blobs) * 2
    out = dt.deflate_bytes(data)
    assert zlib.decompress(out, wbits=-15) == data
    theirs = len(zlib.compress(data, 6)) - 6
    assert len(out) <= theirs * 1.02, (len(out), theirs)
