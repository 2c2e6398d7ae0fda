"""Native host runtime (C++/ctypes) vs stdlib/NumPy oracles."""

import os
import zlib

import numpy as np
import pytest

from deflate_rs_tpu.runtime import native


def test_builds_and_loads():
    assert native.available(), "native runtime failed to build — check g++"


def test_crc32_matches_zlib():
    rng = np.random.default_rng(0)
    for n in (0, 1, 7, 8, 9, 4096, 100_001):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.crc32(data) == zlib.crc32(data)
    # streaming
    a, b = data[:50_000], data[50_000:]
    assert native.crc32(b, native.crc32(a)) == zlib.crc32(data)


def test_adler32_matches_zlib():
    rng = np.random.default_rng(1)
    for n in (0, 1, 5551, 5552, 5553, 99_999):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.adler32(data) == zlib.adler32(data)
    a, b = data[:30_000], data[30_000:]
    assert native.adler32(b, native.adler32(a)) == zlib.adler32(data)


def test_assemble_chunks():
    rng = np.random.default_rng(2)
    n, stride = 17, 1000
    words = rng.integers(0, 256, (n, stride), dtype=np.uint8)
    nbytes = rng.integers(0, stride + 1, n).astype(np.int64)
    expect = b"".join(words[i, : int(nbytes[i])].tobytes() for i in range(n))
    assert native.assemble_chunks(words, nbytes) == expect


@pytest.mark.parametrize("seed", range(3))
def test_bit_append(seed):
    """Bit splicing agrees with a pure-Python bit-string model."""
    rng = np.random.default_rng(seed)
    total_bits = 0
    dst = bytearray(40_000)
    ref_bits = []
    for _ in range(30):
        nbits = int(rng.integers(1, 6000))
        nbytes = (nbits + 7) // 8
        piece = rng.integers(0, 256, nbytes, dtype=np.uint8)
        if nbits & 7:
            piece[-1] &= (1 << (nbits & 7)) - 1  # encoder zero-pads tails
        total_bits = native.bit_append(dst, total_bits, piece.tobytes(), nbits)
        for k in range(nbits):
            ref_bits.append((piece[k >> 3] >> (k & 7)) & 1)
    assert total_bits == len(ref_bits)
    for k, bit in enumerate(ref_bits):
        assert (dst[k >> 3] >> (k & 7)) & 1 == bit, f"bit {k}"
