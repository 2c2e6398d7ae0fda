"""Golden tests for the spec layer: constant tables, canonical codes, checksums.

Counterparts of the reference's unit tests for huffman_table.rs:507-527 (fixed
canonical code values), bit_reverse.rs, zlib.rs:70-86 (FCHECK), and the
checksum modules — all re-derived from the RFCs and stdlib oracles.
"""

import zlib

import numpy as np
import pytest

from deflate_rs_tpu import constants as C
from deflate_rs_tpu.ops.canonical import canonical_codes
from deflate_rs_tpu.ops import checksum as ck
from deflate_rs_tpu.utils.bits import reverse_bits16

import jax.numpy as jnp


def test_length_tables():
    # Spot checks from RFC 1951 §3.2.5.
    assert C.LENGTH_TO_CODE[3] == 0  # symbol 257
    assert C.LENGTH_TO_CODE[10] == 7  # symbol 264
    assert C.LENGTH_TO_CODE[11] == 8
    assert C.LENGTH_TO_CODE[257] == 27  # 227..257 -> code 284
    assert C.LENGTH_TO_CODE[258] == 28  # dedicated code 285
    # Every length in 3..258 maps to a code whose base/extra covers it.
    for L in range(3, 259):
        c = C.LENGTH_TO_CODE[L]
        base = C.LENGTH_BASE[c]
        assert base <= L < base + (1 << C.LENGTH_EXTRA_BITS[c]) or L == 258


def test_dist_tables():
    assert C.DIST_TO_CODE[1] == 0
    assert C.DIST_TO_CODE[4] == 3
    assert C.DIST_TO_CODE[5] == 4
    assert C.DIST_TO_CODE[32768] == 29
    for d in (1, 2, 3, 4, 7, 9, 24577, 32768, 12345):
        c = C.DIST_TO_CODE[d]
        base = C.DIST_BASE[c]
        assert base <= d < base + (1 << C.DIST_EXTRA_BITS[c])


def test_reverse_bits():
    v = reverse_bits16(jnp.uint32(0b1011), jnp.uint32(4))
    assert int(v) == 0b1101
    v = reverse_bits16(jnp.uint32(0x0C), jnp.uint32(5))  # 01100 -> 00110
    assert int(v) == 0b00110


def test_fixed_canonical_codes():
    """The fixed litlen table's canonical codes per RFC 1951 §3.2.6.

    Symbol 0 -> 00110000 (0x30), symbol 144 -> 110010000, symbol 256 -> 0000000,
    symbol 280 -> 11000000.  Our codes are stored bit-reversed.
    """
    codes = np.asarray(canonical_codes(jnp.asarray(C.FIXED_LITLEN_LENGTHS), 15))

    def msb(sym, nbits):
        # Undo the bit-reversal for comparison with the spec's MSB-first values.
        v = int(codes[sym])
        out = 0
        for _ in range(nbits):
            out = (out << 1) | (v & 1)
            v >>= 1
        return out

    assert msb(0, 8) == 0b00110000
    assert msb(143, 8) == 0b10111111
    assert msb(144, 9) == 0b110010000
    assert msb(255, 9) == 0b111111111
    assert msb(256, 7) == 0b0000000
    assert msb(279, 7) == 0b0010111
    assert msb(280, 8) == 0b11000000
    assert msb(287, 8) == 0b11000111

    dist_codes = np.asarray(canonical_codes(jnp.asarray(C.FIXED_DIST_LENGTHS), 15))
    # Fixed distance codes are the 5-bit numbers themselves.
    for sym in range(30):
        v = int(dist_codes[sym])
        out = 0
        for _ in range(5):
            out = (out << 1) | (v & 1)
            v >>= 1
        assert out == sym


def test_zlib_header():
    hdr = C.zlib_header()
    assert hdr == b"\x78\x9c"
    assert (hdr[0] * 256 + hdr[1]) % 31 == 0
    for lvl in range(4):
        h = C.zlib_header(lvl)
        assert (h[0] * 256 + h[1]) % 31 == 0


@pytest.mark.parametrize("n", [0, 1, 5, 511, 512, 513, 65536])
def test_adler32_device(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, size=n, dtype=np.uint8)
    P = 65536
    buf = np.zeros(P, dtype=np.uint8)
    buf[:n] = data
    s1, s2 = ck.adler32_parts_device(jnp.asarray(buf), jnp.int32(n))
    state = ck.adler32_combine(ck.ADLER_INIT, int(s1), int(s2), n)
    assert ck.adler32_value(state) == zlib.adler32(data.tobytes())


def test_adler32_device_large_buffer_no_overflow():
    """Regression: the weighted s2 sum overflowed int32 for buffers past
    ~262 KB of high bytes (the q*b partial); segments-with-mod reduction
    must stay exact at 1 MiB of 0xFF."""
    P = 1 << 20
    buf = np.full(P, 0xFF, dtype=np.uint8)
    s1, s2 = ck.adler32_parts_device(jnp.asarray(buf), jnp.int32(P))
    state = ck.adler32_combine(ck.ADLER_INIT, int(s1), int(s2), P)
    assert ck.adler32_value(state) == zlib.adler32(buf.tobytes())


def test_adler32_combine_stream():
    rng = np.random.default_rng(7)
    chunks = [rng.integers(0, 256, size=m, dtype=np.uint8) for m in (1000, 3, 65536, 777)]
    state = ck.ADLER_INIT
    P = 65536
    for c in chunks:
        buf = np.zeros(P, dtype=np.uint8)
        buf[: len(c)] = c
        s1, s2 = ck.adler32_parts_device(jnp.asarray(buf), jnp.int32(len(c)))
        state = ck.adler32_combine(state, int(s1), int(s2), len(c))
    expected = zlib.adler32(b"".join(c.tobytes() for c in chunks))
    assert ck.adler32_value(state) == expected


@pytest.mark.parametrize("n", [0, 1, 4, 255, 256, 1000, 65536])
def test_crc32_device(n):
    rng = np.random.default_rng(n + 100)
    data = rng.integers(0, 256, size=n, dtype=np.uint8)
    P = 65536
    buf = np.zeros(P, dtype=np.uint8)
    buf[:n] = data
    raw = int(ck.crc32_raw_device(jnp.asarray(buf), jnp.int32(n)))
    assert ck.crc32_from_raw(raw, n) == zlib.crc32(data.tobytes())


def test_crc32_combine_stream():
    rng = np.random.default_rng(42)
    chunks = [rng.integers(0, 256, size=m, dtype=np.uint8) for m in (5, 65536, 12345, 1)]
    raw_total = 0
    total_len = 0
    P = 65536
    for c in chunks:
        buf = np.zeros(P, dtype=np.uint8)
        buf[: len(c)] = c
        raw = int(ck.crc32_raw_device(jnp.asarray(buf), jnp.int32(len(c))))
        raw_total = ck.crc32_combine_raw(raw_total, raw, len(c))
        total_len += len(c)
    expected = zlib.crc32(b"".join(c.tobytes() for c in chunks))
    assert ck.crc32_from_raw(raw_total, total_len) == expected


def test_pack_fields_bigint_oracle():
    """pack_fields vs an arbitrary-precision bit-concatenation oracle.

    Regression coverage for the straddle-carry fold: includes streams whose
    final field straddles into a word with no field start (the non-final
    chunk sync-marker shape that corrupted the carry before the sentinel
    field), plus zero-width fields sprinkled mid-stream.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deflate_rs_tpu.ops.bitpack import pack_fields

    rng = np.random.default_rng(42)
    F, NW = 96, 80
    f = jax.jit(lambda v, n: pack_fields(v, n, NW))
    for trial in range(40):
        nb = rng.integers(0, 33, F).astype(np.int32)
        if trial % 3 == 0:
            nb[-1] = 0  # encoder-style trailing zero-width run
        if trial % 4 == 1:
            nb[-1] = 16  # tail field that can straddle into a start-free word
        if trial % 5 == 0:
            nb[rng.integers(0, F, 8)] = 0
        while nb.sum() > (NW - 1) * 32:
            nb[rng.integers(0, F)] = 0
        vals = rng.integers(0, 1 << 32, F, dtype=np.uint64).astype(np.uint32)

        big = 0
        off = 0
        for v, n in zip(vals, nb):
            big |= (int(v) & ((1 << int(n)) - 1)) << off
            off += int(n)
        want = np.array([(big >> (32 * w)) & 0xFFFFFFFF for w in range(NW)], np.uint32)

        words, tb = f(jnp.asarray(vals), jnp.asarray(nb))
        assert int(tb) == off
        np.testing.assert_array_equal(np.asarray(words), want)
