"""Host bit-assembly layer: packed (marker-free) stream splicing.

Covers models/assembly.py — the counterpart of the reference's one-shot
framing where consecutive DEFLATE blocks meet at arbitrary bit phase and
sync markers appear only on explicit flush (compress.rs:257-262).
"""

import io
import zlib

import numpy as np
import pytest

import deflate_rs_tpu as dt
from deflate_rs_tpu.models.assembly import BitAssembler
from deflate_rs_tpu.write import GzEncoder, ZlibEncoder


class PyBitSink:
    """Independent LSB-first bit accumulator (big-int oracle)."""

    def __init__(self):
        self.value = 0
        self.bits = 0

    def append(self, data: bytes, nbits: int):
        v = int.from_bytes(data, "little") & ((1 << nbits) - 1)
        self.value |= v << self.bits
        self.bits += nbits

    def align(self):
        self.bits = (self.bits + 7) & ~7

    def bytes(self):
        return self.value.to_bytes((self.bits + 7) // 8, "little")


def test_bit_append_matches_bigint_oracle():
    rng = np.random.default_rng(7)
    asm = BitAssembler(1 << 12)
    oracle = PyBitSink()
    for _ in range(300):
        nbits = int(rng.integers(1, 64))
        nbytes = (nbits + 7) // 8
        raw = rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes()
        v = int.from_bytes(raw, "little") & ((1 << nbits) - 1)
        data = v.to_bytes(nbytes, "little")
        asm.append(data, nbits)
        oracle.append(data, nbits)
        if rng.integers(0, 4) == 0:
            asm.align_byte()
            oracle.align()
    assert asm.take_aligned() == oracle.bytes()


def test_drain_keeps_partial_tail_byte():
    asm = BitAssembler(64)
    asm.append(b"\xff", 5)  # 5 one-bits
    asm.append(b"\x00\x00", 16)
    out = asm.drain_whole_bytes()
    assert len(out) == 2 and asm.bits == 5 % 8  # 21 bits -> 2 bytes + 5 bits
    asm.append(b"\x07", 3)  # completes the byte: 5 ones then 3 ones
    out2 = asm.drain_whole_bytes()
    assert out + out2 == b"\x1f\x00\xe0"
    assert asm.bits == 0


@pytest.mark.parametrize("phase", range(8))
def test_stored_reemission_structure_at_every_phase(phase):
    """append_stored_chunk must emit hdr + pad-to-byte + LEN/NLEN + payload
    correctly from any starting bit phase (stored_block.rs:13-40)."""
    payload = bytes(range(200))
    asm = BitAssembler(1 << 12)
    if phase:
        asm.append(bytes([(1 << phase) - 1]), phase)  # junk prefix bits
    asm.append_stored_chunk(payload, is_last=True)
    out = asm.take_aligned()
    v = int.from_bytes(out, "little")
    assert (v >> phase) & 7 == 0b001  # BFINAL=1, BTYPE=00 (LSB first)
    hdr_end = phase + 3
    pad = (-hdr_end) % 8
    assert (v >> hdr_end) & ((1 << pad) - 1) == 0  # zero alignment pad
    p = hdr_end + pad
    ln = (v >> p) & 0xFFFF
    nlen = (v >> (p + 16)) & 0xFFFF
    assert ln == len(payload) and nlen == (~ln & 0xFFFF)
    body = v >> (p + 32)
    got = body.to_bytes(len(out) - (p + 32) // 8, "little")[: len(payload)]
    assert got == payload


def test_stored_after_fixed_block_decodes():
    """Spec-level check: a stored chunk spliced at an odd byte phase (after a
    10-bit non-final fixed empty block) must decode."""
    payload = bytes(range(256)) * 5
    asm = BitAssembler(1 << 12)
    asm.append(b"\x02\x00", 10)  # non-final fixed block: hdr 010 + 7-bit EOB
    asm.append_stored_chunk(payload, is_last=True)
    out = asm.take_aligned()
    assert zlib.decompress(out, wbits=-15) == payload


def test_oneshot_has_no_sync_seams():
    with open("tests/data/pg11.txt", "rb") as f:
        data = f.read()
    out = dt.deflate_bytes(data)
    assert b"\x00\x00\xff\xff" not in out
    assert zlib.decompress(out, wbits=-15) == data


def test_packed_beats_aligned_framing():
    from deflate_rs_tpu.compression_options import CompressionOptions
    from deflate_rs_tpu.models.deflate import compress_stream

    with open("tests/data/pg11.txt", "rb") as f:
        data = f.read()
    opts = CompressionOptions.default()
    packed = compress_stream(data, opts, packed=True).deflate
    aligned = compress_stream(data, opts, packed=False).deflate
    assert zlib.decompress(packed, wbits=-15) == data
    assert zlib.decompress(aligned, wbits=-15) == data
    n_chunks = (len(data) + 65535) // 65536
    # Packed framing saves the ~5 B sync marker per non-final chunk.
    assert len(packed) <= len(aligned) - 4 * (n_chunks - 1)


class FailingWriter:
    """Accepts a few bytes then raises; later heals (trailer-retry fault)."""

    def __init__(self, fail_after: int):
        self.buf = bytearray()
        self.fail_after = fail_after
        self.healed = False

    def write(self, b):
        if not self.healed and len(self.buf) >= self.fail_after:
            raise OSError("disk full")
        b = bytes(b)[:16]
        self.buf += b
        return len(b)


def test_finish_retry_after_write_failure():
    """finish() must be retryable without corrupting or duplicating the
    trailer (the reference buffers the gzip trailer for the same reason,
    writer.rs:409-426)."""
    with open("tests/data/pg11.txt", "rb") as f:
        data = f.read()[:30_000]
    import gzip as _gz

    w = FailingWriter(fail_after=64)
    enc = GzEncoder(w)
    enc.write(data)
    with pytest.raises(OSError):
        enc.finish()
    w.healed = True
    enc.finish()  # retry: must resume, not restart
    assert _gz.decompress(bytes(w.buf)) == data


def test_flush_after_failed_write_keeps_stream_valid():
    with open("tests/data/pg11.txt", "rb") as f:
        data = f.read()[:100_000]
    w = FailingWriter(fail_after=1000)
    enc = ZlibEncoder(w)
    with pytest.raises(OSError):
        enc.write(data)
    w.healed = True
    enc.finish()
    assert zlib.decompress(bytes(w.buf)) == data
