"""Streaming writer tests: chunk determinism, sync flush, reset, framing.

Mirrors the reference's writer tests: chunked-write determinism for many
split sizes (lib.rs:408-433), sync-flush marker (writer.rs:571-595), reset
determinism (writer.rs:539-568), flush-then-write (#26, test.rs:114-136),
zeros through the writer (#18, writer.rs:599-609).
"""

import io
import os
import zlib

import pytest

import deflate_rs_tpu as dt
from deflate_rs_tpu import CompressionOptions
from deflate_rs_tpu.write import DeflateEncoder, GzEncoder, ZlibEncoder

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def pg11():
    with open(os.path.join(DATA_DIR, "pg11.txt"), "rb") as f:
        return f.read()


def stream_compress(data, chunk_size, cls=DeflateEncoder, **kw):
    sink = io.BytesIO()
    enc = cls(sink, **kw)
    for off in range(0, len(data), chunk_size):
        assert enc.write(data[off : off + chunk_size]) == len(data[off : off + chunk_size])
    enc.finish()
    return sink.getvalue()


# Includes the reference's own split list (lib.rs:408-433): 50, 400, 32768,
# BUFFER_SIZE == 2*32768+258 == 65794, 50000.
@pytest.mark.parametrize(
    "chunk_size",
    [50, 400, 1_000, 32_768, 50_000, 65_536, 65_537, 65_794, 131_072, 500_000],
)
def test_chunk_determinism(pg11, chunk_size):
    """Streaming output must be byte-identical to one-shot (lib.rs:408-433)."""
    one_shot = dt.deflate_bytes(pg11)
    streamed = stream_compress(pg11, chunk_size)
    assert streamed == one_shot


def test_chunk_determinism_tiny_writes(pg11):
    data = pg11[:3000]
    one_shot = dt.deflate_bytes(data)
    assert stream_compress(data, 1) == one_shot
    assert stream_compress(data, 7) == one_shot


def test_small_vs_full_tier_identical(pg11):
    """The small-input pipeline tier must produce the same bits as the full
    tier for the same logical chunk."""
    from deflate_rs_tpu.models import deflate as d

    data = pg11[:4000]
    small = dt.deflate_bytes(data)  # routed to the 4 KiB tier
    orig = d.SMALL_EMIT
    try:
        d.SMALL_EMIT = 0  # force full tier
        full = dt.deflate_bytes(data)
    finally:
        d.SMALL_EMIT = orig
    assert small == full


def test_zlib_streaming(pg11):
    out = stream_compress(pg11, 50_000, cls=ZlibEncoder)
    assert zlib.decompress(out) == pg11
    assert out == dt.deflate_bytes_zlib(pg11)


def test_gzip_streaming(pg11):
    import gzip as _gz

    out = stream_compress(pg11, 50_000, cls=GzEncoder)
    assert _gz.decompress(out) == pg11


def test_sync_flush_marker(pg11):
    """flush() ends byte-aligned with 00 00 FF FF (writer.rs:571-595)."""
    sink = io.BytesIO()
    enc = ZlibEncoder(sink)
    enc.write(pg11[:10_000])
    enc.flush()
    flushed = sink.getvalue()
    assert flushed[-4:] == b"\x00\x00\xff\xff"
    # A decompressor must fully recover the flushed data right now.
    d = zlib.decompressobj()
    assert d.decompress(flushed) == pg11[:10_000]

    enc.write(pg11[10_000:20_000])
    enc.finish()
    assert zlib.decompress(sink.getvalue()) == pg11[:20_000]


def test_flush_then_write(pg11):
    """Issue #26 pattern: interleave flushes and writes (test.rs:114-136)."""
    sink = io.BytesIO()
    enc = DeflateEncoder(sink)
    for i in range(5):
        enc.write(pg11[i * 7000 : (i + 1) * 7000])
        enc.flush()
    enc.finish()
    assert zlib.decompress(sink.getvalue(), wbits=-15) == pg11[:35_000]


def test_flush_empty_then_finish():
    sink = io.BytesIO()
    enc = ZlibEncoder(sink)
    enc.flush()
    enc.write(b"hello")
    enc.finish()
    assert zlib.decompress(sink.getvalue()) == b"hello"


def test_finish_empty():
    for cls in (DeflateEncoder, ZlibEncoder, GzEncoder):
        sink = io.BytesIO()
        cls(sink).finish()
        out = sink.getvalue()
        if cls is DeflateEncoder:
            assert zlib.decompress(out, wbits=-15) == b""
        elif cls is ZlibEncoder:
            assert zlib.decompress(out) == b""
        else:
            import gzip as _gz

            assert _gz.decompress(out) == b""


def test_reset_determinism(pg11):
    """reset() must produce identical fresh streams (writer.rs:539-568)."""
    data = pg11[:30_000]
    sink1 = io.BytesIO()
    enc = ZlibEncoder(sink1)
    enc.write(data)
    enc.finish()
    sink2 = io.BytesIO()
    old = enc.reset(sink2)
    assert old is sink1
    enc.write(data)
    enc.finish()
    assert sink1.getvalue() == sink2.getvalue()
    assert zlib.decompress(sink2.getvalue()) == data


def test_write_after_finish_raises():
    enc = DeflateEncoder(io.BytesIO())
    enc.finish()
    with pytest.raises(ValueError):
        enc.write(b"x")


def test_zeros_through_writer():
    """61,000 zeros via the writer (#18, writer.rs:599-609)."""
    data = b"\x00" * 61_000
    out = stream_compress(data, 10_000, cls=ZlibEncoder, options=CompressionOptions.rle())
    assert zlib.decompress(out) == data


class ShortWriter:
    """Partial-write fault injection (the reference's SmallWriter mock,
    test.rs:175-199)."""

    def __init__(self):
        self.buf = bytearray()

    def write(self, b):
        b = bytes(b)[:3]  # accept at most 3 bytes per call
        self.buf += b
        return len(b)

    def flush(self):
        pass


def test_short_writes(pg11):
    data = pg11[:20_000]
    w = ShortWriter()
    enc = ZlibEncoder(w)
    enc.write(data)
    enc.finish()
    assert bytes(w.buf) == dt.deflate_bytes_zlib(data)


def test_context_manager(pg11):
    sink = io.BytesIO()
    with ZlibEncoder(sink) as enc:
        enc.write(pg11[:1000])
    assert zlib.decompress(sink.getvalue()) == pg11[:1000]


class ZeroWriter:
    """A writer that never makes progress (reference issue #47 class)."""

    def write(self, b):
        return 0


def test_zero_progress_writer_raises(pg11):
    """_write_all must raise instead of spinning forever on a writer that
    reports 0 bytes written (WriteZero analogue, test.rs:163-200)."""
    enc = ZlibEncoder(ZeroWriter())
    with pytest.raises(OSError):
        enc.write(pg11[:200_000])  # > one chunk so bytes must be emitted


class StutterWriter:
    """Zero progress a few times, then accepts bytes (must NOT raise)."""

    def __init__(self):
        self.buf = bytearray()
        self._stall = 0

    def write(self, b):
        self._stall += 1
        if self._stall % 4 != 0:
            return 0
        b = bytes(b)[:7]
        self.buf += b
        return len(b)

    def flush(self):
        pass


def test_stuttering_writer_completes(pg11):
    data = pg11[:20_000]
    w = StutterWriter()
    enc = ZlibEncoder(w)
    enc.write(data)
    enc.finish()
    assert bytes(w.buf) == dt.deflate_bytes_zlib(data)


def test_running_checksum_accessor(pg11):
    """ZlibEncoder.checksum() / GzEncoder.checksum() expose the running
    checksum over consumed bytes (writer.rs:248, writer.rs:429)."""
    import io
    import zlib as _z

    enc = ZlibEncoder(io.BytesIO())
    assert enc.checksum() == 1  # Adler-32 of the empty string
    enc.write(pg11[:10_000])
    assert enc.checksum() == _z.adler32(pg11[:10_000])
    enc.write(pg11[10_000:30_000])
    assert enc.checksum() == _z.adler32(pg11[:30_000])
    enc.finish()

    g = GzEncoder(io.BytesIO())
    assert g.checksum() == 0
    g.write(pg11[:7_000])
    assert g.checksum() == _z.crc32(pg11[:7_000])
    g.finish()


def test_reset_after_failed_finish_drains_to_old_writer(pg11):
    """If finish() staged the trailer but the writer failed mid-drain,
    reset() must retry the drain into the OLD writer — never leak the stale
    tail into the next stream."""

    class FlakyWriter:
        def __init__(self):
            self.buf = bytearray()
            self.fail = False

        def write(self, b):
            if self.fail:
                raise OSError("disk full")
            self.buf += bytes(b)
            return len(b)

    w1 = FlakyWriter()
    enc = ZlibEncoder(w1)
    enc.write(pg11[:50_000])
    w1.fail = True
    with pytest.raises(OSError):
        enc.finish()
    w1.fail = False

    w2 = FlakyWriter()
    old = enc.reset(w2)
    assert old is w1
    # Old writer got the complete first stream on the retry...
    assert zlib.decompress(bytes(w1.buf)) == pg11[:50_000]
    # ...and the new stream is clean.
    enc.write(pg11[:10_000])
    enc.finish()
    assert zlib.decompress(bytes(w2.buf)) == pg11[:10_000]


def test_drop_skipped_during_exception_unwind(pg11):
    """Finalizing an encoder while an exception is active must not write to
    the (possibly repurposed) writer — the analogue of the reference's
    thread::panicking() guard (writer.rs:148)."""
    sink = io.BytesIO()
    enc = ZlibEncoder(sink)
    enc.write(pg11[:90_000])
    before = sink.getvalue()
    try:
        raise RuntimeError("abort mid-stream")
    except RuntimeError:
        enc.__del__()  # finalizer with an active exception: must be a no-op
        assert sink.getvalue() == before
    enc.__del__()  # no active exception: best-effort finish completes it
    assert zlib.decompress(sink.getvalue()) == pg11[:90_000]


def test_drop_finishes_best_effort(pg11):
    """Dropping an unfinished encoder completes the stream best-effort,
    like the reference's Drop impl (writer.rs:139-152)."""
    import gc

    sink = io.BytesIO()
    enc = ZlibEncoder(sink)
    enc.write(pg11[:90_000])
    del enc
    gc.collect()
    assert zlib.decompress(sink.getvalue()) == pg11[:90_000]


def test_gz_reset_uses_blank_builder():
    """GzEncoder.reset must revert to a blank header (writer.rs:394-399);
    reset_with_builder installs the provided one (writer.rs:401-407)."""
    from deflate_rs_tpu.models.gzip_header import GzBuilder
    from deflate_rs_tpu.models.inflate import inflate_gzip

    s1, s2, s3 = io.BytesIO(), io.BytesIO(), io.BytesIO()
    enc = GzEncoder(s1, builder=GzBuilder().with_filename(b"a.txt"))
    enc.write(b"first")
    old = enc.reset(s2)
    assert old is s1
    enc.write(b"second")
    enc.reset_with_builder(s3, GzBuilder().with_comment(b"hello"))
    enc.write(b"third")
    enc.finish()

    assert inflate_gzip(s1.getvalue()) == b"first"
    assert b"a.txt" in s1.getvalue()
    assert inflate_gzip(s2.getvalue()) == b"second"
    assert b"a.txt" not in s2.getvalue()  # blank builder after reset
    assert inflate_gzip(s3.getvalue()) == b"third"
    assert b"hello" in s3.getvalue()
