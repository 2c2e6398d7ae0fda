"""Streaming encoder writers: DeflateEncoder / ZlibEncoder / GzEncoder.

Counterpart of the reference's ``write`` module (writer.rs:89/183/331) with the
same surface: ``write`` / ``flush`` (sync flush) / ``finish`` / ``reset``, plus
Python context-manager support.  Bytes are buffered until a full chunk (64 KiB)
*plus one byte* is available — the extra byte guarantees a chunk is only
encoded as non-final when data provably follows it, which makes streaming
output byte-identical to one-shot output for any write split
(the chunk-determinism invariant, lib.rs:408-433).  Consecutive chunks are
bit-spliced (models/assembly.py): sync markers appear only on explicit
``flush()``, exactly the reference's framing.

``flush()`` compresses everything buffered and ends byte-aligned with the
empty-stored-block sync marker ``00 00 FF FF`` (compress.rs:257-262); writing
can continue afterwards with full match history retained across the flush.
"""

from __future__ import annotations

import numpy as np

from .. import constants as C
from ..compression_options import Compression, CompressionOptions
from ..ops.chunk_encode import HALO, PAD, get_chunk_encoder
from ..ops.compaction import used_words_host
from ..runtime import native
from ..utils.debug import ByteAccountant, enabled as debug_enabled
from .assembly import BitAssembler, splice_encoded_chunk
from . import deflate as _deflate  # chunk sizes read at CALL time (see feed)
from .deflate import _resolve
from .gzip_header import GzBuilder

# An empty final fixed block: 3-bit header 0b011 + 7-bit EOB code 0 (10 bits,
# spliced at any phase by the assembler).  The sync-flush marker has a single
# source of truth: BitAssembler.append_sync_marker (it is phase-dependent).
FINAL_EMPTY_BLOCK = b"\x03\x00"


# How many consecutive zero-byte writes _drain tolerates before raising
# (the analogue of std::io::ErrorKind::WriteZero; reference issue #47 class,
# tests/test.rs:163-200 — a throttled writer must not spin forever).
MAX_ZERO_WRITES = 16


class _DeflateCore:
    """Shared chunked-compression state machine."""

    def __init__(self, options: CompressionOptions):
        self.options = options
        self.reset_state()

    def reset_state(self):
        self.pending = bytearray()
        self.history = b""
        self.total_in = 0
        self.started = False  # any chunk emitted yet?
        # Device-resident copy of the last HALO history bytes, carried
        # between BATCHED encodes so consecutive feed() calls skip the
        # 32 KiB history re-upload.  None = stale (a host-path _encode ran,
        # or nothing encoded yet); the next batched encode re-uploads from
        # self.history.
        self._tail_dev = None
        # Running checksums over consumed bytes, updated incrementally on the
        # host (native C, runtime/native.py) — the device partial-combine
        # identities remain available for the sharded pipeline.
        self.adler_v = 1
        self.crc_v = 0
        # Persistent bit-phase assembler: consecutive chunks are spliced at
        # arbitrary bit phase (no per-chunk sync markers), so streaming output
        # is byte-identical to the one-shot packed stream.  The partial tail
        # byte lives here between write() calls.
        self.asm = BitAssembler(_deflate.FULL_EMIT + (_deflate.FULL_EMIT >> 3) + 4096)
        self.accountant = ByteAccountant() if debug_enabled() else None

    def _encode(self, payload: bytes, is_last: bool) -> None:
        """Encode one chunk and splice it into the assembler."""
        SMALL_EMIT, FULL_EMIT = _deflate.SMALL_EMIT, _deflate.FULL_EMIT
        emit = SMALL_EMIT if (not self.started and not payload[SMALL_EMIT:] and is_last) else FULL_EMIT
        encoder = get_chunk_encoder(self.options, emit, with_checksums=False)
        buf = np.zeros(HALO + emit + PAD, dtype=np.uint8)
        hist = self.history[-HALO:]
        if hist:
            buf[HALO - len(hist) : HALO] = np.frombuffer(hist, np.uint8)
        if payload:
            buf[HALO : HALO + len(payload)] = np.frombuffer(payload, np.uint8)
        out = encoder(buf, np.int32(len(hist)), np.int32(len(payload)), np.bool_(is_last))
        nbytes = (int(out["total_bits"]) + 7) // 8
        if nbytes > out["words"].size * 4:
            raise RuntimeError(
                f"encoder overflow: {nbytes} B exceeds the {out['words'].size * 4} B "
                "word buffer (bug — buffer is sized for the worst legal output)"
            )
        emitted = splice_encoded_chunk(
            self.asm, int(out["btype"]), int(out["data_bits"]), out["words"],
            payload, is_last,
        )
        if self.accountant is not None:
            self.accountant.account_chunk(len(payload), emitted, is_last)
        self.history = (self.history + payload)[-HALO:]
        self._tail_dev = None  # device tail no longer matches self.history
        self.started = True

    # Batched-dispatch group sizes, largest first.  Each size is one compiled
    # program shape (shared with parallel/corpus.py's flat encoder cache);
    # a backlog of complete chunks is consumed greedily: 13 -> 8 + 4 + 1.
    _GROUP_LADDER = (16, 8, 4, 2, 1)

    def _encode_batch(self, nfull: int, E: int) -> None:
        """Encode ``nfull`` complete chunks from the backlog in vmapped
        device dispatches (the corpus engine's flat-upload encoder), splicing
        in order.  One large write() thus pays a handful of batched device
        programs instead of ``nfull`` synchronous single-chunk round trips
        (the round-2 streaming path was 4x slower than the corpus engine on
        the same chip for exactly that reason).

        All dispatches are issued before any result is fetched: JAX dispatch
        is asynchronous and device execution is FIFO, so the host's fetch +
        bit-splice of group i overlaps the device encode of groups i+1..
        """
        import jax

        from ..parallel.corpus import _corpus_encoder_flat

        inflight = []
        hist0 = len(self.history)
        done = 0
        while done < nfull:
            rest = nfull - done
            g = next(s for s in self._GROUP_LADDER if s <= rest)
            payload = bytes(self.pending[: g * E])
            del self.pending[: g * E]
            hist = np.full(g, HALO, np.int32)  # E >= HALO: full history after chunk 0
            hist[0] = min(hist0 + done * E, HALO)
            ns = np.full(g, E, np.int32)
            lasts = np.zeros(g, bool)
            if self._tail_dev is None:
                tail = np.zeros(HALO, np.uint8)
                h = self.history[-HALO:]
                if h:
                    tail[HALO - len(h):] = np.frombuffer(h, np.uint8)
                self._tail_dev = jax.device_put(tail)
            enc = _corpus_encoder_flat(self.options, E, g)
            meta_d, head_d, rest_d, self._tail_dev = enc(
                jax.device_put(np.frombuffer(payload, np.uint8)),
                self._tail_dev, hist, ns, lasts,
            )
            inflight.append((g, payload, meta_d, head_d, rest_d))
            self.history = payload[-HALO:]
            done += g
        for g, payload, meta_d, head_d, rest_d in inflight:
            meta = np.asarray(meta_d)  # (3, g) — the synchronizing fetch
            # Used-word rule: ops/compaction.py, the one shared definition of
            # the device-side packing and the host-side read.
            used = used_words_host(meta[1], meta[2])
            need = int(used.sum())
            words = np.asarray(head_d)
            if need > words.shape[0]:
                words = np.concatenate([words, np.asarray(rest_d)])
            woff = np.cumsum(used) - used
            bwords = words.view(np.uint8)
            for i in range(g):
                stored = int(meta[1, i]) == C.BTYPE_STORED
                emitted = splice_encoded_chunk(
                    self.asm, int(meta[1, i]), int(meta[2, i]),
                    bwords[4 * woff[i]: 4 * (woff[i] + used[i])],
                    payload[i * E: (i + 1) * E] if stored else b"", False,
                )
                if self.accountant is not None:
                    self.accountant.account_chunk(E, emitted, False)
        self.started = True

    def feed(self, data) -> list[bytes]:
        """Buffer input; emit compressed bytes for every complete chunk."""
        data = bytes(data)
        self.pending += data
        # Checksums cover bytes the moment write() accepts them — the
        # reference's semantics (writer.rs:258-265 checksums &buf[..n] with
        # n = write's return), observable via the checksum() accessor before
        # a chunk boundary is reached.
        self.adler_v = native.adler32(data, self.adler_v)
        self.crc_v = native.crc32(data, self.crc_v)
        self.total_in += len(data)
        if self.accountant is not None:
            self.accountant.consume(len(data))
        # Complete chunks ready to encode, always holding one byte back: a
        # chunk is encoded as non-final only when data provably follows it
        # (the chunk-determinism invariant).  FULL_EMIT is read at call time
        # (not bound at import) so a chunk-size change or test monkeypatch
        # keeps streaming and one-shot output in lockstep.
        E = _deflate.FULL_EMIT
        nfull = (len(self.pending) - 1) // E if self.pending else 0
        if nfull >= 2 and E >= HALO:
            self._encode_batch(nfull, E)
        else:
            while len(self.pending) > E:
                payload = bytes(self.pending[:E])
                del self.pending[:E]
                self._encode(payload, is_last=False)
        return [self.asm.drain_whole_bytes()]

    def sync_flush(self) -> list[bytes]:
        if self.pending:
            payload = bytes(self.pending)
            self.pending.clear()
            self._encode(payload, is_last=False)
        self.started = True  # a bare marker still yields a resumable stream
        # Empty stored block at the current phase: byte-aligns the stream
        # (compress.rs:257-262), leaving the assembler with no partial byte.
        self.asm.append_sync_marker()
        return [self.asm.drain_whole_bytes()]

    def finish_stream(self) -> list[bytes]:
        payload = bytes(self.pending)
        self.pending.clear()
        if payload or not self.started:
            self._encode(payload, is_last=True)
        else:
            # Data already emitted as non-final chunks: close with an empty
            # final fixed block at the current bit phase (header 0b011 +
            # 7-bit EOB code 0).
            self.asm.append(FINAL_EMPTY_BLOCK, 10)
        if self.accountant is not None:
            self.accountant.reconcile()
        return [self.asm.take_aligned_drain()]


class DeflateEncoder:
    """Raw-DEFLATE streaming encoder (writer.rs:89)."""

    _wrap = "raw"

    def __init__(self, writer, options: CompressionOptions | Compression | None = None):
        self._writer = writer
        self._core = _DeflateCore(_resolve(options or CompressionOptions.default()))
        self._finished = False
        self._header_written = False
        # Bytes accepted by the encoder but not yet accepted by the wrapped
        # writer.  A failed write leaves the remainder here, so a retried
        # flush()/finish() resumes exactly where the writer stopped — in
        # particular the gzip trailer can never be half-emitted and then
        # lost (writer.rs:409-426 buffers it for the same reason).
        self._outbuf = bytearray()

    # -- framing hooks ----------------------------------------------------

    def _header(self) -> bytes:
        return b""

    def _trailer(self) -> bytes:
        return b""

    # -- io.Write surface -------------------------------------------------

    def _drain(self):
        """Write everything in _outbuf, tolerating partial writes
        (compress_until_done, writer.rs:15-58).  A writer that repeatedly
        reports zero progress raises instead of looping forever (the
        WriteZero analogue; reference issue #47 class, tests/test.rs:163)."""
        zero_streak = 0
        while self._outbuf:
            written = self._writer.write(memoryview(self._outbuf))
            if written is None:
                # Only RawIOBase returns None, and there it means NOTHING
                # was accepted (non-blocking backpressure) — never "all of
                # it" (BufferedIOBase raises BlockingIOError instead of
                # returning None).  Treating it as complete would silently
                # drop the compressed tail.
                written = 0
            if written == 0:
                zero_streak += 1
                if zero_streak >= MAX_ZERO_WRITES:
                    raise OSError("writer made no progress (wrote 0 bytes repeatedly)")
                continue
            zero_streak = 0
            del self._outbuf[:written]

    def _emit(self, pieces):
        if not self._header_written:
            self._outbuf += self._header()
            self._header_written = True
        for p in pieces:
            self._outbuf += p
        self._drain()

    def write(self, data) -> int:
        if self._finished:
            raise ValueError("write after finish()")
        self._emit(self._core.feed(data))
        return len(data)

    def flush(self):
        """Sync flush: compress all buffered input, end byte-aligned with the
        00 00 FF FF marker, and flush the wrapped writer."""
        if self._finished:
            return
        self._emit(self._core.sync_flush())
        if hasattr(self._writer, "flush"):
            self._writer.flush()

    def finish(self):
        """Terminate the stream (BFINAL + trailer); returns the inner writer.

        If the wrapped writer fails mid-write, the unwritten tail (including
        the trailer) stays buffered and a subsequent finish() retries it."""
        if not self._finished:
            # Stage final block + trailer fully before touching the writer so
            # a write failure can be retried without re-consuming core state.
            if not self._header_written:
                self._outbuf += self._header()
                self._header_written = True
            for p in self._core.finish_stream():
                self._outbuf += p
            self._outbuf += self._trailer()
            self._finished = True
        self._drain()
        return self._writer

    def reset(self, writer):
        """Start a fresh stream into ``writer``; returns the old writer.

        Matches the reference's reset semantics exactly: ``reset`` runs
        ``output_all`` first, which for the zlib/gzip encoders *includes* the
        trailer (writer.rs:205-214 — ZlibEncoder::output_all calls
        write_trailer; writer.rs:370-375 likewise for gzip), so the old
        writer holds a complete, valid stream.

        finish() is called unconditionally: if a previous finish() staged
        the final block + trailer but the writer failed mid-drain, the
        staged tail is still in the output buffer and must reach the OLD
        writer (retry) — otherwise it would corrupt the next stream."""
        self.finish()
        old, self._writer = self._writer, writer
        self._core.reset_state()
        self._finished = False
        self._header_written = False
        return old

    # -- conveniences ------------------------------------------------------

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self.finish()
        return False

    def __del__(self):
        """Best-effort finish on drop, like the reference's Drop impl
        (writer.rs:139-152: output_all unless already panicking).  Errors
        are swallowed — an unfinished encoder being collected must never
        raise; call finish() explicitly to observe failures.  Skipped while
        an exception is propagating (the ``thread::panicking()`` analogue):
        an encoder abandoned during unwinding must not write a compressed
        tail into a writer the error handler may be repurposing."""
        try:
            import sys  # inside try: fails (harmlessly) at interpreter teardown
            if sys.exc_info()[0] is not None or sys.is_finalizing():
                # Active exception: the panicking-guard analogue.  Interpreter
                # shutdown: a device encode from a finalizer could hang.
                return
            if getattr(self, "_finished", True) is False:
                # Like the reference's Drop, a never-written encoder still
                # emits a valid EMPTY stream (header + final block + trailer).
                self.finish()
        except Exception:
            pass


class ZlibEncoder(DeflateEncoder):
    """zlib-framed streaming encoder (writer.rs:183).

    The Adler-32 trailer covers exactly the bytes consumed, tracked from the
    device checksum partials (writer.rs:253-267 semantics).
    """

    def _header(self) -> bytes:
        return C.zlib_header()

    def checksum(self) -> int:
        """Running Adler-32 over the bytes consumed so far (writer.rs:248)."""
        return self._core.adler_v

    def _trailer(self) -> bytes:
        return self._core.adler_v.to_bytes(4, "big")


class GzEncoder(DeflateEncoder):
    """gzip-framed streaming encoder (writer.rs:331), with builder support."""

    def __init__(self, writer, options=None, builder: GzBuilder | None = None):
        super().__init__(writer, options)
        self._builder = builder or GzBuilder()

    def _header(self) -> bytes:
        return self._builder.header_bytes()

    def reset(self, writer):
        """Reset to a fresh stream with a *blank* gzip header, matching the
        reference (writer.rs:394-399: ``self.header = GzBuilder::new()``)."""
        old = super().reset(writer)
        self._builder = GzBuilder()
        return old

    def reset_with_builder(self, writer, builder: GzBuilder):
        """Reset using ``builder`` for the next stream's header
        (writer.rs:401-407)."""
        old = super().reset(writer)
        self._builder = builder
        return old

    def checksum(self) -> int:
        """Running CRC-32 over the bytes consumed so far (writer.rs:429)."""
        return self._core.crc_v

    def _trailer(self) -> bytes:
        return self._core.crc_v.to_bytes(4, "little") + (
            self._core.total_in % (1 << 32)
        ).to_bytes(4, "little")
