"""Batched one-shot compression for large corpora.

The plain one-shot API (models/deflate.py) encodes chunk-by-chunk, which is
dispatch-bound for large inputs.  This path stages many 64 KiB chunks at
once, runs the vmapped encoder (one device program per batch), assembles with
the native runtime, and combines checksum partials — the single-chip version
of the sharded pipeline in parallel/sharded.py and the engine behind
bench.py's headline number.
"""

from __future__ import annotations

import numpy as np

from .. import constants as C
from ..compression_options import Compression, CompressionOptions
from ..models.assembly import BitAssembler, splice_encoded_chunk
from ..models.deflate import FULL_EMIT, StreamResult, _resolve
from ..models.gzip_header import GzBuilder
from ..ops.chunk_encode import HALO, PAD, get_batch_encoder
from ..runtime import native


def compress_corpus(
    data: bytes,
    options: CompressionOptions | Compression | None = None,
    *,
    batch_size: int = 16,
    packed: bool = True,
) -> StreamResult:
    """Compress ``data`` as one DEFLATE stream using batched device encodes.

    ``packed`` bit-splices blocks marker-free on the host (identical output
    to ``models.deflate.compress_stream``); ``packed=False`` keeps every
    chunk byte-aligned behind a sync marker (the device-assembly framing).
    """
    options = _resolve(options or CompressionOptions.default())
    n = len(data)
    E = FULL_EMIT
    # Host-side native checksums (see compress_stream); skip the device ones.
    encoder = get_batch_encoder(options, E, with_checksums=False)

    offsets = list(range(0, n, E)) if n else [0]
    arr = np.frombuffer(data, np.uint8) if n else np.zeros(0, np.uint8)

    pieces = []
    nbytes_all = []
    asm = BitAssembler(n + n // 128 + 4096) if packed else None
    for base in range(0, len(offsets), batch_size):
        group = offsets[base : base + batch_size]
        B = len(group)
        bufs = np.zeros((B, HALO + E + PAD), np.uint8)
        hist = np.zeros(B, np.int32)
        ns = np.zeros(B, np.int32)
        lasts = np.zeros(B, bool)
        for i, off in enumerate(group):
            ln = min(n - off, E)
            h = min(off, HALO)
            if h:
                bufs[i, HALO - h : HALO] = arr[off - h : off]
            if ln:
                bufs[i, HALO : HALO + ln] = arr[off : off + ln]
            hist[i], ns[i], lasts[i] = h, ln, off + ln >= n
        out = encoder(bufs, hist, ns, lasts)
        words = np.asarray(out["words"]).view(np.uint8).reshape(B, -1)
        bits = np.asarray(out["total_bits"])
        btypes = np.asarray(out["btype"])
        dbits = np.asarray(out["data_bits"])
        for i, off in enumerate(group):
            if packed:
                splice_encoded_chunk(
                    asm, int(btypes[i]), int(dbits[i]), words[i],
                    data[off : off + int(ns[i])], bool(lasts[i]),
                )
            else:
                nbytes_all.append((int(bits[i]) + 7) // 8)
        if not packed:
            pieces.append(words)

    if packed:
        stream = asm.take_aligned()
    else:
        stream = native.assemble_chunks(
            np.concatenate(pieces, axis=0), np.asarray(nbytes_all, np.int64)
        )
    return StreamResult(
        deflate=stream,
        adler=native.adler32(data),
        crc32=native.crc32(data),
        isize=n % (1 << 32),
    )


def compress_corpus_zlib(data: bytes, options=None, *, batch_size: int = 16) -> bytes:
    res = compress_corpus(data, options, batch_size=batch_size)
    return C.zlib_header() + res.deflate + res.adler.to_bytes(4, "big")


def compress_corpus_gzip(
    data: bytes, options=None, *, builder: GzBuilder | None = None, batch_size: int = 16
) -> bytes:
    res = compress_corpus(data, options, batch_size=batch_size)
    return (
        (builder or GzBuilder()).header_bytes()
        + res.deflate
        + res.crc32.to_bytes(4, "little")
        + res.isize.to_bytes(4, "little")
    )
