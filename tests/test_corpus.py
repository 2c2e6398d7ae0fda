"""Batched corpus API: identical output to the chunk-by-chunk one-shot."""

import os
import zlib

import numpy as np

import deflate_rs_tpu as dt
from deflate_rs_tpu.parallel.corpus import (
    compress_corpus_gzip,
    compress_corpus_zlib,
)

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def test_corpus_matches_oneshot():
    with open(os.path.join(DATA_DIR, "pg11.txt"), "rb") as f:
        data = f.read()
    # Mix in binary so multiple block types appear across the batch.
    rng = np.random.default_rng(0)
    data = data + rng.integers(0, 256, 80_000, dtype=np.uint8).tobytes() + data[:50_000]

    z = compress_corpus_zlib(data, batch_size=3)
    assert zlib.decompress(z) == data
    assert z == dt.deflate_bytes_zlib(data)

    import gzip as _gz

    g = compress_corpus_gzip(data, batch_size=5)
    assert _gz.decompress(g) == data


def test_corpus_empty_and_small():
    assert zlib.decompress(compress_corpus_zlib(b"")) == b""
    assert zlib.decompress(compress_corpus_zlib(b"hi")) == b"hi"


def test_corpus_large_chunks():
    """256 KiB device chunks: valid stream, ratio no worse than 64 KiB."""
    from deflate_rs_tpu.parallel.corpus import compress_corpus

    with open(os.path.join(DATA_DIR, "pg11.txt"), "rb") as f:
        text = f.read()
    data = (text * 4)[:600_000]

    big = compress_corpus(data, batch_size=2, chunk_size=262_144)
    assert zlib.decompress(big.deflate, wbits=-15) == data
    assert big.adler == zlib.adler32(data)

    small = compress_corpus(data, batch_size=2)
    # Fewer seams and the same window limit: larger chunks never cost ratio
    # beyond the removed per-chunk framing (allow a few bytes of noise).
    assert len(big.deflate) <= len(small.deflate) + 64
