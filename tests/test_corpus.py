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
