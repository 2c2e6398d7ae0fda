"""Multi-device sharded encoding on the 8-way virtual CPU mesh.

The "multi-node without a real cluster" strategy from SURVEY.md §4: an 8-device
mesh via --xla_force_host_platform_device_count, exercising the real
collectives (all_gather of sizes, psum assembly) end to end, with the stream
validated against the single-device one-shot output and stdlib zlib.
"""

import os
import zlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import deflate_rs_tpu as dt
from deflate_rs_tpu import CompressionOptions
from deflate_rs_tpu.ops import checksum as ck
from deflate_rs_tpu.ops.chunk_encode import HALO, PAD
from deflate_rs_tpu.parallel.mesh import make_mesh
from deflate_rs_tpu.parallel.sharded import assemble_host, make_sharded_encoder

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
EMIT = 4096  # small tier: keeps the 8-device CPU test fast


def build_batch(data: bytes, emit: int):
    n = len(data)
    offsets = list(range(0, max(n, 1), emit))
    B = len(offsets)
    bufs = np.zeros((B, HALO + emit + PAD), np.uint8)
    hist = np.zeros(B, np.int32)
    ns = np.zeros(B, np.int32)
    lasts = np.zeros(B, bool)
    for i, off in enumerate(offsets):
        ln = min(n - off, emit)
        h = min(off, HALO)
        if h:
            bufs[i, HALO - h : HALO] = np.frombuffer(data, np.uint8, h, off - h)
        if ln:
            bufs[i, HALO : HALO + ln] = np.frombuffer(data, np.uint8, ln, off)
        hist[i], ns[i], lasts[i] = h, ln, off + ln >= n
    return bufs, hist, ns, lasts


def pad_to_multiple(arrs, m):
    B = arrs[0].shape[0]
    padB = (-B) % m
    if padB == 0:
        return arrs, B
    out = []
    for a in arrs:
        pad_shape = (padB,) + a.shape[1:]
        out.append(np.concatenate([a, np.zeros(pad_shape, a.dtype)]))
    return out, B


def test_sharded_matches_oneshot():
    with open(os.path.join(DATA_DIR, "pg11.txt"), "rb") as f:
        data = f.read()[:100_000]

    mesh = make_mesh(8)
    opts = CompressionOptions.default()
    step = make_sharded_encoder(mesh, opts, EMIT)

    (bufs, hist, ns, lasts), B = pad_to_multiple(build_batch(data, EMIT), 8)
    # Padded chunks are empty non-last chunks: they emit only a sync marker,
    # so mark them non-last and drop their bytes afterwards.
    stream, nbytes, offsets, s1, s2, crc = step(bufs, hist, ns, lasts)

    nbytes = np.asarray(nbytes)
    offsets = np.asarray(offsets)
    raw = np.asarray(stream)
    pieces = [raw[offsets[i] : offsets[i] + nbytes[i]].tobytes() for i in range(B)]
    out = b"".join(pieces)

    # Reference: one-shot single-device encode with the same chunk grid.
    from deflate_rs_tpu.models import deflate as d

    orig_full, orig_small = d.FULL_EMIT, d.SMALL_EMIT
    try:
        d.FULL_EMIT, d.SMALL_EMIT = EMIT, 0
        expected = dt.deflate_bytes(data)
    finally:
        d.FULL_EMIT, d.SMALL_EMIT = orig_full, orig_small

    assert zlib.decompress(out, wbits=-15) == data
    assert out == expected

    # Checksum partials combine to the stdlib values.
    adler = ck.ADLER_INIT
    crc_raw = 0
    for i in range(B):
        ln = int(ns[i])
        adler = ck.adler32_combine(adler, int(s1[i]), int(s2[i]), ln)
        crc_raw = ck.crc32_combine_raw(crc_raw, int(crc[i]), ln)
    assert ck.adler32_value(adler) == zlib.adler32(data)
    assert ck.crc32_from_raw(crc_raw, len(data)) == zlib.crc32(data)


def test_sharded_stream_is_contiguous():
    """Offsets from the collective scan must tile the stream exactly."""
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 40_000, dtype=np.uint8).tobytes()
    mesh = make_mesh(8)
    step = make_sharded_encoder(mesh, CompressionOptions.fast(), EMIT)
    (bufs, hist, ns, lasts), B = pad_to_multiple(build_batch(data, EMIT), 8)
    stream, nbytes, offsets, *_ = step(bufs, hist, ns, lasts)
    nbytes, offsets = np.asarray(nbytes), np.asarray(offsets)
    assert offsets[0] == 0
    np.testing.assert_array_equal(offsets[1:], (offsets + nbytes)[:-1])
    out = assemble_host(stream, nbytes, offsets)
    assert zlib.decompress(out, wbits=-15) == data
