"""Multi-device sharded encoding on the 8-way virtual CPU mesh.

The "multi-node without a real cluster" strategy from SURVEY.md §4: an 8-device
mesh via --xla_force_host_platform_device_count, exercising the real
collectives (all_gather of sizes + offset scan) end to end, with sharded
outputs assembled host-side and validated against the single-device one-shot
output and stdlib zlib.
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
    # Padded chunks are empty non-last chunks (sync marker only); their
    # bytes are dropped by assembling only the first B chunks.
    out_d = step(bufs, hist, ns, lasts)
    out = assemble_host(out_d, B)

    # Reference: one-shot single-device encode with the same chunk grid and
    # the same byte-aligned (sync-marker) framing the device assembly uses.
    from deflate_rs_tpu.models import deflate as d

    orig_full, orig_small = d.FULL_EMIT, d.SMALL_EMIT
    try:
        d.FULL_EMIT, d.SMALL_EMIT = EMIT, 0
        expected = d.compress_stream(
            data, CompressionOptions.default(), packed=False
        ).deflate
    finally:
        d.FULL_EMIT, d.SMALL_EMIT = orig_full, orig_small

    assert zlib.decompress(out, wbits=-15) == data
    assert out == expected

    # Checksum partials combine to the stdlib values.
    s1, s2, crc = np.asarray(out_d["s1"]), np.asarray(out_d["s2"]), np.asarray(out_d["crc_raw"])
    adler = ck.ADLER_INIT
    crc_raw = 0
    for i in range(B):
        ln = int(ns[i])
        adler = ck.adler32_combine(adler, int(s1[i]), int(s2[i]), ln)
        crc_raw = ck.crc32_combine_raw(crc_raw, int(crc[i]), ln)
    assert ck.adler32_value(adler) == zlib.adler32(data)
    assert ck.crc32_from_raw(crc_raw, len(data)) == zlib.crc32(data)


def test_sharded_packed_matches_oneshot_packed():
    """Marker-free splicing of sharded output must equal the one-shot packed
    stream byte for byte."""
    with open(os.path.join(DATA_DIR, "pg11.txt"), "rb") as f:
        data = f.read()[:60_000]

    mesh = make_mesh(8)
    step = make_sharded_encoder(mesh, CompressionOptions.default(), EMIT)
    (bufs, hist, ns, lasts), B = pad_to_multiple(build_batch(data, EMIT), 8)
    out_d = step(bufs, hist, ns, lasts)
    payloads = [data[i * EMIT : i * EMIT + int(ns[i])] for i in range(B)]
    out = assemble_host(out_d, B, packed=True, payloads=payloads, is_lasts=lasts[:B])

    from deflate_rs_tpu.models import deflate as d

    orig_full, orig_small = d.FULL_EMIT, d.SMALL_EMIT
    try:
        d.FULL_EMIT, d.SMALL_EMIT = EMIT, 0
        expected = dt.deflate_bytes(data)
    finally:
        d.FULL_EMIT, d.SMALL_EMIT = orig_full, orig_small

    assert zlib.decompress(out, wbits=-15) == data
    assert out == expected


def test_assemble_local_single_process(pg11_bytes=None):
    """assemble_local == assemble_host on a single process (all shards
    addressable, offset 0), with shard placement cross-checked against
    local_chunk_range."""
    from deflate_rs_tpu.parallel.sharded import assemble_local

    with open(os.path.join(DATA_DIR, "pg11.txt"), "rb") as f:
        data = f.read()[:40_000]
    mesh = make_mesh(8)
    step = make_sharded_encoder(mesh, CompressionOptions.default(), EMIT)
    (bufs, hist, ns, lasts), B = pad_to_multiple(build_batch(data, EMIT), 8)
    out_d = step(bufs, hist, ns, lasts)
    seg, off = assemble_local(out_d)
    assert off == 0
    assert seg == assemble_host(out_d)


def test_sharded_packed_requires_payloads_for_stored():
    """packed assembly without payloads must refuse batches containing
    stored chunks instead of silently emitting empty stored blocks."""
    import numpy as np
    import pytest

    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, 3 * EMIT, dtype=np.uint8).tobytes()  # stored
    mesh = make_mesh(8)
    step = make_sharded_encoder(mesh, CompressionOptions.default(), EMIT)
    (bufs, hist, ns, lasts), B = pad_to_multiple(build_batch(data, EMIT), 8)
    out_d = step(bufs, hist, ns, lasts)
    with pytest.raises(ValueError, match="stored chunks"):
        assemble_host(out_d, B, packed=True, is_lasts=lasts[:B])


def test_sharded_outputs_stay_sharded_and_offsets_tile():
    """Outputs must remain sharded over the mesh (no replicated whole-stream
    buffer — VERDICT.md weak #6) and the collective offset scan must tile the
    stream exactly."""
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 40_000, dtype=np.uint8).tobytes()
    mesh = make_mesh(8)
    step = make_sharded_encoder(mesh, CompressionOptions.fast(), EMIT)
    (bufs, hist, ns, lasts), B = pad_to_multiple(build_batch(data, EMIT), 8)
    out_d = step(bufs, hist, ns, lasts)

    # Every output stays sharded over the data axis: each device holds
    # exactly 1/8 of the compacted word pieces, not a replica.
    head = out_d["cw_head"]
    shard_rows = {s.data.shape[0] for s in head.addressable_shards}
    assert shard_rows == {head.shape[0] // 8}

    # Compacted fetch volume ~= compressed size, NOT the word-row capacity:
    # random data goes stored, whose chunks contribute ZERO device words.
    from deflate_rs_tpu.parallel.sharded import host_used_words

    used = host_used_words(out_d["btype"], out_d["data_bits"])
    assert int(used[:B].sum()) == 0  # all chunks stored on random data

    from deflate_rs_tpu.parallel.sharded import global_offsets, replicated_host

    nbytes = np.asarray(out_d["nbytes"])
    all_nbytes = replicated_host(out_d["all_nbytes"])
    np.testing.assert_array_equal(all_nbytes, nbytes)
    offsets = global_offsets(all_nbytes)
    assert offsets.dtype == np.int64
    assert offsets[0] == 0
    np.testing.assert_array_equal(offsets[1:], (offsets + nbytes)[:-1])
    payloads = [data[i * EMIT : i * EMIT + int(ns[i])] for i in range(B)]
    out = assemble_host(out_d, B, payloads=payloads, is_lasts=lasts[:B])
    assert zlib.decompress(out, wbits=-15) == data


def test_global_offsets_past_2gib():
    """The 10 GB-scale bookkeeping test (VERDICT r3 weak #4): byte offsets
    must tile exactly once total output exceeds int32 — the sharded step
    deliberately does NO offset arithmetic on device; the host scan is
    int64."""
    from deflate_rs_tpu.parallel.sharded import global_offsets

    rng = np.random.default_rng(7)
    # ~164k chunks of ~64 KiB compressed output each ~= 10.7 GB total.
    nbytes = rng.integers(60_000, 66_000, 164_000).astype(np.int32)
    offsets = global_offsets(nbytes)
    total = int(nbytes.astype(np.int64).sum())
    assert total > 10_000_000_000  # the BASELINE 10 GB sharded config scale
    assert offsets.dtype == np.int64
    assert offsets[0] == 0
    # Every seam tiles: offset[i+1] - offset[i] == nbytes[i], in exact int64.
    np.testing.assert_array_equal(np.diff(offsets), nbytes[:-1].astype(np.int64))
    assert int(offsets[-1]) + int(nbytes[-1]) == total


def test_compaction_rule_single_source():
    """The used-words rule must have ONE definition (ops/compaction.py):
    device and host agree bit for bit, including the stored-chunk zero."""
    import jax.numpy as jnp

    from deflate_rs_tpu import constants as C
    from deflate_rs_tpu.ops.compaction import (
        compact_words_device, used_words_device, used_words_host,
    )

    rng = np.random.default_rng(3)
    B, NW = 16, 8
    btype = rng.choice(
        [C.BTYPE_STORED, C.BTYPE_FIXED, C.BTYPE_DYNAMIC, C.BTYPE_SPLIT], B
    ).astype(np.int32)
    dbits = rng.integers(1, 32 * NW, B).astype(np.int32)
    used_h = used_words_host(btype, dbits)
    used_d = np.asarray(used_words_device(jnp.asarray(btype), jnp.asarray(dbits)))
    np.testing.assert_array_equal(used_h, used_d)
    assert (used_h[btype == C.BTYPE_STORED] == 0).all()

    words = rng.integers(0, 1 << 32, (B, NW), dtype=np.uint64).astype(np.uint32)
    flat = np.asarray(compact_words_device(jnp.asarray(words), jnp.asarray(used_d)))
    # The read contract: chunk i's used prefix at exclusive-cumsum offsets.
    woff = np.cumsum(used_h) - used_h
    for i in range(B):
        np.testing.assert_array_equal(
            flat[woff[i] : woff[i] + used_h[i]], words[i, : used_h[i]]
        )


def test_sharded_compact_fetch_volume_mixed():
    """On mixed content the compacted fetch volume tracks the compressed
    size: used words == ceil(data_bits/32) for Huffman chunks, 0 for stored."""
    rng = np.random.default_rng(6)
    with open(os.path.join(DATA_DIR, "pg11.txt"), "rb") as f:
        text = f.read()
    data = text[: 4 * EMIT] + rng.integers(0, 256, 4 * EMIT, dtype=np.uint8).tobytes()
    mesh = make_mesh(8)
    step = make_sharded_encoder(mesh, CompressionOptions.default(), EMIT)
    (bufs, hist, ns, lasts), B = pad_to_multiple(build_batch(data, EMIT), 8)
    out_d = step(bufs, hist, ns, lasts)

    from deflate_rs_tpu import constants as C
    from deflate_rs_tpu.parallel.sharded import host_used_words

    btype = np.asarray(out_d["btype"])[:B]
    dbits = np.asarray(out_d["data_bits"])[:B]
    used = host_used_words(btype, dbits)[:B]
    assert (btype[4:] == C.BTYPE_STORED).all()  # the random half
    assert (used[4:] == 0).all()
    assert (used[:4] == (dbits[:4] + 31) // 32).all()
    # fetch volume strictly below the full word-row capacity
    from deflate_rs_tpu.ops.chunk_encode import out_words

    assert used.sum() * 4 < 0.30 * B * out_words(EMIT) * 4

    payloads = [data[i * EMIT : i * EMIT + int(ns[i])] for i in range(B)]
    out = assemble_host(out_d, B, payloads=payloads, is_lasts=lasts[:B])
    assert zlib.decompress(out, wbits=-15) == data
    packed = assemble_host(out_d, B, packed=True, payloads=payloads, is_lasts=lasts[:B])
    assert zlib.decompress(packed, wbits=-15) == data
