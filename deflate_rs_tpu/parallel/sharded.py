"""Sharded chunk-parallel encoding over a device mesh.

Pipeline (all inside one jitted, shard_mapped step):
  1. each device vmap-encodes its shard of chunks (pure local compute);
  2. per-chunk compressed byte counts are all-gathered (ICI collective);
  3. an exclusive prefix sum over the gathered counts yields every chunk's
     byte offset in the final stream;
  4. each device scatters its chunks' bytes into a zero global buffer at
     their offsets, and a ``psum`` across the mesh assembles the stream
     (disjoint writes, so add == placement).

This is the ordered gather of variable-length shard outputs described in
SURVEY.md §2 ("collective backend" row): all-gather sizes -> offset scan ->
ordered placement, with checksum partials combined on the host via the
streaming identities.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..compression_options import CompressionOptions
from ..ops.bitpack import words_to_bytes
from ..ops.chunk_encode import encode_chunk, out_words as _num_words
from .mesh import DATA_AXIS


def make_sharded_encoder(mesh, options: CompressionOptions, emit_size: int):
    """Build a jitted sharded encode step.

    Returns fn(bufs, hist_lens, ns, is_lasts) ->
      (stream: uint8[B * W * 4] assembled bitstream bytes (replicated),
       nbytes: int32[B] per-chunk byte counts,
       offsets: int32[B] per-chunk byte offsets,
       s1, s2, crc_raw: int32[B] checksum partials)
    with B = bufs.shape[0] divisible by the mesh size.
    """
    W = _num_words(emit_size)
    cap = W * 4  # per-chunk byte capacity

    encode = jax.vmap(
        functools.partial(encode_chunk, emit_size=emit_size, options=options)
    )

    def local_step(bufs, hist_lens, ns, is_lasts, chunk_ids):
        out = encode(bufs, hist_lens, ns, is_lasts)
        nbytes = (out["total_bits"] + 7) // 8  # sync marker => byte aligned

        # Collective: gather every chunk's compressed size, scan for offsets.
        all_nbytes = jax.lax.all_gather(nbytes, DATA_AXIS).reshape(-1)
        all_offsets = jnp.cumsum(all_nbytes) - all_nbytes

        # Scatter local chunks into the global stream buffer; psum merges the
        # disjoint per-device contributions.
        total_cap = all_nbytes.shape[0] * cap
        my_offsets = all_offsets[chunk_ids]
        stream = jnp.zeros(total_cap, jnp.uint8)
        byte_idx = jnp.arange(cap, dtype=jnp.int32)
        for j in range(bufs.shape[0]):  # static local batch size
            chunk_bytes = words_to_bytes(out["words"][j])
            tgt = my_offsets[j] + byte_idx
            tgt = jnp.where(byte_idx < nbytes[j], tgt, total_cap)  # drop tail
            stream = stream.at[tgt].add(chunk_bytes, mode="drop")
        stream = jax.lax.psum(stream, DATA_AXIS)
        return stream, all_nbytes, all_offsets, out["s1"], out["s2"], out["crc_raw"]

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        # all_gather/psum results are value-replicated across the mesh; the
        # static varying-mesh-axes check can't see through the gathered
        # cumsum, so assert replication ourselves.
        check_vma=False,
    )

    @jax.jit
    def step(bufs, hist_lens, ns, is_lasts):
        B = bufs.shape[0]
        chunk_ids = jnp.arange(B, dtype=jnp.int32)
        return sharded(bufs, hist_lens, ns, is_lasts, chunk_ids)

    return step


def assemble_host(stream, nbytes, offsets) -> bytes:
    """Trim the assembled device buffer to the true stream bytes."""
    import numpy as np

    total = int(np.asarray(nbytes).sum())
    return np.asarray(stream)[:total].tobytes()
