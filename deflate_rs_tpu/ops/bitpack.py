"""Parallel LSB-first bit concatenation.

Replaces the reference's sequential ``LsbWriter::write_bits`` accumulator loop
(bitstream.rs:76-86, the second-hottest loop) with a data-parallel scheme:

1. every emitted quantity becomes a (value, nbits) *field*;
2. an exclusive prefix-sum over ``nbits`` yields each field's absolute bit
   offset;
3. each field contributes to at most two 32-bit output words
   (``value << (off & 31)`` into word ``off >> 5`` and the carry into the next
   word), scattered with bitwise-disjoint adds.

DEFLATE's LSB-first bit order is exactly little-endian uint32 word order, so
the word buffer reinterpreted as bytes IS the bitstream.
"""

from __future__ import annotations

import jax.numpy as jnp


def pack_fields(values, nbits, num_words: int, base_bit=0):
    """Pack bit fields into a little-endian uint32 word buffer.

    Args:
      values: uint32[F] field values (only the low ``nbits`` bits are used).
      nbits: int32[F] field widths, 0..16; width-0 fields are skipped.
      num_words: static output buffer size in 32-bit words.
      base_bit: bit offset at which the first field starts.

    Returns:
      (words: uint32[num_words], total_bits: int32 scalar) where total_bits
      includes ``base_bit``.
    """
    nbits = nbits.astype(jnp.uint32)
    # Mask values to their declared width (up to 32 bits per field) so the
    # disjoint-add scatter stays disjoint.
    # 2 << (nbits-1) == 2**nbits without a shift-by-32 (nbits <= 32); the
    # nbits == 0 case is selected away.
    mask = jnp.where(
        nbits == 0, 0, jnp.left_shift(2, nbits - 1).astype(jnp.uint32) - 1
    ).astype(jnp.uint32)
    vals = values.astype(jnp.uint32) & mask

    ends = jnp.cumsum(nbits, dtype=jnp.uint32) + base_bit
    offs = ends - nbits  # exclusive prefix-sum
    total_bits = ends[-1]

    word = (offs >> 5).astype(jnp.int32)
    sh = offs & 31
    lo = vals << sh
    hi = jnp.where(sh == 0, 0, vals >> (32 - sh)).astype(jnp.uint32)

    skip = nbits == 0
    word = jnp.where(skip, num_words, word)  # out-of-range => dropped
    words = jnp.zeros(num_words, dtype=jnp.uint32)
    words = words.at[word].add(lo, mode="drop")
    words = words.at[word + 1].add(hi, mode="drop")
    return words, total_bits.astype(jnp.int32)


def words_to_bytes(words):
    """uint32[W] little-endian words -> uint8[4W] bytes (device side)."""
    w = words[:, None]
    shifts = jnp.arange(4, dtype=jnp.uint32) * 8
    return ((w >> shifts[None, :]) & 0xFF).astype(jnp.uint8).reshape(-1)
