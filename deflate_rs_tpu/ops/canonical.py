"""Canonical Huffman code assembly (vectorized).

Given per-symbol code lengths, produce the canonical DEFLATE codes
(RFC 1951 §3.2.2) already bit-reversed for LSB-first emission.  Mirrors the
behavior of the reference's ``create_codes_in_place`` (huffman_table.rs:253-278)
— count lengths → next_code → bit-reversed codes — but as a batched, fully
parallel computation instead of a per-symbol loop.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.bits import reverse_bits16


def canonical_codes(lengths, max_len: int):
    """Build canonical codes for one alphabet.

    Args:
      lengths: int32[A] code lengths (0 = symbol unused).
      max_len: static upper bound on code lengths (15 for litlen/dist, 7 for clen).

    Returns:
      uint32[A] codes, bit-reversed so they can be emitted LSB-first with
      ``lengths`` bits each.  Unused symbols get code 0.
    """
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    num_symbols = lengths.shape[0]

    # bl_count[l] = number of codes of length l (l = 0..max_len); length-0
    # symbols must not consume code space.
    one_hot = (lengths[:, None] == jnp.arange(max_len + 1)[None, :]).astype(jnp.int32)
    bl_count = one_hot.sum(axis=0).at[0].set(0)

    # first_code[l] per RFC 1951: code = (code + bl_count[l-1]) << 1.
    def step(code, l):
        code = (code + bl_count[l - 1]) << 1
        return code, code

    # Unrolled scan over the (static, tiny) range of lengths.
    first_code = jnp.zeros(max_len + 1, dtype=jnp.int32)
    code = 0
    for l in range(1, max_len + 1):
        code, c = step(code, l)
        first_code = first_code.at[l].set(c)

    # Rank of each symbol among same-length symbols in symbol order.
    rank_within = jnp.cumsum(one_hot, axis=0) - one_hot  # exclusive cumsum
    rank = jnp.take_along_axis(rank_within, lengths[:, None], axis=1)[:, 0]

    code_msb = first_code[lengths] + rank
    codes = reverse_bits16(code_msb.astype(jnp.uint32), lengths)
    return jnp.where(lengths > 0, codes, 0).astype(jnp.uint32)
