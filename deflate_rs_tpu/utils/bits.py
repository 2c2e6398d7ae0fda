"""Bit-manipulation helpers shared by the encoder pipeline.

Mirrors the role of the reference's ``src/bit_reverse.rs`` (branchless 16-bit
reversal, bit_reverse.rs:3-10): DEFLATE canonical Huffman codes are defined
MSB-first but the bitstream is packed LSB-first, so every code is emitted
bit-reversed.
"""

from __future__ import annotations

import jax.numpy as jnp


def reverse_bits16(value, length):
    """Reverse the low 16 bits of ``value`` and keep the top ``length`` of them.

    Branchless mask-and-shift reversal; works elementwise on arrays.
    ``length`` may be an array (per-element code lengths); entries with
    length 0 return 0.
    """
    v = jnp.asarray(value).astype(jnp.uint32)
    v = ((v & 0x5555) << 1) | ((v & 0xAAAA) >> 1)
    v = ((v & 0x3333) << 2) | ((v & 0xCCCC) >> 2)
    v = ((v & 0x0F0F) << 4) | ((v & 0xF0F0) >> 4)
    v = ((v & 0x00FF) << 8) | ((v & 0xFF00) >> 8)
    length = jnp.asarray(length, dtype=jnp.uint32)
    return jnp.where(length > 0, v >> (16 - length), 0).astype(jnp.uint32)
