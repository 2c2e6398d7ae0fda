"""DEFLATE (RFC 1951) constant tables, built as NumPy arrays.

These are the spec-layer constants mirroring the role of the reference's
``src/huffman_table.rs`` (fixed code lengths huffman_table.rs:32-42, length/distance
code tables huffman_table.rs:50-126) and ``src/chained_hash_table.rs`` (window/hash
constants) — re-derived from RFC 1951 rather than transcribed.

Everything here is a compile-time constant: the JAX pipeline closes over these
arrays, so XLA embeds them in the executable.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Core spec constants (RFC 1951 §3.2)
# ---------------------------------------------------------------------------
MIN_MATCH = 3
MAX_MATCH = 258
WINDOW_SIZE = 32768  # maximum backward distance
MAX_CODE_LENGTH = 15  # litlen/dist code length limit
MAX_CLEN_CODE_LENGTH = 7  # code-length-alphabet limit
NUM_LITLEN_SYMBOLS = 288  # 0..287 (286/287 reserved but present in fixed table)
NUM_USED_LITLEN = 286
NUM_DIST_SYMBOLS = 30
END_OF_BLOCK = 256
MIN_NUM_LITLEN_CODES = 257  # HLIT floor (RFC 1951 §3.2.7)
MIN_NUM_DIST_CODES = 1  # HDIST floor

# Block header: 1 bit BFINAL + 2 bits BTYPE, LSB first.
BTYPE_STORED = 0
BTYPE_FIXED = 1
BTYPE_DYNAMIC = 2
# Reported (not wire-level) chunk block type: the chunk was cut into
# multiple Huffman blocks with per-block tables (ops/chunk_encode.py
# composition search).  Splices like any Huffman chunk.
BTYPE_SPLIT = 3

# Stored blocks: LEN is u16 so <= 65535; we emit aligned 32 KiB sub-blocks
# (the reference caps at 32767, stored_block.rs:11 — equal header overhead for
# 64 KiB chunks, and 32768 keeps our sub-block layout static).
MAX_STORED_BLOCK = 32768

# Heuristic from the reference (lz77.rs:274-278, there 8192; zlib uses 4096):
# a 3-byte match further away than this costs more than 3 literals on average.
# Re-tuned on the in-image corpora sweep (8192/2048/1024): 1024 improved every
# text/source corpus (py_source at high -80, closing the last zlib-9 gap) for
# a <=0.3% give-back on ELF binaries that sit far under their pins.
TOO_FAR = 1024

# ---------------------------------------------------------------------------
# Length codes 257..285 (RFC 1951 §3.2.5)
# ---------------------------------------------------------------------------
# Number of extra bits for length codes 257+i, i = 0..28.
LENGTH_EXTRA_BITS = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0],
    dtype=np.int32,
)
# Base match length for length codes 257+i.
LENGTH_BASE = np.array(
    [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43, 51, 59,
     67, 83, 99, 115, 131, 163, 195, 227, 258],
    dtype=np.int32,
)


def _build_length_to_code() -> np.ndarray:
    """table[L] = length code index (0..28) for match length L in 3..258."""
    table = np.zeros(MAX_MATCH + 1, dtype=np.int32)
    for code in range(29):
        base = LENGTH_BASE[code]
        span = 1 << LENGTH_EXTRA_BITS[code]
        for length in range(base, min(base + span, MAX_MATCH + 1)):
            table[length] = code
    table[MAX_MATCH] = 28  # 258 has its own dedicated zero-extra code
    return table


# Index by match length (3..258) -> length code index i (symbol = 257 + i).
LENGTH_TO_CODE = _build_length_to_code()

# ---------------------------------------------------------------------------
# Distance codes 0..29 (RFC 1951 §3.2.5)
# ---------------------------------------------------------------------------
DIST_EXTRA_BITS = np.array(
    [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10,
     11, 11, 12, 12, 13, 13],
    dtype=np.int32,
)
DIST_BASE = np.array(
    [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257, 385, 513,
     769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289, 16385, 24577],
    dtype=np.int32,
)


def _build_dist_to_code() -> np.ndarray:
    """table[d] = distance code (0..29) for distance d in 1..32768."""
    table = np.zeros(WINDOW_SIZE + 1, dtype=np.int32)
    for code in range(30):
        base = DIST_BASE[code]
        span = 1 << DIST_EXTRA_BITS[code]
        for dist in range(base, min(base + span, WINDOW_SIZE + 1)):
            table[dist] = code
    return table


DIST_TO_CODE = _build_dist_to_code()

# ---------------------------------------------------------------------------
# Fixed Huffman code lengths (RFC 1951 §3.2.6)
# ---------------------------------------------------------------------------
FIXED_LITLEN_LENGTHS = np.concatenate(
    [
        np.full(144, 8, dtype=np.int32),  # 0..143
        np.full(112, 9, dtype=np.int32),  # 144..255
        np.full(24, 7, dtype=np.int32),  # 256..279
        np.full(8, 8, dtype=np.int32),  # 280..287
    ]
)
FIXED_DIST_LENGTHS = np.full(NUM_DIST_SYMBOLS, 5, dtype=np.int32)

# Order in which code-length-code lengths are transmitted (RFC 1951 §3.2.7).
CLEN_ORDER = np.array(
    [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15],
    dtype=np.int32,
)
NUM_CLEN_SYMBOLS = 19
# Extra bits carried by the code-length alphabet's repeat symbols.
CLEN_REPEAT_EXTRA = {16: 2, 17: 3, 18: 7}

# ---------------------------------------------------------------------------
# Hashing (matches the reference's rolling hash, chained_hash_table.rs:55-62:
# h = ((h << 5) ^ byte) & 0x7FFF over a 3-byte window)
# ---------------------------------------------------------------------------
HASH_BITS = 15
HASH_SIZE = 1 << HASH_BITS
HASH_MASK = HASH_SIZE - 1
HASH_SHIFT = 5

# zlib framing (RFC 1950): CM=8 | CINFO=7 (32K window), FLEVEL=2 (default),
# FCHECK chosen so (CMF*256+FLG) % 31 == 0.  Reference: zlib.rs:14-63.
ZLIB_CMF = 0x78


def zlib_header(flevel: int = 2) -> bytes:
    flg = (flevel & 3) << 6
    rem = (ZLIB_CMF * 256 + flg) % 31
    flg += 31 - rem if rem else 0
    return bytes([ZLIB_CMF, flg])


ADLER_MOD = 65521
CRC32_POLY = 0xEDB88320  # reflected polynomial
