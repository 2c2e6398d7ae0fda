"""The per-chunk DEFLATE encoder: one fused, jittable pipeline.

This is the TPU-native counterpart of the reference's driver loop
(``compress_data_dynamic_n``, compress.rs:80) — but where the reference
processes a sliding window byte-by-byte, this encodes one independent chunk
(up to ``emit_size`` bytes, preceded by up to 32 KiB of history halo) as a
single DEFLATE block chosen among stored/fixed/dynamic by exact bit cost
(mirroring gen_huffman_lengths, huffman_lengths.rs:167-286).

Chunks are byte-aligned: a non-final chunk ends with an empty stored block
(the sync-flush marker ``00 00 FF FF``, compress.rs:257-262), which is what
makes chunks independently encodable and concatenable — the parallel seam the
build plan (SURVEY.md §2) calls for.

Pipeline stages (all fixed-shape, no data-dependent Python control flow;
tokens live in POSITION space end to end — no compaction, no gathers):
  hash -> payload sort -> K-probe -> chain extension -> lazy jump steps
  -> lock-step segmented parse (Pallas, parse_scan.py) -> per-position
  symbol fields -> one-hot histograms -> package-merge code lengths
  -> header RLE -> exact cost decision -> field list -> sort-compaction
  bit pack (bitpack.py), plus Adler-32/CRC-32 partials over the payload.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..compression_options import CompressionOptions, SpecialOptions
from .bitpack import pack_fields
from .canonical import canonical_codes
from .checksum import adler32_parts_device, crc32_raw_device
from .code_lengths import CL_CAP, encode_code_lengths
from .matching import find_matches, find_rle_matches
from .symbolmap import dist_code, histogram_onehot, length_code, table_lookup
from .package_merge import package_merge_lengths
from .parse import build_jumps, reachable
from .parse_scan import parse_scan

HALO = C.WINDOW_SIZE  # history bytes preceding the emit region
PAD = 72  # tail padding so packed-word probe reads (up to 64 B probes) stay in bounds


def out_words(emit_size: int) -> int:
    """Output word-buffer capacity: the 9-bit/byte worst case plus slack."""
    return (9 * emit_size) // 32 + 2048

# Per-chunk layout: buf[HALO - hist_len : HALO] = history, buf[HALO : HALO+n]
# = payload. The emit region always starts at buffer offset HALO.


from ..utils.tables import dev_const as _const

_DH_BITS = np.array([5, 5, 4], np.int32)
_SH_BITS = np.array([3, 5, 16, 16], np.int32)
_SY_VALS = np.array([0, 0, 0x0000, 0xFFFF], np.uint32)
_SY_BITS = np.array([3, 0, 16, 16], np.int32)


def encode_chunk(buf, hist_len, n, is_last, *, emit_size: int, options: CompressionOptions):
    """Encode one chunk. See module docstring for the layout.

    Args:
      buf: uint8[HALO + emit_size + PAD].
      hist_len: dynamic history length (0 for the first chunk of a stream).
      n: dynamic payload length, 0 <= n <= emit_size.
      is_last: bool scalar — set BFINAL and omit the trailing sync marker.
      emit_size: static chunk capacity (power of two).
      options: static compression options.

    Returns dict with the packed bitstream words, total bit count, chosen
    block type, token count, and checksum partials for the payload.
    """
    E = emit_size
    N = HALO + E
    is_last = jnp.asarray(is_last, dtype=jnp.bool_)
    n = jnp.asarray(n, dtype=jnp.int32)
    hist_len = jnp.asarray(hist_len, dtype=jnp.int32)
    n_total = HALO + n
    hstart = HALO - hist_len

    # ------------------------------------------------------------------ LZ77
    mode = options.matcher_mode
    if mode == "hash":
        best_len, best_dist = find_matches(
            buf, N, n_total, hstart, options.num_candidates,
            probe_words=options.probe_words,
        )
    elif mode == "rle":
        best_len, best_dist = find_rle_matches(buf, n_total, hstart, N)
    else:  # huffman_only
        best_len = jnp.zeros(N, dtype=jnp.int32)
        best_dist = jnp.zeros(N, dtype=jnp.int32)

    # ------------------------------------------------------ parse resolution
    # Tokens stay in POSITION space end to end (no compaction): the parse
    # yields a boolean token-start mask; every downstream stage masks by it.
    # Jump steps over the emit region: 1 for a literal, match length for a
    # taken match (greedy/lazy resolved elementwise in build_jumps).
    steps = build_jumps(
        best_len[HALO:],
        best_dist[HALO:],
        lazy=options.lazy,
        lazy_if_less_than=min(options.lazy_if_less_than, 258) if options.lazy else 0,
    )
    if jax.default_backend() == "tpu":
        # Lock-step segmented parse kernel (parse_scan.py): 128 segments in
        # parallel on the VPU + short convergence fix-up — exact parse.
        is_tok = parse_scan(steps, n)
    else:
        nxt_e = jnp.minimum(jnp.arange(E, dtype=jnp.int32) + steps, E)
        reach = reachable(jnp.concatenate([nxt_e, jnp.full(1, E, jnp.int32)]), 0)
        is_tok = reach[:E] & (jnp.arange(E) < n)
    count = jnp.sum(is_tok.astype(jnp.int32))
    tvalid = is_tok

    # ------------------------- token symbol mapping (arithmetic, gather-free)
    length = steps
    dist = jnp.where(steps >= C.MIN_MATCH, best_dist[HALO:], 0)
    is_match = length >= C.MIN_MATCH
    lit = buf[HALO : HALO + E].astype(jnp.int32)

    lcode, len_extra_n, len_extra_v = length_code(jnp.clip(length, C.MIN_MATCH, C.MAX_MATCH))
    len_extra_n = jnp.where(is_match, len_extra_n, 0)
    len_extra_v = jnp.where(is_match, len_extra_v, 0)
    lsym = jnp.where(is_match, 257 + lcode, lit)
    dcode, dist_extra_n, dist_extra_v = dist_code(jnp.clip(dist, 1, C.WINDOW_SIZE))
    dcode = jnp.where(is_match, dcode, 0)
    dist_extra_n = jnp.where(is_match, dist_extra_n, 0)
    dist_extra_v = jnp.where(is_match, dist_extra_v, 0)

    l_freq = histogram_onehot(lsym, tvalid, C.NUM_USED_LITLEN)
    l_freq = l_freq.at[C.END_OF_BLOCK].add(1)
    d_freq = histogram_onehot(dcode, tvalid & is_match, C.NUM_DIST_SYMBOLS)

    # ------------------------------------------- dynamic Huffman code tables
    l_len_dyn286 = package_merge_lengths(l_freq, C.MAX_CODE_LENGTH)
    d_len_dyn = package_merge_lengths(d_freq, C.MAX_CODE_LENGTH)

    sym_l = jnp.arange(C.NUM_USED_LITLEN)
    last_l = jnp.max(jnp.where(l_len_dyn286 > 0, sym_l, -1))
    hlit = jnp.clip(last_l + 1, C.MIN_NUM_LITLEN_CODES, C.NUM_USED_LITLEN)
    sym_d = jnp.arange(C.NUM_DIST_SYMBOLS)
    last_d = jnp.max(jnp.where(d_len_dyn > 0, sym_d, -1))
    hdist = jnp.clip(last_d + 1, C.MIN_NUM_DIST_CODES, C.NUM_DIST_SYMBOLS)

    # Concatenated litlen+dist lengths, RLE encoded for the header.
    j = jnp.arange(CL_CAP, dtype=jnp.int32)
    cl = jnp.where(
        j < hlit,
        l_len_dyn286[jnp.clip(j, 0, C.NUM_USED_LITLEN - 1)],
        d_len_dyn[jnp.clip(j - hlit, 0, C.NUM_DIST_SYMBOLS - 1)],
    )
    rle = encode_code_lengths(cl, hlit + hdist)
    clen_len = package_merge_lengths(rle["freq"], C.MAX_CLEN_CODE_LENGTH)
    clen_codes = canonical_codes(clen_len, C.MAX_CLEN_CODE_LENGTH)
    clen_in_order = clen_len[C.CLEN_ORDER]  # tracer indexed by a host array
    last_c = jnp.max(jnp.where(clen_in_order > 0, jnp.arange(19), -1))
    hclen = jnp.clip(last_c + 1, 4, 19)

    # ----------------------------------------------------- exact bit costs
    l_extra_tbl = jnp.concatenate(
        [jnp.zeros(257, jnp.int32), _const(C.LENGTH_EXTRA_BITS)]
    )
    d_extra_tbl = _const(C.DIST_EXTRA_BITS)
    fixed_l_len286 = _const(C.FIXED_LITLEN_LENGTHS[: C.NUM_USED_LITLEN])
    fixed_d_len = _const(C.FIXED_DIST_LENGTHS)

    dyn_tok_bits = jnp.sum(l_freq * (l_len_dyn286 + l_extra_tbl)) + jnp.sum(
        d_freq * (d_len_dyn + d_extra_tbl)
    )
    fix_tok_bits = jnp.sum(l_freq * (fixed_l_len286 + l_extra_tbl)) + jnp.sum(
        d_freq * (fixed_d_len + d_extra_tbl)
    )
    rle_used = jnp.arange(CL_CAP) < rle["n"]
    dyn_hdr_bits = (
        14
        + 3 * hclen
        + jnp.sum(jnp.where(rle_used, clen_len[rle["sym"]], 0))
        + jnp.sum(rle["extra_bits"])
    )

    n_sub_static = max(1, (E + C.MAX_STORED_BLOCK - 1) // C.MAX_STORED_BLOCK)
    sub_k = jnp.arange(n_sub_static, dtype=jnp.int32)
    sub_present = (n > sub_k * C.MAX_STORED_BLOCK) | (sub_k == 0)
    n_sub = jnp.sum(sub_present.astype(jnp.int32))
    stored_bits = 40 * n_sub + 8 * n

    dyn_total = 3 + dyn_hdr_bits + dyn_tok_bits
    fix_total = 3 + fix_tok_bits
    best = jnp.minimum(jnp.minimum(dyn_total, fix_total), stored_bits)
    # Tie order mirrors gen_huffman_lengths (huffman_lengths.rs:271-286):
    # fixed beats stored beats dynamic on equal cost; tiny blocks force fixed.
    btype = jnp.where(
        best == fix_total, C.BTYPE_FIXED, jnp.where(best == stored_bits, C.BTYPE_STORED, C.BTYPE_DYNAMIC)
    )
    btype = jnp.where(n <= 4, C.BTYPE_FIXED, btype)
    if options.special == SpecialOptions.ForceFixed:
        btype = jnp.full((), C.BTYPE_FIXED, jnp.int32)
    elif options.special == SpecialOptions.ForceStored:
        btype = jnp.full((), C.BTYPE_STORED, jnp.int32)
    is_dyn = btype == C.BTYPE_DYNAMIC
    is_fix = btype == C.BTYPE_FIXED
    is_stored = btype == C.BTYPE_STORED

    data_bits = jnp.where(
        is_stored, stored_bits, jnp.where(is_dyn, dyn_total, fix_total)
    ).astype(jnp.int32)

    # --------------------------------------------------------- field arrays
    huff = is_dyn | is_fix

    # Selected code tables (dynamic padded to 288 symbols).
    l_len_dyn = jnp.concatenate([l_len_dyn286, jnp.zeros(2, jnp.int32)])
    sel_l_len = jnp.where(is_dyn, l_len_dyn, _const(C.FIXED_LITLEN_LENGTHS))
    sel_d_len = jnp.where(is_dyn, d_len_dyn, fixed_d_len)
    sel_l_code = canonical_codes(sel_l_len, C.MAX_CODE_LENGTH)
    sel_d_code = canonical_codes(sel_d_len, C.MAX_CODE_LENGTH)

    # [0] main 3-bit header (huffman blocks only; stored sub-blocks carry
    # their own headers).
    bfinal = jnp.asarray(is_last).astype(jnp.int32)
    hdr_v = (bfinal | (btype << 1)).astype(jnp.uint32)[None]
    hdr_b = jnp.where(huff, 3, 0).astype(jnp.int32)[None]

    # [1] dynamic header: HLIT/HDIST/HCLEN + clen lengths + RLE symbols.
    dh_v = jnp.stack([(hlit - 257).astype(jnp.uint32), (hdist - 1).astype(jnp.uint32), (hclen - 4).astype(jnp.uint32)])
    dh_b = jnp.where(is_dyn, _const(_DH_BITS), 0)
    co_v = clen_in_order.astype(jnp.uint32)
    co_b = jnp.where(is_dyn & (jnp.arange(19) < hclen), 3, 0)
    rle_code_v = clen_codes[rle["sym"]]
    rle_code_b = jnp.where(rle_used & is_dyn, clen_len[rle["sym"]], 0)
    rle_ex_v = rle["extra_vals"].astype(jnp.uint32)
    rle_ex_b = jnp.where(is_dyn, rle["extra_bits"], 0)
    rle_v = jnp.stack([rle_code_v, rle_ex_v], axis=1).reshape(-1)
    rle_b = jnp.stack([rle_code_b, rle_ex_b], axis=1).reshape(-1)

    # [2] token fields, two per token (code+extra packed; LSB-first means the
    # Huffman code occupies the low bits and extra bits follow above it).
    # Code+length tables are packed so each side needs ONE lookup, done as a
    # one-hot MXU matmul (~7x faster than a gather on TPU).
    tok_on = tvalid & huff
    l_pack = table_lookup(
        (sel_l_code | (sel_l_len.astype(jnp.uint32) << 16)).astype(jnp.int32),
        lsym,
        C.NUM_LITLEN_SYMBOLS,
    )
    lsym_code = (l_pack & 0xFFFF).astype(jnp.uint32)
    lsym_len = l_pack >> 16
    t1v = lsym_code | (len_extra_v.astype(jnp.uint32) << lsym_len.astype(jnp.uint32))
    t1b = jnp.where(tok_on, lsym_len + len_extra_n, 0)
    mt = tok_on & is_match
    d_pack = table_lookup(
        (sel_d_code | (sel_d_len.astype(jnp.uint32) << 16)).astype(jnp.int32),
        dcode,
        C.NUM_DIST_SYMBOLS,
    )
    d_code_v = (d_pack & 0xFFFF).astype(jnp.uint32)
    d_code_l = d_pack >> 16
    t2v = d_code_v | (dist_extra_v.astype(jnp.uint32) << d_code_l.astype(jnp.uint32))
    t2b = jnp.where(mt, d_code_l + dist_extra_n, 0)
    tok_v = jnp.stack([t1v, t2v], axis=1).reshape(-1)
    tok_b = jnp.stack([t1b, t2b], axis=1).reshape(-1)

    # [3] end of block.
    eob_v = sel_l_code[C.END_OF_BLOCK][None]
    eob_b = jnp.where(huff, sel_l_len[C.END_OF_BLOCK], 0)[None]

    # [4] stored sub-blocks: hdr(3) + pad(5) + LEN + NLEN + payload, the
    # payload as 32-bit packed-word fields (4 bytes per field, ragged tail
    # expressed through the field width).
    SB = C.MAX_STORED_BLOCK
    sub_len = jnp.clip(n - sub_k * SB, 0, SB)
    last_sub = jnp.maximum(n_sub - 1, 0)
    sub_final = (sub_k == last_sub) & is_last
    st_segments_v, st_segments_b = [], []
    p = buf[HALO : HALO + E].astype(jnp.uint32)
    pwords = p[0::4] | (p[1::4] << 8) | (p[2::4] << 16) | (p[3::4] << 24)
    wj = jnp.arange(E // 4, dtype=jnp.int32)
    for k in range(n_sub_static):
        on = is_stored & sub_present[k]
        sh_v = jnp.stack(
            [
                sub_final[k].astype(jnp.uint32),  # hdr: BFINAL | (00 << 1)
                jnp.zeros((), jnp.uint32),  # pad to byte
                sub_len[k].astype(jnp.uint32),  # LEN
                (~sub_len[k]).astype(jnp.uint32) & 0xFFFF,  # NLEN
            ]
        )
        sh_b = jnp.where(on, _const(_SH_BITS), 0)
        lo, hi = k * SB // 4, min((k + 1) * SB, E) // 4
        pb_v = pwords[lo:hi]
        pb_b = jnp.where(on, 8 * jnp.clip(n - 4 * wj[lo:hi], 0, 4), 0)
        st_segments_v += [sh_v, pb_v]
        st_segments_b += [sh_b, pb_b]

    # [5] sync-flush marker for non-final chunks (empty stored block,
    # compress.rs:257-262): header 000, pad to byte, 0x0000, 0xFFFF.
    sync_on = ~is_last
    sync_pad = (-(data_bits + 3)) % 8
    sy_v = _const(_SY_VALS)
    sy_b = jnp.where(
        sync_on,
        jnp.stack(
            [jnp.full((), 3, jnp.int32), sync_pad, jnp.full((), 16, jnp.int32), jnp.full((), 16, jnp.int32)]
        ),
        0,
    )

    values = jnp.concatenate(
        [hdr_v, dh_v, co_v, rle_v, tok_v, eob_v] + st_segments_v + [sy_v]
    )
    nbits = jnp.concatenate(
        [hdr_b, dh_b, co_b, rle_b, tok_b, eob_b] + st_segments_b + [sy_b]
    )

    # Sized for the worst *legal* output: ForceFixed on all-high literals is
    # 9 bits/byte (fixed codes for 144..255), plus headers/EOB/sync slack.
    # (Match tokens are always cheaper per byte than 9-bit literals, and the
    # normal cost model never exceeds the stored bound of ~8.005 bits/byte.)
    num_words = out_words(E)
    words, total_bits = pack_fields(values, nbits, num_words)

    # ------------------------------------------------------------ checksums
    s1, s2 = adler32_parts_device(buf[HALO : HALO + E], n)
    crc_raw = crc32_raw_device(buf[HALO : HALO + E], n)

    return {
        "words": words,
        "total_bits": total_bits,
        "data_bits": data_bits,
        "btype": btype,
        "ntokens": count,
        "s1": s1,
        "s2": s2,
        "crc_raw": crc_raw,
    }


@functools.lru_cache(maxsize=None)
def get_chunk_encoder(options: CompressionOptions, emit_size: int):
    """Jitted single-chunk encoder, cached per (options, size) config."""

    fn = functools.partial(encode_chunk, emit_size=emit_size, options=options)
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def get_batch_encoder(options: CompressionOptions, emit_size: int):
    """Jitted batched (vmapped over chunks) encoder."""

    fn = functools.partial(encode_chunk, emit_size=emit_size, options=options)
    return jax.jit(jax.vmap(fn))
