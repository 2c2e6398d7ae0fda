"""Token-level diff of our parse vs zlib's on a corpus (debug/analysis).

Decodes both DEFLATE streams into (literal | match(len,dist)) token lists and
prints distribution stats — where the ratio gap actually comes from.
"""

from __future__ import annotations

import os
import sys
import zlib
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from deflate_rs_tpu import constants as C  # noqa: E402
from deflate_rs_tpu.models.inflate import BitReader, _Decoder  # noqa: E402


def tokens(data: bytes):
    """Token list of a raw DEFLATE stream: ('lit', byte) / ('m', len, dist)."""
    br = BitReader(data)
    toks = []
    outlen = 0
    while True:
        bfinal = br.read(1)
        btype = br.read(2)
        if btype == C.BTYPE_STORED:
            br.align()
            ln = br.read(16)
            br.read(16)
            start = br.bitpos >> 3
            for b in br.data[start : start + ln]:
                toks.append(("lit", b))
            br.bitpos += 8 * ln
            outlen += ln
        else:
            if btype == C.BTYPE_FIXED:
                lit_dec = _Decoder(C.FIXED_LITLEN_LENGTHS.tolist())
                dist_dec = _Decoder(C.FIXED_DIST_LENGTHS.tolist())
            else:
                hlit = br.read(5) + 257
                hdist = br.read(5) + 1
                hclen = br.read(4) + 4
                clen_lengths = [0] * 19
                for i in range(hclen):
                    clen_lengths[int(C.CLEN_ORDER[i])] = br.read(3)
                clen_dec = _Decoder(clen_lengths)
                lengths = []
                while len(lengths) < hlit + hdist:
                    sym = clen_dec.decode(br)
                    if sym < 16:
                        lengths.append(sym)
                    elif sym == 16:
                        lengths += [lengths[-1]] * (3 + br.read(2))
                    elif sym == 17:
                        lengths += [0] * (3 + br.read(3))
                    else:
                        lengths += [0] * (11 + br.read(7))
                lit_dec = _Decoder(lengths[:hlit])
                dist_dec = _Decoder(lengths[hlit:])
            while True:
                sym = lit_dec.decode(br)
                if sym < 256:
                    toks.append(("lit", sym))
                    outlen += 1
                elif sym == 256:
                    break
                else:
                    ci = sym - 257
                    ln = int(C.LENGTH_BASE[ci]) + br.read(int(C.LENGTH_EXTRA_BITS[ci]))
                    dsym = dist_dec.decode(br)
                    d = int(C.DIST_BASE[dsym]) + br.read(int(C.DIST_EXTRA_BITS[dsym]))
                    toks.append(("m", ln, d))
                    outlen += ln
        if bfinal:
            break
    return toks


def stats(name, toks):
    lits = sum(1 for t in toks if t[0] == "lit")
    ms = [t for t in toks if t[0] == "m"]
    mbytes = sum(t[1] for t in ms)
    lens = Counter()
    for t in ms:
        l = t[1]
        b = 0
        while (1 << (b + 3)) <= l:
            b += 1
        lens[1 << (b + 3 - 1) if False else min(1 << (b + 2), 256)] += 0
    buckets = Counter()
    dbuckets = Counter()
    for t in ms:
        for lo, hi, lab in ((3, 8, "3-8"), (9, 16, "9-16"), (17, 32, "17-32"),
                            (33, 64, "33-64"), (65, 128, "65-128"), (129, 258, "129-258")):
            if lo <= t[1] <= hi:
                buckets[lab] += 1
        for lo, hi, lab in ((1, 64, "d<=64"), (65, 1024, "d<=1K"), (1025, 8192, "d<=8K"),
                            (8193, 32768, "d<=32K")):
            if lo <= t[2] <= hi:
                dbuckets[lab] += 1
    print(f"{name}: {len(toks)} tokens, {lits} literals, {len(ms)} matches "
          f"covering {mbytes} bytes (avg len {mbytes / max(len(ms), 1):.1f})")
    print(f"  len buckets:  " + "  ".join(f"{k}:{buckets[k]}" for k in
          ["3-8", "9-16", "17-32", "33-64", "65-128", "129-258"]))
    print(f"  dist buckets: " + "  ".join(f"{k}:{dbuckets[k]}" for k in
          ["d<=64", "d<=1K", "d<=8K", "d<=32K"]))


def main():
    from dataclasses import replace

    from deflate_rs_tpu.compression_options import CompressionOptions
    from deflate_rs_tpu.models.deflate import compress_stream
    from scripts.corpora_ratio import build_corpora

    name = os.environ.get("PD_CORPUS", "json_cfg")
    data = build_corpora()[name]
    z = zlib.compress(data, 6)[2:-4]
    opts = CompressionOptions.default()
    pw = int(os.environ.get("PD_PW", "0"))
    if pw:
        opts = replace(opts, probe_words_override=pw)
    ours = compress_stream(data, opts).deflate
    print(f"{name}: {len(data)} bytes; zlib-6 {len(z)} vs ours {len(ours)}")
    stats("zlib-6", tokens(z))
    stats("ours  ", tokens(bytes(ours)))


if __name__ == "__main__":
    main()
