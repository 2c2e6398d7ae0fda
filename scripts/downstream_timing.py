"""Fine-grained timing of the entropy/downstream half of encode_chunk.

Times shape-faithful reconstructions of each downstream sub-stage (the
pipeline from token symbols to packed words) so optimization effort lands on
the real cost centers.  Floor: see floor(triv) in sa_stage_timing.py.
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402

import deflate_rs_tpu.constants as C  # noqa: E402
from deflate_rs_tpu.ops.canonical import canonical_codes  # noqa: E402
from deflate_rs_tpu.ops.chunk_encode import NQ, RANGES  # noqa: E402
from deflate_rs_tpu.ops.code_lengths import CL_CAP, encode_code_lengths  # noqa: E402
from deflate_rs_tpu.ops.package_merge import package_merge_rows  # noqa: E402
from deflate_rs_tpu.ops.symbolmap import histogram_onehot, table_lookup  # noqa: E402
from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402


def main():
    B = int(os.environ.get("STAGE_BATCH", "16"))
    E = int(os.environ.get("STAGE_EMIT", "65536"))
    IT = int(os.environ.get("STAGE_ITERS", "16"))
    QL = E // NQ
    R = len(RANGES)
    rng = np.random.default_rng(0)
    print(f"platform={jax.devices()[0].platform} B={B} E={E} NQ={NQ} R={R}")

    lsym = jax.device_put(rng.integers(0, 286, (B, E)).astype(np.int32))
    dcode = jax.device_put(rng.integers(0, 30, (B, E)).astype(np.int32))
    tvalid = jax.device_put((rng.random((B, E)) < 0.6))

    # a) per-quarter histograms (litlen 286 + dist 30)
    def s_hist(lsym, dcode, tvalid):
        lf = jnp.stack([
            histogram_onehot(lsym[q * QL:(q + 1) * QL], tvalid[q * QL:(q + 1) * QL], C.NUM_USED_LITLEN)
            for q in range(NQ)
        ])
        df = jnp.stack([
            histogram_onehot(dcode[q * QL:(q + 1) * QL], tvalid[q * QL:(q + 1) * QL], C.NUM_DIST_SYMBOLS)
            for q in range(NQ)
        ])
        return lf, df

    t = sync_time(jax.vmap(s_hist), lsym, dcode, tvalid, iters=IT)
    print(f"histograms  : {t*1e3/B:8.3f} ms/chunk")

    # b) table construction: batched package-merge (2R rows) + RLE + clen pm
    #    + canonical, shape-faithful to chunk_encode
    lfreq = jax.device_put(rng.integers(0, 1000, (B, R, C.NUM_USED_LITLEN)).astype(np.int32))
    dfreq = jax.device_put(rng.integers(0, 200, (B, R, C.NUM_DIST_SYMBOLS)).astype(np.int32))

    def s_tables(l_freq_r, d_freq_r):
        # Production path: package_merge_rows (Pallas kernel on TPU).
        d_pad = jnp.concatenate(
            [d_freq_r, jnp.zeros((R, C.NUM_USED_LITLEN - C.NUM_DIST_SYMBOLS), jnp.int32)], axis=1
        )
        ld_len = package_merge_rows(jnp.concatenate([l_freq_r, d_pad], axis=0), max_len=C.MAX_CODE_LENGTH)
        l_len = ld_len[:R]
        d_len = ld_len[R:, : C.NUM_DIST_SYMBOLS]
        hlit = jnp.clip(jnp.max(jnp.where(l_len > 0, jnp.arange(C.NUM_USED_LITLEN)[None, :], -1), axis=1) + 1, 257, 286)
        hdist = jnp.clip(jnp.max(jnp.where(d_len > 0, jnp.arange(30)[None, :], -1), axis=1) + 1, 1, 30)
        j = jnp.arange(CL_CAP, dtype=jnp.int32)
        cl = jnp.where(
            j[None, :] < hlit[:, None],
            jnp.take_along_axis(l_len, jnp.broadcast_to(jnp.clip(j, 0, 285), (R, CL_CAP)), axis=1),
            jnp.take_along_axis(d_len, jnp.clip(j[None, :] - hlit[:, None], 0, 29), axis=1),
        )
        rle = jax.vmap(encode_code_lengths)(cl, hlit + hdist)
        clen_len = package_merge_rows(rle["freq"], max_len=7)
        clen_codes = jax.vmap(functools.partial(canonical_codes, max_len=7))(clen_len)
        ld_codes = jax.vmap(functools.partial(canonical_codes, max_len=15))(
            jnp.concatenate([
                jnp.concatenate([l_len, jnp.zeros((R, 2), jnp.int32)], axis=1),
                jnp.concatenate([d_len, jnp.zeros((R, C.NUM_LITLEN_SYMBOLS - 30), jnp.int32)], axis=1),
            ], axis=0)
        )
        return ld_codes, clen_codes, rle["n"]

    t = sync_time(jax.vmap(s_tables), lfreq, dfreq, iters=IT)
    print(f"tables(pm..): {t*1e3/B:8.3f} ms/chunk")

    # b1) the batched 15-level package-merge alone
    def s_pm(l_freq_r, d_freq_r):
        d_pad = jnp.concatenate(
            [d_freq_r, jnp.zeros((R, C.NUM_USED_LITLEN - C.NUM_DIST_SYMBOLS), jnp.int32)], axis=1
        )
        return package_merge_rows(jnp.concatenate([l_freq_r, d_pad], axis=0), max_len=C.MAX_CODE_LENGTH)

    t = sync_time(jax.vmap(s_pm), lfreq, dfreq, iters=IT)
    print(f"  pm15 alone: {t*1e3/B:8.3f} ms/chunk")

    # c) per-quarter token field construction (the 8 one-hot MXU lookups +
    #    elementwise + interleave/concat)
    lpack = jax.device_put(rng.integers(0, 1 << 20, (B, R, C.NUM_LITLEN_SYMBOLS)).astype(np.int32))
    dpack = jax.device_put(rng.integers(0, 1 << 20, (B, R, C.NUM_DIST_SYMBOLS)).astype(np.int32))
    exv = jax.device_put(rng.integers(0, 32, (B, E)).astype(np.int32))

    def s_fields(lsym, dcode, tvalid, exv, l_pack_r, d_pack_r):
        segs_v, segs_b = [], []
        for q in range(NQ):
            sl = slice(q * QL, (q + 1) * QL)
            l_pack = table_lookup(l_pack_r[q % R], lsym[sl], C.NUM_LITLEN_SYMBOLS)
            lc = (l_pack & 0xFFFF).astype(jnp.uint32)
            ll = l_pack >> 16
            t1v = lc | (exv[sl].astype(jnp.uint32) << ll.astype(jnp.uint32))
            t1b = jnp.where(tvalid[sl], ll + 3, 0)
            d_pack = table_lookup(d_pack_r[q % R], dcode[sl], C.NUM_DIST_SYMBOLS)
            dc_ = (d_pack & 0xFFFF).astype(jnp.uint32)
            dl = d_pack >> 16
            t2v = dc_ | (exv[sl].astype(jnp.uint32) << dl.astype(jnp.uint32))
            t2b = jnp.where(tvalid[sl], dl + 2, 0)
            segs_v.append(jnp.stack([t1v, t2v], axis=1).reshape(-1))
            segs_b.append(jnp.stack([t1b, t2b], axis=1).reshape(-1))
        return jnp.concatenate(segs_v), jnp.concatenate(segs_b)

    t = sync_time(jax.vmap(s_fields), lsym, dcode, tvalid, exv, lpack, dpack, iters=IT)
    print(f"tok fields  : {t*1e3/B:8.3f} ms/chunk")

    # d) the bit pack itself (2E token fields + header/stored slack)
    from deflate_rs_tpu.ops.bitpack import pack_fields
    from deflate_rs_tpu.ops.chunk_encode import out_words

    F = 2 * E + 256
    NW = out_words(E)
    vals = jax.device_put(rng.integers(0, 1 << 16, (B, F)).astype(np.uint32))
    bits = jax.device_put(
        (rng.integers(0, 12, (B, F)) * (rng.random((B, F)) < 0.4)).astype(np.int32))
    t = sync_time(jax.vmap(functools.partial(pack_fields, num_words=NW)),
                  vals, bits, iters=IT)
    print(f"pack_fields : {t*1e3/B:8.3f} ms/chunk")

    # e) symbol mapping (arithmetic length/dist codes)
    from deflate_rs_tpu.ops.symbolmap import dist_code, length_code

    lens = jax.device_put(rng.integers(3, 258, (B, E)).astype(np.int32))
    dists = jax.device_put(rng.integers(1, 32768, (B, E)).astype(np.int32))

    def s_sym(ln, dd):
        lc, ln_, lv = length_code(ln)
        dc_, dn, dv = dist_code(dd)
        return lc + dc_ + ln_ + dn, lv + dv

    t = sync_time(jax.vmap(s_sym), lens, dists, iters=IT)
    print(f"symbol map  : {t*1e3/B:8.3f} ms/chunk")

    # f) jump graph + parse
    from deflate_rs_tpu.ops.parse import build_jumps
    from deflate_rs_tpu.ops.parse_scan import parse_scan

    blen = jax.device_put((rng.integers(0, 40, (B, E)) * (rng.random((B, E)) < 0.3)).astype(np.int32))
    bdist = jax.device_put(rng.integers(1, 32768, (B, E)).astype(np.int32))
    ns = jax.device_put(np.full(B, E, np.int32))

    def s_parse(bl, bd, n):
        steps = build_jumps(bl, bd, lazy=True, lazy_if_less_than=32)
        if jax.default_backend() == "tpu":
            return parse_scan(steps, n)
        return steps

    t = sync_time(jax.vmap(s_parse), blen, bdist, ns, iters=IT)
    print(f"jumps+parse : {t*1e3/B:8.3f} ms/chunk")


if __name__ == "__main__":
    main()
