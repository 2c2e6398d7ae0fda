"""The fused token-field kernel must match the XLA table_lookup path bit
for bit (the packed bitstream depends on these fields exactly)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deflate_rs_tpu.ops.field_kernel import token_fields_batched
from deflate_rs_tpu.ops.symbolmap import table_lookup

ON_TPU = jax.default_backend() == "tpu"


def xla_reference(huff, lsym_eff, len_en, len_ev, dcode_eff, dist_en,
                  dist_ev, l_pack_q, d_pack_q):
    B, E = lsym_eff.shape
    nq = l_pack_q.shape[1]
    QL = E // nq
    t1v = np.zeros((B, E), np.int32)
    t1b = np.zeros((B, E), np.int32)
    t2v = np.zeros((B, E), np.int32)
    t2b = np.zeros((B, E), np.int32)
    for b in range(B):
        for q in range(nq):
            sl = slice(q * QL, (q + 1) * QL)
            ls = jnp.asarray(np.clip(lsym_eff[b, sl], 0, 287))
            l_pack = table_lookup(jnp.asarray(l_pack_q[b, q]), ls, 288)
            code = np.asarray(l_pack) & 0xFFFF
            ln = np.asarray(l_pack) >> 16
            tok = (lsym_eff[b, sl] < 288) & bool(huff[b])
            t1v[b, sl] = code | (len_ev[b, sl].astype(np.uint32) << ln.astype(np.uint32)).astype(np.int32)
            t1b[b, sl] = np.where(tok, ln + len_en[b, sl], 0)
            dc = jnp.asarray(np.clip(dcode_eff[b, sl], 0, 29))
            d_pack = table_lookup(jnp.asarray(d_pack_q[b, q]), dc, 30)
            dcd = np.asarray(d_pack) & 0xFFFF
            dl = np.asarray(d_pack) >> 16
            mt = (dcode_eff[b, sl] < 30) & bool(huff[b])
            t2v[b, sl] = dcd | (dist_ev[b, sl].astype(np.uint32) << dl.astype(np.uint32)).astype(np.int32)
            t2b[b, sl] = np.where(mt, dl + dist_en[b, sl], 0)
    return t1v, t1b, t2v, t2b


@pytest.mark.parametrize("nq", [1, 4])
def test_field_kernel_matches_xla(nq):
    rng = np.random.default_rng(nq + 10)
    B, E = 2, 2048
    lsym = rng.integers(0, 288, (B, E)).astype(np.int32)
    lsym[rng.random((B, E)) < 0.3] = 999
    len_en = rng.integers(0, 6, (B, E)).astype(np.int32)
    len_ev = rng.integers(0, 32, (B, E)).astype(np.int32)
    dcode = rng.integers(0, 30, (B, E)).astype(np.int32)
    dcode[rng.random((B, E)) < 0.6] = 99
    dist_en = rng.integers(0, 14, (B, E)).astype(np.int32)
    dist_ev = rng.integers(0, 1 << 13, (B, E)).astype(np.int32)
    # Realistic packed entries: code (<= 15 bits reversed) | len << 16.
    l_pack_q = (rng.integers(0, 1 << 15, (B, nq, 288))
                | (rng.integers(1, 16, (B, nq, 288)) << 16)).astype(np.int32)
    d_pack_q = (rng.integers(0, 1 << 15, (B, nq, 30))
                | (rng.integers(1, 16, (B, nq, 30)) << 16)).astype(np.int32)
    huff = np.array([1, 0], np.int32)[:B]

    outs = token_fields_batched(
        jnp.asarray(huff), jnp.asarray(lsym), jnp.asarray(len_en),
        jnp.asarray(len_ev), jnp.asarray(dcode), jnp.asarray(dist_en),
        jnp.asarray(dist_ev), jnp.asarray(l_pack_q), jnp.asarray(d_pack_q),
        interpret=not ON_TPU,
    )
    refs = xla_reference(huff, lsym, len_en, len_ev, dcode, dist_en,
                         dist_ev, l_pack_q, d_pack_q)
    t1v, t1b, t2v, t2b = (np.asarray(o) for o in outs)
    r1v, r1b, r2v, r2b = refs
    # Widths must agree EVERYWHERE (they gate what reaches the stream)...
    np.testing.assert_array_equal(t1b, r1b, err_msg="t1b")
    np.testing.assert_array_equal(t2b, r2b, err_msg="t2b")
    # ...values only where the width is nonzero: pack_fields masks each
    # value to its declared width, so width-0 fields never reach the stream
    # (the kernel and the XLA path intentionally differ there — the XLA path
    # looks up a clipped symbol, the kernel matches no bin).
    np.testing.assert_array_equal(
        np.where(t1b > 0, t1v, 0), np.where(r1b > 0, r1v, 0), err_msg="t1v")
    np.testing.assert_array_equal(
        np.where(t2b > 0, t2v, 0), np.where(r2b > 0, r2v, 0), err_msg="t2v")
