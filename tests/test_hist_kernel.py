"""The fused histogram kernel must match the XLA one-hot path bit for bit."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deflate_rs_tpu import constants as C
from deflate_rs_tpu.ops.hist_kernel import quarter_histograms_batched
from deflate_rs_tpu.ops.symbolmap import histogram_onehot

ON_TPU = jax.default_backend() == "tpu"


def xla_reference(lsym_eff, dcode_eff, nq):
    B, E = lsym_eff.shape
    QL = E // nq
    lf = np.zeros((B, nq, C.NUM_USED_LITLEN), np.int32)
    df = np.zeros((B, nq, C.NUM_DIST_SYMBOLS), np.int32)
    for b in range(B):
        for q in range(nq):
            sl = slice(q * QL, (q + 1) * QL)
            lv = lsym_eff[b, sl]
            dv = dcode_eff[b, sl]
            lf[b, q] = np.asarray(histogram_onehot(
                jnp.asarray(lv), jnp.asarray(lv < C.NUM_USED_LITLEN),
                C.NUM_USED_LITLEN))
            df[b, q] = np.asarray(histogram_onehot(
                jnp.asarray(dv), jnp.asarray(dv < C.NUM_DIST_SYMBOLS),
                C.NUM_DIST_SYMBOLS))
    return lf, df


@pytest.mark.parametrize("nq", [1, 4])
def test_hist_kernel_matches_onehot(nq):
    rng = np.random.default_rng(nq)
    B, E = 3, 4096
    # Realistic mix: mostly literals (0..255), some length syms (257..285),
    # invalid filler (999) at non-token positions.
    lsym = rng.integers(0, 286, (B, E)).astype(np.int32)
    lsym[rng.random((B, E)) < 0.4] = 999
    dcode = rng.integers(0, 30, (B, E)).astype(np.int32)
    dcode[rng.random((B, E)) < 0.7] = 99
    lf, df = quarter_histograms_batched(
        jnp.asarray(lsym), jnp.asarray(dcode), nq, interpret=not ON_TPU)
    lf_ref, df_ref = xla_reference(lsym, dcode, nq)
    np.testing.assert_array_equal(np.asarray(lf), lf_ref)
    np.testing.assert_array_equal(np.asarray(df), df_ref)
