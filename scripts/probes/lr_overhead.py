"""Decompose the gated LR pass's remaining text overhead (+0.35 ms/chunk).

On pg11 the kernel's gated loop runs ~1.4 of 32 dominants per segment, yet
default-with-LR still measures +0.35 ms/chunk over lr-off.  This probe jits
each XLA-side LR sub-stage separately on real matcher outputs to find where
that lives: dominant selection (the [S, L/stride] sort + top_k), the
phase-table prep, the Mosaic measurement call, and the byte-expansion
finish.  Isolated stage times over-count the composite (XLA overlap), so
this RANKS candidates; composite A/Bs decide changes.
"""

from __future__ import annotations

import functools
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from deflate_rs_tpu.compression_options import CompressionOptions  # noqa: E402
from deflate_rs_tpu.ops import chunk_encode as ce  # noqa: E402
from deflate_rs_tpu.ops.longrange import (  # noqa: E402
    _select_dominants, local_dominant_lengths_tpu,
)
from deflate_rs_tpu.ops.matching import find_matches  # noqa: E402
from deflate_rs_tpu.utils.profiling import sync_time  # noqa: E402
from scripts.stage_timing import build_inputs  # noqa: E402


def main():
    B = int(os.environ.get("STAGE_BATCH", "16"))
    E = int(os.environ.get("STAGE_EMIT", "65536"))
    bufs, hist, ns, lasts = build_inputs(B, E)
    opts = CompressionOptions.default()
    N = ce.HALO + E
    S, M, stride = (opts.resolved_dom_segs, opts.resolved_num_dom,
                    opts.resolved_lr_stride)
    cap = 4 * opts.probe_words

    def matcher(buf, h, n, last):
        n_total = ce.HALO + n
        hstart = ce.HALO - h
        bl, bd = find_matches(buf, N, n_total, hstart, opts.num_candidates,
                              probe_words=opts.probe_words,
                              nkey=opts.resolved_sort_nkey,
                              tail_jumps=opts.resolved_sa_tail)
        return bl, bd, jnp.where(bl >= cap, bd, 0)

    mfn = jax.jit(jax.vmap(matcher))
    bl, bd, d_cand = mfn(bufs, hist, ns, lasts)
    bl, bd, d_cand = map(jax.device_put, (bl, bd, d_cand))

    sel = jax.jit(jax.vmap(functools.partial(
        _select_dominants, S=S, M=M, harvest_stride=stride,
        sel=opts.resolved_lr_sel, pair=opts.resolved_lr_pair)))

    def full_lr(buf, h, n, dc):
        return local_dominant_lengths_tpu(
            buf, N, ce.HALO + n, ce.HALO - h, dc,
            num_dom=M, num_seg=S, harvest_stride=stride,
            sel=opts.resolved_lr_sel, pair=opts.resolved_lr_pair)

    lr = jax.jit(jax.vmap(full_lr))

    print(f"platform={jax.default_backend()} B={B} S={S} M={M} st={stride}",
          flush=True)
    for name, fn, args in (
        ("matcher alone", mfn, (bufs, hist, ns, lasts)),
        ("select_dominants", sel, (d_cand,)),
        ("full LR (sel+prep+kernel+finish)", lr, (bufs, hist, ns, d_cand)),
    ):
        t = sync_time(fn, *args, iters=12)
        print(f"{name:34s}: {t*1e3/B:7.3f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
