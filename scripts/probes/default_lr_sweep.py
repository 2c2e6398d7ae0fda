"""Ratio sweep: budgeted long-range configs for the DEFAULT preset.

VERDICT r3 item 1: Default must be <= zlib-6 on every in-image corpus at
<= ~2 ms/chunk.  The high preset proves the matches are findable (M48/S32/x2
long-range); this sweep finds the SMALLEST (num_dom, dom_segs, dom_iters)
that closes the json_cfg/doc_text/py_source gaps, to be paid from ~1 ms of
device budget.  Ratio is platform-independent; run on CPU.
"""

from __future__ import annotations

import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(REPO, "tests"))

from deflate_rs_tpu.compression_options import CompressionOptions  # noqa: E402
from deflate_rs_tpu.models.deflate import compress_stream  # noqa: E402
from test_corpora_ratio import CORPORA  # noqa: E402


def main():
    z6 = {k: len(zlib.compress(v, 6)) - 6 for k, v in CORPORA.items()}
    names = sorted(CORPORA)
    configs = [("off", CompressionOptions.default())]
    for m, s, it, st in [(32, 32, 1, 2), (36, 32, 1, 4), (40, 32, 1, 4),
                         (40, 32, 1, 2), (48, 32, 1, 4)]:
        configs.append((
            f"M{m}S{s}x{it}st{st}",
            CompressionOptions(long_range="on", num_dom=m, dom_segs=s,
                               dom_iters=it, lr_stride=st),
        ))
    hdr = f"{'config':>10s}" + "".join(f" {n:>10s}" for n in names)
    print(hdr)
    print(f"{'zlib6':>10s}" + "".join(f" {z6[n]:>10d}" for n in names), flush=True)
    for label, opt in configs:
        row = [f"{label:>10s}"]
        worst = 0.0
        t0 = time.perf_counter()
        for n in names:
            sz = len(compress_stream(CORPORA[n], opt).deflate)
            worst = max(worst, sz / z6[n])
            mark = "" if sz <= z6[n] else "!"
            row.append(f" {sz:>9d}{mark or ' '}")
        print("".join(row) + f"  worst={worst:.3f} ({time.perf_counter()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
