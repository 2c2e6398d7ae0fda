"""Ratio headroom sweep for the FAST preset (VERDICT r4 item 2).

Fast's contract is zlib-1-class size (pg11 budget 72,095) at maximum
throughput.  Every probe word is a sort operand, so narrower probes cut the
dominant stage cost; this sweep finds how narrow the probe can go while
keeping every corpus under its zlib-1 budget.  CPU (ratio only).
"""

from __future__ import annotations

import os
import sys
import zlib
from dataclasses import replace

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
    z1 = {k: len(zlib.compress(v, 1)) - 6 for k, v in CORPORA.items()}
    names = sorted(CORPORA)
    base = CompressionOptions.fast()
    configs = [
        ("PW4(cur)", base),
        ("PW3", replace(base, probe_words_override=3)),
        ("PW2", replace(base, probe_words_override=2)),
        ("PW1", replace(base, probe_words_override=1)),
    ]
    print(f"{'config':>10s}" + "".join(f" {n:>10s}" for n in names))
    print(f"{'zlib1':>10s}" + "".join(f" {z1[n]:>10d}" for n in names), flush=True)
    for label, opt in configs:
        row = [f"{label:>10s}"]
        worst = 0.0
        for n in names:
            sz = len(compress_stream(CORPORA[n], opt).deflate)
            worst = max(worst, sz / z1[n])
            mark = "" if sz <= z1[n] else "!"
            row.append(f" {sz:>9d}{mark or ' '}")
        print("".join(row) + f"  worst={worst:.3f}", flush=True)


if __name__ == "__main__":
    main()
