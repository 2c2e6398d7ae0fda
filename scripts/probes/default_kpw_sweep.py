"""With the long-range pass on, can Default shrink its short-range budget?

The LR pass recovers exactly the long matches the probe window caps, so the
K-deep scan / probe width may afford smaller values.  All corpora must stay
<= zlib-6.  CPU ratio; pairs with a TPU timing of the winners.
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
    z6 = {k: len(zlib.compress(v, 6)) - 6 for k, v in CORPORA.items()}
    names = sorted(CORPORA)
    base = CompressionOptions.default()  # LR on by default now
    configs = [("K64pw6(cur)", base)]
    for k, pw in [(48, 6), (64, 5), (48, 5), (32, 5), (48, 4), (64, 4)]:
        configs.append((
            f"K{k}pw{pw}",
            replace(base, max_hash_checks=2 * k, probe_words_override=pw),
        ))
    print(f"{'config':>12s}" + "".join(f" {n:>10s}" for n in names))
    print(f"{'zlib6':>12s}" + "".join(f" {z6[n]:>10d}" for n in names), flush=True)
    for label, opt in configs:
        row = [f"{label:>12s}"]
        worst = 0.0
        for n in names:
            sz = len(compress_stream(CORPORA[n], opt).deflate)
            worst = max(worst, sz / z6[n])
            mark = "" if sz <= z6[n] else "!"
            row.append(f" {sz:>9d}{mark or ' '}")
        print("".join(row) + f"  worst={worst:.4f}", flush=True)


if __name__ == "__main__":
    main()
