"""High-preset retune (VERDICT r4 item 7): hold 7/7 corpus dominance
(<= zlib-9 AND <= zlib-6 everywhere) at a fraction of 12.7 ms/chunk.

The r3 high = hash matcher K=256 (a 256-iteration fori: ~13 us/iter of
while-loop overhead alone) + PW16 + exact split scoring + local LR.  With
the LR measurement now a Mosaic kernel, try sa-matcher highs with deep
tails + bigger LR budgets.  CPU ratio first; TPU timing separately.
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

from deflate_rs_tpu.compression_options import (  # noqa: E402
    CompressionOptions, MatchingType,
)
from deflate_rs_tpu.models.deflate import compress_stream  # noqa: E402
from test_corpora_ratio import CORPORA  # noqa: E402


def sa_high(k, pw, m, s, it, st=1):
    """An sa-matcher high: budget 2k chain checks -> K = k, deep tail."""
    return CompressionOptions(
        max_hash_checks=2 * k,  # sa: num_candidates = budget // 2
        lazy_if_less_than=128, matching_type=MatchingType.Lazy,
        probe_words_override=pw, split_scoring="exact", long_range="on",
        num_dom=m, dom_segs=s, dom_iters=it, lr_stride=st,
    )


def main():
    z9 = {k: len(zlib.compress(v, 9)) - 6 for k, v in CORPORA.items()}
    z6 = {k: len(zlib.compress(v, 6)) - 6 for k, v in CORPORA.items()}
    names = sorted(CORPORA)
    budget = {k: min(z9[k], z6[k]) for k in names}
    configs = [
        ("cur-high", CompressionOptions.high()),
        ("saK128pw16", sa_high(128, 16, 48, 32, 2)),
        ("saK128pw8", sa_high(128, 8, 48, 32, 2)),
        ("saK192pw16", sa_high(192, 16, 48, 32, 2)),
        ("saK128pw16x1", sa_high(128, 16, 64, 32, 1)),
    ]
    print(f"{'config':>14s}" + "".join(f" {n:>10s}" for n in names))
    print(f"{'min(z9,z6)':>14s}" + "".join(f" {budget[n]:>10d}" for n in names),
          flush=True)
    for label, opt in configs:
        row = [f"{label:>14s}"]
        worst = 0.0
        for n in names:
            sz = len(compress_stream(CORPORA[n], opt).deflate)
            worst = max(worst, sz / budget[n])
            mark = "" if sz <= budget[n] else "!"
            row.append(f" {sz:>9d}{mark or ' '}")
        print("".join(row) + f"  worst={worst:.4f}", flush=True)


if __name__ == "__main__":
    main()
