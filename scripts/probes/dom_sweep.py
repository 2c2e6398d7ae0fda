"""Dominant-distance sweep for the default preset on the losing corpora.

The long-range pass measures EXACT run lengths at the top-M candidate
distances; this sweeps M (and the capped-claim merge) to see how much of the
doc_text/json_cfg/py_source gap is distance coverage.
"""

from __future__ import annotations

import os
import sys
import zlib
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from deflate_rs_tpu.compression_options import CompressionOptions  # noqa: E402
from deflate_rs_tpu.models.deflate import compress_stream  # noqa: E402
from scripts.corpora_ratio import build_corpora  # noqa: E402

CORPORA = os.environ.get("DOM_CORPORA", "doc_text,json_cfg,py_source,pg11").split(",")
DOMS = [int(x) for x in os.environ.get("DOM_LIST", "8,16,32,64").split(",")]
PW = int(os.environ.get("DOM_PW", "0"))


def main():
    corp = {k: v for k, v in build_corpora().items() if k in CORPORA}
    base = CompressionOptions.default()
    if PW:
        base = replace(base, probe_words_override=PW)
    print(f"{'corpus':10s} {'bytes':>8s} {'zlib-6':>9s} " +
          " ".join(f"{'M=' + str(m):>9s}" for m in DOMS))
    for name, data in corp.items():
        z6 = len(zlib.compress(data, 6)) - 6
        row = []
        for m in DOMS:
            opts = replace(base, num_dom=m)
            row.append(len(compress_stream(data, opts).deflate))
        print(f"{name:10s} {len(data):8d} {z6:9d} " +
              " ".join(f"{r:9d}" for r in row), flush=True)


if __name__ == "__main__":
    main()
