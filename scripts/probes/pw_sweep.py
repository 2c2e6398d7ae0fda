"""Probe-window sweep for the default preset on the losing corpora.

Round-3 ratio work: default loses to zlib-6 on doc_text/json_cfg/py_source
(scripts/corpora_ratio.py).  The high preset (PW=16) wins doc_text; this
sweep isolates how much of that is probe depth vs chain budget.
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

CORPORA = os.environ.get("PW_CORPORA", "doc_text,json_cfg,py_source,pg11,issue18").split(",")
PWS = [int(x) for x in os.environ.get("PW_LIST", "6,8,12,16").split(",")]


def main():
    corp = {k: v for k, v in build_corpora().items() if k in CORPORA}
    base = CompressionOptions.default()
    print(f"{'corpus':10s} {'bytes':>8s} {'zlib-6':>9s} " +
          " ".join(f"{'PW=' + str(pw):>9s}" for pw in PWS))
    for name, data in corp.items():
        z6 = len(zlib.compress(data, 6)) - 6
        row = []
        for pw in PWS:
            opts = replace(base, probe_words_override=pw)
            row.append(len(compress_stream(data, opts).deflate))
        print(f"{name:10s} {len(data):8d} {z6:9d} " +
              " ".join(f"{r:9d}" for r in row), flush=True)


if __name__ == "__main__":
    main()
