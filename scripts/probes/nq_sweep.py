"""Ratio effect of finer static block-split sub-quarters (VERDICT r3 item 9).

The reference re-decides block type and rebuilds tables every <= 31,744
tokens at content-driven boundaries (output_writer.rs:19, compress.rs:186).
Here splits happen at static sub-quarter seams; nq=8 halves the seam
granularity to 8 KiB.  CPU, ratio only — device cost measured separately.
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

import numpy as np  # noqa: E402

from deflate_rs_tpu.compression_options import CompressionOptions  # noqa: E402
from deflate_rs_tpu.models.deflate import compress_stream  # noqa: E402
from test_corpora_ratio import CORPORA  # noqa: E402


def build_corpora():
    out = dict(CORPORA)
    with open(os.path.join(REPO, "tests", "data", "pg11.txt"), "rb") as f:
        text = f.read()
    rng = np.random.default_rng(0)
    out["mixed_32k"] = b"".join(
        text[i * 32768 : (i + 1) * 32768]
        + rng.integers(0, 256, 32768, dtype=np.uint8).tobytes()
        for i in range(2)
    )
    # Finer-grained alternation: 8 KiB text / 8 KiB binary — seams fall
    # INSIDE static 16 KiB quarters at nq=4.
    out["mixed_8k"] = b"".join(
        text[i * 8192 : (i + 1) * 8192]
        + rng.integers(0, 256, 8192, dtype=np.uint8).tobytes()
        for i in range(8)
    )
    return out


def main():
    corpora = build_corpora()
    names = sorted(corpora)
    zl = {k: (len(zlib.compress(v, 6)) - 6, len(zlib.compress(v, 9)) - 6)
          for k, v in corpora.items()}
    for preset_name, base in (("default", CompressionOptions.default()),
                              ("high", CompressionOptions.high())):
        print(f"== {preset_name}")
        print(f"{'config':>8s}" + "".join(f" {n:>10s}" for n in names))
        print(f"{'zlib6':>8s}" + "".join(f" {zl[n][0]:>10d}" for n in names))
        print(f"{'zlib9':>8s}" + "".join(f" {zl[n][1]:>10d}" for n in names),
              flush=True)
        for nq in (4, 8, 16):
            opt = replace(base, block_split=str(nq))
            row = [f"nq{nq:<6d}"]
            for n in names:
                sz = len(compress_stream(corpora[n], opt).deflate)
                row.append(f" {sz:>10d}")
            print("".join(row), flush=True)


if __name__ == "__main__":
    main()
