"""CPU ratio sweep over the matcher's sort-key count (sort_nkey knob).

The sort-cost probe (r3_probe.py) showed key count drives the content sort's
device cost 4x; this measures what each key is worth in compressed size, per
preset, on the ratio corpora the tests pin (pg11 text, issue_18 structured
binary, an ELF, random).  Run on CPU (ratio is backend-independent).
"""

from __future__ import annotations

import dataclasses
import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from deflate_rs_tpu.compression_options import CompressionOptions  # noqa: E402
from deflate_rs_tpu.models.deflate import compress_stream  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def corpora():
    out = {}
    with open(os.path.join(HERE, "tests", "data", "pg11.txt"), "rb") as f:
        out["pg11"] = f.read()
    with open(os.path.join(HERE, "tests", "data", "issue_18_201911.bin"), "rb") as f:
        out["issue18"] = f.read()
    for cand in ("/usr/bin/python3.11", "/bin/bash"):
        if os.path.exists(cand):
            with open(cand, "rb") as f:
                out["elf"] = f.read()[: 1 << 18]
            break
    import numpy as np

    rng = np.random.default_rng(7)
    rec = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    out["records"] = b"".join(
        rec[:48] + int(i).to_bytes(8, "little") + rng.integers(0, 256, 8, dtype=np.uint8).tobytes()
        for i in range(2048)
    )
    return out


def main():
    preset = os.environ.get("NKEY_PRESET", "default")
    base = getattr(CompressionOptions, preset)()
    data = corpora()
    zl = {k: {lvl: len(zlib.compress(v, lvl)) for lvl in (6, 9)} for k, v in data.items()}
    print(f"preset={preset} K={base.num_candidates} PW={base.probe_words}")
    hdr = "corpus".ljust(10) + "".join(f"nk={k}".rjust(10) for k in (1, 2, 3, 4))
    print(hdr + "    zlib-6    zlib-9")
    for name, buf in data.items():
        row = name.ljust(10)
        for nk in (1, 2, 3, 4):
            opts = dataclasses.replace(base, sort_nkey=nk)
            sz = len(compress_stream(buf, opts).deflate)
            row += f"{sz:10d}"
        print(row + f"{zl[name][6]:10d}{zl[name][9]:10d}", flush=True)


if __name__ == "__main__":
    main()
