"""Ratio sweep over diverse REAL in-image corpora (VERDICT r2 item 7).

Measures default vs zlib-6 and high vs zlib-9 on non-synthetic content
classes: ELF shared library, ELF executable, concatenated docs (text),
JSON configs, Python source, locale/charmap data, plus the repo's pinned
corpora.  Results back tests/test_ratio.py's corpus guards.
"""

from __future__ import annotations

import glob
import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from deflate_rs_tpu.compression_options import CompressionOptions  # noqa: E402
from deflate_rs_tpu.models.deflate import compress_stream  # noqa: E402

CAP = 256 * 1024


def build_corpora():
    out = {}

    def add_file(name, path, cap=CAP):
        if os.path.exists(path):
            with open(path, "rb") as f:
                out[name] = f.read()[:cap]

    add_file("libc_elf", "/usr/lib/x86_64-linux-gnu/libc.so.6")
    add_file("bash_elf", "/bin/bash")
    # Concatenated package docs (text).
    docs = []
    for p in sorted(glob.glob("/usr/share/doc/*/copyright"))[:200]:
        try:
            with open(p, "rb") as f:
                docs.append(f.read())
        except OSError:
            pass
        if sum(len(d) for d in docs) > CAP:
            break
    if docs:
        out["doc_text"] = b"".join(docs)[:CAP]
    js = []
    for p in sorted(glob.glob("/usr/share/gdal/*.json"))[:50]:
        with open(p, "rb") as f:
            js.append(f.read())
        if sum(len(d) for d in js) > CAP:
            break
    if js:
        out["json_cfg"] = b"".join(js)[:CAP]
    py = []
    import numpy as _np

    npdir = os.path.dirname(_np.__file__)
    for p in sorted(glob.glob(os.path.join(npdir, "**", "*.py"), recursive=True))[:80]:
        with open(p, "rb") as f:
            py.append(f.read())
        if sum(len(d) for d in py) > CAP:
            break
    out["py_source"] = b"".join(py)[:CAP]
    add_file("charmap", "/usr/share/i18n/charmaps/UTF-8.gz")  # already-deflated
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    add_file("pg11", os.path.join(here, "tests", "data", "pg11.txt"))
    add_file("issue18", os.path.join(here, "tests", "data", "issue_18_201911.bin"))
    return out


def main():
    corp = build_corpora()
    dflt = CompressionOptions.default()
    high = CompressionOptions.high()
    print(f"{'corpus':10s} {'bytes':>8s} {'default':>9s} {'zlib-6':>9s} "
          f"{'ok':>3s} {'high':>9s} {'zlib-9':>9s} {'ok':>3s}")
    for name, data in corp.items():
        d = len(compress_stream(data, dflt).deflate)
        z6 = len(zlib.compress(data, 6)) - 6
        h = len(compress_stream(data, high).deflate)
        z9 = len(zlib.compress(data, 9)) - 6
        print(f"{name:10s} {len(data):8d} {d:9d} {z6:9d} "
              f"{'Y' if d <= z6 else 'N':>3s} {h:9d} {z9:9d} "
              f"{'Y' if h <= z9 else 'N':>3s}", flush=True)


if __name__ == "__main__":
    main()
