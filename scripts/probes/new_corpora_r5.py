"""Round-5 (final session) contract probe on NEW content classes.

Three classes not in tests/test_corpora_ratio.py's nine:
- man_gz: concatenated pre-compressed .gz man pages (incompressible class —
  stresses the stored/fixed decision; zlib-6 degenerates to stored framing).
- etc_text: concatenated /etc config text (short-line prose, high redundancy).
- locale_mo: concatenated binary .mo message catalogs (string tables).

Prints ours-vs-zlib margins for default (vs z6) and high (vs z9 and z6) at a
128 KiB cap.  Decision rule: margin <= 1.0 -> candidate for pinning; > 1.0 ->
record as a found hole.
"""

import glob
import os
import sys
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402

# The host image pins JAX_PLATFORMS=axon via sitecustomize; env vars are
# ignored — force the CPU backend the way tests/conftest.py does.
jax.config.update("jax_platforms", "cpu")

import deflate_rs_tpu as dt  # noqa: E402
from deflate_rs_tpu import CompressionOptions  # noqa: E402

CAP = 128 * 1024


def _concat(paths, cap=CAP):
    acc = []
    for p in paths:
        try:
            with open(p, "rb") as f:
                acc.append(f.read())
        except OSError:
            continue
        if sum(map(len, acc)) > cap:
            break
    return b"".join(acc)[:cap]


def corpora():
    out = {}
    gz = sorted(glob.glob("/usr/share/man/man1/*.gz"))[:400]
    if gz:
        out["man_gz"] = _concat(gz)
    etc = sorted(
        p for p in glob.glob("/etc/**/*", recursive=True)
        if os.path.isfile(p) and os.access(p, os.R_OK)
    )[:400]
    if etc:
        out["etc_text"] = _concat(etc)
    mo = sorted(glob.glob("/usr/share/locale/*/LC_MESSAGES/*.mo"))[:200]
    if mo:
        out["locale_mo"] = _concat(mo)
    return {k: v for k, v in out.items() if len(v) >= 32 * 1024}


def main():
    for name, data in corpora().items():
        z6 = len(zlib.compress(data, 6)) - 6
        z9 = len(zlib.compress(data, 9)) - 6
        d = len(dt.deflate_bytes_conf(data, CompressionOptions.default()))
        h = len(dt.deflate_bytes_conf(data, CompressionOptions.high()))
        print(
            f"{name:10s} n={len(data):7d}  default {d} vs z6 {z6} "
            f"(margin {d / z6:.4f})  high {h} vs z9 {z9} / z6 {z6} "
            f"(margins {h / z9:.4f} / {h / z6:.4f})"
        )


if __name__ == "__main__":
    main()
