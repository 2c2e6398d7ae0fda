"""Diverse-corpora ratio guards (VERDICT r2 item 7).

The high preset is the ratio flagship: it must stay at-or-under BOTH zlib-9
and zlib-6 on every in-image corpus class (ELF code, concatenated docs, JSON
configs, Python sources, text, structured binary).  The default preset is
throughput-tiered (long-range recovery off — docs/perf_notes.md round-3
ledger): it must stay at-or-under zlib-6 on the reference-anchored corpora
(text, ELF, issue18) and within a tracked ceiling on cross-file corpora
where long-range matches dominate (the Best preset covers those).
"""

import glob
import os
import zlib

import pytest

import deflate_rs_tpu as dt
from deflate_rs_tpu import CompressionOptions

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
CAP = 128 * 1024


def _corpora():
    out = {}
    for name, path in (
        ("libc_elf", "/usr/lib/x86_64-linux-gnu/libc.so.6"),
        ("bash_elf", "/bin/bash"),
    ):
        if os.path.exists(path):
            with open(path, "rb") as f:
                out[name] = f.read()[:CAP]
    docs = []
    for p in sorted(glob.glob("/usr/share/doc/*/copyright"))[:200]:
        try:
            with open(p, "rb") as f:
                docs.append(f.read())
        except OSError:
            continue
        if sum(map(len, docs)) > CAP:
            break
    if docs:
        out["doc_text"] = b"".join(docs)[:CAP]
    js = []
    for p in sorted(glob.glob("/usr/share/gdal/*.json"))[:50]:
        with open(p, "rb") as f:
            js.append(f.read())
        if sum(map(len, js)) > CAP:
            break
    if js:
        out["json_cfg"] = b"".join(js)[:CAP]
    import numpy as _np

    py = []
    npdir = os.path.dirname(_np.__file__)
    for p in sorted(glob.glob(os.path.join(npdir, "**", "*.py"), recursive=True))[:80]:
        with open(p, "rb") as f:
            py.append(f.read())
        if sum(map(len, py)) > CAP:
            break
    out["py_source"] = b"".join(py)[:CAP]
    with open(os.path.join(DATA_DIR, "pg11.txt"), "rb") as f:
        out["pg11"] = f.read()[:CAP]
    with open(os.path.join(DATA_DIR, "issue_18_201911.bin"), "rb") as f:
        out["issue18"] = f.read()
    return out


CORPORA = _corpora()


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_high_beats_zlib9_and_zlib6(name):
    data = CORPORA[name]
    ours = len(dt.deflate_bytes_conf(data, CompressionOptions.high()))
    z9 = len(zlib.compress(data, 9)) - 6
    z6 = len(zlib.compress(data, 6)) - 6
    assert ours <= z9, f"high {ours} > zlib-9 {z9} on {name}"
    assert ours <= z6, f"high {ours} > zlib-6 {z6} on {name}"


# Throughput-tiered default: strict <= zlib-6 where the reference's own
# regression corpora live; tracked ceilings (vs zlib-6) on cross-file
# corpora whose long matches need the Best preset's long-range pass.
DEFAULT_CEILING = {
    "libc_elf": 1.0,
    "bash_elf": 1.0,
    "pg11": 1.0,
    "issue18": 1.0,
    "doc_text": 1.06,
    "py_source": 1.02,
    "json_cfg": 1.40,
}


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_default_vs_zlib6_tiered(name):
    data = CORPORA[name]
    ours = len(dt.deflate_bytes_conf(data, CompressionOptions.default()))
    z6 = len(zlib.compress(data, 6)) - 6
    ceil = DEFAULT_CEILING[name]
    assert ours <= z6 * ceil, (
        f"default {ours} > {ceil} * zlib-6 {z6} on {name}"
    )
