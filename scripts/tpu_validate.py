"""On-TPU validation sweep: the roundtrip/preset/edge matrix on real hardware.

The CPU test suite (tests/) exercises kernel semantics in interpreter mode;
this script runs the same matrix through the COMPILED TPU path — the branch
actually used in production (`chunk_encode` on backend 'tpu') — so a
compiled-Mosaic divergence from interpret mode cannot ship silently.

Usage:  python scripts/tpu_validate.py            # full sweep
        python scripts/tpu_validate.py --quick    # default preset only

Prints one PASS/FAIL line per case and a summary; exit code 0 iff all pass.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cases(data_dir):
    rng = np.random.default_rng(42)
    with open(os.path.join(data_dir, "pg11.txt"), "rb") as f:
        text = f.read()

    cases = {
        "text_1chunk": text[:65536],
        "text_multi": text,
        "text_odd": text[: 65536 + 12345],
        "empty": b"",
        "one": b"x",
        "four": b"abca",
        "zeros_65537": b"\x00" * 65537,
        "zeros_200k": b"\x00" * 200_000,
        "ones_run": b"\xff" * 70_000,
        "random_64k": rng.integers(0, 256, 65536, dtype=np.uint8).tobytes(),
        "random_150k": rng.integers(0, 256, 150_000, dtype=np.uint8).tobytes(),
        "high_bytes": rng.integers(144, 256, 70_000, dtype=np.uint8).tobytes(),
        "period_2": b"ab" * 40_000,
        "period_7": b"exampl7" * 11_000,
        "period_13": (bytes(range(13)) * 6000),
        "alt_text_bin": (text[:8192] + bytes(rng.integers(0, 256, 8192, dtype=np.uint8))) * 5,
        "small_alphabet": rng.integers(0, 4, 100_000, dtype=np.uint8).tobytes(),
        "repeated_block": (lambda b: b + b + b[: len(b) // 2])(
            rng.integers(0, 256, 40_000, dtype=np.uint8).tobytes()
        ),
        "exact_64k": text[:65536],
        "exact_128k": (text * 2)[:131072],
        "boundary_65535": text[:65535],
        "boundary_65537": text[:65537],
        "ladder": bytes(range(256)) * 300,
    }
    # AFL regression corpus replay, if present.
    afl_dir = os.path.join(data_dir, "afl")
    if os.path.isdir(afl_dir):
        for name in sorted(os.listdir(afl_dir))[:10]:
            with open(os.path.join(afl_dir, name), "rb") as f:
                cases[f"afl_{name[:18]}"] = f.read()
    return cases


def device_decode_sweep(platform: str) -> int:
    """Encode -> DEVICE decode -> compare, 30+ cases.

    Case capacities are tiered (one compile per tier); the decoder is a
    validator, so shapes stay modest.  Direction 2 (zlib-produced streams)
    checks the decoder independently of our encoder.
    """
    import zlib as _zlib

    import deflate_rs_tpu as dt
    from deflate_rs_tpu.compression_options import CompressionOptions
    from deflate_rs_tpu.ops.inflate_device import inflate_device

    data_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "data"
    )
    rng = np.random.default_rng(7)
    with open(os.path.join(data_dir, "pg11.txt"), "rb") as f:
        text = f.read()
    with open(os.path.join(data_dir, "issue_18_201911.bin"), "rb") as f:
        issue18 = f.read()

    contents = {
        "text16k": text[:16384],
        "text_odd": text[: 16384 + 777],
        "text_2chunk": text[:80000],  # crosses a chunk seam (sync marker)
        "binary": issue18,
        "random": rng.integers(0, 256, 30000, dtype=np.uint8).tobytes(),  # stored
        "zeros": b"\x00" * 40000,  # RLE runs
        "period7": b"exampl7" * 3000,
        "small_alpha": rng.integers(0, 4, 30000, dtype=np.uint8).tobytes(),
        "tiny": b"Deflate late",  # fixed block
        "empty": b"",
    }
    presets = {
        "default": CompressionOptions.default(),
        "fast": CompressionOptions.fast(),
        "high": CompressionOptions.high(),
        "rle": CompressionOptions.rle(),
        "huffman_only": CompressionOptions.huffman_only(),
    }

    def cap(n):
        return max(4096, (n + 16383) & ~16383)

    failures, n_run = [], 0
    t_start = time.perf_counter()
    # Direction 1: our encoder's streams, presets x a content subset.
    plan = [(p, c) for p in presets for c in
            ("text16k", "random", "zeros", "tiny")]
    plan += [("default", c) for c in contents if c not in
             ("text16k", "random", "zeros", "tiny")]
    for pname, cname in plan:
        data = contents[cname]
        n_run += 1
        t0 = time.perf_counter()
        try:
            stream = dt.deflate_bytes_conf(data, presets[pname])
            ok = inflate_device(stream, cap(len(data))) == data
            status = "PASS" if ok else "FAIL"
        except Exception as e:  # noqa: BLE001
            status, ok = f"ERROR {type(e).__name__}: {e}", False
        print(f"{status:8s} dec<-{pname:13s} {cname:12s} {len(data):7d}"
              f"  {time.perf_counter()-t0:6.2f}s", flush=True)
        if not ok:
            failures.append((pname, cname))
    # Direction 2: zlib-produced streams (encoder-independent).
    for level in (1, 6, 9):
        for cname in ("text16k", "period7", "small_alpha", "binary"):
            data = contents[cname]
            n_run += 1
            t0 = time.perf_counter()
            try:
                co = _zlib.compressobj(level, _zlib.DEFLATED, -15)
                stream = co.compress(data) + co.flush()
                ok = inflate_device(stream, cap(len(data))) == data
                status = "PASS" if ok else "FAIL"
            except Exception as e:  # noqa: BLE001
                status, ok = f"ERROR {type(e).__name__}: {e}", False
            print(f"{status:8s} dec<-zlib-{level}    {cname:12s} {len(data):7d}"
                  f"  {time.perf_counter()-t0:6.2f}s", flush=True)
            if not ok:
                failures.append((f"zlib-{level}", cname))

    total_s = time.perf_counter() - t_start
    print(f"\ndevice-decode: {n_run - len(failures)}/{n_run} passed on "
          f"{platform} in {total_s:.0f}s")
    if failures:
        print("FAILURES:", failures)
        return 1
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="default preset only")
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (smoke the matrix when no TPU is attached; "
        "env alone is too late — the site hook imports jax at startup)",
    )
    ap.add_argument(
        "--device-decode", action="store_true",
        help="run the DEVICE-SIDE inflate validator (ops/inflate_device.py): "
        "encode -> decode on device -> compare, 30+ cases incl. zlib-produced "
        "streams (the north star's closing clause)",
    )
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import deflate_rs_tpu as dt
    from deflate_rs_tpu.compression_options import CompressionOptions
    from deflate_rs_tpu.models.inflate import inflate

    platform = jax.devices()[0].platform
    print(f"platform: {platform}")

    if args.device_decode:
        return device_decode_sweep(platform)

    presets = {"default": CompressionOptions.default()}
    if not args.quick:
        presets.update(
            fast=CompressionOptions.fast(),
            high=CompressionOptions.high(),
            rle=CompressionOptions.rle(),
            huffman_only=CompressionOptions.huffman_only(),
        )

    data_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "data")
    cases = build_cases(data_dir)

    failures = []
    n_run = 0
    t_start = time.perf_counter()
    for pname, opts in presets.items():
        for cname, data in cases.items():
            # Small inputs hit the SMALL_EMIT pipeline tier; keep a couple per
            # preset but skip the rest to bound compile count.
            if len(data) <= 4096 and cname not in ("empty", "one", "four"):
                continue
            n_run += 1
            t0 = time.perf_counter()
            try:
                out = dt.deflate_bytes_conf(data, opts)
                dec = zlib.decompress(out, wbits=-15)
                ok = dec == data
                # Second oracle: our own spec decoder, on a subset (slow in
                # Python for big inputs).
                if ok and len(data) <= 70_000:
                    ok = inflate(out) == data
                status = "PASS" if ok else "FAIL"
            except Exception as e:  # noqa: BLE001
                status, out = f"ERROR {type(e).__name__}: {e}", b""
                ok = False
            dt_s = time.perf_counter() - t0
            print(f"{status:8s} {pname:13s} {cname:18s} {len(data):8d} -> {len(out):8d}  {dt_s:6.2f}s", flush=True)
            if not ok:
                failures.append((pname, cname))

    # Corpus-path cases (the batched pipeline behind bench.py): exercises
    # the device-side used-prefix compaction, two-piece fetch, stored-chunk
    # host re-emission, and marker-free splicing on the compiled TPU path.
    from deflate_rs_tpu.parallel.corpus import compress_corpus

    rng = np.random.default_rng(3)
    with open(os.path.join(data_dir, "pg11.txt"), "rb") as f:
        text = f.read()
    corpus_cases = {
        "corpus_text": (text * 3)[: 6 * 65536 + 777],
        "corpus_stored": rng.integers(0, 256, 4 * 65536, dtype=np.uint8).tobytes(),
        "corpus_cap_overflow": rng.integers(0, 64, 4 * 65536, dtype=np.uint8).tobytes(),
        "corpus_mixed": text[:100_000]
        + rng.integers(0, 256, 65536, dtype=np.uint8).tobytes()
        + b"\x00" * 70_000,
    }
    for cname, data in corpus_cases.items():
        n_run += 1
        t0 = time.perf_counter()
        try:
            res = compress_corpus(data, batch_size=4)
            ok = zlib.decompress(res.deflate, wbits=-15) == data
            ok = ok and res.adler == zlib.adler32(data) and res.crc32 == zlib.crc32(data)
            out = res.deflate
            status = "PASS" if ok else "FAIL"
        except Exception as e:  # noqa: BLE001
            status, out, ok = f"ERROR {type(e).__name__}: {e}", b"", False
        dt_s = time.perf_counter() - t0
        print(f"{status:8s} {'corpus':13s} {cname:18s} {len(data):8d} -> {len(out):8d}  {dt_s:6.2f}s", flush=True)
        if not ok:
            failures.append(("corpus", cname))

    total_s = time.perf_counter() - t_start
    print(f"\n{n_run - len(failures)}/{n_run} passed on {platform} in {total_s:.0f}s")
    if failures:
        print("FAILURES:", failures)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
