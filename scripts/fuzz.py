"""Structure-guided mutation fuzzer for the encoder.

The reference ships an AFL target (deflate-fuzz-target/src/main.rs) whose
coverage feedback drives input mutation.  Source-coverage instrumentation is
not practical for a jitted XLA pipeline, so this fuzzer uses the encoder's
OBSERVABLE STRUCTURE as the feedback map instead: which block type each chunk
chose, which split composition, how many stored sub-blocks, token-count and
output-size buckets, per preset.  A mutant that lights up a new structure
tuple joins the live corpus, exactly like AFL's new-edge rule — so the corpus
evolves toward inputs that exercise rare encoder paths (stored/huffman
boundaries, split seams, RLE runs, tiny tails).

Every executed input is a full roundtrip check (our encoder -> stdlib zlib
inflate -> byte equality), at two presets like the reference's fuzz target.

Usage:
  python scripts/fuzz.py --iters 200          # bounded run (CI-sized)
  python scripts/fuzz.py --iters 0            # run until interrupted
  python scripts/fuzz.py --seed 7 --max-len 300000

Exit code 0 iff no failure was found; failing inputs are written to
tests/data/fuzz_failures/ for replay.
"""

from __future__ import annotations

import argparse
import os
import sys
import zlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def structure_key(out_meta, preset_name: str) -> tuple:
    """Feedback map: the encoder-structure 'coverage' tuple of one input."""
    btypes, ntoks, sizes = out_meta
    tok_bucket = tuple(min(7, int(t).bit_length() // 2) for t in ntoks[:8])
    size_bucket = tuple(min(7, int(s).bit_length() // 2) for s in sizes[:8])
    return (preset_name, tuple(btypes[:8]), tok_bucket, size_bucket, len(btypes))


def encode_with_structure(data: bytes, options):
    """Compress via the chunk encoder, returning (stream, structure meta)."""
    from deflate_rs_tpu.models.assembly import BitAssembler, splice_encoded_chunk
    from deflate_rs_tpu.models.deflate import FULL_EMIT, SMALL_EMIT, _encode_chunk_host
    from deflate_rs_tpu.ops.chunk_encode import get_chunk_encoder

    n = len(data)
    emit = SMALL_EMIT if n <= SMALL_EMIT else FULL_EMIT
    encoder = get_chunk_encoder(options, emit, with_checksums=False)
    asm = BitAssembler(n + n // 128 + 4096)
    btypes, ntoks, sizes = [], [], []
    offsets = list(range(0, n, FULL_EMIT)) if n else [0]
    for off in offsets:
        ln = min(n - off, FULL_EMIT)
        is_last = off + ln >= n
        out = _encode_chunk_host(encoder, data, off, ln, is_last, emit)
        splice_encoded_chunk(
            asm, int(out["btype"]), int(out["data_bits"]), out["words"],
            data[off : off + ln], is_last,
        )
        btypes.append(int(out["btype"]))
        ntoks.append(int(out["ntokens"]))
        sizes.append(int(out["data_bits"]))
    return asm.take_aligned(), (btypes, ntoks, sizes)


def seeds(rng) -> list[bytes]:
    out = []
    afl = os.path.join(REPO, "tests", "data", "afl")
    if os.path.isdir(afl):
        for name in sorted(os.listdir(afl)):
            with open(os.path.join(afl, name), "rb") as f:
                out.append(f.read())
    with open(os.path.join(REPO, "tests", "data", "pg11.txt"), "rb") as f:
        text = f.read()
    out += [
        b"",
        b"x",
        text[:70_000],
        b"\x00" * 65_537,
        bytes(rng.integers(0, 256, 40_000, dtype=np.uint8)),
        (b"ab" * 9000),
        text[:32768] + bytes(rng.integers(0, 256, 32768, dtype=np.uint8)),
    ]
    return out


def mutate(rng, corpus: list[bytes], max_len: int) -> bytes:
    a = corpus[int(rng.integers(0, len(corpus)))]
    op = int(rng.integers(0, 8))
    b = bytearray(a)
    if op == 0 and b:  # byte flips
        for _ in range(int(rng.integers(1, 16))):
            b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
    elif op == 1:  # insert random span
        pos = int(rng.integers(0, len(b) + 1))
        b[pos:pos] = bytes(rng.integers(0, 256, int(rng.integers(1, 4096)), dtype=np.uint8))
    elif op == 2 and b:  # delete span
        lo = int(rng.integers(0, len(b)))
        b[lo : lo + int(rng.integers(1, 4096))] = b""
    elif op == 3:  # splice two corpus entries
        c = corpus[int(rng.integers(0, len(corpus)))]
        cut_a, cut_c = int(rng.integers(0, len(b) + 1)), int(rng.integers(0, len(c) + 1))
        b = bytearray(bytes(b[:cut_a]) + c[cut_c:])
    elif op == 4 and b:  # repeat a window (manufactures long matches)
        lo = int(rng.integers(0, len(b)))
        w = bytes(b[lo : lo + int(rng.integers(1, 1024))])
        b[lo:lo] = w * int(rng.integers(2, 30))
    elif op == 5:  # run injection (RLE paths)
        pos = int(rng.integers(0, len(b) + 1))
        b[pos:pos] = bytes([int(rng.integers(0, 256))]) * int(rng.integers(3, 70_000))
    elif op == 6:  # resize to boundary-adjacent length
        target = [4095, 4096, 4097, 65535, 65536, 65537, 131072, 98304][int(rng.integers(0, 8))]
        b = bytearray((bytes(b) * (target // max(1, len(b)) + 1))[:target + int(rng.integers(0, 3)) - 1])
    else:  # arithmetic on a few bytes
        for _ in range(int(rng.integers(1, 8))):
            if not b:
                break
            i = int(rng.integers(0, len(b)))
            b[i] = (b[i] + int(rng.integers(-4, 5))) % 256
    return bytes(b[:max_len])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200, help="0 = unbounded")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-len", type=int, default=300_000)
    ap.add_argument(
        "--presets", default="default,fast",
        help="comma list of CompressionOptions preset names to roundtrip "
        "(the reference's AFL target uses Default+Fast; pass "
        "high,rle,huffman_only to hammer the exact-split-scoring paths)",
    )
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

    from deflate_rs_tpu.compression_options import CompressionOptions

    presets = {
        name: getattr(CompressionOptions, name)()
        for name in args.presets.split(",")
    }
    rng = np.random.default_rng(args.seed)
    corpus = seeds(rng)
    seen: set = set()
    failures = []

    corpus_iter = [0]

    def run_one(data: bytes) -> bool:
        new_structure = False
        for pname, opts in presets.items():
            try:
                stream, meta = encode_with_structure(data, opts)
                ok = zlib.decompress(stream, wbits=-15) == data
            except Exception as e:  # noqa: BLE001
                ok, meta = False, ([f"EXC:{type(e).__name__}"], [0], [0])
            if not ok:
                failures.append((pname, data))
                fdir = os.path.join(REPO, "tests", "data", "fuzz_failures")
                os.makedirs(fdir, exist_ok=True)
                with open(os.path.join(fdir, f"fail_{len(failures)}_{pname}.bin"), "wb") as f:
                    f.write(data)
                print(f"FAILURE at preset {pname}, len={len(data)} (saved)", flush=True)
                continue
            key = structure_key(meta, pname)
            if key not in seen:
                seen.add(key)
                new_structure = True
        # Every 8th multi-chunk input also roundtrips through the batched
        # corpus engine (device-side compaction, two-piece fetch, stored
        # host re-emission) with a varying batch size — the pipeline behind
        # bench.py and the auto-routed one-shot path.
        corpus_iter[0] += 1
        if corpus_iter[0] % 8 == 0 and len(data) > 65536:
            from deflate_rs_tpu.parallel.corpus import compress_corpus

            bs = [2, 3, 5][corpus_iter[0] // 8 % 3]
            try:
                res = compress_corpus(data, next(iter(presets.values())), batch_size=bs)
                ok = zlib.decompress(res.deflate, wbits=-15) == data
            except Exception as e:  # noqa: BLE001
                ok = False
                print(f"corpus-path EXC {type(e).__name__}: {e}", flush=True)
            if not ok:
                failures.append(("corpus", data))
                fdir = os.path.join(REPO, "tests", "data", "fuzz_failures")
                os.makedirs(fdir, exist_ok=True)
                with open(os.path.join(fdir, f"fail_{len(failures)}_corpus.bin"), "wb") as f:
                    f.write(data)
                print(f"FAILURE at corpus path, len={len(data)} (saved)", flush=True)
        return new_structure

    for s in corpus:
        run_one(s)
    base_structures = len(seen)
    print(f"seeded: {len(corpus)} inputs, {base_structures} structures", flush=True)

    i = 0
    while args.iters == 0 or i < args.iters:
        i += 1
        m = mutate(rng, corpus, args.max_len)
        if run_one(m):
            corpus.append(m)
        if i % 50 == 0:
            print(
                f"iter {i}: corpus={len(corpus)} structures={len(seen)} failures={len(failures)}",
                flush=True,
            )

    print(
        f"done: {i} iters, corpus grew {len(corpus)}, structures {base_structures}->{len(seen)}, "
        f"failures={len(failures)}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
