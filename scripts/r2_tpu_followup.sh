#!/bin/bash
# Run when the TPU tunnel returns after the round-2 mid-round outage.
# Order matters: validate the compiled paths first (traced code changed
# after the last on-chip sweep: precision pin, adler segment sums,
# exact-path slot row-selection), then re-measure, then tune.
set -x
cd "$(dirname "$0")/.."

# 1. Compiled-path validation of the post-outage code (quick: default
#    preset + corpus cases; drop --quick for the full 169-case matrix).
python scripts/tpu_validate.py --quick || exit 1

# 2. Fresh headline numbers (also refreshes BENCH_LAST_TPU.json).
python bench.py
python bench.py

# 3. Pending experiments (docs/perf_notes.md "Pending hardware experiments"):
BENCH_QUEUE_DEPTH=6 BENCH_DEVICE_METRICS=0 python bench.py
BENCH_QUEUE_DEPTH=8 BENCH_DEVICE_METRICS=0 python bench.py

# 4. Stage decomposition for the perf notes.
python scripts/sa_stage_timing.py
