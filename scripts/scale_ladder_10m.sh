#!/usr/bin/env bash
# 10M-doc scale ladder (VERDICT r03 ask #6 — RUN_SCALE_TEST.sh parity:
# the reference asserts near-linear build throughput at 100K/1M/10M,
# benchmarks/scalability_test.cpp:238).
#
# Produces:
#   * the three-point throughput curve at a FIXED 8 cores
#     (100K / 1M / 10M docs — fixed-cost amortization story), and
#   * a controlled same-session 2->8 core pair at 10M docs
#     (north-rule two-parallelism-level evidence at one more decade
#     than round 3's 2M pair).
#
# Each level runs in its own process (Spark master is fixed per JVM);
# inputs are prepared once and reused byte-identically across levels.
# Run on an otherwise-idle box — concurrent Spark jobs invalidate the
# measurement (BASELINE.md measurement-discipline note).
set -euo pipefail
cd "$(dirname "$0")/.."
BASE=${SCALE_BASE:-/tmp/diagon_scale10m}
mkdir -p "$BASE"

for n in 100000 1000000 10000000; do
  if [ ! -d "$BASE/in_$n" ]; then
    python scripts/scaling_run.py prepare "$n" "$BASE/in_$n"
  fi
done

# docs/segment stays bounded across sizes (the 100-TB layout knob):
# 100K/64 ≈ 1.6k, 1M/64 ≈ 15.6k, 10M/512 ≈ 19.5k docs per segment —
# encode-group cost is superlinear in group size (see scaling_run.py)
python scripts/scaling_run.py run 8 "$BASE/in_100000"   "$BASE/idx_100k" 64  | tee "$BASE/r8_100k.json"
python scripts/scaling_run.py run 8 "$BASE/in_1000000"  "$BASE/idx_1m"   64  | tee "$BASE/r8_1m.json"
python scripts/scaling_run.py run 8 "$BASE/in_10000000" "$BASE/idx_10m"  512 | tee "$BASE/r8_10m.json"
rm -rf "$BASE/idx_100k" "$BASE/idx_1m"   # keep disk bounded for the 2-core run
python scripts/scaling_run.py run 2 "$BASE/in_10000000" "$BASE/idx_10m2" 512 | tee "$BASE/r2_10m.json"

python scripts/scaling_run.py report "$BASE/r2_10m.json" "$BASE/r8_10m.json" \
  | tee "$BASE/pair_2to8_10m.json"
