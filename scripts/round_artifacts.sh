#!/bin/sh
# End-of-round artifact refresh (round-4 verdict task 2, made mechanical):
#   1. full-catalog DuckDB parity at the driver's sf0.01 correctness scale
#      -> CORRECTNESS_local_r{N}.json (per-query rows/schema/hash booleans)
#   2. full-catalog bench at sf0.1 -> BENCH_full_local.json (per-query map)
#      + the compact driver-parseable summary line on stdout
# Usage: sh scripts/round_artifacts.sh <round-number>
set -e
cd "$(dirname "$0")/.."
N="${1:?usage: round_artifacts.sh <round-number>}"
python check_parity.py /root/testdata/sf0.01 "--json=CORRECTNESS_local_r${N}.json" \
  | tail -2
python bench.py | tail -1
echo "artifacts: CORRECTNESS_local_r${N}.json BENCH_full_local.json"
