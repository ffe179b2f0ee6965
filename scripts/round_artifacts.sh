#!/bin/sh
# End-of-round artifact refresh (round-4 verdict task 2, made mechanical;
# sf1 sweep folded in per round-5 verdict task 6):
#   1. full-catalog DuckDB parity at the driver's sf0.01 correctness scale
#      -> CORRECTNESS_local_r{N}.json (per-query rows/schema/hash booleans)
#   2. full-catalog bench at sf0.1 -> BENCH_full_local.json (per-query map)
#      + the compact driver-parseable summary line on stdout
#   3. full-catalog sf1 scale sweep -> BENCH_sf1_full_r{N}.json(l) +
#      SCALE_r{N}.md ratio table (skipped with a note if the sf1 testdata
#      dir is absent; regenerate it with scripts/make_sf1.py first)
# Usage: sh scripts/round_artifacts.sh <round-number>
set -e
cd "$(dirname "$0")/.."
N="${1:?usage: round_artifacts.sh <round-number>}"
python check_parity.py /root/testdata/sf0.01 "--json=CORRECTNESS_local_r${N}.json" \
  | tail -2
python bench.py | tail -1
SF1_DIR="${SPARK_GRAFT_SF1_DIR:-.tmp/sf1}"
if [ -d "$SF1_DIR" ]; then
  python scripts/sf1_audit.py "$SF1_DIR" "BENCH_sf1_full_r${N}.jsonl" | tail -2
  python scripts/sf1_ratios.py "BENCH_sf1_full_r${N}.jsonl" "SCALE_r${N}.md" | tail -2
  echo "artifacts: CORRECTNESS_local_r${N}.json BENCH_full_local.json BENCH_sf1_full_r${N}.jsonl SCALE_r${N}.md"
else
  echo "sf1 dir $SF1_DIR absent -- skipped scale sweep (run scripts/make_sf1.py)"
  echo "artifacts: CORRECTNESS_local_r${N}.json BENCH_full_local.json"
fi
