#!/usr/bin/env python
"""Full-catalog sf1 scale audit, resumable: times each catalog query
(one cold + one warm run, noop sink) at a given SF dir and appends one
JSON line per query to the output file. Already-recorded queries are
skipped, so the audit can run in bounded chunks.

Each record also carries a SAME-SESSION sf0.1 base time (``base``, min
of 2 runs at $SPARK_GRAFT_BASE_DIR, default /root/testdata/sf0.1) so
the scale-ratio gate never ratios against a base artifact produced in a
different session/load window — the round-8 false-fail mode, where a
driver bench overwrite of BENCH_full_local.json flipped 8 phantom
"regressions". CPU-steal share per timed window is recorded too
(``steal_warm`` / ``steal_base``) so noisy records self-identify.

Usage: python scripts/sf1_audit.py <sf_dir> <out.jsonl> [max_queries]

Env knobs (round-10 sf10 decade audit reuses this harness unchanged):
- SPARK_GRAFT_BASE_DIR: the same-session comparison base (default
  /root/testdata/sf0.1; the sf10 audit points it at .tmp/sf1 so the
  ratio measures the second decade).
- SPARK_GRAFT_ONLY: comma-separated query names; runs ONLY those, in
  the given order (cheapest-first so a bounded window still accrues
  evidence).
- SPARK_GRAFT_SF_RUNS / SPARK_GRAFT_BASE_RUNS: run counts at the audit
  SF and the base SF (defaults 2 and 2 — the r9 cold+warm / min-of-2
  protocol). The sf10 audit sets SF_RUNS=1: each sf10 run is >30 s, so
  single-run noise is a small share, and the halved wall-clock lets the
  whole top-20 sweep fit one session; the record's "warm" field then
  carries the single (JVM-warm, data-cold) measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.session import (  # noqa: E402
    get_spark,
)


# Queries whose sf0.1->sf1 time ratio is driven by TRUE RESULT GROWTH
# (LSH pair population on a replicated corpus), not plan shape — the
# audit records their output row count so SCALE notes carry the numbers
# (round-5 VERDICT task 4).
ROWS_WATCHLIST = {
    "q32_dedup_minhash_pairs",
    "q33_dedup_jaccard_verify",
    "q34_dedup_simhash",
    "q35_dedup_simhash_pairs",
    "q81_split_contamination",
    "q99_dedup_incremental",
    "q263_crossdoc_span_excise",
    "q269_crossdoc_keep_first",
    # round-11 (r10 verdict task 5): the cluster-loop family adjudicated
    # by ratio alone until now — pin their sf10 output rows too
    "q78_dedup_clusters",
    "q90_neardup_apply",
    "q186_containment_pairs",
    "q199_dedup_keep_best",
    "q229_source_overlap",
    "q233_cluster_size_histogram",
    # q215 (LIMIT 20) and q402 (1-row contract) pin their own output
    # sizes structurally — counting them would just re-run the query
}


def _cpu_sample() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat; (0,0) if unreadable."""
    try:
        with open("/proc/stat") as fh:
            vals = [int(v) for v in fh.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except Exception:  # noqa: BLE001
        return 0, 0


def _steal_pct(a: tuple[int, int], b: tuple[int, int]) -> float:
    ds, dt = b[0] - a[0], b[1] - a[1]
    return round(100.0 * ds / dt, 3) if dt > 0 else 0.0


def main() -> None:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    max_q = int(sys.argv[3]) if len(sys.argv) > 3 else 10**9
    done: set[str] = set()
    if os.path.exists(out_path):
        with open(out_path) as fh:
            for line in fh:
                if line.strip():
                    done.add(json.loads(line)["query"])
    queries = entrymod.queries()
    only = [n for n in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if n]
    pool = only if only else sorted(queries)
    todo = [n for n in pool if n not in done and n in queries][:max_q]
    if not todo:
        print("ALL DONE")
        return
    base_dir = os.environ.get("SPARK_GRAFT_BASE_DIR", "/root/testdata/sf0.1")
    spark = get_spark("sf1-audit")
    spark.range(1).count()
    with open(out_path, "a") as fh:
        for name in todo:
            runs = []
            try:
                steal_warm = 0.0
                sf_runs = int(os.environ.get("SPARK_GRAFT_SF_RUNS", "2"))
                for i in range(sf_runs):
                    s0, t0 = _cpu_sample(), time.time()
                    queries[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    runs.append(round(time.time() - t0, 2))
                    if i == sf_runs - 1:
                        steal_warm = _steal_pct(s0, _cpu_sample())
                # same-session sf0.1 base AFTER the sf1 runs (so sf1
                # cold/warm stay comparable with prior rounds' sweeps);
                # min of 2 matches BENCH_full_local's steady-min basis
                base_runs = []
                for _ in range(int(os.environ.get("SPARK_GRAFT_BASE_RUNS", "2"))):
                    s0, t0 = _cpu_sample(), time.time()
                    queries[name](spark, base_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    base_runs.append(
                        (round(time.time() - t0, 3), _steal_pct(s0, _cpu_sample()))
                    )
                best = min(base_runs)
                rec = {
                    "query": name,
                    "cold": runs[0],
                    "warm": runs[-1],
                    "base": best[0],
                    "steal_warm": steal_warm,
                    "steal_base": best[1],
                }
                if name in ROWS_WATCHLIST:
                    # a count failure annotates the record instead of
                    # discarding the captured timings (round-6 ADVICE)
                    try:
                        rec["rows"] = queries[name](spark, sf_dir).count()
                    except Exception as e:  # noqa: BLE001
                        rec["rows_error"] = f"{type(e).__name__}: {e}"[:300]
            except Exception as e:  # noqa: BLE001
                rec = {"query": name, "error": f"{type(e).__name__}: {e}"[:300]}
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(rec, flush=True)
    print(f"chunk done: {len(todo)} queries")


if __name__ == "__main__":
    main()
