#!/usr/bin/env python
"""Full-catalog sf1 scale audit, resumable: times each catalog query
(one cold + one warm run, noop sink) at a given SF dir and appends one
JSON line per query to the output file. Already-recorded queries are
skipped, so the audit can run in bounded chunks.

Usage: python scripts/sf1_audit.py <sf_dir> <out.jsonl> [max_queries]
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
    "q81_split_contamination",
    "q99_dedup_incremental",
    "q263_crossdoc_span_excise",
    "q269_crossdoc_keep_first",
}


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
    todo = [n for n in sorted(queries) if n not in done][:max_q]
    if not todo:
        print("ALL DONE")
        return
    spark = get_spark("sf1-audit")
    spark.range(1).count()
    with open(out_path, "a") as fh:
        for name in todo:
            runs = []
            try:
                for _ in range(2):
                    t0 = time.time()
                    queries[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    runs.append(round(time.time() - t0, 2))
                rec = {"query": name, "cold": runs[0], "warm": runs[1]}
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
