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
            except Exception as e:  # noqa: BLE001
                rec = {"query": name, "error": f"{type(e).__name__}: {e}"[:300]}
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(rec, flush=True)
    print(f"chunk done: {len(todo)} queries")


if __name__ == "__main__":
    main()
