#!/usr/bin/env python
"""Targeted per-query micro-bench (bench.py methodology: warm session,
noop sink, cold + min of 3 steady runs, per-run steal%) for an explicit
query list. Usage:

    python scripts/microbench.py out.json q117_semantic_dedup q126_...

Writes {"name": {"cold": s, "min": s, "runs": [...], "steal": [...]}}.
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


def _cpu_sample():
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(v) for v in parts[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except Exception:  # noqa: BLE001
        return 0, 0


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("microbench")
    queries = entrymod.queries()
    # session warm-up (mirrors bench.py)
    from pyspark.sql import functions as _F

    spark.range(1).count()
    _w = spark.range(1000).selectExpr("id % 7 AS k")
    _w.groupBy("k").count().join(
        _F.broadcast(spark.range(7).withColumnRenamed("id", "k")), "k"
    ).count()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    res: dict[str, dict] = {}
    for name in names:
        runs, steals = [], []
        cold = None
        for i in range(4):
            s0, t0 = _cpu_sample(), time.time()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            sec = round(time.time() - t0, 3)
            s1 = _cpu_sample()
            ds, dt = s1[0] - s0[0], s1[1] - s0[1]
            sp = round(100.0 * ds / dt, 2) if dt else 0.0
            if i == 0:
                cold = sec
            else:
                runs.append(sec)
                steals.append(sp)
        res[name] = {"cold": cold, "min": min(runs), "runs": runs, "steal": steals}
        print(name, res[name], flush=True)
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
