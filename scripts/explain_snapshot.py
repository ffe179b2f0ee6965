#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for named catalog queries into
``plans/r11/<query>_<tag>.txt`` — the optimization round's before/after
plan evidence. Usage:

    python scripts/explain_snapshot.py before q117_semantic_dedup q126_pagerank_copurchase
    python scripts/explain_snapshot.py after  q117_semantic_dedup

Plans are built (not executed) at sf0.1 so scan statistics and join
strategy choices match what the bench measures.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.session import (  # noqa: E402
    get_spark,
)

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r12"),
)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("explain-snapshot")
    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({txt.count('Exchange')} Exchange lines)", flush=True)


if __name__ == "__main__":
    main()
