#!/usr/bin/env python
"""Run the full catalog vs DuckDB at sf0.01 (the driver's correctness
scale). Usage: python check_parity.py [sf_dir] [query_name ...]"""

from __future__ import annotations

import sys
import time

from tests.parity import compare, duck_connection

import __spark_entry__ as entrymod
from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    spark = get_spark("parity-check")
    duck = duck_connection(sf_dir)
    failed = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            if name in oracles:
                problems = compare(queries[name](spark, sf_dir), duck.execute(oracles[name]).df(), name)
            else:
                n = queries[name](spark, sf_dir).count()
                problems = [] if n >= 0 else [f"{name}: negative count?"]
                print(f"  (rows-only: {name} -> {n} rows)")
        except Exception as e:  # noqa: BLE001
            problems = [f"{name}: EXCEPTION {type(e).__name__}: {e}"]
        status = "OK " if not problems else "FAIL"
        print(f"{status} {name} ({time.time() - t0:.1f}s)")
        for p in problems:
            print("   ", p[:500])
        failed.extend(problems)
    print(f"\n{len(failed)} failures / {len(queries) if not only else len(only)} queries")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
