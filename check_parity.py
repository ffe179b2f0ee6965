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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_out = None
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            json_out = a.split("=", 1)[1]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    spark = get_spark("parity-check")
    duck = duck_connection(sf_dir)
    failed = []
    results: dict[str, dict] = {}
    for name in sorted(queries):
        if only and name not in only:
            continue
        t0 = time.time()
        rec = {"oracle": name in oracles, "ok": False, "sec": None, "problems": []}
        try:
            if name in oracles:
                problems = compare(queries[name](spark, sf_dir), duck.execute(oracles[name]).df(), name)
            else:
                n = queries[name](spark, sf_dir).count()
                problems = [] if n >= 0 else [f"{name}: negative count?"]
                rec["rows_only"] = n
                print(f"  (rows-only: {name} -> {n} rows)")
        except Exception as e:  # noqa: BLE001
            problems = [f"{name}: EXCEPTION {type(e).__name__}: {e}"]
        rec["ok"] = not problems
        rec["sec"] = round(time.time() - t0, 1)
        rec["problems"] = [p[:500] for p in problems]
        results[name] = rec
        status = "OK " if not problems else "FAIL"
        print(f"{status} {name} ({rec['sec']}s)", flush=True)
        for p in problems:
            print("   ", p[:500])
        failed.extend(problems)
    print(f"\n{len(failed)} failures / {len(queries) if not only else len(only)} queries")
    if json_out:
        import json

        n_oracle = sum(1 for r in results.values() if r["oracle"])
        with open(json_out, "w") as fh:
            json.dump({
                "sf_dir": sf_dir,
                "n_queries": len(results),
                "n_oracle": n_oracle,
                "n_ok": sum(1 for r in results.values() if r["ok"]),
                "queries": results,
            }, fh, indent=1, sort_keys=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
