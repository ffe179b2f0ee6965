#!/usr/bin/env python
"""Interleaved same-session A/B for plan variants toggled by an env var
(read at plan-build time). Alternates A,B,A,B,... in ONE Spark session
so machine-noise windows hit both variants equally.

Usage: python scripts/ab_interleaved.py <query> <ENV_VAR> <n_rounds>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    name, env, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab")
    spark.range(1).count()
    q = entrymod.queries()[name]

    def run(flag: bool) -> float:
        if flag:
            os.environ[env] = "1"
        else:
            os.environ.pop(env, None)
        t0 = time.time()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run(False)
    run(True)  # warm both variants
    a, b = [], []
    for _ in range(n):
        a.append(run(False))
        b.append(run(True))
    print(f"{name} {env}=off: min {min(a):.3f} runs {[round(x, 2) for x in a]}")
    print(f"{name} {env}=on : min {min(b):.3f} runs {[round(x, 2) for x in b]}")


if __name__ == "__main__":
    main()
