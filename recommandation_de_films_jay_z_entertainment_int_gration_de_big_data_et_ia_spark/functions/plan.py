"""Plan-shaping helpers: control WHERE Catalyst evaluates an expression.

Catalyst's PushDownPredicates substitutes projected aliases into
predicates with no cost model, and interpreted higher-order lambdas do
no common-subexpression elimination — so `select(expensive.alias("x"))
.filter(col("x") > 0)` evaluates `expensive` once in an interpreted
Filter (per lambda STEP if the filter lands inside a lambda) and again
in the output projection. Measured blowups: q390 16 s of 17 s at sf1;
q318 16.7 s vs 3.7 s for single evaluation.

`once()` pins an expression to exactly one evaluation by routing it
through a single-element Generate (explode of a one-element array):
predicates cannot push below a Generate they reference, and
CollapseProject cannot merge across it. Cost: one interpreted Generate
row per input row — nanoseconds — and NO materialization, shuffle, or
lineage truncation, so unlike localCheckpoint it stays a pure plan
transform that scales to any input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Fan a narrow scan out to the session's parallelism before
    expression-heavy per-row work (tokenize/shingle/hash folds, vector
    folds) — ONLY when the plan currently yields fewer partitions than
    cores.

    Why (optimization guide §2.5, "input skew — one huge unsplittable
    file: repartition immediately after the read"): a parquet file with
    a single row group is ONE Spark input split no matter what
    `maxPartitionBytes` says (byte-range splits only subdivide across
    row groups), so every scan-local expression runs on one core. The
    round-10 sf10 audit hit the identical class on compressed replicated
    text (q43: >7 min single-threaded vs 21.6 s parallel); at sf0.1 the
    driver's own fixture layout is single-row-group for EVERY table,
    serializing the catalog's interpreted higher-order folds (minhash
    signatures measured 2.18 s 1-task vs 0.70 s spread at sf0.1).

    Scale-adaptive by construction: a production 100 TB corpus has
    thousands of row groups, the partition count exceeds
    ``defaultParallelism``, and this is a no-op — the shuffle only ever
    moves inputs small enough to fit in fewer-than-cores splits. Do NOT
    use it in front of cheap scan-aggregates: shuffling raw fact rows
    costs more than the single-task partial aggregation it replaces
    (measured 0.30 -> 1.17 s on the q01-class lineitem aggregate).
    """
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)


def with_once(df: DataFrame, name: str, expr: Column) -> DataFrame:
    """Add column `name` = `expr`, guaranteed to be evaluated exactly
    once per row no matter how many downstream predicates/projections
    reference it.

    Equivalent to ``df.withColumn(name, expr)`` in semantics; differs
    only in plan shape (a one-element Generate barrier under the new
    attribute). Use when `expr` is expensive (lambda chains, regex over
    long text) AND a downstream ``filter`` would otherwise inline it.
    """
    return df.select("*", F.explode(F.array(expr)).alias(name))
