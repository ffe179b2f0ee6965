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
