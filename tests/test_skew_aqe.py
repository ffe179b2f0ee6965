"""AQE skew-join handling: prove the session's adaptive config actually
splits a skewed shuffle partition at runtime — the mechanism the scale
notes (PERF.md, SURVEY §2) lean on for hot-key joins at 100 TB, checked
here end-to-end instead of taken on faith. Complements the manual
salting operators (q62/q67), which exist for engines/paths where AQE is
unavailable."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    # One pathological hot key (50k rows) among 50 cold keys (100 rows
    # each): with thresholds lowered to test scale, AQE must mark the
    # hot partition skewed and split it.
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 55_000).select(
            F.when(F.col("id") < 50_000, F.lit(0))
            .otherwise((F.col("id") % 50) + 1)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("v"),
        )
        right = spark.range(0, 51).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        joined = left.join(right, "k")
        # collect() drives THIS DataFrame's QueryExecution to its final
        # adaptive plan (count() would build a separate execution whose
        # plan we could not inspect here)
        assert len(joined.collect()) == 55_000  # correctness under the split
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, final_plan[:3000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
