"""Structured Streaming window operators.

The batch catalog's window queries (plans/timeseries.py q44–q46) use
``F.window`` / ``F.session_window`` expressions that are streaming-native;
this module wires the same expressions to ``readStream`` sources with
watermarks, proving the engine's window semantics are identical in both
modes (tested by tests/test_streaming.py: streaming availableNow ==
batch result).

Scale notes: file-source streaming shards by file; state for windowed aggs
is bounded by the watermark horizon; session windows use Spark's native
merging session state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Raw parquet schema of the events table (ts is TIMESTAMP(NANOS) on disk,
# read as long nanos — same workaround as sources.readers.load_table).
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as an unbounded stream (file source; at scale this is the
    same code over a Kafka/object-store source)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # file-source streaming needs a directory: point at sf_dir and glob
    # down to the single events file.
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """1-hour tumbling count+sum per event_type — the q44 expression with a
    watermark bound for streaming state cleanup."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").cast("long").alias("window_start_s"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_memory(
    agg: DataFrame, name: str, output_mode: str = "complete"
) -> None:
    """Drain the stream with availableNow into an in-memory table ``name``
    (test/demo sink; production would writeStream to parquet/Kafka)."""
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def attribution_join(views: DataFrame, clicks: DataFrame) -> DataFrame:
    """Stream-stream event-time interval join: each click matches the same
    user's views in the preceding 30 minutes (click attribution).

    Both sides carry watermarks so the join state store can evict: a
    buffered view can be dropped once the click-side watermark passes
    view_ts + 30 min. The identical expression runs in batch (tested
    equivalence) — in batch it is the bucketed-range-join shape; in
    streaming Spark maintains keyed state per user.
    """
    v = views.select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", "2 hours")
    # click side's key is renamed: both inputs usually derive from the
    # same source frame, and same-name column equality on a self-join
    # relies on Spark's dataset-id disambiguation (it warns "trivially
    # true predicate") — an explicit distinct name is version-proof
    c = clicks.select(
        F.col("user_id").alias("click_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", "2 hours")
    return (
        v.join(
            c,
            [
                F.col("user_id") == F.col("click_user_id"),
                F.col("click_ts") >= F.col("view_ts"),
                F.col("click_ts") < F.col("view_ts") + F.expr("interval 30 minutes"),
            ],
            "inner",
        )
        .select(
            "user_id",
            "view_id",
            "click_id",
            F.col("view_ts").cast("long").alias("view_ts_s"),
            F.col("click_ts").cast("long").alias("click_ts_s"),
        )
    )
