"""Spatial grid-join query family.

The engine-side pattern is the standard distributed spatial join: assign
every point to a fixed-size grid cell (cell edge = search radius), explode
the SMALLER side into its 3x3 neighbor cells, then equi-join on the cell
key — the cell id *is* the shuffle partitioner, so the join never goes
cartesian and each task only sees co-located cells. At 100 TB the
per-cell density (not total rows) bounds task size; skewed cells are
AQE-splittable because the join is a plain equi-join on (cy, cx).

The tables carry no coordinates, so both engines derive deterministic
synthetic lat/lon from the integer keys (pure BIGINT arithmetic + one
double divide — bit-identical in Spark and DuckDB). Points live on a
[0, 30) x [0, 30) plane with 1-degree cells (900 cells) and eps = 0.5,
giving a sparse-but-nonempty neighborhood structure at every SF.

Reference has no spatial operators; this is a north-star extension
(SURVEY.md §2.8 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .catalog import register

_M = 3000  # plane is [0, 30) degrees at 2-decimal resolution
_EPS2 = 0.25  # radius 0.5 deg, squared

# per-axis multipliers (distinct odd primes, coprime with _M) — the
# derived point set is a deterministic lattice walk over the torus
_C_LAT, _C_LON = 7919, 104729
_S_LAT, _S_LON = 7907, 104717


def _pts(df: DataFrame, key: str, mlat: int, mlon: int, prefix: str) -> DataFrame:
    k = F.col(key)
    lat = ((k * F.lit(mlat)) % F.lit(_M)) / F.lit(100.0)
    lon = ((k * F.lit(mlon)) % F.lit(_M)) / F.lit(100.0)
    return df.select(
        key,
        *([c for c in df.columns if c != key and c.endswith("nationkey")]),
        lat.alias(f"{prefix}lat"),
        lon.alias(f"{prefix}lon"),
        F.floor(lat).cast("int").alias(f"{prefix}y"),
        F.floor(lon).cast("int").alias(f"{prefix}x"),
    )


def _grid9(supp: DataFrame) -> DataFrame:
    """Explode the supplier side into its 3x3 neighbor cells."""
    d3 = F.array(F.lit(-1), F.lit(0), F.lit(1))
    return (
        supp.withColumn("dy", F.explode(d3))
        .withColumn("dx", F.explode(d3))
        .select(
            "s_suppkey",
            "slat",
            "slon",
            (F.col("sy") + F.col("dy")).alias("gy"),
            (F.col("sx") + F.col("dx")).alias("gx"),
        )
    )


def _dist2(latc, lonc, lats, lons):
    dlat = latc - lats
    dlon = lonc - lons
    return dlat * dlat + dlon * dlon


_PTS_SQL = {
    "cust": f"""
      SELECT c_custkey, c_nationkey,
             ((c_custkey * {_C_LAT}) % {_M}) / 100.0 AS clat,
             ((c_custkey * {_C_LON}) % {_M}) / 100.0 AS clon,
             CAST(FLOOR(((c_custkey * {_C_LAT}) % {_M}) / 100.0) AS INT) AS cy,
             CAST(FLOOR(((c_custkey * {_C_LON}) % {_M}) / 100.0) AS INT) AS cx
      FROM customer""",
    "supp": f"""
      SELECT s_suppkey,
             ((s_suppkey * {_S_LAT}) % {_M}) / 100.0 AS slat,
             ((s_suppkey * {_S_LON}) % {_M}) / 100.0 AS slon,
             CAST(FLOOR(((s_suppkey * {_S_LAT}) % {_M}) / 100.0) AS INT) AS sy,
             CAST(FLOOR(((s_suppkey * {_S_LON}) % {_M}) / 100.0) AS INT) AS sx
      FROM supplier""",
}

_GRID_SQL = """
      SELECT s.*, s.sy + dy.d AS gy, s.sx + dx.d AS gx
      FROM supp s
      CROSS JOIN (VALUES (-1), (0), (1)) AS dy(d)
      CROSS JOIN (VALUES (-1), (0), (1)) AS dx(d)"""

_D2_SQL = "((c.clat - g.slat) * (c.clat - g.slat) + (c.clon - g.slon) * (c.clon - g.slon))"


@register(
    "q235_geo_radius_count",
    oracle=f"""
    WITH cust AS ({_PTS_SQL['cust']}),
    supp AS ({_PTS_SQL['supp']}),
    grid AS ({_GRID_SQL}),
    per_c AS (
      SELECT c.c_custkey,
             CAST(SUM(CASE WHEN {_D2_SQL} < {_EPS2} THEN 1 ELSE 0 END) AS BIGINT) AS n_nearby
      FROM cust c
      LEFT JOIN grid g ON c.cy = g.gy AND c.cx = g.gx
      GROUP BY c.c_custkey)
    SELECT n_nearby, CAST(COUNT(*) AS BIGINT) AS customers
    FROM per_c GROUP BY n_nearby ORDER BY n_nearby
    """,
)
def q235_geo_radius_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many suppliers sit within radius eps of each customer —
    surfaced as a count histogram (zero-neighbor customers included via
    the left grid join). Grid-cell equi-join: candidate pairs are only
    those sharing a 3x3 neighborhood, never the cross product. The
    supplier side (x9 cells) is broadcast here because it is the small
    side at every test SF; at cluster scale the identical plan runs as a
    shuffle equi-join partitioned by (gy, gx)."""
    cust = _pts(load_table(spark, sf_dir, "customer"), "c_custkey", _C_LAT, _C_LON, "c")
    supp = _pts(load_table(spark, sf_dir, "supplier"), "s_suppkey", _S_LAT, _S_LON, "s")
    grid = _grid9(supp)
    j = cust.join(
        F.broadcast(grid), (F.col("cy") == F.col("gy")) & (F.col("cx") == F.col("gx")), "left"
    )
    within = F.when(
        _dist2(F.col("clat"), F.col("clon"), F.col("slat"), F.col("slon")) < F.lit(_EPS2), 1
    ).otherwise(0)
    per_c = j.groupBy("c_custkey").agg(F.sum(within).cast("bigint").alias("n_nearby"))
    return (
        per_c.groupBy("n_nearby")
        .agg(F.count(F.lit(1)).cast("bigint").alias("customers"))
        .orderBy("n_nearby")
    )


@register(
    "q236_geo_nearest",
    oracle=f"""
    WITH cust AS ({_PTS_SQL['cust']}),
    supp AS ({_PTS_SQL['supp']}),
    grid AS ({_GRID_SQL}),
    cand AS (
      SELECT c.c_custkey, g.s_suppkey, {_D2_SQL} AS d2,
             ROW_NUMBER() OVER (PARTITION BY c.c_custkey
                                ORDER BY {_D2_SQL}, g.s_suppkey) AS rn
      FROM cust c
      JOIN grid g ON c.cy = g.gy AND c.cx = g.gx
      WHERE c.c_nationkey = 0)
    SELECT c_custkey, s_suppkey, ROUND(d2, 6) AS dist2
    FROM cand WHERE rn = 1
    ORDER BY c_custkey
    """,
)
def q236_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier per customer (nation 0) within the 3x3 cell ring
    — the grid-bounded nearest-neighbor probe. Customers with an empty
    ring drop out (by design: an expanding-ring search is the production
    fallback). Deterministic tie-break on (dist2, s_suppkey). The
    nation filter is pushed to the customer scan; per-customer ranking is
    a WindowGroupLimit-style rn=1 over ring candidates only."""
    cust = _pts(load_table(spark, sf_dir, "customer"), "c_custkey", _C_LAT, _C_LON, "c").filter(
        F.col("c_nationkey") == 0
    )
    supp = _pts(load_table(spark, sf_dir, "supplier"), "s_suppkey", _S_LAT, _S_LON, "s")
    grid = _grid9(supp)
    cand = (
        cust.join(
            F.broadcast(grid), (F.col("cy") == F.col("gy")) & (F.col("cx") == F.col("gx"))
        )
        .withColumn(
            "d2", _dist2(F.col("clat"), F.col("clon"), F.col("slat"), F.col("slon"))
        )
    )
    w = Window.partitionBy("c_custkey").orderBy(F.col("d2").asc(), F.col("s_suppkey").asc())
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", "s_suppkey", F.round("d2", 6).alias("dist2"))
        .orderBy("c_custkey")
    )
