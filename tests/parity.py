"""DuckDB-oracle parity harness mirroring the driver's correctness gate:
row-count + schema-width + order-insensitive value comparison with columns
sorted by name. Used by tests (sf0.001) and check_parity.py (sf0.01)."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return repr(f)
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_norm_val(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_norm_val(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def _dtype_kind(dt) -> str:
    k = getattr(dt, "kind", "O")
    return {"i": "int", "u": "int", "f": "float", "M": "ts", "b": "bool"}.get(k, "obj")


def compare(spark_df, oracle_df: pd.DataFrame, name: str = "") -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    sp = spark_df.toPandas()
    problems = []
    if sorted(sp.columns) != sorted(oracle_df.columns):
        problems.append(f"{name}: columns differ spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}")
        return problems
    # exact dtype parity (int32 vs int64 etc.) — a stricter driver might
    # compare schemas type-sensitively, so we do too
    for c in sp.columns:
        a, b = sp[c].dtype, oracle_df[c].dtype
        if str(a) != str(b) and not (_dtype_kind(a) == _dtype_kind(b) == "obj"):
            problems.append(f"{name}: dtype differs for {c}: spark={a} oracle={b}")
    if len(sp) != len(oracle_df):
        problems.append(f"{name}: row count spark={len(sp)} oracle={len(oracle_df)}")
    a, b = normalize(sp), normalize(oracle_df)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:3]
        diff_b = [r for r in b if r not in set(a)][:3]
        problems.append(f"{name}: values differ; spark-only={diff_a} oracle-only={diff_b}")
    return problems
