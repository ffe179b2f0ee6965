#!/usr/bin/env python
"""Build a deterministic sf10 audit dataset (100x sf0.1) under
``.tmp/sf10`` for the round-10 second-decade scale audit (VERDICT r9
task 2: extend the sf0.1->sf1 evidence one more decade for the top-20
absolute-cost queries).

Same methodology as scripts/make_sf1.py — replication with per-copy key
offsets so every FK relationship stays intact and copy 0 keeps the
original keys (literal-key predicates hit identical rows). The strides
chosen for sf1 already exceed each table's max sf0.1 key, so the same
strides support 100 replicas (max offset 99*stride, all < 2^63).

Replication consequences amplify one decade further: the dedup/ANN
corpus is now 100-way duplicated, so LSH/SimHash buckets grow 100x and
un-capped in-bucket pair counts would grow ~100^2x — this is exactly
the mega-bucket-cap stress the audit exists to certify, and why the
pair families carry __rows_sf10__ output contracts in SCALE_BUDGET.json
rather than a naive linear-time expectation.

LAYOUT (the round-10 input-split-starvation finding, preserved in
BENCH_sf10_singlefile_probe_r10.jsonl): a first sf10 cut wrote each
table as ONE duckdb parquet file; 100-way-replicated text compresses so
well that 500k documents landed in a single 4.5 MB file = ONE Spark
input split, serializing every scan-local query onto 1 of 32 cores
(q43 ran minutes single-threaded). No production 100 TB corpus is one
file — object-store datasets arrive as thousands of splits — so each
replicated table is now written as a DIRECTORY of N_FILES parquet parts
(replica-range per part, keys identical to the single-file cut), which
is both representative and exactly what Spark's scan parallelism keys
on. Dimension tables stay single-file.
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp", "sf10"
)
N_REPLICAS = 100

S_CUST, S_ORD, S_PART, S_SUPP, S_DOC, S_EMB, S_EV = (
    1_000_000, 10_000_000, 1_000_000, 100_000, 100_000, 100_000, 10_000_000,
)

REPLICAS = {
    "customer": f"SELECT c_custkey + i * {S_CUST} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM t CROSS JOIN r",
    "supplier": f"SELECT s_suppkey + i * {S_SUPP} AS s_suppkey, s_name, s_nationkey, s_acctbal FROM t CROSS JOIN r",
    "part": f"SELECT p_partkey + i * {S_PART} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM t CROSS JOIN r",
    "orders": f"SELECT o_orderkey + i * {S_ORD} AS o_orderkey, o_custkey + i * {S_CUST} AS o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM t CROSS JOIN r",
    "lineitem": f"SELECT l_orderkey + i * {S_ORD} AS l_orderkey, l_partkey + i * {S_PART} AS l_partkey, l_suppkey + i * {S_SUPP} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM t CROSS JOIN r",
    "events": f"SELECT event_id + i * {S_EV} AS event_id, ts, user_id + i * {S_CUST} AS user_id, event_type, value, props FROM t CROSS JOIN r",
    "documents": f"SELECT doc_id + i * {S_DOC} AS doc_id, text, lang, source, n_chars FROM t CROSS JOIN r",
    "embeddings": f"SELECT vec_id + i * {S_EMB} AS vec_id, embedding, label FROM t CROSS JOIN r",
}


N_FILES = 20  # parts per replicated table (5 replicas each)


def main() -> None:
    import shutil

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for tbl in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')) TO '{DST}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        print(tbl, "copied 1x", flush=True)
    per_file = N_REPLICAS // N_FILES
    for tbl, sql in REPLICAS.items():
        tbl_dir = f"{DST}/{tbl}.parquet"
        shutil.rmtree(tbl_dir, ignore_errors=True)
        os.makedirs(tbl_dir)
        con.execute(
            f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')"
        )
        for j in range(N_FILES):
            lo, hi = j * per_file, (j + 1) * per_file
            con.execute(
                "CREATE OR REPLACE VIEW r AS "
                f"SELECT CAST(range AS BIGINT) AS i FROM range({lo}, {hi})"
            )
            con.execute(
                f"COPY ({sql}) TO '{tbl_dir}/part-{j:04d}.parquet' (FORMAT PARQUET)"
            )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{tbl_dir}/*.parquet')"
        ).fetchone()[0]
        print(tbl, n, f"({N_FILES} files)", flush=True)


if __name__ == "__main__":
    main()
