#!/usr/bin/env python
"""Build a deterministic sf1 rehearsal dataset (10x sf0.1) under
``.tmp/sf1`` for the scale-ratio bench (PERF.md "sf1 rehearsal").

Replication, not regeneration: each fact/doc table is unioned 10 times
with a per-copy key offset chosen so every foreign-key relationship
stays intact (copy i's orders reference copy i's customers, etc.), and
copy 0 keeps the original keys so the catalog's literal-key predicates
(q28/q30/q74/q85/q137 targets) hit identical rows. Dimension tables
region/nation keep a single copy, exactly like TPC-H scaling.

Consequences to keep in mind when reading ratios (documented in
PERF.md): text/embedding payloads repeat 10x, so the dedup/ANN families
see a maximally-duplicated corpus — bucket sizes grow 10x and pair
candidates up to 100x in affected buckets; that is the stress the
mega-bucket caps exist for, not a linear-scaling defect.

Strides (all > the table's max key at sf0.1, power-of-ten for
readability): customer/user 1e6, orders 1e7, part 1e6, supplier 1e5,
documents 1e5, embeddings 1e5, events 1e7.
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp", "sf1")

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


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for tbl in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')) TO '{DST}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        print(tbl, "copied 1x")
    for tbl, sql in REPLICAS.items():
        con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')")
        con.execute("CREATE OR REPLACE VIEW r AS SELECT CAST(range AS BIGINT) AS i FROM range(10)")
        con.execute(f"COPY ({sql}) TO '{DST}/{tbl}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{DST}/{tbl}.parquet')").fetchone()[0]
        print(tbl, n)


if __name__ == "__main__":
    main()
