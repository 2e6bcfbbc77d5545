#!/usr/bin/env python
"""Synthesize an sf1-scale testdata directory (~6M lineitem rows) from the
driver's read-only sf0.1 drop, for the upper rung of the scale ladder
(ORACLE_SF01.md: each scale step has caught a distinct bug class; the
largest driver-provided input is 600k rows).

Method: 10 deterministic copies of every FACT table with all keys remapped
as ``key*10 + copy`` — applied consistently to both sides of every foreign
key, so joins at sf1 have the same selectivity/shape as sf0.1 at 10× the
rows. Dimension tables (region, nation) are shared reference data and stay
fixed, exactly as TPC-H scales them. Text/event/embedding payloads:

- documents: copy 0 keeps the original text; copies 1–9 prepend a copy
  token, preserving near-dup structure without manufacturing 10-way exact-
  duplicate clusters that would distort the dedup families.
- events: event_id/user_id remapped; ts shifted +copy seconds so per-user
  series stay strictly orderable (sessionization/gap-fill semantics keep
  their shape instead of collapsing into 10-way timestamp ties).
- embeddings: vec_id remapped, vectors unchanged (ANN/cosine costs depend
  on cardinality, not vector novelty; Spark and the DuckDB oracle see the
  same ties).

Everything is derived in DuckDB (no Spark needed) and is a pure function
of the sf0.1 input — rerunning reproduces byte-identical content.

Usage: python tools/make_sf1.py [src_dir] [dest_dir] [copies]
       (defaults: /root/testdata/sf0.1 -> /tmp/sf1, copies=10;
        copies=100 synthesizes the sf10 rung into e.g. /tmp/sf10 —
        60 M lineitem, 5 M events, 500 k documents, 200 k embeddings)
"""

import os
import sys

import duckdb

COPIES = 10

# per-table: SELECT template with {i} as the copy index
FACT_SQL = {
    "customer": """
        SELECT c_custkey * {n} + {i} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM src""",
    "supplier": """
        SELECT s_suppkey * {n} + {i} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM src""",
    "part": """
        SELECT p_partkey * {n} + {i} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM src""",
    "orders": """
        SELECT o_orderkey * {n} + {i} AS o_orderkey,
               o_custkey * {n} + {i} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM src""",
    "lineitem": """
        SELECT l_orderkey * {n} + {i} AS l_orderkey,
               l_partkey * {n} + {i} AS l_partkey,
               l_suppkey * {n} + {i} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM src""",
    "events": """
        SELECT event_id * {n} + {i} AS event_id,
               ts + INTERVAL ({i}) SECOND AS ts,
               user_id * {n} + {i} AS user_id,
               event_type, value, props
        FROM src""",
    "documents": """
        SELECT doc_id * {n} + {i} AS doc_id,
               CASE WHEN {i} = 0 THEN text
                    ELSE 'c{i}x ' || text END AS text,
               lang, source,
               CASE WHEN {i} = 0 THEN n_chars
                    ELSE n_chars + {pad} END AS n_chars
        FROM src""",
    "embeddings": """
        SELECT vec_id * {n} + {i} AS vec_id, embedding, label
        FROM src""",
}
DIM_TABLES = ("region", "nation")


def make(src_dir: str, dest_dir: str, copies: int = COPIES) -> None:
    os.makedirs(dest_dir, exist_ok=True)
    con = duckdb.connect()
    for t in DIM_TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src_dir}/{t}.parquet')) "
            f"TO '{dest_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied (dimension, unscaled)")
    for t, tmpl in FACT_SQL.items():
        con.execute(
            f"CREATE OR REPLACE VIEW src AS "
            f"SELECT * FROM read_parquet('{src_dir}/{t}.parquet')"
        )
        selects = " UNION ALL ".join(
            tmpl.format(i=i, n=copies, pad=len(f"c{i}x "))
            for i in range(copies)
        )
        con.execute(
            f"COPY ({selects}) TO '{dest_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        rows = con.execute(
            f"SELECT count(*) FROM read_parquet('{dest_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {rows} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else COPIES
    make(src, dest, copies=n)
