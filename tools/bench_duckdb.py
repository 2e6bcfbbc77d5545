"""Single-node comparison baseline: run the headline queries' ORACLE SQL in
DuckDB on the same parquet inputs and print the same JSON shape bench.py
emits.

The reference repo publishes no benchmark (BASELINE.md), so DuckDB — a
state-of-the-art single-node OLAP engine executing the exact oracle SQL —
is the honest stand-in for "reference single-node throughput" at the same
scale factor. Queries without an oracle (engine-specific) are skipped and
listed.

Usage: python tools/bench_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE
from healthcare_etl_pipeline_spark.catalog import TABLES, table_path
from healthcare_etl_pipeline_spark.queries import all_queries


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    specs = all_queries()
    timings: dict[str, float] = {}
    skipped: list[str] = []
    for name in HEADLINE:
        oracle = specs[name].oracle
        if oracle is None:
            skipped.append(name)
            continue
        con.execute(oracle).fetchall()  # warm (buffer cache, plan)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(oracle).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_headline_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "skipped_no_oracle": skipped,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
