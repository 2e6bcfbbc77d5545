"""Local differential harness: run every registered query on Spark AND its
DuckDB oracle, compare row count, column names, and order-insensitive values.

Approximates the driver's t2 check so mismatches surface before a round ends.

Usage:
    python tools/check_oracle.py [sf_dir] [query ...]
    python tools/check_oracle.py [sf_dir] --chunk I/N

--chunk I/N runs the I-th of N alphabetical-interleave slices of the
registry (I in 1..N) — lets long scale-factor drives run as several
shorter sessions (see ORACLE_SF01.md).
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from healthcare_etl_pipeline_spark.catalog import TABLES, table_path
from healthcare_etl_pipeline_spark.queries import all_queries
from healthcare_etl_pipeline_spark.session import get_spark


def norm_value(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0.0"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def row_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        "|".join(norm_value(r[i]) for i in order) for r in rows
    )
    return out


def main() -> int:
    args = sys.argv[1:]
    chunk = None
    if "--chunk" in args:
        i = args.index("--chunk")
        num, den = args[i + 1].split("/")
        chunk = (int(num), int(den))
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = get_spark()
    con = duckdb.connect()
    # At rung scales (sf100: 26 GB parquet) DuckDB's default memory limit
    # (~80% of RAM) plus the Spark JVM heap exceeds the box — the kernel
    # OOM-kills the JVM mid-drive (observed round 7). Cap DuckDB when the
    # drive co-hosts a large Spark heap.
    duck_mem = os.environ.get("SPARK_GRAFT_DUCK_MEM")
    if duck_mem:
        con.execute(f"SET memory_limit='{duck_mem}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )

    specs = all_queries()
    names = [n for n in sorted(specs) if not only or n in only]
    if chunk:
        i, n = chunk
        names = names[i - 1 :: n]
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR")
            traceback.print_exc(limit=4)
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: DUCKDB ERROR {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not problems:
            s_set = row_set(scols, [[r[c] for c in scols] for r in srows])
            o_set = row_set(ocols, orows)
            if s_set != o_set:
                diff_s = [r for r in s_set if r not in set(o_set)][:3]
                diff_o = [r for r in o_set if r not in set(s_set)][:3]
                problems.append(f"values spark_only={diff_s} duck_only={diff_o}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} FAIL")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
