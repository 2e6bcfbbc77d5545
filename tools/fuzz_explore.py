#!/usr/bin/env python
"""Exploratory (randomized) run of the differential fuzzer's grammars.

The pytest suite runs DERANDOMIZED (fixed corpus — reproducible CI);
this driver samples FRESH random ASTs through the identical
Spark-vs-DuckDB harness to widen coverage between rounds. Mismatches
print the full AST + SQL so they can be added to the fixed corpus as
regression cases.

Usage: python tools/fuzz_explore.py [n_per_property] [seed]

The seed is REAL: ASTs are drawn through ``@given`` under an explicit
``hypothesis.seed`` (``strategy.example()`` is documented as
non-reproducible, so it is not used here) — the same (n, seed) pair
replays the identical AST sequence when promoting a mismatch into the
fixed regression corpus.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from hypothesis import HealthCheck, Phase, given, seed as hyp_seed, settings

import tests.test_differential_fuzz as tf
from healthcare_etl_pipeline_spark.session import get_spark


def _draw(strat, n: int, seed_val: int) -> list:
    """Reproducibly draw ~n examples from a strategy: a ``@given`` body
    that only records its argument, pinned by ``hypothesis.seed`` with
    the example database and shrinking disabled."""
    out: list = []

    @hyp_seed(seed_val)
    @settings(
        max_examples=n,
        database=None,
        deadline=None,
        derandomize=False,
        phases=[Phase.generate],
        suppress_health_check=list(HealthCheck),
    )
    @given(strat)
    def collect(q):
        out.append(q)

    collect()
    return out[:n]


def _duck():
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tf.SF_DIR}/{t}.parquet')"
        )
    return con


def _check_relational(spark, duck, q) -> str | None:
    srows = [tuple(r) for r in tf._spark_query(spark, q).collect()]
    drows = [tuple(r) for r in duck.execute(tf._duck_sql(q)).fetchall()]
    ok, why = tf._agree(
        tf._normalize(srows, len(q["group_by"])),
        tf._normalize(drows, len(q["group_by"])),
    )
    return None if ok else f"{why}\nAST: {q}\nSQL: {tf._duck_sql(q)}"


def _check_window(spark, duck, q) -> str | None:
    srows = {r[0]: r[1] for r in tf._spark_win(spark, q).collect()}
    drows = {r[0]: r[1] for r in duck.execute(tf._duck_win_sql(q)).fetchall()}
    if len(srows) != len(drows):
        return f"row-count {len(srows)} vs {len(drows)}\nAST: {q}"
    for k, sv in srows.items():
        dv = drows.get(k)
        if sv is None or dv is None:
            if sv is not dv:
                return f"null mismatch at {k}: {sv} vs {dv}\nAST: {q}"
        elif not math.isclose(float(sv), float(dv), rel_tol=1e-9, abs_tol=1e-9):
            return f"value mismatch at {k}: {sv} vs {dv}\nAST: {q}"
    return None


def _check_jwa(spark, duck, q) -> str | None:
    srows = [tuple(r) for r in tf._spark_jwa(spark, q).collect()]
    drows = [tuple(r) for r in duck.execute(tf._duck_jwa_sql(q)).fetchall()]
    n_group = 1 if q["group_by"] else 0
    ok, why = tf._agree(
        tf._normalize(srows, n_group), tf._normalize(drows, n_group)
    )
    return None if ok else f"{why}\nAST: {q}\nSQL: {tf._duck_jwa_sql(q)}"


def _check_setop(spark, duck, q) -> str | None:
    srows = sorted(tuple(r) for r in tf._spark_setop(spark, q).collect())
    drows = sorted(
        tuple(r) for r in duck.execute(tf._duck_setop_sql(q)).fetchall()
    )
    if srows == drows:
        return None
    return (
        f"multiset mismatch ({len(srows)} vs {len(drows)})"
        f"\nAST: {q}\nSQL: {tf._duck_setop_sql(q)}"
    )


def _check_subq(spark, duck, q) -> str | None:
    srows = sorted(tuple(r) for r in tf._spark_subq(spark, q).collect())
    drows = sorted(
        tuple(r) for r in duck.execute(tf._duck_subq_sql(q)).fetchall()
    )
    if srows == drows:
        return None
    return (
        f"row sets differ ({len(srows)} vs {len(drows)})"
        f"\nAST: {q}\nSQL: {tf._duck_subq_sql(q)}"
    )


def _check_agg6(spark, duck, q) -> str | None:
    n_key = len(q["groups"]) * (2 if q["mode"] != "plain" else 1)
    srows = [tuple(r) for r in tf._spark_agg6(spark, q).collect()]
    drows = [tuple(r) for r in duck.execute(tf._duck_agg6_sql(q)).fetchall()]
    ok, why = tf._agree(
        tf._normalize(srows, n_key), tf._normalize(drows, n_key)
    )
    if ok:
        return None
    return f"{why}\nAST: {q}\nSQL: {tf._duck_agg6_sql(q)}"


def _check_sql7(spark, duck, q) -> str | None:
    ok, why = tf._check_sql7(spark, duck, q)
    return None if ok else f"{why}\nAST: {q}\nSQL: {tf._sql7(q)}"


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    spark = get_spark()
    duck = _duck()
    props = [
        ("relational", tf.ast, _check_relational),
        ("window", tf.win_ast, _check_window),
        ("join+win+agg", tf.jwa_ast, _check_jwa),
        ("set-ops", tf.setop_ast, _check_setop),
        ("subqueries", tf.subq_ast, _check_subq),
        ("distinct+filter+rollup", tf.agg6_ast, _check_agg6),
        ("same-text lateral+recursive", tf.sql7_ast, _check_sql7),
    ]
    failures = 0
    for name, strat, check in props:
        mismatches = 0
        for i, q in enumerate(_draw(strat, n, seed)):
            try:
                bad = check(spark, duck, q)
            except Exception as exc:  # noqa: BLE001 — a crash IS a finding
                bad = f"EXCEPTION {type(exc).__name__}: {exc}\nAST: {q}"
            if bad:
                mismatches += 1
                failures += 1
                print(f"MISMATCH [{name} #{i}]\n{bad}\n", flush=True)
        print(f"{name}: {n - mismatches}/{n} agree", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
