"""Tests for the mining wave: exact-substring span stats, frequent pairs,
PMI co-occurrence, Pareto frontier, multi-source BFS."""

import itertools

from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.dedup import duplicated_span_stats
from healthcare_etl_pipeline_spark.operators.graph import bfs_hops
from healthcare_etl_pipeline_spark.operators.mining import (
    frequent_pairs,
    pareto_frontier,
    pmi_pairs,
)


# ---------------------------------------------------------------------------
# duplicated_span_stats
# ---------------------------------------------------------------------------

def test_duplicated_span_stats_shared_span(spark):
    shared = " ".join(f"s{i}" for i in range(10))  # 10-token shared span
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta epsilon zeta eta"),
            (2, f"one two three {shared} four five six seven"),
            (3, "totally unrelated text with eight tokens here now ok fine"),
            (4, "short doc"),  # < k tokens → zero windows
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in duplicated_span_stats(docs, k=8).collect()}
    assert set(out) == {1, 2, 3, 4}
    # the 10-token shared span yields 3 duplicated 8-gram windows → span 10
    assert out[1]["max_dup_span"] == 10
    assert out[2]["max_dup_span"] == 10
    assert out[1]["n_dup_grams"] == 3
    assert out[3]["n_dup_grams"] == 0 and out[3]["max_dup_span"] == 0
    assert out[4]["n_grams"] == 0 and out[4]["dup_gram_ratio"] == 0.0


def test_duplicated_span_stats_within_doc_repeat(spark):
    span = " ".join(f"w{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, f"{span} filler1 filler2 filler3 {span}")],
        ["doc_id", "text"],
    )
    row = duplicated_span_stats(docs, k=8).collect()[0]
    # the 8-gram repeats within the SAME doc → both occurrences marked
    assert row["n_dup_grams"] == 2
    assert row["max_dup_span"] == 8


# ---------------------------------------------------------------------------
# frequent_pairs
# ---------------------------------------------------------------------------

def test_frequent_pairs_support_lift(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"), (4, "b"),  # duplicate item in a basket counts once
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = {
        (r["item_a"], r["item_b"]): r
        for r in frequent_pairs(df, "basket", "item", min_baskets=2).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c")}
    ab = out[("a", "b")]
    # support = 2/4; lift = (2*4)/(3*3)
    assert ab["n_baskets"] == 2
    assert abs(ab["support"] - 0.5) < 1e-9
    assert abs(ab["lift"] - 8 / 9) < 1e-6


# ---------------------------------------------------------------------------
# pmi_pairs
# ---------------------------------------------------------------------------

def test_pmi_pairs_counts(spark):
    docs = spark.createDataFrame(
        [(i, "x y common") if i % 2 == 0 else (i, "x z common") for i in range(10)],
        ["doc_id", "text"],
    )
    out = {
        (r["tok_a"], r["tok_b"]): r
        for r in pmi_pairs(docs, min_df_ratio=0.3, min_cooccur=5).collect()
    }
    # x & common co-occur in all 10 docs; y/z each only in 5
    assert out[("common", "x")]["n_ab"] == 10
    assert abs(out[("common", "x")]["pmi"]) < 1e-9  # ln(10*10/(10*10)) = 0
    assert out[("common", "y")]["n_ab"] == 5
    # ln(5*10/(10*5)) = 0
    assert abs(out[("common", "y")]["pmi"]) < 1e-9
    assert ("y", "z") not in out  # never co-occur


# ---------------------------------------------------------------------------
# pareto_frontier
# ---------------------------------------------------------------------------

def test_pareto_frontier_matches_bruteforce(spark):
    # deterministic pseudo-random points
    pts = [
        (i, float((i * 37) % 101), float((i * 53) % 97)) for i in range(200)
    ]
    df = spark.createDataFrame(pts, ["pid", "x", "y"])
    got = sorted(
        r["pid"] for r in pareto_frontier(df, "x", "y", "pid").collect()
    )

    # brute-force sweep under the same (x desc, pid asc) total order
    ordered = sorted(pts, key=lambda p: (-p[1], p[0]))
    best = float("-inf")
    want = []
    for pid, _x, y in ordered:
        if y > best:
            want.append(pid)
            best = max(best, y)
    assert got == sorted(want)
    # every survivor is genuinely non-dominated (strict both-dims check)
    survivors = [p for p in pts if p[0] in set(got)]
    for pid, x, y in survivors:
        assert not any(
            ox > x and oy > y for opid, ox, oy in pts if opid != pid
        )


# ---------------------------------------------------------------------------
# bfs_hops
# ---------------------------------------------------------------------------

def test_bfs_hops_chain_and_unreachable(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (7, 8)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    out = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 beyond max_hops, 7/8 unreachable


def test_bfs_hops_multi_source_min_distance(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 3)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,), (9,)], ["node"])
    out = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    # node 3 reachable at hop 2 via 1→2→3 but hop 1 via 9→3: min wins
    assert out == {1: 0, 9: 0, 2: 1, 3: 1}
