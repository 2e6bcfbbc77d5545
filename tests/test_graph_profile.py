"""Hand-computable fixtures for pagerank and psi_drift."""

import math

import pytest
from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.graph import pagerank
from healthcare_etl_pipeline_spark.operators.profile import psi_drift


def test_pagerank_star_hand_computed(spark):
    # a(1) <-> b(2), a <-> c(3): outdeg a=2, b=c=1
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 1)], "src long, dst long"
    )
    out = {r.node: r.rank for r in pagerank(edges, iters=1).collect()}
    # r1(a) = 0.15/3 + 0.85*(1/3 + 1/3); r1(b) = r1(c) = 0.15/3 + 0.85*(1/6)
    assert out[1] == pytest.approx(0.05 + 0.85 * (2 / 3))
    assert out[2] == pytest.approx(0.05 + 0.85 / 6)
    assert out[2] == out[3]
    # rank mass is conserved on a closed graph
    assert sum(out.values()) == pytest.approx(1.0)


def test_psi_drift_hand_computed(spark):
    ref = spark.createDataFrame(
        [(5.0,)] * 50 + [(15.0,)] * 50, "v double"
    )
    cur = spark.createDataFrame(
        [(5.0,)] * 90 + [(15.0,)] * 10, "v double"
    )
    out = psi_drift(ref, cur, "v", bin_width=10, n_bins=2).collect()
    total = sum(r.psi_term for r in out)
    expect = (0.9 - 0.5) * math.log(0.9 / 0.5) + (0.1 - 0.5) * math.log(0.1 / 0.5)
    assert total == pytest.approx(expect, abs=1e-5)
    assert {r.bin for r in out} == {0, 1}
    assert all(r.n_ref == 50 for r in out)


def test_psi_drift_empty_bin_is_finite(spark):
    ref = spark.createDataFrame([(5.0,)] * 10 + [(15.0,)] * 10, "v double")
    cur = spark.createDataFrame([(5.0,)] * 10, "v double")  # bin 1 empty
    out = {r.bin: r for r in psi_drift(ref, cur, "v", bin_width=10, n_bins=2).collect()}
    assert out[1].n_cur == 0
    assert math.isfinite(out[1].psi_term) and out[1].psi_term > 0


def test_ks_drift_detects_shift_and_identical_is_zero(spark):
    from healthcare_etl_pipeline_spark.operators.profile import ks_drift

    ref = spark.createDataFrame(
        [("g", float(v)) for v in range(100)], "g string, v double"
    )
    shifted = spark.createDataFrame(
        [("g", float(v + 50)) for v in range(100)], "g string, v double"
    )
    d = ks_drift(ref, shifted, "v", ["g"], bin_width=10.0, n_bins=20).collect()[0]
    # mass moved up by 50 = 5 bins of 10% each -> D = 0.5
    assert abs(d.ks_stat - 0.5) < 1e-6
    assert d.n_ref == 100 and d.n_cur == 100
    same = ks_drift(ref, ref, "v", ["g"], bin_width=10.0, n_bins=20).collect()[0]
    assert same.ks_stat == 0.0


def test_triangle_stats_hand_computed(spark):
    from healthcare_etl_pipeline_spark.operators.graph import triangle_stats

    # K4 on {1,2,3,4} (4 triangles) + pendant 5-1 + dup/reversed edges
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 1),
             (2, 1), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = triangle_stats(df).collect()[0]
    assert r.n_vertices == 5
    assert r.n_edges == 7
    assert r.n_triangles == 4
    # wedges: deg(1)=4,deg(2)=3,deg(3)=3,deg(4)=3,deg(5)=1 -> 6+3+3+3 = 15
    assert r.n_wedges == 15
    assert abs(r.clustering - 12 / 15) < 1e-9
