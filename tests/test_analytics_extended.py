"""Tests for the extended analytics surface."""

from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.queries.helpers import t
from healthcare_etl_pipeline_spark.queries.registry import get

SF = "/root/testdata/sf0.001"


def test_approx_percentiles_within_tolerance(spark):
    """GK-sketch percentiles must land near the exact ones.

    sf0.01 (2000 events/type): at sf0.001 the p99 neighborhood is so sparse
    that nearest-rank vs interpolated differ by >5% legitimately.
    """
    sf = "/root/testdata/sf0.01"
    approx = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in get("approx_percentiles_value").fn(spark, sf).collect()
    }
    exact = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in t(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et in exact:
        for a, e in zip(approx[et], exact[et]):
            spread = abs(e) if abs(e) > 1 else 1.0
            assert abs(a - e) / spread < 0.05, (et, a, e)


def test_unpivot_row_multiplicity(spark):
    out = get("unpivot_part_measures").fn(spark, SF)
    n_parts = t(spark, SF, "part").count()
    assert out.count() == 2 * n_parts
