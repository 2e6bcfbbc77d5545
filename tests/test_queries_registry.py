"""Registry contract tests: every query is callable, oracle coverage is sane."""

from healthcare_etl_pipeline_spark.queries import all_queries


def test_registry_nonempty_and_unique():
    specs = all_queries()
    assert len(specs) >= 50
    assert all(spec.name == name for name, spec in specs.items())


def test_oracle_coverage():
    specs = all_queries()
    with_oracle = [s for s in specs.values() if s.oracle is not None]
    # engine-specific ops are allowed to be rows-only, but they must be few
    # (approx sketches ×2, ANN ×2, multimodal decode, iterative BPE train
    # + encode, k-means, SemDeDup)
    assert len(with_oracle) >= len(specs) - 9


def test_every_query_has_description():
    for spec in all_queries().values():
        assert spec.description, f"{spec.name} lacks a description"


def test_flagship_runs_at_smoke_sf(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
