"""Privacy operators: k-anonymity audit semantics and Safe-Harbor
generalization, including the 90+ top-code the corpus ages never reach."""

from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.privacy import (
    generalize,
    k_anonymity,
    safe_harbor_deidentify,
)


def _people(spark):
    rows = [
        # (mrn, ssn, birthDate, gender, dx)
        ("M1", "111-11-1111", "1950-01-01", "male", "flu"),
        ("M2", "222-22-2222", "1955-06-01", "male", "flu"),
        ("M3", None, "1958-03-09", "male", "cold"),
        ("M4", "444-44-4444", "1980-07-04", "female", "flu"),
        ("M5", "555-55-5555", "1931-02-11", "female", "flu"),  # age 95
        ("M6", "666-66-6666", None, "other", "cold"),
    ]
    return spark.createDataFrame(rows, ["mrn", "ssn", "birthDate", "gender", "dx"])


def test_k_anonymity_flags_small_and_homogeneous_classes(spark):
    df = _people(spark).withColumn(
        "decade", F.concat(F.substring("birthDate", 1, 3), F.lit("0s"))
    )
    out = {
        (r.gender, r.decade): r
        for r in k_anonymity(df, ["gender", "decade"], sensitive_col="dx", k=3).collect()
    }
    m50 = out[("male", "1950s")]
    assert m50.class_size == 3
    assert m50.k_violation is False  # k=3 met exactly
    assert m50.l_diversity == 2 and m50.homogeneous is False
    f80 = out[("female", "1980s")]
    assert f80.class_size == 1 and f80.k_violation is True
    assert f80.l_diversity == 1 and f80.homogeneous is True


def test_safe_harbor_topcodes_age_and_suppresses_identifiers(spark):
    out = {r.pseudonym: r for r in safe_harbor_deidentify(_people(spark)).collect()}
    rows = list(out.values())
    # direct identifiers gone: every ssn suppressed, mrn never appears
    assert all(r.ssn is None for r in rows)
    assert not any(r.pseudonym.startswith("M") and len(r.pseudonym) < 32 for r in rows)
    by_year = {r.birth_year: r for r in rows}
    assert by_year[1950].age_band == "76"
    assert by_year[1931].age_band == "90+"  # the top-code rule
    assert by_year[None].age_band is None  # null birth date stays null
    # deterministic pseudonyms: same input twice -> same digest
    again = {r.pseudonym for r in safe_harbor_deidentify(_people(spark)).collect()}
    assert again == set(out)


def test_generalize_bands(spark):
    df = spark.createDataFrame([(3,), (49,), (50,), (104,)], ["v"])
    out = [r.b for r in df.select(generalize(F.col("v"), width=50).alias("b")).collect()]
    assert out == [0, 0, 50, 100]


def test_laplace_noise_distribution(spark):
    import math

    from healthcare_etl_pipeline_spark.operators.privacy import laplace_noise

    scale = 2.0
    n = 20_000
    samples = [
        r.x
        for r in spark.range(n)
        .select(laplace_noise(scale, seed=7).alias("x"))
        .collect()
    ]
    mean = sum(samples) / n
    var = sum((s - mean) ** 2 for s in samples) / n
    # Laplace(0, b): mean 0, var 2b^2 = 8. Loose 5-sigma-ish tolerances.
    assert abs(mean) < 0.15
    assert abs(var - 8.0) < 1.5
    # symmetric-ish and actually noisy
    assert 0.45 < sum(1 for s in samples if s > 0) / n < 0.55
    assert len({round(s, 6) for s in samples}) > n // 2


def test_dp_counts_noisy_but_bounded(spark):
    from healthcare_etl_pipeline_spark.operators.privacy import dp_counts

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(1000)], ["id", "g"]
    )
    out = {r.g: r for r in dp_counts(df, ["g"], epsilon=0.5).collect()}
    for g in ("a", "b"):
        assert out[g].n_exact == 500
        assert abs(out[g].n_noisy - 500) <= 21  # 10*scale + rounding
