"""Encryption UDF tests (ported from reference tests/test_encryption.py)."""

from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.functions.encryption import (
    make_decrypt_udf,
    make_encrypt_udf,
)


def test_roundtrip_and_ciphertext_differs(spark):
    enc, dec = make_encrypt_udf(), make_decrypt_udf()
    df = spark.createDataFrame([("secret-phi",)], ["v"]).select(
        F.col("v"),
        enc(F.col("v")).alias("ct"),
    )
    row = df.select("v", "ct", dec(F.col("ct")).alias("rt")).collect()[0]
    assert row.ct != "secret-phi"
    assert row.rt == "secret-phi"


def test_empty_string_passthrough(spark):
    enc, dec = make_encrypt_udf(), make_decrypt_udf()
    df = spark.createDataFrame([("",), (None,)], ["v"])
    rows = df.select(enc(F.col("v")).alias("ct"), dec(F.col("v")).alias("pt")).collect()
    assert rows[0].ct == ""
    assert rows[0].pt == ""
    assert rows[1].ct is None
    assert rows[1].pt is None


def test_encrypt_is_nondeterministic_flagged(spark):
    # Fernet embeds a random IV: same plaintext → different ciphertext, so the
    # UDF must carry the nondeterministic flag to stop Catalyst CSE/reorder.
    enc = make_encrypt_udf()
    df = spark.createDataFrame([("x",)], ["v"]).select(
        enc(F.col("v")).alias("a"), enc(F.col("v")).alias("b")
    )
    row = df.collect()[0]
    assert row.a != row.b
