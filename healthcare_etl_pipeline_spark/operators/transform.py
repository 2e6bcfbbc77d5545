"""Transform stage: PHI-strip projection + encrypting normalization.

Re-expresses the reference's transform stage (reference:
app/etl/pipeline.py:87-118):
- build the internal record: mrn, encrypted_name/dob/ssn, gender, constant
  resource_type="Patient", sanitized fhir_resource (PHI keys removed);
- ssn encryption is conditional on presence (pipeline.py:108-110);
- PHI strip drops name/birthDate/ssn from the stored payload
  (pipeline.py:96-101).

Spark mapping: one ``select`` projection — Catalyst prunes unused input
columns all the way to the scan; the only Python is the Fernet pandas_udf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.functions.encryption import make_encrypt_udf

PHI_FIELDS = ("name", "birthDate", "ssn")


def strip_phi_fields(df: DataFrame, struct_col: str, fields: tuple[str, ...] = PHI_FIELDS) -> DataFrame:
    """Drop PHI subfields from a struct column (reference pipeline.py:96-101)."""
    out = F.col(struct_col)
    for f_name in fields:
        out = out.dropFields(f_name)
    return df.withColumn(struct_col, out)


def transform_patients(df: DataFrame, key: bytes | None = None) -> DataFrame:
    """Normalize validated+consented patient records for loading.

    Input columns: resourceType, mrn, name, birthDate, gender, ssn, consent.
    Output matches the reference's internal record (pipeline.py:103-115) with
    the sanitized payload as a JSON string (fhir_resource).
    """
    enc = make_encrypt_udf(key)
    sanitized = F.to_json(
        F.struct(
            F.col("resourceType"),
            F.col("mrn"),
            F.col("gender"),
        )
    )
    return df.select(
        F.col("mrn"),
        enc(F.col("name")).alias("encrypted_name"),
        enc(F.col("birthDate")).alias("encrypted_dob"),
        F.when(F.col("ssn").isNotNull(), enc(F.col("ssn"))).alias("encrypted_ssn"),
        F.col("gender"),
        F.lit("Patient").alias("resource_type"),
        sanitized.alias("fhir_resource"),
        F.col("consent"),
    )
