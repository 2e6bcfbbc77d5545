"""Validation operator tests (ported from reference tests/test_validation.py)."""

import json

from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.validation import (
    PATIENT_RULES,
    Rule,
    annotate_errors,
    jsonschema_errors_udf,
    validate_split,
)
from healthcare_etl_pipeline_spark.plans.pipeline import records_to_df
from tests.conftest import make_patient


def _errors_for(spark, record):
    df = records_to_df(spark, [record])
    return annotate_errors(df, PATIENT_RULES).collect()[0].errors


def test_valid_record_no_errors(spark):
    assert _errors_for(spark, make_patient()) == []


def test_missing_required_collects_all(spark):
    """A record missing both mrn and name reports BOTH errors (collect-all)."""
    errors = _errors_for(spark, make_patient(mrn=None, name=None))
    joined = " ".join(errors)
    assert "mrn" in joined
    assert "name" in joined
    assert len(errors) == 2


def test_bad_date_format(spark):
    errors = _errors_for(spark, make_patient(birthDate="12-04-1980"))
    assert len(errors) == 1
    assert "birthDate" in errors[0]


def test_bad_gender_enum(spark):
    errors = _errors_for(spark, make_patient(gender="robot"))
    assert len(errors) == 1
    assert "gender" in errors[0]


def test_empty_string_mrn_rejected(spark):
    errors = _errors_for(spark, make_patient(mrn=""))
    assert any("mrn" in e for e in errors)


def test_nullable_optionals_pass(spark):
    assert _errors_for(spark, make_patient(birthDate=None, gender=None, ssn=None)) == []


def test_split_routes_both_sides(spark):
    df = records_to_df(spark, [make_patient(), make_patient(mrn=None)])
    valid, invalid = validate_split(df, PATIENT_RULES)
    assert valid.count() == 1
    assert invalid.count() == 1
    assert "errors" in invalid.columns
    assert "errors" not in valid.columns


def test_rule_kinds():
    df_rules = [
        Rule("x", "min_length", 3),
        Rule("x", "not_negative"),
        Rule("x", "castable", "int"),
    ]
    assert "shorter than 3" in df_rules[0].error_message()
    assert ">= 0" in df_rules[1].error_message()
    assert "valid int" in df_rules[2].error_message()


def test_jsonschema_udf_fallback(spark):
    """Full Draft-7 fidelity path over a JSON string column."""
    schema = {
        "type": "object",
        "required": ["mrn", "name"],
        "properties": {
            "mrn": {"type": "string", "minLength": 1},
            "name": {"type": "string"},
        },
        "additionalProperties": False,
    }
    udf = jsonschema_errors_udf(schema)
    df = spark.createDataFrame(
        [
            (json.dumps({"mrn": "M1", "name": "ok"}),),
            (json.dumps({"mrn": "M2", "extra": 1}),),  # missing name + extra prop
            ("not json",),
        ],
        ["payload"],
    )
    rows = df.select(udf(F.col("payload")).alias("errors")).collect()
    assert rows[0].errors == []
    assert len(rows[1].errors) == 2  # collect-all: missing name AND extra prop
    assert rows[2].errors == ["record is not valid JSON"]


def test_parse_json_column_routes_corrupt(spark):
    from healthcare_etl_pipeline_spark.sources.json_source import parse_json_column

    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, "{broken"), (3, None), (4, '{"k": null}')],
        ["id", "payload"],
    )
    parsed, corrupt = parse_json_column(df, "payload", "struct<k: bigint>")
    assert {r.id for r in corrupt.collect()} == {2}
    got = {r.id: (r.parsed["k"] if r.parsed else None) for r in parsed.collect()}
    assert got == {1: 5, 3: None, 4: None}


def test_parse_csv_column_routes_corrupt(spark):
    from healthcare_etl_pipeline_spark.sources.csv_source import (
        parse_csv_column,
    )

    df = spark.createDataFrame(
        [(1, "10,alpha,1.5"), (2, "11,beta,notanumber"), (3, "12,gamma,2.0")],
        ["id", "line"],
    )
    parsed, corrupt = parse_csv_column(
        df, "line", "k BIGINT, name STRING, v DOUBLE"
    )
    # corrupt side: routed line-level, raw text preserved for replay
    bad = corrupt.collect()
    assert [r.id for r in bad] == [2]
    assert bad[0].line == "11,beta,notanumber"
    got = {r.id: (r.parsed["k"], r.parsed["name"], r.parsed["v"]) for r in parsed.collect()}
    assert got == {1: (10, "alpha", 1.5), 3: (12, "gamma", 2.0)}


def test_nested_rule_kinds(spark):
    """nested_required / array_item_required / closed_world semantics."""
    from healthcare_etl_pipeline_spark.operators.validation import (
        OBSERVATION_DDL,
        OBSERVATION_RULES,
    )

    payloads = [
        # valid
        '{"resourceType":"Observation","status":"final",'
        '"code":{"coding":[{"system":"s","code":"c"}]}}',
        # code present, coding missing -> nested_required
        '{"resourceType":"Observation","status":"final","code":{}}',
        # two items each missing code -> TWO per-item errors
        '{"resourceType":"Observation","status":"final",'
        '"code":{"coding":[{"system":"a"},{"system":"b"}]}}',
        # extra top-level property -> closed_world
        '{"resourceType":"Observation","status":"final",'
        '"code":{"coding":[]},"oops":1}',
        # code absent entirely -> required fires, nested/item rules stay quiet
        '{"resourceType":"Observation","status":"final"}',
    ]
    df = spark.createDataFrame([(p,) for p in payloads], ["payload"])
    flat = df.select(
        "payload", F.from_json("payload", OBSERVATION_DDL).alias("o")
    ).select("payload", "o.*")
    rows = annotate_errors(flat.coalesce(1), OBSERVATION_RULES).collect()
    assert rows[0].errors == []
    assert rows[1].errors == ["'coding' is a required property"]
    assert rows[2].errors == ["'code' is a required property"] * 2
    assert rows[3].errors == ["Additional properties are not allowed"]
    assert rows[4].errors == ["'code' is a required property"]


def test_observation_rules_differential_vs_jsonschema(spark):
    """OBSERVATION_RULES must agree with the reference validator
    (jsonschema Draft-7 on the FHIR Observation contract,
    reference app/schemas/fhir.py:61-100) on validity AND error count over
    a seeded sweep of nested record space — including per-coding-item
    errors and additionalProperties."""
    import random

    import jsonschema

    from healthcare_etl_pipeline_spark.operators.validation import (
        OBSERVATION_DDL,
        OBSERVATION_RULES,
    )

    fhir_schema = {
        "type": "object",
        "required": ["resourceType", "status", "code"],
        "properties": {
            "resourceType": {"type": "string", "const": "Observation"},
            "status": {
                "type": "string",
                "enum": ["registered", "preliminary", "final", "amended"],
            },
            "code": {
                "type": "object",
                "required": ["coding"],
                "properties": {
                    "coding": {
                        "type": "array",
                        "items": {
                            "type": "object",
                            "required": ["system", "code"],
                            "properties": {
                                "system": {"type": "string"},
                                "code": {"type": "string"},
                                "display": {"type": "string"},
                            },
                        },
                    }
                },
            },
            "valueQuantity": {
                "type": "object",
                "properties": {
                    "value": {"type": "number"},
                    "unit": {"type": "string"},
                },
            },
        },
        "additionalProperties": False,
    }
    validator = jsonschema.Draft7Validator(fhir_schema)
    rng = random.Random(7)

    def rand_record():
        rec = {
            "resourceType": rng.choice(["Observation", "Patient", None]),
            "status": rng.choice(
                ["final", "amended", "registered", "preliminary", "bogus", None]
            ),
        }
        roll = rng.random()
        if roll < 0.2:
            rec["code"] = None
        elif roll < 0.35:
            rec["code"] = {"coding": None}
        else:
            rec["code"] = {
                "coding": [
                    {
                        "system": rng.choice(["http://loinc.org", None]),
                        "code": rng.choice(["8867-4", None]),
                        "display": rng.choice(["HR", None]),
                    }
                    for _ in range(rng.randint(0, 3))
                ]
            }
        rec["valueQuantity"] = rng.choice(
            [None, {"value": 1.5, "unit": "mg"}, {"value": None, "unit": None}]
        )
        if rng.random() < 0.2:
            rec["extraProp"] = "x"
        return rec

    def drop_nones(v):
        if isinstance(v, dict):
            return {k: drop_nones(x) for k, x in v.items() if x is not None}
        if isinstance(v, list):
            return [drop_nones(x) for x in v]
        return v

    records = [drop_nones(rand_record()) for _ in range(300)]
    payloads = [json.dumps(r) for r in records]
    df = spark.createDataFrame([(p,) for p in payloads], ["payload"])
    flat = df.select(
        "payload", F.from_json("payload", OBSERVATION_DDL).alias("o")
    ).select("payload", "o.*")
    spark_errors = [
        r.errors for r in annotate_errors(flat.coalesce(1), OBSERVATION_RULES).collect()
    ]
    for rec, errs in zip(records, spark_errors):
        ref_errors = [e.message for e in validator.iter_errors(rec)]
        assert (len(errs) == 0) == (len(ref_errors) == 0), (rec, errs, ref_errors)
        assert len(errs) == len(ref_errors), (rec, errs, ref_errors)


def test_rule_compiler_differential_vs_jsonschema(spark):
    """compile_rules(PATIENT_RULES) must agree with the reference's actual
    validator (jsonschema Draft-7 on the FHIR Patient contract) on validity
    AND error count, over a seeded sweep of the input space.

    Missing-vs-null: the DataFrame represents absent fields as null, so the
    jsonschema payload drops None keys (absent ≡ null, matching the rules'
    required/optional semantics).
    """
    import random

    import jsonschema

    from healthcare_etl_pipeline_spark.operators.validation import (
        PATIENT_RULES,
        annotate_errors,
    )
    from healthcare_etl_pipeline_spark.plans.pipeline import RAW_PATIENT_SCHEMA

    fhir_schema = {
        "type": "object",
        "required": ["resourceType", "mrn", "name"],
        "properties": {
            "resourceType": {"const": "Patient"},
            "mrn": {"type": "string", "minLength": 1},
            "name": {"type": "string", "minLength": 1},
            "birthDate": {"type": "string", "pattern": r"^\d{4}-\d{2}-\d{2}$"},
            "gender": {"enum": ["male", "female", "other", "unknown"]},
            "ssn": {"type": "string", "pattern": r"^\d{3}-\d{2}-\d{4}$"},
        },
    }
    validator = jsonschema.Draft7Validator(fhir_schema)

    pools = {
        "resourceType": ["Patient", "Observation", "", None],
        "mrn": ["MRN-1", "", None],
        "name": ["Jane", "", None],
        "birthDate": ["1980-04-12", "1980-4-12", "not-a-date", "", None],
        "gender": ["male", "female", "other", "unknown", "robot", "", None],
        "ssn": ["123-45-6789", "123456789", "", None],
    }
    rng = random.Random(42)
    records = [
        {k: rng.choice(v) for k, v in pools.items()} for _ in range(400)
    ]
    for r in records:
        r["consent"] = None

    df = spark.createDataFrame(
        [{f.name: r.get(f.name) for f in RAW_PATIENT_SCHEMA.fields} for r in records],
        RAW_PATIENT_SCHEMA,
    )
    spark_errors = [
        r.errors
        for r in annotate_errors(df.coalesce(1), PATIENT_RULES).collect()
    ]
    for rec, errs in zip(records, spark_errors):
        payload = {k: v for k, v in rec.items() if v is not None and k != "consent"}
        ref_errors = list(validator.iter_errors(payload))
        assert (len(errs) == 0) == (len(ref_errors) == 0), (rec, errs, [e.message for e in ref_errors])
        assert len(errs) == len(ref_errors), (rec, errs, [e.message for e in ref_errors])
