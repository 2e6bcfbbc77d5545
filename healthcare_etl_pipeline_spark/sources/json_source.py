"""JSON record source with corrupt-record routing.

The reference's wire contract is JSON batches parsed by Pydantic — malformed
input is rejected before the pipeline runs (HTTP 422, reference
app/schemas/api.py:15-28). The Spark-first equivalent keeps parsing inside
the plan and ROUTES instead of failing: ``from_json`` yields a typed struct
for well-formed rows and null for corrupt ones, and the splitter sends each
side on. Same collect-don't-crash posture as the validation operator
(operators/validation.py).

At scale this is the standard pattern for reading JSON event feeds: schema
pinned (no inference pass over 100 TB), corrupt rows quarantined to a
side-output table for replay, zero Python in the parse path (Jackson inside
codegen).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class JsonSplit(NamedTuple):
    parsed: DataFrame   # original columns + parsed struct column
    corrupt: DataFrame  # original columns only (raw text preserved for replay)


CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: T.StructType | str) -> T.StructType:
    st = T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
    if CORRUPT_COL in st.fieldNames():
        return st
    return T.StructType(list(st.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def parse_json_column(
    df: DataFrame,
    json_col: str,
    schema: T.StructType | str,
    *,
    parsed_col: str = "parsed",
) -> JsonSplit:
    """Parse a JSON string column against a pinned schema; route corrupt rows.

    PERMISSIVE ``from_json`` yields an all-null struct for malformed input,
    so corruption is detected the supported way: a ``_corrupt_record``
    field in the parse schema, non-null exactly when the row failed to
    parse. Well-formed-but-schema-mismatched fields surface as nulls inside
    the struct — field-level validation is the validation operator's job,
    not the parser's.
    """
    full = _with_corrupt_field(schema)
    annotated = df.withColumn(
        parsed_col,
        F.from_json(
            F.col(json_col), full, {"columnNameOfCorruptRecord": CORRUPT_COL}
        ),
    )
    bad = F.col(parsed_col)[CORRUPT_COL].isNotNull()
    return JsonSplit(
        parsed=annotated.filter(~bad).withColumn(
            parsed_col, F.col(parsed_col).dropFields(CORRUPT_COL)
        ),
        corrupt=annotated.filter(bad).drop(parsed_col),
    )


def is_valid_json(col: Column | str, schema: T.StructType | str) -> Column:
    """Boolean: the string parses against the schema (null input → true,
    matching the parser's treat-missing-as-absent routing)."""
    c = F.col(col) if isinstance(col, str) else col
    full = _with_corrupt_field(schema)
    return F.from_json(c, full, {"columnNameOfCorruptRecord": CORRUPT_COL})[
        CORRUPT_COL
    ].isNull()
