"""CSV record source with corrupt-record routing.

The delimited-text sibling of sources/json_source.py: ``from_csv``
against a pinned DDL schema in PERMISSIVE mode, with a
``_corrupt_record`` field that is non-null exactly when the line failed
to parse — malformed rows are ROUTED to a quarantine side-output
instead of failing the job, raw text preserved for replay. Zero Python
in the parse path (Univocity inside codegen), no schema inference pass
— the posture that matters when the feed is 100 TB of CSV drops.

PERMISSIVE field semantics: a field that fails its declared type parses
as null and the whole raw line lands in the corrupt column; fields
before/after the bad one may still be populated in the parsed struct —
the split routes on line-level corruption, field-level validation stays
the validation operator's job.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


class CsvSplit(NamedTuple):
    parsed: DataFrame   # original columns + parsed struct column
    corrupt: DataFrame  # original columns only (raw line preserved for replay)


def _full_ddl(ddl: str) -> str:
    return f"{ddl}, {CORRUPT_COL} STRING"


def parse_csv_column(
    df: DataFrame,
    csv_col: str,
    ddl: str,
    *,
    parsed_col: str = "parsed",
    options: dict | None = None,
) -> CsvSplit:
    """Parse a CSV-line column against a pinned DDL schema; route corrupt
    rows. ``ddl`` is the target schema as DDL text ("a BIGINT, b STRING")
    WITHOUT the corrupt column — it is appended here."""
    opts = {"columnNameOfCorruptRecord": CORRUPT_COL, "mode": "PERMISSIVE"}
    opts.update(options or {})
    annotated = df.withColumn(
        parsed_col, F.from_csv(F.col(csv_col), _full_ddl(ddl), opts)
    )
    bad = F.col(parsed_col)[CORRUPT_COL].isNotNull()
    return CsvSplit(
        parsed=annotated.filter(~bad).withColumn(
            parsed_col, F.col(parsed_col).dropFields(CORRUPT_COL)
        ),
        corrupt=annotated.filter(bad).drop(parsed_col),
    )


def is_valid_csv(col: Column | str, ddl: str, options: dict | None = None) -> Column:
    """Boolean: the line parses against the schema."""
    c = F.col(col) if isinstance(col, str) else col
    opts = {"columnNameOfCorruptRecord": CORRUPT_COL, "mode": "PERMISSIVE"}
    opts.update(options or {})
    return F.from_csv(c, _full_ddl(ddl), opts)[CORRUPT_COL].isNull()
