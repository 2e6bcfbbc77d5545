"""Dump `.explain("formatted")` for named registered queries to files.

Used to commit the before/after physical plans that back optimization
claims (plans/rNN/<query>_{before,after}.txt). Run it from any checkout
(the round-8 tree for "before", HEAD for "after"):

    python tools/dump_plans.py <sf_dir> <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt with the formatted physical plan of
the DataFrame the query function returns (plans only — nothing is executed).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_etl_pipeline_spark.queries import all_queries
from healthcare_etl_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark()
    specs = all_queries()
    for name in names:
        if name not in specs:
            print(f"skip  {name}: not registered in this tree")
            continue
        try:
            df = specs[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - record the failure in the file
            text = f"PLAN DUMP FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
