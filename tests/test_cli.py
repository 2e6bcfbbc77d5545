"""CLI front-end tests (in-process main(), reusing the session fixture)."""

import json

from healthcare_etl_pipeline_spark.__main__ import main


def test_cli_list_and_run(spark, capsys):
    assert main(["list", "--tag", "tpch"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out

    assert main(["run", "q1_pricing_summary", "--sf-dir", "/root/testdata/sf0.001", "-n", "3"]) == 0
    assert "sum_qty" in capsys.readouterr().out


def test_cli_unknown_query(spark, capsys):
    assert main(["run", "no_such_query"]) == 2


def test_cli_ingest(spark, tmp_path, capsys):
    batch = tmp_path / "batch.jsonl"
    batch.write_text(
        json.dumps(
            {
                "resourceType": "Patient",
                "mrn": "CLI-9",
                "name": "Cli User",
                "birthDate": "1990-01-01",
                "gender": "other",
                "ssn": None,
                "consent": {"data_sharing": True},
            }
        )
    )
    rc = main(["ingest", str(batch), "--warehouse", str(tmp_path / "wh")])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["status"] == "success"
    assert out["record_counts"]["load_count"] == 1
