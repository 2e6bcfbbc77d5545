"""DAG engine contract tests (ported 1:1 from reference tests/test_dag.py)."""

import pytest

from healthcare_etl_pipeline_spark.plans.dag import DAG, TaskStatus


def test_linear_order_and_context_flow():
    calls = []

    dag = DAG("linear")
    dag.add_task("a", lambda ctx: calls.append("a") or {"x": 1})
    dag.add_task("b", lambda ctx: calls.append("b") or {"y": ctx["x"] + 1}, depends_on=["a"])
    dag.add_task("c", lambda ctx: calls.append("c") or {"z": ctx["y"] + 1}, depends_on=["b"])
    summary = dag.run()

    assert calls == ["a", "b", "c"]
    assert summary["status"] == "success"
    assert summary["context"]["z"] == 3
    assert all(t["status"] == "success" for t in summary["tasks"].values())
    assert all(t["duration_ms"] is not None for t in summary["tasks"].values())


def test_failure_skips_downstream():
    def boom(ctx):
        raise RuntimeError("kaput")

    dag = DAG("failing")
    dag.add_task("ok", lambda ctx: {"n": 1})
    dag.add_task("bad", boom, depends_on=["ok"])
    dag.add_task("after", lambda ctx: {"m": 2}, depends_on=["bad"])
    summary = dag.run()

    assert summary["status"] == "failed"
    assert summary["tasks"]["ok"]["status"] == "success"
    assert summary["tasks"]["bad"]["status"] == "failed"
    assert "RuntimeError" in summary["tasks"]["bad"]["error"]
    assert summary["tasks"]["after"]["status"] == "skipped"


def test_cycle_detection():
    dag = DAG("cyclic")
    dag.add_task("a", lambda ctx: None, depends_on=["b"])
    dag.add_task("b", lambda ctx: None, depends_on=["a"])
    with pytest.raises(ValueError, match="Cycle detected"):
        dag.run()


def test_unknown_dependency():
    dag = DAG("dangling")
    dag.add_task("a", lambda ctx: None, depends_on=["ghost"])
    with pytest.raises(ValueError, match="unknown task"):
        dag.run()


def test_duplicate_task_name():
    dag = DAG("dup")
    dag.add_task("a", lambda ctx: None)
    with pytest.raises(ValueError, match="already exists"):
        dag.add_task("a", lambda ctx: None)


def test_diamond_merges_both_branches():
    dag = DAG("diamond")
    dag.add_task("a", lambda ctx: {"base": 2})
    dag.add_task("b", lambda ctx: {"left": ctx["base"] * 3}, depends_on=["a"])
    dag.add_task("c", lambda ctx: {"right": ctx["base"] * 13}, depends_on=["a"])
    dag.add_task(
        "d", lambda ctx: {"total": ctx["left"] + ctx["right"]}, depends_on=["b", "c"]
    )
    summary = dag.run()
    assert summary["context"]["total"] == 32


def test_to_dict_roundtrip():
    dag = DAG("snap")
    dag.add_task("a", lambda ctx: None)
    dag.add_task("b", lambda ctx: None, depends_on=["a"])
    d = dag.to_dict()
    assert d == {"name": "snap", "tasks": {"a": {"depends_on": []}, "b": {"depends_on": ["a"]}}}


def test_status_enum_values():
    assert TaskStatus.SKIPPED.value == "skipped"
    assert TaskStatus.SUCCESS.value == "success"
