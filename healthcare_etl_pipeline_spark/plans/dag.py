"""Stage runner: the reference DAG engine's observable contract on Spark.

Re-expresses reference app/etl/dag.py (the one piece of genuine engine code
in the reference — 164 LoC):
- named tasks with dependencies, duplicate-name rejection (dag.py:63-74)
- Kahn topological sort with unknown-dependency and cycle detection
  (dag.py:76-101)
- sequential execution with per-task status lifecycle
  PENDING→RUNNING→SUCCESS/FAILED (dag.py:25-30, :132-140), wall-clock
  duration_ms (:134,:143), exception capture without rethrow (:138-141),
  context merge of upstream results (:127-129)
- skip-on-upstream-failure → SKIPPED (dag.py:117-125); overall status
  "failed" unless all SUCCESS (:151-152)
- serializable definition ``to_dict()`` (dag.py:156-164)

Design stance (SURVEY.md §0): Spark's lazy transformation graph IS the
dataflow DAG — this runner does NOT schedule DataFrame work itself. Tasks
are driver-side callables that *declare* transformations and trigger actions
(writes, counts); the runner contributes the observable contract: ordering,
status, timing, error capture, skip semantics, and a JSON snapshot stored in
``pipeline_runs.dag_definition``.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from enum import Enum
from typing import Any


class TaskStatus(str, Enum):
    PENDING = "pending"
    RUNNING = "running"
    SUCCESS = "success"
    FAILED = "failed"
    SKIPPED = "skipped"


@dataclass
class TaskNode:
    name: str
    fn: Callable[[dict[str, Any]], dict[str, Any] | None]
    depends_on: list[str] = field(default_factory=list)
    status: TaskStatus = TaskStatus.PENDING
    duration_ms: float | None = None
    error: str | None = None
    result: dict[str, Any] | None = None


class DAG:
    """Named-stage pipeline with the reference engine's execution contract."""

    def __init__(self, name: str):
        self.name = name
        self.tasks: dict[str, TaskNode] = {}

    def add_task(
        self,
        name: str,
        fn: Callable[[dict[str, Any]], dict[str, Any] | None],
        depends_on: list[str] | None = None,
    ) -> "DAG":
        if name in self.tasks:
            raise ValueError(f"Task '{name}' already exists")
        self.tasks[name] = TaskNode(name=name, fn=fn, depends_on=list(depends_on or []))
        return self

    def topological_order(self) -> list[str]:
        """Kahn's algorithm; raises on unknown deps and cycles."""
        for task in self.tasks.values():
            for dep in task.depends_on:
                if dep not in self.tasks:
                    raise ValueError(
                        f"Task '{task.name}' depends on unknown task '{dep}'"
                    )
        in_degree = {name: len(t.depends_on) for name, t in self.tasks.items()}
        dependents: dict[str, list[str]] = {name: [] for name in self.tasks}
        for name, task in self.tasks.items():
            for dep in task.depends_on:
                dependents[dep].append(name)
        ready = sorted(n for n, d in in_degree.items() if d == 0)
        order: list[str] = []
        while ready:
            name = ready.pop(0)
            order.append(name)
            for child in dependents[name]:
                in_degree[child] -= 1
                if in_degree[child] == 0:
                    ready.append(child)
        if len(order) != len(self.tasks):
            raise ValueError("Cycle detected in DAG")
        return order

    def run(self, initial_context: dict[str, Any] | None = None) -> dict[str, Any]:
        """Execute in topo order; returns the run summary dict."""
        from datetime import datetime, timezone

        run_started = datetime.now(timezone.utc)
        context: dict[str, Any] = dict(initial_context or {})
        order = self.topological_order()
        for name in order:
            task = self.tasks[name]
            failed_deps = [
                d for d in task.depends_on
                if self.tasks[d].status in (TaskStatus.FAILED, TaskStatus.SKIPPED)
            ]
            if failed_deps:
                task.status = TaskStatus.SKIPPED
                continue
            task.status = TaskStatus.RUNNING
            started = time.perf_counter()
            try:
                result = task.fn(context)
                task.result = result if isinstance(result, dict) else None
                if task.result:
                    context.update(task.result)
                task.status = TaskStatus.SUCCESS
            except Exception as exc:  # capture, don't rethrow (dag.py:138-141)
                task.status = TaskStatus.FAILED
                task.error = f"{type(exc).__name__}: {exc}"
            finally:
                task.duration_ms = (time.perf_counter() - started) * 1000.0

        all_success = all(t.status == TaskStatus.SUCCESS for t in self.tasks.values())
        return {
            "pipeline": self.name,
            "status": "success" if all_success else "failed",
            # actual wall-clock run boundaries (reference routes.py:140-141
            # records real start/end, not a single write-time stamp)
            "started_at": run_started,
            "completed_at": datetime.now(timezone.utc),
            "context": context,
            "tasks": {
                n: {
                    "status": t.status.value,
                    "duration_ms": t.duration_ms,
                    "error": t.error,
                }
                for n, t in self.tasks.items()
            },
        }

    def to_dict(self) -> dict[str, Any]:
        """Serializable definition (reference dag.py:156-164)."""
        return {
            "name": self.name,
            "tasks": {
                name: {"depends_on": list(task.depends_on)}
                for name, task in self.tasks.items()
            },
        }
