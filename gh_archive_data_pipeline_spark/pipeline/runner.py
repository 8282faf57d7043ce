"""Dependency-ordered pipeline runner — the reference's Airflow DAG shape
(get_file_path ≫ download ≫ silver ≫ cleanup ≫ gold,
/root/reference/pipeline/airflow/dags/load_data_task.py:245-258) without the
Airflow dependency: plain topological execution with per-task results in
place of XCom.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Any


@dataclass
class Task:
    name: str
    fn: Callable[..., Any]
    upstream: tuple[str, ...] = ()


@dataclass
class Pipeline:
    """Minimal DAG runner: add tasks with upstream names; ``run`` executes in
    topological order, passing each task the dict of upstream results."""

    tasks: dict[str, Task] = field(default_factory=dict)

    def add(self, name: str, fn: Callable[..., Any],
            upstream: tuple[str, ...] = ()) -> "Pipeline":
        if name in self.tasks:
            raise ValueError(f"duplicate task {name}")
        self.tasks[name] = Task(name, fn, upstream)
        return self

    def run(self, context: dict[str, Any] | None = None) -> dict[str, Any]:
        graph = {n: set(t.upstream) for n, t in self.tasks.items()}
        results: dict[str, Any] = dict(context or {})
        for name in TopologicalSorter(graph).static_order():
            if name not in self.tasks:
                # Upstream satisfied by the caller-supplied context (the XCom
                # analog); anything else is a wiring error — fail loudly.
                if name in results:
                    continue
                raise KeyError(
                    f"upstream {name!r} is neither a registered task nor a "
                    f"context key")
            task = self.tasks[name]
            results[name] = task.fn(**{u: results[u] for u in task.upstream
                                       if u in results})
        return results


def gh_archive_pipeline(spark, bronze_path: str, silver_path: str,
                        gold_path: str) -> Pipeline:
    """The reference pipeline as a Pipeline instance over local parquet."""
    from . import stages

    def silver_task():
        silver = stages.to_silver(stages.read_bronze(spark, bronze_path))
        stages.write_silver(silver, silver_path)
        return spark.read.parquet(silver_path)

    def gold_task(silver):
        gold = stages.build_gold(silver)
        for name, df in gold.items():
            df.write.mode("overwrite").parquet(f"{gold_path}/{name}")
        return {n: spark.read.parquet(f"{gold_path}/{n}") for n in gold}

    return (Pipeline()
            .add("silver", silver_task)
            .add("gold", gold_task, upstream=("silver",)))
