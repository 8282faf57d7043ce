"""Streaming-query supervision: restart-on-failure with bounded retries —
the engine-side half of the reference's monitoring/alerting plane
(/root/reference/monitoring/prometheus/config/alert-rules.yml fires alerts;
something still has to RESTART the job). Spark streaming queries die on
task-irrecoverable errors (source file vanished, state-store corruption,
OOM); a production pipeline wraps them in exactly this loop: rebuild the
query from its factory, resume from the checkpoint, give up after
``max_restarts`` and surface the terminal error.

The factory-based design matters: a StreamingQuery object is not
restartable — the DataFrame lineage must be rebuilt so the new run binds
fresh source offsets from the checkpoint. Checkpoint continuity is what
makes the restart exactly-once (same contract as
streaming/pipeline.start_parquet_sink's rerun test).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQuery


@dataclass
class SupervisedRun:
    """Outcome of one supervised lifecycle."""

    succeeded: bool
    restarts: int
    errors: list[str] = field(default_factory=list)


def run_supervised(query_factory: Callable[[], StreamingQuery],
                   max_restarts: int = 3,
                   backoff_sec: float = 0.5,
                   timeout_sec: float = 120.0) -> SupervisedRun:
    """Run a (typically availableNow) streaming query to completion,
    rebuilding + restarting it on failure up to ``max_restarts`` times.

    ``query_factory`` must create a FRESH query against the SAME
    checkpoint each call. Returns the outcome instead of raising so the
    caller (scheduler/DAG task) decides the escalation policy; the last
    error is always preserved in ``errors``.
    """
    errors: list[str] = []
    for attempt in range(max_restarts + 1):
        try:
            q = query_factory()
        except Exception as e:  # noqa: BLE001 — factory itself failed
            errors.append(f"factory: {str(e)[:300]}")
            time.sleep(backoff_sec * (attempt + 1))
            continue
        try:
            if not q.awaitTermination(timeout_sec):
                q.stop()
                errors.append(f"attempt {attempt}: timeout after {timeout_sec}s")
                continue
            return SupervisedRun(True, attempt, errors)
        except Exception as e:  # noqa: BLE001 — query failed mid-run
            errors.append(f"attempt {attempt}: {str(e)[:300]}")
            time.sleep(backoff_sec * (attempt + 1))
    return SupervisedRun(False, max_restarts, errors)
