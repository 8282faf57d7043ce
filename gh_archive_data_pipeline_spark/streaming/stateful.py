"""Arbitrary stateful streaming (SURVEY.md §2.11 T8):
applyInPandasWithState-backed operators for semantics the built-in stateful
ops can't express.

running_user_stats: per-key running count/sum/max maintained across
micro-batches with an idle-timeout that finalizes and evicts state — the
canonical custom-stateful shape (counters, anomaly baselines, rate limits).
State per key is a constant-size tuple, so total state is O(|active keys|),
bounded by the eviction timeout at any stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id bigint, n_events bigint, total_value double, "
                 "max_value double, finalized boolean")
STATE_SCHEMA = "n bigint, total double, mx double"


def _update_user_stats(key: tuple, batches: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, total, mx = state.get
        state.remove()
        yield pd.DataFrame([{
            "user_id": user_id, "n_events": n, "total_value": total,
            "max_value": mx, "finalized": True,
        }])
        return
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    state.setTimeoutDuration(30_000)  # idle 30 s → finalize + evict
    yield pd.DataFrame([{
        "user_id": user_id, "n_events": n, "total_value": total,
        "max_value": mx, "finalized": False,
    }])


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator over a stream of (user_id, value, ...)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
