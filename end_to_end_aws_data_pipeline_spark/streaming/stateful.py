"""Arbitrary stateful streaming: applyInPandasWithState.

The reference's only state is a nested map in DynamoDB updated per file
(ref delta_load.py:204-265). The generalization here is a per-key
session tracker with explicit GroupState — the PySpark pattern for any
custom stateful operator (counters, CDC folds, online features).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, first_ts timestamp, last_ts timestamp"
)
# total tracked in integer cents: float accumulation order varies with
# batch arrival, but int sums are exact → state is replay- and
# engine-reproducible (same discipline as functions/aggs.py)
STATE_SCHEMA = "n_events long, total_cents long, first_ts long, last_ts long"


def _track_user_sessions(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold each micro-batch into per-user running session state and
    emit the updated aggregate (update-mode output)."""
    (user_id,) = key
    if state.exists:
        n, cents, first_us, last_us = state.get
    else:
        n, cents, first_us, last_us = 0, 0, None, None
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
        ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs
        lo, hi = int(ts_us.min()), int(ts_us.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    state.update((n, cents, first_us, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [cents / 100.0],
            "first_ts": [pd.Timestamp(first_us, unit="us")],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def user_session_tracker(events: DataFrame) -> DataFrame:
    """events(user_id, ts, value) → continuously-updated per-user
    aggregates with explicit GroupState (no timeout: state lives for
    the life of the query; production would use event-time timeout to
    expire idle users and bound state)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track_user_sessions,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
