"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in windowed aggregations can't express, Spark's
escape hatch is arbitrary per-key state + Arrow-batched pandas. State
here is O(distinct keys), shipped per batch as pandas — the 100 TB
posture is: keep per-key state tiny (a few scalars), never accumulate
raw events in state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output schema of running_user_totals (one row per user per batch).
TOTALS_SCHEMA = "user_id long, n_events long, total_value_cents long, last_ts timestamp"
_STATE_SCHEMA = "n long, cents long, last bigint"


def _totals_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's events for one user into running totals.

    Money is accumulated in integer cents — deterministic regardless of
    batch boundaries or arrival order (IEEE754 double addition is not).
    """
    n, cents, last = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().sum())
        ts_ns = pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64")
        last = max(last, int(ts_ns.max()))
    state.update((n, cents, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value_cents": [cents],
            "last_ts": [pd.Timestamp(last, unit="ns")],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, exact-cents total, last event time),
    emitted each micro-batch in update mode — the classic "live counters"
    stateful op. Input needs ``user_id``, ``value``, ``ts`` columns.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _totals_fn,
        outputStructType=TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
