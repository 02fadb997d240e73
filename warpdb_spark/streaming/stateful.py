"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.9 superset row: "stateful ops").

The reference has no state at all — its streaming is a stateless
chunked map (src/warpdb.cpp:544-590). These operators carry per-key
state across micro-batches with bounded memory (timeout-based
eviction), the Spark-idiomatic form of a custom streaming aggregator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("total", DoubleType()),
    ]
)

_STATE_SCHEMA = "n LONG, total DOUBLE"


def running_totals(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum) maintained across micro-batches.

    State is two numbers per key; with ``timeout_ms`` idle keys are
    evicted (processing-time timeout), keeping state bounded on
    unbounded key domains.
    """

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total": [total]})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
