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
    BooleanType,
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


FIRST_SEEN_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("doc_id", LongType()),
        StructField("novel_for_key", BooleanType()),
    ]
)

_FS_STATE_SCHEMA = "seen LONG"


def first_seen(
    stream: DataFrame, key_col: str = "key", id_col: str = "doc_id"
) -> DataFrame:
    """Per-key first-arrival marking across micro-batches — the
    stateful half of incremental MinHash dedup: each incoming
    ``(key, id)`` row is emitted with ``novel_for_key`` = "no row with
    this key was seen before it". State is ONE long per key (the id
    that claimed the key), bounded by distinct keys; idle-key eviction
    can be layered on exactly as in :func:`running_totals`.

    Within a micro-batch rows are walked in ascending id order, so
    when batches also arrive in id order the output equals the batch
    formulation ``novel_for_key ⟺ id == min(id) OVER (PARTITION BY
    key)`` — the equivalence the ``stream_incremental_dedup``
    inventory entry's oracle checks and tests/test_streaming.py pins
    against a live two-batch readStream run.
    """

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.get[0] if state.exists else None
        ids: list[int] = []
        for pdf in batches:
            ids.extend(int(x) for x in pdf[id_col])
        ids.sort()
        flags = []
        for i in ids:
            flags.append(seen is None)
            seen = i if seen is None else min(seen, i)
        state.update((seen,))
        yield pd.DataFrame(
            {"key": [key[0]] * len(ids), "doc_id": ids, "novel_for_key": flags}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType=_FS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
