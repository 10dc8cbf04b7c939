"""Custom stateful streaming operator: applyInPandasWithState.

The foreachBatch pipeline (inference.py) keeps its state in the feature
table — restart-safe, exactly-once with the table's atomic commits. This
module is the *executor-state* alternative for low-latency continuous
queries: per-key state lives in the Spark state store across micro-batches
(checkpointed), no table round-trip per batch.

Implements the reference's incremental average as a streaming-native
operator: for each key, fold arriving values in event-time order through
    state = value                 (first observation)
    state = (state + value) / 2   (every subsequent one — §2.13 Q4)
and emit the updated state each micro-batch (update output mode).

Within a micro-batch events are sorted by (ts, id); ACROSS batches the fold
order is arrival order — identical to the reference's behavior (events
re-delivered late apply late, §2.13 Q5). The multi-batch pytest asserts
bit-equality with the closed-form batch computation when arrival order
matches event order.

Scale: state is (double, long, timestamp) per key, hash-partitioned by the
grouping key — the standard Structured Streaming state-store shape that
scales with executors; watermark-based state TTL can be layered on via
GroupStateTimeout.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("inc_avg", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.LongType()),
        T.StructField("inc_avg_value", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _fold_group(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    if state.exists:
        avg, n = state.get
    else:
        avg, n = None, 0
    for pdf in pdfs:
        pdf = pdf.sort_values(["purchase_timestamp", "event_id"])
        for v in pdf["purchase_value"]:
            avg = float(v) if avg is None else (avg + float(v)) / 2.0
            n += 1
    state.update((avg, n))
    yield pd.DataFrame(
        {"customer_id": [key[0]], "inc_avg_value": [avg], "n_events": [n]}
    )


def stateful_incremental_avg(events: DataFrame) -> DataFrame:
    """events(event_id, customer_id, purchase_timestamp, purchase_value)
    [streaming] → per-key (old+new)/2 state, emitted on every update."""
    return events.groupBy("customer_id").applyInPandasWithState(
        _fold_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
