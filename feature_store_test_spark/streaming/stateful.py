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


# ---------------------------------------------------------------------------
# Timeout-closed sessions: state expiry via GroupStateTimeout.EventTimeTimeout
# ---------------------------------------------------------------------------

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.TimestampType()),
        T.StructField("end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _session_fold(gap_ms: int):
    def fold(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        import datetime as _dt

        # timeout fired with no new data: the open session is complete —
        # emit it and drop the state (bounded memory is the whole point)
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [start],
                    "session_end": [end],
                    "n_events": [n],
                }
            )
            return

        # Interval-merge sessionization (adversarial round 7 rewrite).
        # Events may arrive ACROSS micro-batches out of event-time order
        # (cross-batch skew): an event earlier than the open session's
        # start must extend the interval BACKWARD, never drag `end`
        # backward (the pre-r7 fold did exactly that, corrupting the
        # interval to end < start). Uniform treatment: every event is a
        # width-0 interval, the open state is an interval, sweep-merge
        # all of them where next.start <= cur.end + gap.
        gap = _dt.timedelta(milliseconds=gap_ms)
        ivals = [
            (ts.to_pydatetime(), ts.to_pydatetime(), 1)
            for pdf in pdfs
            for ts in pdf["ts"]
        ]
        if state.exists:
            s0, e0, n0 = state.get
            ivals.append((s0, e0, int(n0)))
        ivals.sort(key=lambda t: (t[0], t[1]))
        merged: list[list] = []
        for s, e, n in ivals:
            if merged and s <= merged[-1][1] + gap:
                merged[-1][1] = max(merged[-1][1], e)
                merged[-1][2] += n
            else:
                merged.append([s, e, n])

        out = {
            "user_id": [],
            "session_start": [],
            "session_end": [],
            "n_events": [],
        }
        # Single-open-session state bound (documented): only the interval
        # with the latest end can still grow under ordinary late arrival;
        # any earlier disjoint interval is emitted NOW. Under deep skew
        # (an event > gap older than the open session, arriving while the
        # watermark still admits even-older events) this eager close can
        # split what a batch sessionizer would merge — the bounded-state
        # trade, pinned by test_streaming_adversarial.py.
        for s, e, n in merged[:-1]:
            out["user_id"].append(key[0])
            out["session_start"].append(s)
            out["session_end"].append(e)
            out["n_events"].append(n)
        start, end, n = merged[-1]

        # The fold receives NAIVE wall times in the session timezone (the
        # engine pins it to UTC — __spark_entry__/_ensure_session_confs),
        # while the watermark is epoch ms. A bare .timestamp() on a naive
        # datetime interprets it in the OS timezone, skewing close_at by
        # the host's UTC offset on any non-UTC box (code-review r7):
        # convert explicitly as UTC.
        close_at = (
            int(end.replace(tzinfo=_dt.timezone.utc).timestamp() * 1000) + gap_ms
        )
        wm = state.getCurrentWatermarkMs()
        if close_at < wm:
            # STRICTLY below: an event at ts == close_at == watermark is
            # not late (Spark drops only ts < watermark) and sits exactly
            # gap from end, so it would still join — the pre-r7 `<=` close
            # split that tie event into a spurious second session.
            out["user_id"].append(key[0])
            out["session_start"].append(start)
            out["session_end"].append(end)
            out["n_events"].append(n)
            state.remove()
        else:
            state.update((start, end, n))
            # wake up once event time passes end + gap: if nothing else
            # arrives for this key, the session closes on that timeout.
            # close_at + 1, not close_at: whichever equality convention
            # Spark's timeout firing uses, the timeout must only fire
            # once wm > close_at (an event at ts == close_at == wm is
            # still admissible and still joins); and a timeout may not
            # sit at/below the watermark — hence the wm + 1 clamp.
            state.setTimeoutTimestamp(max(close_at + 1, wm + 1))
        yield pd.DataFrame(out)

    return fold


# K-open-interval state (round 8, r7 verdict item 6): the single-interval
# sessionizer emits every non-latest merged interval IMMEDIATELY — bounded
# state, but under heavy cross-batch skew a key whose events alternate
# between two far-apart time regions emits sessions a batch sessionizer
# would have merged. The multi-interval state holds up to K disjoint open
# intervals (K small and fixed — still bounded state), closing each only
# when the WATERMARK passes its end + gap; only past-K overflow is emitted
# eagerly (earliest interval first). With K large enough for the skew
# depth, streaming output is bit-identical to batch sessionization
# (test-pinned under the deep-skew fixture).
MULTI_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.TimestampType())),
        T.StructField("ends", T.ArrayType(T.TimestampType())),
        T.StructField("ns", T.ArrayType(T.LongType())),
    ]
)


def _session_fold_multi(gap_ms: int, max_open: int):
    def fold(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        import datetime as _dt

        gap = _dt.timedelta(milliseconds=gap_ms)

        def _py(ts):
            return ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts

        def _close_at(end) -> int:
            # same UTC-explicit epoch conversion as the single-interval
            # fold (code-review r7: naive .timestamp() skews by the OS tz)
            return (
                int(end.replace(tzinfo=_dt.timezone.utc).timestamp() * 1000)
                + gap_ms
            )

        ivals: list[tuple] = []
        if state.exists:
            starts, ends, ns = state.get
            ivals += [
                (_py(s), _py(e), int(n)) for s, e, n in zip(starts, ends, ns)
            ]
        if not state.hasTimedOut:
            ivals += [
                (_py(ts), _py(ts), 1) for pdf in pdfs for ts in pdf["ts"]
            ]
        ivals.sort(key=lambda t: (t[0], t[1]))
        merged: list[list] = []
        for s, e, n in ivals:
            if merged and s <= merged[-1][1] + gap:
                merged[-1][1] = max(merged[-1][1], e)
                merged[-1][2] += n
            else:
                merged.append([s, e, n])

        wm = state.getCurrentWatermarkMs()
        closed: list[list] = []
        keep: list[list] = []
        for iv in merged:
            # STRICTLY below the watermark, same tie rule as the single
            # fold: an event at ts == close_at == wm is not late and
            # still joins
            (closed if _close_at(iv[1]) < wm else keep).append(iv)
        # bounded state: only past-K overflow closes eagerly; merged (and
        # hence keep) is sorted by start and the intervals are > gap
        # apart, so the FRONT of the list is the earliest-ending one —
        # the interval least likely to see further admissible events
        while len(keep) > max_open:
            closed.append(keep.pop(0))

        out = {
            "user_id": [key[0]] * len(closed),
            "session_start": [s for s, _, _ in closed],
            "session_end": [e for _, e, _ in closed],
            "n_events": [n for _, _, n in closed],
        }
        if keep:
            state.update(
                (
                    [s for s, _, _ in keep],
                    [e for _, e, _ in keep],
                    [n for _, _, n in keep],
                )
            )
            # wake when the EARLIEST-closing kept interval passes its
            # close_at (same +1 / wm+1 conventions as the single fold)
            min_close = min(_close_at(e) for _, e, _ in keep)
            state.setTimeoutTimestamp(max(min_close + 1, wm + 1))
        else:
            state.remove()
        yield pd.DataFrame(out)

    return fold


def stateful_sessions(
    events: DataFrame, gap: str = "30 minutes", max_open_intervals: int = 1
) -> DataFrame:
    """events(user_id, ts, ...) [streaming, watermarked on ts] → closed
    sessions (start, end, n_events) per user, gap-separated.

    Unlike ``F.session_window`` (which Spark manages wholly), this is the
    CUSTOM-state template: sessions close either when a later event
    arrives past the gap (emitted inline) or when the event-time watermark
    passes end + gap with no new data (``state.hasTimedOut`` — the state
    expiry path that keeps per-key memory bounded at 100 TB/day). Append
    mode: each session emits exactly once, when it closes.

    ``max_open_intervals``: 1 (default) keeps the original single-interval
    state and its documented eager-close trade under deep cross-batch
    skew; K > 1 holds up to K disjoint open intervals per key (array
    state, still bounded) and closes sessions only at the watermark or on
    past-K overflow — bit-parity with batch sessionization whenever K
    covers the skew depth. The two paths use DIFFERENT state schemas; a
    checkpoint written by one cannot restore into the other (it fails
    loudly — the pinned schema-drift behavior).
    """
    unit = {"minutes": 60_000, "minute": 60_000, "seconds": 1_000, "second": 1_000}
    qty, u = gap.split()
    gap_ms = int(qty) * unit[u]
    if max_open_intervals <= 1:
        return events.groupBy("user_id").applyInPandasWithState(
            _session_fold(gap_ms),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fold_multi(gap_ms, max_open_intervals),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=MULTI_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming decayed counter: the stateful twin of q145_decayed_spend.
# ---------------------------------------------------------------------------

DECAY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("scaled_sum", T.LongType()),
        T.StructField("n_in_window", T.LongType()),
    ]
)

DECAY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_in_window", T.LongType()),
        T.StructField("decayed_spend", T.DoubleType()),
    ]
)


def _decay_fold(divisor: float):
    def fold(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        scaled, n = state.get if state.exists else (0, 0)
        scaled, n = int(scaled), int(n)
        for pdf in pdfs:
            # the scaled term is an exact integer — addition commutes, so
            # arrival order across micro-batches cannot change the state
            scaled += int(pdf["scaled_term"].sum())
            n += len(pdf)
        state.update((scaled, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_in_window": [n],
                "decayed_spend": [scaled / divisor],
            }
        )

    return fold


def stateful_decayed_spend(events: DataFrame, anchor: str, window_days: int = 30) -> DataFrame:
    """events(user_id, ts, value) [streaming] → per-user exponentially
    time-decayed spend (half-life 1 day), exact and ORDER-FREE.

    The q145 power-of-two trick carries over: each event contributes the
    integer ``ticks(value) << (W − age_days)``, computed as a COLUMN
    before the stateful fold, so the executor state is one integer sum —
    and because integer addition commutes, the converged state is
    bit-identical to the batch query no matter how events split across
    micro-batches (the multi-batch parity test asserts exact equality,
    not approx). Events outside [0, W] days are dropped by the same
    declared window. State bound: one long per key holds while
    n_key · max_ticks · 2^W < 2^63 (~8.5e3 events/key at $10k values and
    W=30); past that, split hi/lo like functions.dec_sum — same state
    shape, two longs.
    """
    from pyspark.sql import functions as F

    from feature_store_test_spark.functions import dec_ticks

    w = window_days
    aged = events.select(
        "user_id",
        dec_ticks(F.col("value"), 2).alias("__ticks"),
        F.datediff(F.lit(anchor).cast("date"), F.col("ts").cast("date")).alias("__k"),
    ).where(F.col("__k").between(0, w))
    scaled = aged.select(
        "user_id",
        F.expr(f"__ticks * shiftleft(CAST(1 AS BIGINT), {w} - __k)").alias(
            "scaled_term"
        ),
    )
    return scaled.groupBy("user_id").applyInPandasWithState(
        _decay_fold(float((1 << w) * 100)),
        outputStructType=DECAY_OUTPUT_SCHEMA,
        stateStructType=DECAY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
