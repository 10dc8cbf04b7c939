"""Adversarial round (r7) on the stateful streaming family.

Targets the three crash/corruption classes the batch adversarial program
found analogues of (VERDICT r6 item 5):
- cross-micro-batch event-time SKEW: a later batch delivers events
  event-time-EARLIER than the open session (legal under a lax watermark);
  the pre-r7 fold dragged ``end`` backward, corrupting the interval to
  end < start;
- watermark-BOUNDARY ties: an event at exactly watermark == end + gap is
  not late (Spark drops only ts < watermark) and sits exactly gap from
  the session end, so it must still join;
- state-store RESTORE with schema-width drift: restarting from a
  checkpoint with a wider state struct must fail loudly, never silently
  reinterpret persisted state bytes.
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

EV_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _t(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, 0, 0) + dt.timedelta(
        minutes=minute, seconds=second
    )


def _write_batches(spark, src: str, batches: list[list[tuple]]) -> None:
    """One parquet file per micro-batch; the file source orders batches by
    modification time, so sleep past mtime granularity between writes."""
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        if i:
            time.sleep(1.1)
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
            f"{src}/b{i}"
        )


def _run_sessions(
    spark, tmp_path, batches, gap="30 minutes", delay="2 hours", max_open=1
):
    from feature_store_test_spark.streaming.stateful import stateful_sessions

    src = str(tmp_path / "src")
    _write_batches(spark, src, batches)
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .withWatermark("ts", delay)
    )
    out = str(tmp_path / "out")
    q = (
        stateful_sessions(stream, gap=gap, max_open_intervals=max_open)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out).collect()
    )


def test_cross_batch_skew_extends_session_backward(spark, tmp_path):
    """Batch 2 delivers an event 10 min BEFORE the open session's start
    (within gap, admitted by a 2h watermark delay). It must extend the
    interval backward — the pre-r7 fold instead set end := that earlier
    ts, emitting a session with end < start."""
    batches = [
        [(1, _t(10)), (1, _t(15))],   # open session [10:10, 10:15]
        [(1, _t(0))],                 # skewed: 10:00, within 30m of start
        [(1, _t(120))],               # 12:00 — closes the merged session
    ]
    got = _run_sessions(spark, tmp_path, batches)
    assert (1, _t(0), _t(15), 3) in got
    for _, s, e, _n in got:
        assert s <= e  # no corrupted interval, ever


def test_cross_batch_deep_skew_eager_close_is_deterministic(spark, tmp_path):
    """An event arriving > gap EARLIER than the open session cannot merge;
    the single-open-session contract emits it immediately as its own
    closed session (the documented bounded-state trade)."""
    batches = [
        [(1, _t(100)), (1, _t(101))],  # open session [11:40, 11:41]
        [(1, _t(0))],                  # 10:00 — 100 min before: disjoint
        [(1, _t(300))],                # closes the open session
    ]
    got = _run_sessions(spark, tmp_path, batches)
    assert (1, _t(0), _t(0), 1) in got
    assert (1, _t(100), _t(101), 2) in got


def _batch_sessionize(events, gap_min=30):
    """Reference batch sessionization: global per-user interval merge."""
    out = []
    by_user: dict = {}
    for u, ts in events:
        by_user.setdefault(u, []).append(ts)
    for u, tss in sorted(by_user.items()):
        tss.sort()
        s = e = tss[0]
        n = 1
        for ts in tss[1:]:
            if (ts - e).total_seconds() <= gap_min * 60:
                e, n = ts, n + 1
            else:
                out.append((u, s, e, n))
                s, e, n = ts, ts, 1
        out.append((u, s, e, n))
    return sorted(out)


def test_multi_interval_state_bit_parity_with_batch_under_deep_skew(
    spark, tmp_path
):
    """r7 verdict item 6: with max_open_intervals=2 the deep-skew fixture
    that the single-interval state splits (an event landing > gap BEFORE
    the open session, then a second event merging with it) produces
    EXACTLY the batch sessionization of the closed prefix — the early
    region [10:00, 10:20] survives as open state until its own watermark
    close instead of being emitted at first sight."""
    batches = [
        [(1, _t(100)), (1, _t(101))],  # open session [11:40, 11:41]
        [(1, _t(0))],                  # deep skew: 100 min earlier
        [(1, _t(20))],                 # merges with 10:00 under K=2
        [(1, _t(300))],                # wm -> 10:00+180-120 = t(180)
        [(1, _t(600))],                # wm -> t(480): closes [300]
    ]
    got = _run_sessions(spark, tmp_path, batches, max_open=2)
    events = [ev for b in batches for ev in b]
    expected = _batch_sessionize(events)
    # every emitted session must be a batch session (bit parity on the
    # closed prefix; the final interval [600, 600] may stay open at
    # availableNow termination)
    assert set(got) <= set(expected)
    # and the two sessions the K=1 trade would have mangled are closed:
    assert (1, _t(0), _t(20), 2) in got     # K=1 emits (0,0,1)+(20,20,1)
    assert (1, _t(100), _t(101), 2) in got
    assert (1, _t(0), _t(0), 1) not in got


def test_multi_interval_k1_matches_single_interval_contract(spark, tmp_path):
    """K=1 keeps the original single-interval fold (and state schema):
    the deep-skew fixture reproduces the documented eager-close split."""
    batches = [
        [(1, _t(100)), (1, _t(101))],
        [(1, _t(0))],
        [(1, _t(300))],
    ]
    got = _run_sessions(spark, tmp_path, batches, max_open=1)
    assert (1, _t(0), _t(0), 1) in got
    assert (1, _t(100), _t(101), 2) in got


def test_watermark_boundary_tie_joins_session(spark, tmp_path):
    """gap = 30m, watermark delay 0. After batch 1 the watermark is 10:30
    (user 2's event); user 1's open session ends 10:00, so close_at ==
    10:30 == watermark. The 10:30 event for user 1 in batch 2 is NOT late
    and sits exactly gap from end — it must join, yielding ONE session
    [10:00, 10:30] with 2 events, never a spurious second session."""
    batches = [
        [(1, _t(0)), (2, _t(30))],
        [(1, _t(30)), (2, _t(31))],
        [(1, _t(120)), (2, _t(120))],  # close both users' sessions
    ]
    got = _run_sessions(spark, tmp_path, batches, delay="0 seconds")
    u1 = [t for t in got if t[0] == 1 and t[1] <= _t(30)]
    assert u1 == [(1, _t(0), _t(30), 2)]


def test_state_restore_schema_drift_fails_loudly(spark, tmp_path):
    """Restarting from a checkpoint with a WIDER state struct (a field
    added) must raise, not silently reinterpret persisted state rows."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from feature_store_test_spark.streaming import stateful as S

    purchases = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("customer_id", T.LongType()),
            T.StructField("purchase_timestamp", T.TimestampType()),
            T.StructField("purchase_value", T.DoubleType()),
        ]
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, 7, _t(0), 10.0), (2, 7, _t(1), 20.0)], purchases
    ).coalesce(1).write.parquet(src + "/b0")
    ckpt = str(tmp_path / "ckpt")

    def run(fold, state_schema):
        stream = spark.readStream.schema(purchases).parquet(src + "/*")
        q = (
            stream.groupBy("customer_id")
            .applyInPandasWithState(
                fold,
                outputStructType=S.OUTPUT_SCHEMA,
                stateStructType=state_schema,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run(S._fold_group, S.STATE_SCHEMA)  # seeds checkpointed state

    wide = T.StructType(
        [
            T.StructField("inc_avg", T.DoubleType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("drifted", T.DoubleType()),
        ]
    )

    def wide_fold(key, pdfs, state):
        avg, n, _d = state.get if state.exists else (None, 0, 0.0)
        for pdf in pdfs:
            for v in pdf["purchase_value"]:
                avg = float(v) if avg is None else (avg + float(v)) / 2.0
                n += 1
        state.update((avg, n, 0.0))
        yield pd.DataFrame(
            {"customer_id": [key[0]], "inc_avg_value": [avg], "n_events": [n]}
        )

    spark.createDataFrame(
        [(3, 7, _t(2), 30.0)], purchases
    ).coalesce(1).write.parquet(src + "/b1")
    with pytest.raises(Exception) as exc:
        run(wide_fold, wide)
    assert "state" in str(exc.value).lower() or "schema" in str(exc.value).lower()


def test_neardedup_duplicate_ids_in_batch_raise(spark, tmp_path):
    from feature_store_test_spark.streaming.neardedup import NearDupIngest

    ing = NearDupIngest(spark, str(tmp_path / "nd"))
    batch = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (1, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="duplicate ids"):
        ing.process_batch(batch)


def test_multi_interval_state_survives_restart(spark, tmp_path):
    """The K>1 array-backed session state restores from a checkpoint: a
    second availableNow run on the same checkpoint continues the held
    intervals (merging a mid-gap event into the restored early interval)
    instead of restarting them."""
    from feature_store_test_spark.streaming.stateful import stateful_sessions

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run(batches, start_index):
        os.makedirs(src, exist_ok=True)
        for i, rows in enumerate(batches):
            time.sleep(1.1)
            spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
                f"{src}/b{start_index + i}"
            )
        stream = (
            spark.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
            .withWatermark("ts", "2 hours")
        )
        q = (
            stateful_sessions(stream, gap="30 minutes", max_open_intervals=2)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # run 1 leaves TWO open intervals in state: [11:40,11:41] and [10:00]
    run([[(1, _t(100)), (1, _t(101))], [(1, _t(0))]], 0)
    # run 2 (fresh query, same checkpoint) merges 10:20 into the RESTORED
    # [10:00] interval, then closes both as the watermark advances
    run([[(1, _t(20))], [(1, _t(300))], [(1, _t(600))]], 2)
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out).collect()
    )
    assert (1, _t(0), _t(20), 2) in got     # restored interval grew
    assert (1, _t(100), _t(101), 2) in got  # restored interval closed intact
    assert (1, _t(0), _t(0), 1) not in got
