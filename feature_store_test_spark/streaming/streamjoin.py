"""Stream-stream joins with bounded state — attribution at ingest time.

The reference joins each live event against a *static* store snapshot
(core/inference.py:89-126, the J1 lookup join). The capability it cannot
express — correlating two LIVE streams, e.g. "purchase within 1 hour of a
click" — is native in Structured Streaming, provided both inputs carry
watermarks and the join predicate bounds event-time distance. Those two
conditions are what let Spark EVICT join state: a left row older than
``watermark - upper`` can never match a future right row, so its state is
dropped. Without the time bound the state grows without limit — at 100
TB/day that is the difference between a runnable job and an OOM, which is
why this module refuses to build an unbounded stream-stream join.

``interval_join_streams`` works on batch DataFrames too (same predicate,
no watermark needed) — tests verify stream output == batch output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join right-stream rows to left-stream rows with the same ``key``
    where ``left_ts <= right_ts <= left_ts + upper``.

    Both sides are watermarked by ``watermark`` (how late data may arrive);
    the ``upper`` bound is the attribution window. State per side is
    bounded by ``watermark + upper`` of event time. ``how`` may be
    ``inner`` or ``leftOuter`` (outer emits unmatched left rows only after
    the watermark proves no match can arrive).

    Column naming: every non-key column of ``right`` must be distinct from
    ``left``'s — callers rename (``r_ts`` etc.) before joining, keeping the
    output schema explicit rather than positional.
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    joined = lw.join(rw, cond, how)
    # Drop the duplicate right-side key column; keep left's.
    return joined.drop(rw[key])
