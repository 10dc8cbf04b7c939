"""Streaming deduplication — exactly-once event ingestion.

At-least-once sources (Kafka redeliveries, file-source replays, the
reference's retry loop, core/inference.py:270-279) hand the pipeline the
same event more than once. Two native tools, both surfaced here:

* ``dedup_stream`` — ``dropDuplicatesWithinWatermark``: keeps the FIRST
  arrival of each key and drops re-deliveries that arrive within the
  watermark delay. State per key is evicted once the watermark passes it —
  bounded memory, the only safe form at 100 TB/day ingest. (Plain
  ``dropDuplicates`` on a stream never evicts — unbounded state — so it is
  deliberately NOT exposed for streams.)
* ``dedup_batch`` — the batch equivalent for backfills: exact
  ``dropDuplicates`` on the key columns, one hash shuffle.

The guarantee: duplicates separated by ≤ delay are always dropped;
duplicates separated by more than the delay MAY re-emit (state already
evicted) — the standard exactly-once-within-watermark contract. Downstream
sinks that MERGE by key (store/feature_group.py upsert) absorb those.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Watermarked streaming dedup: first arrival per key wins; state for a
    key is dropped once the event-time watermark moves ``delay`` past it."""
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def dedup_batch(events: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Batch/backfill dedup on the same keys (exact, one shuffle)."""
    return events.dropDuplicates(list(key_cols))
