"""Low-latency point-read serving over a feature group's online view.

Reference parity: ``get_latest_features``
(/root/reference/core/feature_store_manager.py:184-204) answers a single-key
read in milliseconds from a managed online store; the reference outsources
that latency tier to AWS. ``FeatureGroup.get_latest`` is a stats-pruned
Spark job — correct, but hundreds of milliseconds of scheduling floor per
call. ``ServingSession`` closes the gap for request-path reads: ONE Spark
job snapshots the online view, then every lookup is a local dict probe
(microseconds, no job).

Scale design (100 TB): the snapshot is the ONLINE view — one row per key,
never history — so its size is key cardinality, not event volume. The same
pattern shards horizontally: a fleet of serving processes each hold one
hash shard of the view (``online_view().where(pmod(hash(key), N) == i)``);
this single-process form is the one-shard case. What does NOT scale is
snapshotting history or using this for analytical scans — those stay
Spark-side.

Staleness contract: reads are as-of the snapshot's commit version
(``version``), exactly like any online store replicating asynchronously
from a write-ahead log; ``refresh()`` re-snapshots after upserts and is a
no-op when the table version is unchanged.
"""

from __future__ import annotations

from typing import Any, Iterable

from feature_store_test_spark.store.feature_group import FeatureGroup


class ServingSession:
    """Request-path key lookups against a snapshot of the online view."""

    def __init__(
        self, feature_group: FeatureGroup, strict_event_time: bool = False
    ) -> None:
        self._fg = feature_group
        self._strict = strict_event_time
        self._records: dict[Any, dict] = {}
        self.version: int | None = None
        self.refresh()

    def refresh(self, force: bool = False) -> bool:
        """Re-snapshot the online view; True when a new snapshot was taken.

        Skips the Spark job when the table's commit version is unchanged
        (the snapshot is already current) unless ``force``.
        """
        current = self._fg.table.latest_version()
        if not force and self.version == current:
            return False
        key = self._fg.key_col
        rows = self._fg.online_view(strict_event_time=self._strict).collect()
        self._records = {r[key]: r.asDict() for r in rows}
        self.version = current
        return True

    def __len__(self) -> int:
        return len(self._records)

    def exists(self, key_value) -> bool:
        return key_value in self._records

    def get_record(self, key_value) -> dict | None:
        """Latest record for one key — no Spark job; dict semantics match
        ``FeatureGroup.get_latest`` as of the snapshot version."""
        rec = self._records.get(key_value)
        return dict(rec) if rec is not None else None

    def get_records(self, key_values: Iterable) -> dict[Any, dict | None]:
        """Batch form: key -> record (or None) for request-sized key sets."""
        return {k: self.get_record(k) for k in key_values}
