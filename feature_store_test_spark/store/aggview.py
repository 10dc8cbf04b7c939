"""Incrementally-maintained aggregate view over a versioned table.

The 100 TB problem this solves: a per-key aggregate (counts, sums, min/max —
the backbone of feature engineering, SURVEY.md §2.4 A1-A4) recomputed from
scratch rescans the whole fact table on every ingest. Because the table is
append-only with a change data feed (``VersionedParquetTable.changes``),
every distributive aggregate can instead be *maintained*: read only the
commits since the last refresh — O(new data) IO — partially aggregate them,
and merge into the materialized per-key state, which is orders of magnitude
smaller than the history it summarizes. This is classic incremental view
maintenance restricted to self-decomposable aggregates (count/sum/min/max;
avg = sum/count at read time), the same contract Spark's own partial
aggregation relies on — the merge step IS a partial-agg merge.

The reference has no analog (it rereads its offline store per training run,
/root/reference/core/feature_store_manager.py:121-153); production systems
express this as Delta CDF + MERGE or a streaming agg with state. Here the
state is a snapshot parquet dir published via the same atomic-rename commit
pattern as the table log, so readers see either the old or the new state,
never a half-written one.

Exactness: sums go through ``decimal(18,6)`` integer arithmetic so the
incremental fold is bit-identical to a one-shot recompute regardless of how
many refreshes the history was split across (see functions.dec_sum — the
same discipline the oracle gate enforces).
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_store_test_spark.store.table import VersionedParquetTable

_META = "aggview_meta.json"


class IncrementalAggView:
    """Materialized per-key (count, sum, min, max) over ``table``'s rows.

    ``measure_cols`` are numeric columns; the state carries, per key,
    ``n_rows`` plus ``{c}_sum`` / ``{c}_min`` / ``{c}_max`` for each.
    ``refresh()`` folds in only the commits made since the last refresh.
    """

    def __init__(
        self,
        spark: SparkSession,
        table: VersionedParquetTable,
        path: str,
        key_cols: list[str],
        measure_cols: list[str],
    ):
        known = set(table.schema.fieldNames())
        missing = (set(key_cols) | set(measure_cols)) - known
        if missing:
            raise ValueError(f"columns not in table schema: {sorted(missing)}")
        self.spark = spark
        self.table = table
        self.path = path
        self.key_cols = list(key_cols)
        self.measure_cols = list(measure_cols)

    # -- state persistence ---------------------------------------------------
    @property
    def _meta_file(self) -> str:
        return os.path.join(self.path, _META)

    def _load_meta(self) -> dict | None:
        if not os.path.exists(self._meta_file):
            return None
        with open(self._meta_file) as f:
            return json.load(f)

    @property
    def applied_version(self) -> int:
        """Last source-table version folded into the state (0 = none)."""
        meta = self._load_meta()
        return meta["applied_version"] if meta else 0

    def _publish(self, state: DataFrame, applied_version: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        state_dir = os.path.join(self.path, f"s{applied_version:010d}-{uuid.uuid4().hex[:8]}")
        state.write.mode("errorifexists").parquet(state_dir)
        meta = {"applied_version": applied_version, "state_dir": state_dir}
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.rename(tmp, self._meta_file)  # atomic publish

    # -- aggregation pieces --------------------------------------------------
    def _partial_agg(self, df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in self.measure_cols:
            aggs.append(F.sum(F.col(c).cast("decimal(18,6)")).alias(f"{c}_sum"))
            aggs.append(F.min(c).alias(f"{c}_min"))
            aggs.append(F.max(c).alias(f"{c}_max"))
        return df.groupBy(*self.key_cols).agg(*aggs)

    def _merge(self, old: DataFrame, delta: DataFrame) -> DataFrame:
        """Merge two partial states: the union-then-reaggregate form of a
        partial-agg merge — one shuffle on the key, no join needed (a key
        absent from one side simply contributes one row to the group)."""
        aggs = [F.sum("n_rows").alias("n_rows")]
        for c in self.measure_cols:
            aggs.append(F.sum(f"{c}_sum").cast("decimal(18,6)").alias(f"{c}_sum"))
            aggs.append(F.min(f"{c}_min").alias(f"{c}_min"))
            aggs.append(F.max(f"{c}_max").alias(f"{c}_max"))
        return old.unionByName(delta).groupBy(*self.key_cols).agg(*aggs)

    # -- public API ----------------------------------------------------------
    def refresh(self) -> int:
        """Fold commits since ``applied_version`` into the state; returns
        the new applied version. No new commits → no-op. A change range
        broken by vacuum falls back to a full recompute (the only case
        that rescans the table)."""
        src_latest = self.table.latest_version() or 0
        applied = self.applied_version
        if src_latest <= applied:
            return applied
        meta = self._load_meta()
        try:
            delta = self.table.changes(applied, src_latest).drop("_commit_version")
        except ValueError:
            # vacuumed commits in range: incremental read impossible
            self._publish(
                self._partial_agg(
                    self.table.read(as_of_version=src_latest).drop("_commit_version")
                ),
                src_latest,
            )
            return src_latest
        partial = self._partial_agg(delta)
        if meta is None:
            state = partial
        else:
            old = self.spark.read.parquet(meta["state_dir"])
            state = self._merge(old, partial)
        self._publish(state, src_latest)
        return src_latest

    def read(self, with_avg: bool = False) -> DataFrame:
        """Current materialized state (refresh first for freshness).
        ``with_avg=True`` derives ``{c}_avg`` = sum/count at read time —
        avg is not self-decomposable, so it is never stored."""
        meta = self._load_meta()
        if meta is None:
            raise ValueError(f"view at {self.path} has never been refreshed")
        df = self.spark.read.parquet(meta["state_dir"])
        if with_avg:
            for c in self.measure_cols:
                df = df.withColumn(
                    f"{c}_avg",
                    (F.col(f"{c}_sum") / F.col("n_rows")).cast("double"),
                )
        return df
