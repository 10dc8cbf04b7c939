"""Feature groups: the reference's store API re-expressed set-oriented.

Reference surface (/root/reference/core/feature_store_manager.py):
    create_feature_group    :72-106   → FeatureStore.create / FeatureGroup
    ingest_features         :108-119  → FeatureGroup.ingest (one commit, not
                                        per-row PutRecord with max_workers=1)
    build_training_dataset  :121-153  → FeatureGroup.training_dataset (spark.sql)
    customer_features_exist :155-172  → FeatureGroup.exists / exists_batch
    get_latest_features     :184-204  → FeatureGroup.get_latest / online_view
    add_customer_features   :206-238  → FeatureGroup.upsert (NOT MATCHED arm)
    update_customer_features:240-282  → FeatureGroup.upsert (MATCHED arm,
                                        (old+new)/2 rule preserved — §2.13 Q4)

Everything crossing the reference's store boundary was stringly typed
(:225-230, :269-274); here columns keep native Spark types end-to-end
(SURVEY.md §1.2).

"Latest" semantics (SURVEY.md §2.13 Q1/Q5): the online view ranks history by
arrival order (_commit_version) in parity mode — last write wins, matching
the reference's put-overwrites behavior — or by event time in strict mode;
both use the feature-group key + event-time declared at creation, with a
deterministic tiebreak.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_store_test_spark.operators.latest import latest_per_key_agg
from feature_store_test_spark.store.table import VersionedParquetTable


@dataclass
class FeatureGroup:
    """A named, typed feature table with a record key and event-time column."""

    spark: SparkSession
    name: str
    schema: T.StructType
    key_col: str
    event_time_col: str
    table: VersionedParquetTable

    # value column -> is it an incremental average maintained by the
    # reference's (old+new)/2 rule on update?
    @property
    def feature_cols(self) -> list[str]:
        return [
            f.name
            for f in self.schema.fields
            if f.name not in (self.key_col, self.event_time_col)
        ]

    # -- ingestion ----------------------------------------------------------
    def ingest(self, df: DataFrame) -> int:
        """Batch ingest: ONE atomic commit to the offline history.

        Replaces the reference's serial per-row PutRecord loop
        (max_workers=1, :108-119) with an executor-parallel parquet write.
        """
        return self.table.append(df.select(*self.schema.fieldNames()))

    # -- offline store ------------------------------------------------------
    def offline_history(self, as_of_version: int | None = None) -> DataFrame:
        """Every version of every record (append-only history)."""
        return self.table.read(as_of_version)

    def training_dataset(self, columns: list[str] | None = None) -> DataFrame:
        """The reference's Athena training query on Spark SQL (§3.2):
        full history, projected and ordered — Q3 semantics preserved
        (no dedup; docstring-vs-behavior quirk resolved in favor of code).
        """
        cols = columns or [self.key_col, *self.feature_cols]
        view = f"__fg_{self.name}_history"
        self.offline_history().createOrReplaceTempView(view)
        col_list = ", ".join(cols)
        return self.spark.sql(
            f"SELECT {col_list} FROM {view} "
            f"ORDER BY {self.key_col}, {self.event_time_col} DESC"
        )

    def changes(
        self, since_version: int, until_version: int | None = None
    ) -> DataFrame:
        """Key-level change data feed over the offline history: rows
        committed in versions (since, until], each tagged ``_change_type``
        = 'insert' (first version this key ever appeared in) or 'update'
        (key existed in an earlier commit) — the Delta CDF contract for an
        append-only upsert log. Incremental online-view refresh and
        downstream retraining consume this instead of re-reading the table.

        Scale: the changed rows come from reading ONLY the new commits
        (table.changes); the insert/update classification needs each key's
        first-ever version, obtained from a keys-only projection of
        history aggregated min(_commit_version) — a shuffle of (key,
        version) pairs, not feature payloads, then a broadcast-friendly
        join onto the (small) change slice.
        """
        delta = self.table.changes(since_version, until_version)
        first_seen = (
            self.table.read(as_of_version=until_version)
            .select(self.key_col, "_commit_version")
            .groupBy(self.key_col)
            .agg(F.min("_commit_version").alias("__first_v"))
        )
        return (
            delta.join(first_seen, on=self.key_col, how="left")
            .withColumn(
                "_change_type",
                F.when(
                    F.col("_commit_version") == F.col("__first_v"), F.lit("insert")
                ).otherwise(F.lit("update")),
            )
            .drop("__first_v")
        )

    # -- online store -------------------------------------------------------
    def online_view(self, strict_event_time: bool = False) -> DataFrame:
        """Latest record per key.

        parity mode (default): last-ARRIVAL wins (commit sequence, then
        event time) — reproduces the reference's put-overwrites behavior
        including its retry-out-of-order quirk (§2.13 Q5).
        strict mode: last-EVENT-TIME wins regardless of arrival.
        """
        hist = self.offline_history()
        if strict_event_time:
            max_of = [self.event_time_col, "_commit_version"]
        else:
            max_of = ["_commit_version", self.event_time_col]
        # aggregation form: map-side partial max_by → one candidate row per
        # key per partition crosses the shuffle (vs every version for the
        # ranking-window form)
        return latest_per_key_agg(hist, self.key_col, max_of).drop("_commit_version")

    def exists_batch(self, keys: DataFrame) -> DataFrame:
        """Which of the given keys have a stored record (left semi join) —
        the set-oriented form of customer_features_exist (:155-172)."""
        return keys.join(
            self.online_view().select(self.key_col),
            on=self.key_col,
            how="left_semi",
        )

    def _key_slice_latest(self, key_value, strict_event_time: bool = False) -> DataFrame:
        """Latest record for ONE key via the stats-pruned read path: the
        table's per-file min/max skips every file whose key range excludes
        the key, so after compact(cluster_by=[key]) a point read lists ~1
        file instead of scanning the table. Latest-per-key over only this
        key's rows is identical to filtering the full online view."""
        hist = self.table.read(where=[(self.key_col, "=", key_value)])
        if strict_event_time:
            max_of = [self.event_time_col, "_commit_version"]
        else:
            max_of = ["_commit_version", self.event_time_col]
        return latest_per_key_agg(hist, self.key_col, max_of).drop("_commit_version")

    def exists(self, key_value) -> bool:
        return (
            self.table.read(where=[(self.key_col, "=", key_value)])
            .limit(1)
            .count()
            > 0
        )

    def get_latest(self, key_value) -> dict | None:
        """Point read of the latest record (get_latest_features :184-204).

        Stats-pruned key-slice scan (see _key_slice_latest); at serving
        scale the residual is cached / key-clustered (documented scope:
        micro-batch freshness, like the reference outsourcing ms-latency
        serving to AWS).
        """
        rows = self._key_slice_latest(key_value).collect()
        return rows[0].asDict() if rows else None

    # -- upsert (the feature-store core) ------------------------------------
    def upsert(self, updates: DataFrame, value_col_map: dict[str, str]) -> int:
        """MERGE semantics as an append of computed rows (§2.10 U1/U2).

        ``updates``: one row per key — columns: key, event_time, and one NEW
        observation column per entry of ``value_col_map``.
        ``value_col_map``: {new_observation_col -> (latest_col, avg_col)
        prefix}, e.g. {"purchase_value": "purchase_value"} maintains
        latest_purchase_value and avg_purchase_value.

        MATCHED: latest := new, avg := (old_avg + new) / 2  — the
        reference's exponential-decay rule preserved exactly (§2.13 Q4,
        /root/reference/core/feature_store_manager.py:258-264).
        NOT MATCHED: latest := new, avg := new (initialization,
        add_customer_features :206-238).

        The online view stays a derived window over history, so this
        "merge" writes only the new version rows — no table rewrite. On
        Delta this maps 1:1 to MERGE WHEN (NOT) MATCHED.
        """
        # one row per key is a hard precondition: two update rows for the
        # same key would both fold against the SAME stored average (the
        # chain needs sequential application — that's the streaming
        # pipeline's per-key fold, not this batch merge)
        dup = (
            updates.groupBy(self.key_col)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "upsert requires one row per key; pre-fold multi-event "
                "batches (see streaming.InferencePipeline._fold_batch)"
            )
        current = self.online_view()
        upd = updates.alias("u")
        cur = current.alias("c")
        joined = upd.join(cur, on=self.key_col, how="left")

        out_cols = [
            F.col(f"u.{self.key_col}").alias(self.key_col),
            F.col(f"u.{self.event_time_col}").alias(self.event_time_col),
        ]
        handled = {self.key_col, self.event_time_col}
        for obs_col, prefix in value_col_map.items():
            latest_c, avg_c = f"latest_{prefix}", f"avg_{prefix}"
            out_cols.append(F.col(f"u.{obs_col}").alias(latest_c))
            out_cols.append(
                F.when(
                    F.col(f"c.{avg_c}").isNull(), F.col(f"u.{obs_col}")
                )
                .otherwise((F.col(f"c.{avg_c}") + F.col(f"u.{obs_col}")) / 2.0)
                .alias(avg_c)
            )
            handled |= {latest_c, avg_c}
        # passthrough feature columns not maintained by the update rule:
        # take the update's value when the caller supplied the column,
        # else carry the stored value through unchanged
        for c in self.feature_cols:
            if c not in handled:
                if c in updates.columns:
                    out_cols.append(
                        F.coalesce(F.col(f"u.{c}"), F.col(f"c.{c}")).alias(c)
                    )
                else:
                    out_cols.append(F.col(f"c.{c}").alias(c))

        new_rows = joined.select(*out_cols).select(*self.schema.fieldNames())
        return self.ingest(new_rows)

    def merge(
        self,
        source: DataFrame,
        when_matched: dict[str, F.Column] | None = None,
        when_not_matched: dict[str, F.Column] | None = None,
    ) -> int | None:
        """General ``MERGE INTO`` (Delta parity), realized append-only.

        ``source`` must carry the key column and one row per key. Update /
        insert clauses are dicts {target_column -> Column expression};
        expressions may reference the target's current latest state as
        ``t.<col>`` and the source as ``s.<col>``:

        - ``when_matched``: applied where the key exists; unspecified
          feature columns carry the stored value through. ``None`` means
          WHEN MATCHED is absent — matched source rows change nothing.
        - ``when_not_matched``: applied where the key is new; unspecified
          columns default to the source column of the same name, else
          NULL. ``None`` means inserts are skipped.

        Like ``upsert`` (the specialized (old+new)/2 form), this writes
        ONLY the new version rows — the online view derives the result;
        no table rewrite, and the full history stays queryable. DELETE is
        deliberately absent: an append-only history cannot un-happen a
        version (Delta implements it as a rewrite); retention is vacuum's
        job and key retirement is a modeling concern (tombstone column).

        Returns the committed version, or None if nothing changed.
        """
        dup = (
            source.groupBy(self.key_col).count().where(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise ValueError("merge requires one source row per key")
        t = self.online_view().alias("t")
        s = source.alias("s")
        joined = s.join(t, on=self.key_col, how="left")
        matched = F.col(f"t.{self.event_time_col}").isNotNull()
        if when_matched is None:
            joined = joined.where(~matched)
        if when_not_matched is None:
            joined = joined.where(matched)

        out_cols = []
        for f in self.schema.fields:
            c = f.name
            if c == self.key_col:
                out_cols.append(F.col(f"s.{self.key_col}").alias(c))
                continue
            m_expr = (when_matched or {}).get(c)
            if m_expr is None:
                m_expr = F.col(f"t.{c}")
            i_expr = (when_not_matched or {}).get(c)
            if i_expr is None:
                i_expr = (
                    F.col(f"s.{c}")
                    if c in source.columns
                    else F.lit(None).cast(f.dataType)
                )
            out_cols.append(F.when(matched, m_expr).otherwise(i_expr).alias(c))
        new_rows = joined.select(*out_cols)
        if new_rows.limit(1).count() == 0:
            return None
        return self.ingest(new_rows)


class FeatureStore:
    """Feature-group registry (replaces the reference's hardcoded name
    literals — §2.13 Q6 — with a single catalog rooted at base_path)."""

    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base_path = base_path
        self._groups: dict[str, FeatureGroup] = {}

    def create(
        self,
        name: str,
        schema: T.StructType,
        key_col: str,
        event_time_col: str,
        partition_cols: list[str] | None = None,
    ) -> FeatureGroup:
        """``partition_cols``: optional low-cardinality schema columns (e.g.
        a derived event DATE) for hive-partitioned storage — time-range
        reads then prune whole directories (SURVEY §4 'partition pruning')."""
        if key_col not in schema.fieldNames() or event_time_col not in schema.fieldNames():
            raise ValueError("key/event-time column must be part of the schema")
        table = VersionedParquetTable(
            self.spark,
            os.path.join(self.base_path, name),
            schema,
            partition_cols=partition_cols,
        )
        fg = FeatureGroup(
            spark=self.spark,
            name=name,
            schema=schema,
            key_col=key_col,
            event_time_col=event_time_col,
            table=table,
        )
        self._groups[name] = fg
        return fg

    def get(self, name: str) -> FeatureGroup:
        return self._groups[name]
