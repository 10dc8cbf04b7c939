"""Versioned table + feature group semantics (SURVEY §2.10 U1-U3, §2.13 Q4/Q5)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_store_test_spark.store import FeatureStore, VersionedParquetTable

FG_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.LongType()),
        T.StructField("purchase_timestamp", T.TimestampType()),
        T.StructField("latest_purchase_value", T.DoubleType()),
        T.StructField("avg_purchase_value", T.DoubleType()),
        T.StructField("avg_loyalty_score", T.DoubleType()),
        T.StructField("latest_loyalty_score", T.DoubleType()),
    ]
)


def ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


def make_fg(spark, tmp_path, name="fg"):
    store = FeatureStore(spark, str(tmp_path))
    return store.create(name, FG_SCHEMA, "customer_id", "purchase_timestamp")


def row(cid, day, lpv, apv, als, lls):
    return (cid, ts(day), lpv, apv, als, lls)


def test_versioned_table_append_and_time_travel(spark, tmp_path):
    schema = T.StructType([T.StructField("x", T.LongType())])
    t = VersionedParquetTable(spark, str(tmp_path / "t"), schema)
    assert t.read().count() == 0
    v1 = t.append(spark.createDataFrame([(1,), (2,)], schema))
    v2 = t.append(spark.createDataFrame([(3,)], schema))
    assert (v1, v2) == (1, 2)
    assert t.read().count() == 3
    assert t.read(as_of_version=1).count() == 2  # time travel
    assert set(t.read().select("_commit_version").distinct().toPandas()["_commit_version"]) == {1, 2}


def test_versioned_table_rejects_bad_schema(spark, tmp_path):
    schema = T.StructType([T.StructField("x", T.LongType())])
    t = VersionedParquetTable(spark, str(tmp_path / "t"), schema)
    bad = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(bad)


def test_online_view_is_latest_and_offline_keeps_history(spark, tmp_path):
    fg = make_fg(spark, tmp_path)
    fg.ingest(spark.createDataFrame([row(1, 1, 10.0, 10.0, 5.0, 5.0)], FG_SCHEMA))
    fg.ingest(spark.createDataFrame([row(1, 2, 20.0, 15.0, 6.0, 7.0)], FG_SCHEMA))
    assert fg.offline_history().count() == 2  # every version kept
    online = fg.online_view().collect()
    assert len(online) == 1
    assert online[0].latest_purchase_value == 20.0


def test_point_read_and_exists(spark, tmp_path):
    fg = make_fg(spark, tmp_path)
    fg.ingest(spark.createDataFrame([row(7, 1, 10.0, 10.0, 5.0, 5.0)], FG_SCHEMA))
    assert fg.exists(7)
    assert not fg.exists(8)
    rec = fg.get_latest(7)
    assert rec is not None and rec["avg_loyalty_score"] == 5.0
    assert fg.get_latest(8) is None


def test_upsert_matched_applies_old_plus_new_over_2(spark, tmp_path):
    """(old+new)/2 — preserved exactly, NOT a running mean (§2.13 Q4)."""
    fg = make_fg(spark, tmp_path)
    fg.ingest(spark.createDataFrame([row(1, 1, 10.0, 10.0, 5.0, 5.0)], FG_SCHEMA))
    updates = spark.createDataFrame(
        [(1, ts(2), 30.0, 9.0)],
        "customer_id long, purchase_timestamp timestamp, "
        "purchase_value double, loyalty_score double",
    )
    fg.upsert(updates, {"purchase_value": "purchase_value", "loyalty_score": "loyalty_score"})
    rec = fg.get_latest(1)
    assert rec["latest_purchase_value"] == 30.0
    assert rec["avg_purchase_value"] == (10.0 + 30.0) / 2
    assert rec["avg_loyalty_score"] == (5.0 + 9.0) / 2
    assert rec["latest_loyalty_score"] == 9.0
    # chain a second update: exponential decay, not running mean
    fg.upsert(
        spark.createDataFrame(
            [(1, ts(3), 50.0, 1.0)],
            "customer_id long, purchase_timestamp timestamp, "
            "purchase_value double, loyalty_score double",
        ),
        {"purchase_value": "purchase_value", "loyalty_score": "loyalty_score"},
    )
    rec = fg.get_latest(1)
    assert rec["avg_purchase_value"] == (20.0 + 50.0) / 2  # (old_avg+new)/2
    assert rec["avg_loyalty_score"] == (7.0 + 1.0) / 2


def test_upsert_not_matched_initializes_averages(spark, tmp_path):
    """Insert arm: averages start at the observation (U1, fsm.py:206-238)."""
    fg = make_fg(spark, tmp_path)
    updates = spark.createDataFrame(
        [(42, ts(1), 12.0, 3.0)],
        "customer_id long, purchase_timestamp timestamp, "
        "purchase_value double, loyalty_score double",
    )
    fg.upsert(updates, {"purchase_value": "purchase_value", "loyalty_score": "loyalty_score"})
    rec = fg.get_latest(42)
    assert rec["avg_purchase_value"] == 12.0
    assert rec["latest_purchase_value"] == 12.0
    assert rec["avg_loyalty_score"] == 3.0


def test_parity_vs_strict_latest_modes(spark, tmp_path):
    """§2.13 Q5: arrival-order (parity) vs event-time (strict) last-write-wins."""
    fg = make_fg(spark, tmp_path)
    # second commit carries an OLDER event time (a retried stale event)
    fg.ingest(spark.createDataFrame([row(1, 5, 50.0, 50.0, 5.0, 5.0)], FG_SCHEMA))
    fg.ingest(spark.createDataFrame([row(1, 2, 20.0, 20.0, 2.0, 2.0)], FG_SCHEMA))
    parity = fg.online_view(strict_event_time=False).collect()[0]
    strict = fg.online_view(strict_event_time=True).collect()[0]
    assert parity.latest_purchase_value == 20.0  # last arrival wins
    assert strict.latest_purchase_value == 50.0  # last event time wins


def test_training_dataset_full_history(spark, tmp_path):
    """Q3 semantics: training set keeps every version (no dedup)."""
    fg = make_fg(spark, tmp_path)
    fg.ingest(spark.createDataFrame([row(1, 1, 10.0, 10.0, 5.0, 5.0)], FG_SCHEMA))
    fg.ingest(spark.createDataFrame([row(1, 2, 20.0, 15.0, 6.0, 7.0)], FG_SCHEMA))
    td = fg.training_dataset()
    assert td.count() == 2
    assert "customer_id" in td.columns


def test_exists_batch_semi_join(spark, tmp_path):
    fg = make_fg(spark, tmp_path)
    fg.ingest(spark.createDataFrame([row(1, 1, 10.0, 10.0, 5.0, 5.0)], FG_SCHEMA))
    keys = spark.createDataFrame([(1,), (2,), (3,)], "customer_id long")
    present = fg.exists_batch(keys).collect()
    assert [r.customer_id for r in present] == [1]


def test_partitioned_table_prunes_directories(spark, tmp_path):
    """Partition pruning: a date-filtered read must touch only the matching
    partition directories (PartitionFilters in the scan, fewer files)."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F
    from feature_store_test_spark.store import VersionedParquetTable

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("event_date", T.DateType()),
        ]
    )
    t = VersionedParquetTable(
        spark, str(tmp_path / "pt"), schema, partition_cols=["event_date"]
    )
    df = spark.createDataFrame(
        [(i, float(i), dt.date(2024, 1, 1 + (i % 5))) for i in range(100)], schema
    )
    t.append(df)
    full = t.read()
    one_day = full.where(F.col("event_date") == F.lit(dt.date(2024, 1, 3)))
    assert one_day.count() == 20
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_date" in plan


def test_partition_cols_must_exist(spark, tmp_path):
    import pyspark.sql.types as T
    from feature_store_test_spark.store import VersionedParquetTable

    schema = T.StructType([T.StructField("k", T.LongType())])
    with pytest.raises(ValueError, match="partition columns"):
        VersionedParquetTable(spark, str(tmp_path / "x"), schema, partition_cols=["nope"])


def test_partial_commit_files_are_invisible(spark, tmp_path):
    """Atomicity: stray .tmp files and data without a published commit JSON
    must be invisible to readers (files-first, rename-to-publish)."""
    import os

    schema = T.StructType([T.StructField("x", T.LongType())])
    t = VersionedParquetTable(spark, str(tmp_path / "t"), schema)
    t.append(spark.createDataFrame([(1,)], schema))
    # simulate a writer that died before publishing: data dir exists,
    # commit json only as .tmp
    orphan_dir = os.path.join(str(tmp_path / "t"), "data", "v0000000099-dead")
    spark.createDataFrame([(999,)], schema).write.parquet(orphan_dir)
    with open(os.path.join(str(tmp_path / "t"), "_commits", "tmp_partial.tmp"), "w") as f:
        f.write('{"version": 99')  # truncated JSON
    assert t.read().count() == 1  # orphan data never surfaces
    assert t.versions() == [1]
    # next append proceeds normally
    t.append(spark.createDataFrame([(2,)], schema))
    assert sorted(r.x for r in t.read().collect()) == [1, 2]


def test_upsert_passthrough_column_preserved(spark, tmp_path):
    """Feature columns NOT governed by the (old+new)/2 rule must carry the
    stored value through an upsert that doesn't mention them."""
    fg = make_fg(spark, tmp_path)
    fg.ingest(spark.createDataFrame([row(1, 1, 10.0, 10.0, 5.0, 5.0)], FG_SCHEMA))
    # update only purchase_value; loyalty columns are passthrough
    updates = spark.createDataFrame(
        [(1, ts(2), 30.0)],
        "customer_id long, purchase_timestamp timestamp, purchase_value double",
    )
    fg.upsert(updates, {"purchase_value": "purchase_value"})
    rec = fg.get_latest(1)
    assert rec["latest_purchase_value"] == 30.0
    assert rec["avg_purchase_value"] == 20.0
    assert rec["avg_loyalty_score"] == 5.0  # preserved from stored state
    assert rec["latest_loyalty_score"] == 5.0


def test_many_commits_single_scan(spark, tmp_path):
    """30 commits must still read as ONE scan (no union-per-commit plan)."""
    schema = T.StructType([T.StructField("x", T.LongType())])
    t = VersionedParquetTable(spark, str(tmp_path / "t"), schema)
    for i in range(30):
        t.append(spark.createDataFrame([(i,)], schema))
    df = t.read()
    assert df.count() == 30
    versions = {r._commit_version for r in df.collect()}
    assert versions == set(range(1, 31))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan


def test_compaction_preserves_snapshot_and_history(spark, tmp_path):
    """compact() rewrites N commits as one; reads are identical before and
    after (including arrival-order _commit_version), later appends stack on
    top, and pre-compaction time travel still works."""
    schema = T.StructType([T.StructField("x", T.LongType())])
    t = VersionedParquetTable(spark, str(tmp_path / "t"), schema)
    for i in range(5):
        t.append(spark.createDataFrame([(i,)], schema))
    before = sorted(map(tuple, t.read().collect()))
    cv = t.compact()
    assert cv == 6
    after = sorted(map(tuple, t.read().collect()))
    assert before == after  # snapshot identical, versions preserved
    # the post-compaction read touches ONE data dir
    hist = t.read()
    assert "Union" not in hist._jdf.queryExecution().executedPlan().toString()
    # appends continue on top
    t.append(spark.createDataFrame([(99,)], schema))
    assert t.read().count() == 6
    assert max(r._commit_version for r in t.read().collect()) == 7
    # deep time travel below the compaction base still resolves
    assert t.read(as_of_version=2).count() == 2


def test_compaction_with_parity_online_view(spark, tmp_path):
    """Arrival-order (parity) online semantics must survive compaction."""
    fg = make_fg(spark, tmp_path)
    fg.ingest(spark.createDataFrame([row(1, 5, 50.0, 50.0, 5.0, 5.0)], FG_SCHEMA))
    fg.ingest(spark.createDataFrame([row(1, 2, 20.0, 20.0, 2.0, 2.0)], FG_SCHEMA))
    before = fg.online_view().collect()[0]
    fg.table.compact()
    after = fg.online_view().collect()[0]
    assert before.latest_purchase_value == after.latest_purchase_value == 20.0


def test_upsert_rejects_duplicate_keys(spark, tmp_path):
    fg = make_fg(spark, tmp_path)
    dup = spark.createDataFrame(
        [(1, ts(1), 10.0, 1.0), (1, ts(2), 20.0, 2.0)],
        "customer_id long, purchase_timestamp timestamp, "
        "purchase_value double, loyalty_score double",
    )
    with pytest.raises(ValueError, match="one row per key"):
        fg.upsert(dup, {"purchase_value": "purchase_value", "loyalty_score": "loyalty_score"})


def test_vacuum_after_compaction(spark, tmp_path):
    import os

    schema = T.StructType([T.StructField("x", T.LongType())])
    t = VersionedParquetTable(spark, str(tmp_path / "t"), schema)
    for i in range(4):
        t.append(spark.createDataFrame([(i,)], schema))
    t.compact()
    snapshot = sorted(map(tuple, t.read().collect()))
    removed = t.vacuum()
    assert removed == [1, 2, 3, 4]
    # current reads unaffected; vacuumed data dirs gone from disk
    assert sorted(map(tuple, t.read().collect())) == snapshot
    data_root = os.path.join(str(tmp_path / "t"), "data")
    assert len(os.listdir(data_root)) == 1  # only the compacted dir remains
    # deep time travel now fails loudly, not silently-empty
    with pytest.raises(ValueError, match="vacuumed"):
        t.read(as_of_version=2)
    # appends continue
    t.append(spark.createDataFrame([(9,)], schema))
    assert t.read().count() == 5
    # vacuum with no compaction is a no-op
    t2 = VersionedParquetTable(spark, str(tmp_path / "t2"), schema)
    t2.append(spark.createDataFrame([(1,)], schema))
    assert t2.vacuum() == []


# -- data skipping (file stats + clustered compaction) -----------------------

KV_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _kv_table(spark, tmp_path, n=1000, commits=4):
    t = VersionedParquetTable(spark, str(tmp_path / "kv"), KV_SCHEMA)
    per = n // commits
    for i in range(commits):
        rows = [
            (j, float(j) / 7.0, ts(1 + j % 27)) for j in range(i * per, (i + 1) * per)
        ]
        t.append(spark.createDataFrame(rows, KV_SCHEMA).repartition(4))
    return t


def test_commit_log_records_file_stats(spark, tmp_path):
    t = _kv_table(spark, tmp_path, n=100, commits=1)
    files = t.commits()[0]["files"]
    assert files and all(f["rows"] > 0 for f in files)
    ks = [f["stats"]["k"] for f in files]
    assert min(s["min"] for s in ks) == 0 and max(s["max"] for s in ks) == 99
    # timestamps serialize as isoformat strings (lexicographically ordered)
    assert all(isinstance(f["stats"]["ts"]["min"], str) for f in files)


def test_pruned_read_equals_filtered_read(spark, tmp_path):
    t = _kv_table(spark, tmp_path)
    for where in (
        [("k", "=", 123)],
        [("k", ">=", 100), ("k", "<", 200)],
        [("ts", ">=", ts(20))],
        [("k", ">", 10_000)],  # empty result
    ):
        pruned = t.read(where=where)
        full = t.read()
        for c, op, v in where:
            col = F.col(c)
            full = full.where(
                {"=": col == v, "<": col < v, "<=": col <= v, ">": col > v, ">=": col >= v}[op]
            )
        assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, full.collect()))


def test_clustered_compaction_tightens_pruning(spark, tmp_path):
    t = _kv_table(spark, tmp_path)
    before = t.skipping_report([("k", "=", 123)])
    assert before["candidate_files"] >= 1
    t.compact(cluster_by=["k"], n_files=8)
    after = t.skipping_report([("k", "=", 123)])
    # range clustering → disjoint per-file key ranges → a point predicate
    # matches ~1 file; results unchanged
    assert after["candidate_files"] < after["total_files"]
    assert after["candidate_files"] <= 2
    assert after["candidate_rows"] < after["total_rows"]
    got = t.read(where=[("k", "=", 123)]).drop("_commit_version").collect()
    assert [tuple(r)[:2] for r in got] == [(123, 123 / 7.0)]


def test_interleave_bits_is_morton_order(spark):
    from feature_store_test_spark.operators.zorder import interleave_bits

    df = spark.range(1).select(
        interleave_bits([F.lit(0b11), F.lit(0b00)], bits=2).alias("z1"),
        interleave_bits([F.lit(0b01), F.lit(0b11)], bits=2).alias("z2"),
    )
    row = df.collect()[0]
    assert row["z1"] == 0b1010  # col0's bits land in even positions (from MSB)
    assert row["z2"] == 0b0111


def test_zorder_compaction_prunes_on_every_dimension(spark, tmp_path):
    schema = T.StructType(
        [T.StructField("x", T.LongType()), T.StructField("y", T.LongType())]
    )
    t = VersionedParquetTable(spark, str(tmp_path / "zt"), schema)
    # 100x100 grid: x and y independent; appended in hash order (no
    # accidental clustering)
    rows = [(j % 100, j // 100) for j in range(10_000)]
    t.append(spark.createDataFrame(rows, schema).repartition(8))

    t.compact(cluster_by=["x"], n_files=16)
    lin_x = t.skipping_report([("x", "<=", 12)])
    lin_y = t.skipping_report([("y", "<=", 12)])
    assert lin_x["candidate_files"] < lin_x["total_files"]
    # lexicographic clustering leaves every file spanning the full y range
    assert lin_y["candidate_files"] == lin_y["total_files"]

    t.compact(zorder_by=["x", "y"], n_files=16)
    z_x = t.skipping_report([("x", "<=", 12)])
    z_y = t.skipping_report([("y", "<=", 12)])
    # the space-filling curve gives tight boxes on BOTH dimensions
    assert z_x["candidate_files"] < z_x["total_files"]
    assert z_y["candidate_files"] < z_y["total_files"]
    assert z_y["candidate_files"] < lin_y["candidate_files"]

    # physical order changed, logical contents did not
    got = t.read().drop("_commit_version")
    assert got.count() == 10_000
    assert got.distinct().count() == 10_000
    assert t.read(where=[("x", "=", 3), ("y", "=", 7)]).drop(
        "_commit_version"
    ).collect() == [(3, 7)]


def test_zorder_rejects_combined_cluster_args(spark, tmp_path):
    t = _kv_table(spark, tmp_path, n=100, commits=1)
    with pytest.raises(ValueError, match="mutually exclusive"):
        t.compact(cluster_by=["k"], zorder_by=["k"])


def test_skipping_report_counts_all_files_without_where_effect(spark, tmp_path):
    t = _kv_table(spark, tmp_path, n=200, commits=2)
    rep = t.skipping_report([("k", ">=", 0)])
    assert rep["candidate_files"] == rep["total_files"]
    assert rep["total_rows"] == 200
    assert rep["commits_without_stats"] == 0


def test_pruned_read_on_partitioned_table(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("event_date", T.StringType()),
        ]
    )
    t = VersionedParquetTable(
        spark, str(tmp_path / "pt"), schema, partition_cols=["event_date"]
    )
    rows = [(j, float(j), f"2024-01-{1 + j % 3:02d}") for j in range(90)]
    t.append(spark.createDataFrame(rows, schema))
    # partition column values survive leaf-file reads (basePath) and the
    # stats prune on the partition column too
    got = t.read(where=[("event_date", "=", "2024-01-02"), ("k", "<", 10)])
    assert sorted(r.k for r in got.collect()) == [1, 4, 7]
    rep = t.skipping_report([("event_date", "=", "2024-01-02")])
    assert rep["candidate_files"] < rep["total_files"]


def test_point_read_uses_pruned_path_after_clustering(spark, tmp_path):
    fg = make_fg(spark, tmp_path)
    fg.ingest(spark.createDataFrame([row(1, 1, 10.0, 10.0, 5.0, 5.0)], FG_SCHEMA))
    fg.ingest(spark.createDataFrame([row(2, 2, 20.0, 20.0, 6.0, 6.0)], FG_SCHEMA))
    fg.table.compact(cluster_by=["customer_id"], n_files=2)
    rep = fg.table.skipping_report([("customer_id", "=", 2)])
    assert rep["candidate_files"] < rep["total_files"]
    rec = fg.get_latest(2)
    assert rec["latest_purchase_value"] == 20.0
    assert fg.exists(2) and not fg.exists(99)


def test_schema_evolution_widens_and_backfills_null(spark, tmp_path):
    """mergeSchema: new column widens the table; old commits read as NULL
    for it; missing columns in a later write are null-filled; type changes
    are rejected."""
    schema = T.StructType([T.StructField("k", T.LongType())])
    t = VersionedParquetTable(spark, str(tmp_path / "t"), schema)
    t.append(spark.createDataFrame([(1,)], "k long"))
    t.append(spark.createDataFrame([(2, "a")], "k long, tag string"), merge_schema=True)
    assert t.schema.fieldNames() == ["k", "tag"]
    got = {r.k: r.tag for r in t.read().collect()}
    assert got == {1: None, 2: "a"}
    # a writer still on the old column set is null-backfilled under merge
    t.append(spark.createDataFrame([(3,)], "k long"), merge_schema=True)
    assert {r.k: r.tag for r in t.read().collect()}[3] is None
    # but an exact-schema writer without merge_schema is rejected
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(spark.createDataFrame([(4,)], "k long"))
    with pytest.raises(ValueError, match="not schema evolution"):
        t.append(spark.createDataFrame([(5, 1.0)], "k long, tag double"), merge_schema=True)
    # time travel to the pre-evolution snapshot still works (NULL tag)
    v1 = sorted(t.versions())[0]
    old = t.read(as_of_version=v1).collect()
    assert [(r.k, r.tag) for r in old] == [(1, None)]


def test_load_reopens_table_from_log(spark, tmp_path):
    """A reader in another session reconstructs schema + partition layout
    from the commit log alone."""
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("d", T.StringType())]
    )
    t = VersionedParquetTable(spark, str(tmp_path / "t"), schema, partition_cols=["d"])
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], schema))
    t.append(spark.createDataFrame([(3, "a", 9.5)], "k long, d string, score double"),
             merge_schema=True)
    re = VersionedParquetTable.load(spark, str(tmp_path / "t"))
    assert re.schema.fieldNames() == ["k", "d", "score"]
    assert re.partition_cols == ["d"]
    assert re.read().count() == 3


def test_table_changes_reads_only_new_commits(spark, tmp_path):
    schema = T.StructType([T.StructField("k", T.LongType())])
    t = VersionedParquetTable(spark, str(tmp_path / "t"), schema)
    v1 = t.append(spark.createDataFrame([(1,), (2,)], schema))
    v2 = t.append(spark.createDataFrame([(3,)], schema))
    v3 = t.append(spark.createDataFrame([(4,)], schema))
    got = sorted(r.k for r in t.changes(v1).collect())
    assert got == [3, 4]
    got = sorted(r.k for r in t.changes(v1, until_version=v2).collect())
    assert got == [3]
    assert t.changes(v3).count() == 0
    # the incremental read must not scan the v1 data dir at all
    plan = t.changes(v1)._jdf.queryExecution().executedPlan().toString()
    assert f"v{v1:010d}" not in plan


def test_table_changes_across_compaction_falls_back_correctly(spark, tmp_path):
    schema = T.StructType([T.StructField("k", T.LongType())])
    t = VersionedParquetTable(spark, str(tmp_path / "t"), schema)
    v1 = t.append(spark.createDataFrame([(1,)], schema))
    t.append(spark.createDataFrame([(2,)], schema))
    t.compact()
    t.append(spark.createDataFrame([(3,)], schema))
    got = sorted(r.k for r in t.changes(v1).collect())
    assert got == [2, 3]  # the compaction itself is not a data change


def test_feature_group_change_feed_classifies_insert_vs_update(spark, tmp_path):
    fg = make_fg(spark, tmp_path)
    v1 = fg.ingest(spark.createDataFrame([row(1, 1, 10.0, 10.0, 5.0, 5.0)], FG_SCHEMA))
    fg.ingest(
        spark.createDataFrame(
            [row(1, 2, 20.0, 15.0, 5.0, 5.0), row(2, 2, 30.0, 30.0, 7.0, 7.0)],
            FG_SCHEMA,
        )
    )
    ch = fg.changes(v1).select("customer_id", "_change_type").collect()
    got = {(r.customer_id, r._change_type) for r in ch}
    assert got == {(1, "update"), (2, "insert")}
    assert fg.changes(v1).count() == 2


def test_merge_general_clauses(spark, tmp_path):
    """General MERGE: declarative t./s. expressions, carry-through of
    unspecified columns, insert defaults, and clause omission."""
    fg = make_fg(spark, tmp_path)
    fg.ingest(
        spark.createDataFrame(
            [row(1, 1, 10.0, 10.0, 5.0, 5.0), row(2, 1, 20.0, 20.0, 6.0, 6.0)],
            FG_SCHEMA,
        )
    )
    src = spark.createDataFrame(
        [(1, ts(2), 100.0), (3, ts(2), 7.0)],
        "customer_id long, purchase_timestamp timestamp, purchase_value double",
    )
    v = fg.merge(
        src,
        when_matched={
            "purchase_timestamp": F.col("s.purchase_timestamp"),
            "latest_purchase_value": F.col("s.purchase_value"),
            "avg_purchase_value": (
                F.col("t.avg_purchase_value") + F.col("s.purchase_value")
            ) / 2.0,
        },
        when_not_matched={
            "purchase_timestamp": F.col("s.purchase_timestamp"),
            "latest_purchase_value": F.col("s.purchase_value"),
            "avg_purchase_value": F.col("s.purchase_value"),
            "avg_loyalty_score": F.lit(0.0),
            "latest_loyalty_score": F.lit(0.0),
        },
    )
    assert v is not None
    state = {r.customer_id: r for r in fg.online_view().collect()}
    assert state[1].latest_purchase_value == 100.0
    assert state[1].avg_purchase_value == pytest.approx((10.0 + 100.0) / 2)
    assert state[1].avg_loyalty_score == 5.0  # carried through, not clobbered
    assert state[2].latest_purchase_value == 20.0  # untouched key unchanged
    assert state[3].avg_purchase_value == 7.0  # inserted with defaults
    assert state[3].avg_loyalty_score == 0.0


def test_merge_update_only_and_insert_only(spark, tmp_path):
    fg = make_fg(spark, tmp_path)
    fg.ingest(spark.createDataFrame([row(1, 1, 10.0, 10.0, 5.0, 5.0)], FG_SCHEMA))
    src = spark.createDataFrame(
        [(1, ts(2), 99.0), (9, ts(2), 1.0)],
        "customer_id long, purchase_timestamp timestamp, purchase_value double",
    )
    # WHEN MATCHED only: key 9 must NOT appear
    fg.merge(
        src,
        when_matched={
            "purchase_timestamp": F.col("s.purchase_timestamp"),
            "latest_purchase_value": F.col("s.purchase_value"),
        },
    )
    keys = {r.customer_id for r in fg.online_view().collect()}
    assert keys == {1}
    # WHEN NOT MATCHED only: key 1 must stay at 99, key 9 inserted
    fg.merge(
        src,
        when_not_matched={
            "purchase_timestamp": F.col("s.purchase_timestamp"),
            "latest_purchase_value": F.col("s.purchase_value"),
        },
    )
    state = {r.customer_id: r for r in fg.online_view().collect()}
    assert set(state) == {1, 9}
    assert state[1].latest_purchase_value == 99.0
    assert state[9].latest_purchase_value == 1.0
    assert state[9].avg_purchase_value is None  # no default supplied


def test_merge_matches_upsert_rule(spark, tmp_path):
    """The specialized upsert is expressible through the general merge —
    same (old+new)/2 state either way."""
    fg_a = make_fg(spark, tmp_path / "a")
    fg_b = make_fg(spark, tmp_path / "b")
    seed = spark.createDataFrame([row(1, 1, 10.0, 10.0, 5.0, 5.0)], FG_SCHEMA)
    fg_a.ingest(seed)
    fg_b.ingest(seed)
    src = spark.createDataFrame(
        [(1, ts(3), 30.0)],
        "customer_id long, purchase_timestamp timestamp, purchase_value double",
    )
    fg_a.upsert(src, {"purchase_value": "purchase_value"})
    fg_b.merge(
        src,
        when_matched={
            "purchase_timestamp": F.col("s.purchase_timestamp"),
            "latest_purchase_value": F.col("s.purchase_value"),
            "avg_purchase_value": (
                F.col("t.avg_purchase_value") + F.col("s.purchase_value")
            ) / 2.0,
        },
        when_not_matched={
            "purchase_timestamp": F.col("s.purchase_timestamp"),
            "latest_purchase_value": F.col("s.purchase_value"),
            "avg_purchase_value": F.col("s.purchase_value"),
        },
    )
    a = fg_a.online_view().collect()[0]
    b = fg_b.online_view().collect()[0]
    assert (a.latest_purchase_value, a.avg_purchase_value) == (
        b.latest_purchase_value,
        b.avg_purchase_value,
    )


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    fg = make_fg(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, ts(1), 1.0), (1, ts(2), 2.0)],
        "customer_id long, purchase_timestamp timestamp, purchase_value double",
    )
    with pytest.raises(ValueError, match="one source row per key"):
        fg.merge(src, when_matched={})


def test_concurrent_append_publish_race_retries_to_next_version(spark, tmp_path):
    """Two writers race to the same version: the loser must NOT clobber
    the winner's commit (os.link exclusivity) and, appends being
    commutative, must retry under the next free version — both rows end
    up readable under distinct versions."""
    from feature_store_test_spark.store.table import VersionedParquetTable

    schema = T.StructType([T.StructField("x", T.LongType())])

    class RacingTable(VersionedParquetTable):
        """Simulates losing one race: the first publish attempt finds the
        version already taken (another writer committed between our
        latest_version() read and our publish)."""

        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self._race_armed = False

        def _publish_new_commit(self, tmp, version):
            if self._race_armed:
                self._race_armed = False
                other = VersionedParquetTable(spark, self.path, schema)
                other.append(spark.createDataFrame([(99,)], schema))
            return super()._publish_new_commit(tmp, version)

    t = RacingTable(spark, str(tmp_path / "t"), schema)
    t.append(spark.createDataFrame([(1,)], schema))
    t._race_armed = True
    v = t.append(spark.createDataFrame([(2,)], schema))
    assert v == 3  # lost version 2 to the racer, retried to 3
    got = {r.x for r in t.read().collect()}
    assert got == {1, 2, 99}  # nobody's commit was clobbered
    assert t.versions() == [1, 2, 3]


def test_compact_aborts_on_publish_race(spark, tmp_path):
    """compact() pins its snapshot to base_version; if another writer
    commits first, the compaction must abort loudly, not retry onto a
    stale snapshot."""
    from feature_store_test_spark.store.table import (
        ConcurrentCommitError,
        VersionedParquetTable,
    )

    schema = T.StructType([T.StructField("x", T.LongType())])

    class RacingTable(VersionedParquetTable):
        def _publish_new_commit(self, tmp, version):
            if not getattr(self, "_raced", False):
                self._raced = True
                other = VersionedParquetTable(spark, self.path, schema)
                other.append(spark.createDataFrame([(99,)], schema))
            return super()._publish_new_commit(tmp, version)

    t = RacingTable(spark, str(tmp_path / "t"), schema)
    VersionedParquetTable(spark, str(tmp_path / "t"), schema).append(
        spark.createDataFrame([(1,)], schema)
    )
    with pytest.raises(ConcurrentCommitError):
        t.compact()
    # the racer's commit survived untouched
    assert {r.x for r in t.read().collect()} == {1, 99}


def test_delete_restore_and_history(spark, tmp_path):
    """DELETE rewrites the snapshot copy-on-write (time travel still sees
    the rows); RESTORE republishes an old snapshot as the new latest;
    history() enumerates every commit with its operation."""
    schema = T.StructType([T.StructField("x", T.LongType())])
    t = VersionedParquetTable(spark, str(tmp_path / "t"), schema)
    t.append(spark.createDataFrame([(1,), (2,), (3,)], schema))
    t.append(spark.createDataFrame([(4,)], schema))

    v, n = t.delete("x >= 3")
    assert (v, n) == (3, 2)
    assert {r.x for r in t.read().collect()} == {1, 2}
    # pre-delete versions still fully readable
    assert {r.x for r in t.read(as_of_version=2).collect()} == {1, 2, 3, 4}
    # arrival-order axis survives the rewrite
    assert {r["_commit_version"] for r in t.read().collect()} == {1}

    rv = t.restore(2)
    assert rv == 4
    assert {r.x for r in t.read().collect()} == {1, 2, 3, 4}

    h = {r.version: (r.type, r.op) for r in t.history().collect()}
    assert h[1] == ("append", "append")
    assert h[3] == ("compact", "delete")
    assert h[4] == ("compact", "restore")
    hist = {r.version: r for r in t.history().collect()}
    assert hist[4].restored_from == 2
    assert hist[3].n_rows == 2  # post-delete snapshot row count


def test_delete_keeps_null_predicate_rows(spark, tmp_path):
    """Rows where the predicate is NULL are KEPT (SQL DELETE semantics:
    only rows where the condition is TRUE are removed)."""
    schema = T.StructType([T.StructField("x", T.LongType())])
    t = VersionedParquetTable(spark, str(tmp_path / "t"), schema)
    t.append(spark.createDataFrame([(1,), (None,), (5,)], schema))
    v, n = t.delete("x > 2")
    assert n == 1
    got = {r.x for r in t.read().collect()}
    assert got == {1, None}


def test_diff_reports_inserts_deletes_and_updates(spark, tmp_path):
    """Delete-aware CDF: diff() tags snapshot differences with the Delta
    change-type vocabulary, including update_pre/update_post pairs when a
    key's values changed across the range."""
    schema = T.StructType(
        [T.StructField("x", T.LongType()), T.StructField("s", T.StringType())]
    )
    t = VersionedParquetTable(spark, str(tmp_path / "t"), schema)
    t.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], schema))  # v1
    t.append(spark.createDataFrame([(4, "d")], schema))                      # v2

    # full-history diff: everything is an insert
    d0 = t.diff(0)
    assert {r["_change_type"] for r in d0.collect()} == {"insert"}
    assert d0.count() == 4

    t.delete("x = 2")                                                        # v3
    t.append(spark.createDataFrame([(2, "B")], schema))                      # v4

    d = t.diff(2, 4, key_cols=["x"])
    by_type = {}
    for r in d.collect():
        by_type.setdefault(r["_change_type"], set()).add((r.x, r.s))
    assert by_type["update_pre"] == {(2, "b")}
    assert by_type["update_post"] == {(2, "B")}
    assert "insert" not in by_type and "delete" not in by_type

    # row-level (no keys): the same range is one delete + one insert
    d2 = t.diff(2, 4)
    rows = {(r["_change_type"], r.x, r.s) for r in d2.collect()}
    assert rows == {("delete", 2, "b"), ("insert", 2, "B")}

    # a pure delete range
    d3 = t.diff(1, 3, key_cols=["x"])
    got = {(r["_change_type"], r.x) for r in d3.collect()}
    assert got == {("insert", 4), ("delete", 2)}


def test_vacuum_crash_window_is_clean_and_retryable(spark, tmp_path):
    """Round-7 crash-safety: vacuum tombstones BEFORE deleting, so a crash
    mid-vacuum leaves readers with the clean 'vacuumed' error (never a raw
    parquet path-not-found), and the retained vacuum_dir lets the next
    vacuum() finish the deletion idempotently."""
    import json as _json
    import os

    schema = T.StructType([T.StructField("x", T.LongType())])
    t = VersionedParquetTable(spark, str(tmp_path / "t"), schema)
    for i in range(3):
        t.append(spark.createDataFrame([(i,)], schema))
    t.compact()

    # simulate the crash-after-tombstone state for version 1: tombstone
    # written (data_dir nulled, vacuum_dir retained), directory NOT deleted
    cf = t._commit_file(1)
    with open(cf) as f:
        c = _json.load(f)
    assert c["data_dir"]
    c["vacuum_dir"] = c["data_dir"]
    c["data_dir"] = None
    c["vacuumed"] = True
    t._rewrite_commit(c)
    leaked = c["vacuum_dir"]
    assert os.path.isdir(leaked)

    # readers see the clean vacuumed error, not a parquet read failure
    with pytest.raises(ValueError, match="vacuumed"):
        t.read(as_of_version=1)

    # the next vacuum finishes the interrupted deletion AND vacuums the rest
    removed = t.vacuum()
    assert not os.path.isdir(leaked)
    assert 2 in removed and 3 in removed
    # the retried completion is reported too (r8: the crashed call never
    # returned, so this call's list is the only place version 1 can appear)
    assert 1 in removed
    with open(cf) as f:
        assert "vacuum_dir" not in _json.load(f)
    # current snapshot unaffected
    assert t.read().count() == 3
