"""Persisted IVF-PQ index: build-once/serve-many equals the per-call
operator, survives reload, and probes read only their cell partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table
from feature_store_test_spark.operators.similarity import ivfpq_ann_topk
from feature_store_test_spark.store.annindex import ANNIndex

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_index_search_matches_per_call_operator(spark, tmp_path):
    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.where(F.col("vec_id") % 25 == 0)
    idx = ANNIndex.build(spark, emb, str(tmp_path / "idx"), n_cells=8, m=8, k=16)
    got = idx.search(queries, k=5, n_probe=2, n_candidates=50)
    # the per-call operator with the index's own trained artifacts must
    # produce the identical result set
    want = ivfpq_ann_topk(
        emb, queries, idx.centroids, idx.codebooks,
        k=5, n_probe=2, n_candidates=50,
    )
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_index_reload_is_identical(spark, tmp_path):
    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.where(F.col("vec_id") % 25 == 0)
    path = str(tmp_path / "idx2")
    built = ANNIndex.build(spark, emb, path)
    reloaded = ANNIndex.load(spark, path)
    assert built.codebooks == reloaded.codebooks
    assert _rows(built.search(queries)) == _rows(reloaded.search(queries))


def test_search_prunes_to_probed_cell_partitions(spark, tmp_path):
    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.where(F.col("vec_id") < 3)
    idx = ANNIndex.build(spark, emb, str(tmp_path / "idx3"))
    plan = (
        idx.search(queries, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the cid filter must reach the reader as a partition filter (cell
    # directories outside the probe set are never read)
    assert "PartitionFilters: [cid" in plan.replace("PartitionFilters: [ cid", "PartitionFilters: [cid"), plan
