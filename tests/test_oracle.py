"""The local t2 gate: every registered query hash-matches its DuckDB oracle."""

from __future__ import annotations

import pytest

from feature_store_test_spark.oracle import compare_all, compare_query, duckdb_connection
from feature_store_test_spark.registry import all_queries


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_matches_oracle(spark, sf_dir, name):
    con = duckdb_connection(sf_dir)
    res = compare_query(spark, name, sf_dir, con)
    assert res.ok, f"{name}: {res.detail}"


def test_every_query_has_doc():
    for name, spec in all_queries().items():
        assert spec.doc, f"{name} has no doc line"


def test_managed_caches_released_after_compare(spark):
    """Queries that cache intermediates (managed_cache) must not leak
    persisted RDDs once the comparator materializes them — a long-lived
    session sweeping the registry stays flat."""
    from feature_store_test_spark.oracle import compare_query, duckdb_connection

    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    con = duckdb_connection("/root/testdata/sf0.001")
    for q in ("q39b_simhash_groups", "q121_semantic_dedup", "q30_embedding_near_dups"):
        assert compare_query(spark, q, "/root/testdata/sf0.001", con).ok
    assert jsc.getPersistentRDDs().size() <= before
