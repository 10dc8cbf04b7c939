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
