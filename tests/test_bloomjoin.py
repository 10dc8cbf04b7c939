"""Bloom-filter semi-join reduction (operators/bloomjoin.py).

Pins the two properties the operator's 100 TB story rests on:
no false negatives (the rerank can only REMOVE rows, so equality with
the plain semi join is structural), and a real candidate-set reduction
at honest filter geometry.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table_spread as load_table
from feature_store_test_spark.operators.bloomjoin import (
    bloom_prefilter,
    bloom_semi_join,
    bloom_words,
)

SF_DIR = "/root/testdata/sf0.001"


def _sides(spark):
    fact = load_table(spark, "lineitem", SF_DIR).select("l_orderkey", "l_quantity")
    dim = (
        load_table(spark, "orders", SF_DIR)
        .where(F.col("o_totalprice") > 450000)
        .select("o_orderkey")
    )
    return fact, dim


def test_equals_exact_semi_join(spark):
    fact, dim = _sides(spark)
    got = (
        bloom_semi_join(fact, dim, "l_orderkey", "o_orderkey", m_bits=1 << 14)
        .groupBy("l_orderkey")
        .count()
    )
    want = (
        fact.join(dim.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", "left_semi")
        .groupBy("l_orderkey")
        .count()
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_no_false_negatives_even_tiny_bitmap(spark):
    # a 128-bit bitmap saturates (every probe passes) but must never DROP
    # a true match — equality still holds because the rerank is exact
    fact, dim = _sides(spark)
    got = bloom_semi_join(fact, dim, "l_orderkey", "o_orderkey", m_bits=128, n_hashes=2)
    want = fact.join(
        dim.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", "left_semi"
    )
    assert got.count() == want.count()


def test_prefilter_reduces_candidates(spark):
    fact, dim = _sides(spark)
    words = bloom_words(dim, "o_orderkey", 1 << 18, 3)
    n_cand = bloom_prefilter(fact, words, "l_orderkey", 1 << 18, 3).count()
    n_total = fact.count()
    n_exact = fact.join(
        dim.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", "left_semi"
    ).count()
    # every true match survives; the candidate set is a small superset
    assert n_exact <= n_cand < n_total
    # at 2^18 bits for ~150 keys the FP rate is ~0: candidates ≈ matches,
    # allow a loose 2x bound so the assertion is geometry, not luck
    assert n_cand <= max(2 * n_exact, n_exact + 50)


def test_word_table_bounded(spark):
    _, dim = _sides(spark)
    m_bits = 1 << 12
    words = bloom_words(dim, "o_orderkey", m_bits, 3).collect()
    assert len(words) <= m_bits // 64
    assert all(r["word_idx"] < m_bits // 64 and r["word_idx"] >= 0 for r in words)


def test_rejects_unaligned_bits(spark):
    _, dim = _sides(spark)
    with pytest.raises(ValueError):
        bloom_words(dim, "o_orderkey", 100, 3)
