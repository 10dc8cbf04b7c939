"""Semantic unit tests for the pretraining quality filters (q119/q120) on
crafted degenerate documents — the oracle gate proves cross-engine equality,
these prove the signals mean what they claim.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from feature_store_test_spark.queries.text import (
    q119_repetition_signals,
    q120_corpus_freq_quality,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    """A tiny documents table with known repetition/frequency structure."""
    rows = [
        # 0: pure loop — one word repeated
        (0, "spam spam spam spam spam spam spam spam", "en", "src0", 39),
        # 1: all-distinct words (no repetition at all)
        (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "src0", 45),
        # 2: looping bigram pattern "a b a b ..." — every bigram duplicated
        (2, "a b a b a b a b a b", "en", "src0", 19),
        # 3: common words only (each appears in docs 0-2 too -> high corpus freq)
        (3, "spam alpha beta a b", "en", "src1", 19),
        # 4: rare words only (appear nowhere else)
        (4, "xylophone quixotic zephyr", "en", "src1", 25),
    ]
    path = str(tmp_path_factory.mktemp("textq") / "docs")
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.parquet(
        f"{path}/documents.parquet"
    )
    return path


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_q119_flags_degenerate_docs(spark, docs_dir):
    out = _by_id(q119_repetition_signals(spark, docs_dir))
    assert set(out) == {0, 1, 2, 3, 4}
    # doc 0: one repeated unigram -> total dominance, all bigrams identical
    assert out[0]["top_unigram_share"] == 1.0
    assert out[0]["dup_bigram_frac"] == pytest.approx(6 / 7)
    assert out[0]["is_repetitive"]
    # doc 1: all distinct -> share 1/n, zero duplicate bigrams, clean
    assert out[1]["top_unigram_share"] == pytest.approx(1 / 8)
    assert out[1]["dup_bigram_frac"] == 0.0
    assert not out[1]["is_repetitive"]
    # doc 2: "a b" loop -> 9 bigrams, 2 distinct
    assert out[2]["dup_bigram_frac"] == pytest.approx(7 / 9)
    assert out[2]["is_repetitive"]


def test_q120_scores_common_vs_rare(spark, docs_dir):
    out = _by_id(q120_corpus_freq_quality(spark, docs_dir))
    # doc 4's words occur once each corpus-wide -> every token rare
    assert out[4]["rare_frac"] == 1.0
    assert out[4]["is_rare_heavy"]
    assert out[4]["sum_corpus_cnt"] == 3
    # doc 3 reuses corpus-common words -> its mean relative frequency must
    # exceed doc 4's by construction, and "spam" (9 corpus hits) dominates
    assert out[3]["mean_rel_freq"] > out[4]["mean_rel_freq"]
    # doc 3: alpha/beta have corpus count 2 -> rare; spam/a/b are common
    assert out[3]["rare_frac"] == pytest.approx(2 / 5)
    assert out[3]["sum_corpus_cnt"] == 9 + 2 + 2 + 6 + 6
    # n_tokens are exact
    assert out[0]["n_tokens"] == 8 and out[3]["n_tokens"] == 5
