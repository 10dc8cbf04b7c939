"""Corpus language-model scoring and keyword retrieval over ``documents``.

Two pre-training pipeline stages the reference's relational surface
doesn't reach but any 100 TB curation stack needs:

- q133: CCNet-style statistical LM quality filter — train a bigram
  transition model ON the corpus itself (one aggregation), score every
  document by how "predictable" its bigrams are under that model. The
  model tables are vocabulary-bounded (|V| and |V|² rows, independent of
  corpus size), so scoring is a map-side broadcast join however large
  the corpus gets.
- q134: BM25 keyword search — the classic sparse-retrieval scorer, as
  two scans: one aggregate row of corpus statistics (N, avgdl, per-term
  document frequencies) broadcast back over a scan that computes term
  frequencies per document, then a top-k on the rounded score.

Cross-engine exactness: q133 is transcendental-free — "predictable"
means corpus transition probability ≥ 0.1, tested as the integer
cross-multiply ``c(w1,w2)·10 ≥ c(w1)``; the only float is one
bigint/bigint division identical in both engines. q134 needs ``ln`` by
BM25's definition; both engines evaluate the identically-written
expression over identical doubles, and the 6-dp round on an
almost-surely-irrational value absorbs any last-ulp libm divergence
(the sort key is the ROUNDED score with doc_id tiebreak, so the top-k
selection is deterministic too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table_spread as load_table
from feature_store_test_spark.registry import register


# ---------------------------------------------------------------------------
# Q133 — bigram-LM quality scoring. Corpus pass 1 trains the model
# (bigram counts; unigram counts fold from them); pass 2 re-derives each
# doc's bigrams and scores them against the broadcast model. n_rare
# (corpus-hapax bigrams) is the CCNet "surprising text" signal; the
# pred_frac ratio is exact: numerator/denominator are bigints and the
# denominator (bigrams per doc < 128) cannot make the quotient terminate
# at exactly 7 decimals, so the 6-dp round never sits on a HALF_UP tie.
# ---------------------------------------------------------------------------
@register(
    "q133_bigram_lm_quality",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    big AS (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
    ),
    bg AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM big GROUP BY w1, w2
    ),
    uni AS (
      SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM bg GROUP BY w1
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN bg.c2 * 10 >= uni.c1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_predictable,
           CAST(SUM(CASE WHEN bg.c2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
           ROUND(CAST(SUM(CASE WHEN bg.c2 * 10 >= uni.c1 THEN 1 ELSE 0 END) AS BIGINT)
                 / COUNT(*), 6) AS pred_frac
    FROM big b JOIN bg USING (w1, w2) JOIN uni USING (w1)
    GROUP BY b.doc_id
    """,
    doc="bigram-LM quality filter: corpus-trained transition model, per-doc predictability",
    tags=("text", "lm", "join", "agg"),
)
def q133_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: ``big`` (the per-doc bigram explode) is scanned twice
    — once to train, once to score. Both model tables are vocab-bounded
    so they broadcast; the only corpus-sized shuffles are the training
    groupBy and the per-doc re-aggregation on doc_id."""
    docs = load_table(spark, "documents", sf_dir)
    w = docs.select("doc_id", F.split("text", " ").alias("ws"))
    big = w.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("ws") - 1)).alias("i"),
        "ws",
    ).select(
        "doc_id",
        F.expr("element_at(ws, i)").alias("w1"),
        F.expr("element_at(ws, i + 1)").alias("w2"),
    )
    bg = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    uni = bg.groupBy("w1").agg(F.sum("c2").alias("c1"))
    pred = F.when(F.col("c2") * 10 >= F.col("c1"), 1).otherwise(0)
    return (
        big.join(F.broadcast(bg), ["w1", "w2"])
        .join(F.broadcast(uni), "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(pred).alias("n_predictable"),
            F.sum(F.when(F.col("c2") == 1, 1).otherwise(0)).alias("n_rare"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_predictable",
            "n_rare",
            F.round(F.col("n_predictable") / F.col("n_bigrams"), 6).alias("pred_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Q134 — BM25 retrieval (k1=1.2, b=0.75) for a fixed conjunctive-ish
# query {hash, scan, merge}: score = Σ_t idf_t · tf·(k1+1) /
# (tf + k1·(1−b+b·dl/avgdl)), idf_t = ln((N−df_t+0.5)/(df_t+0.5)+1).
# The scoring arithmetic is ONE shared SQL text evaluated by both
# engines so the doubles agree bit-for-bit up to ln's last ulp.
# ---------------------------------------------------------------------------
_BM25_TERMS = ("hash", "scan", "merge")


def _bm25_term_sql(tf: str, df: str) -> str:
    return (
        f"ln((CAST(n_docs AS DOUBLE) - {df} + 0.5) / ({df} + 0.5) + 1.0)"
        f" * ({tf} * 2.2) / ({tf} + 1.2 * (0.25 + 0.75 * dl / avgdl))"
    )


_BM25_SCORE_SQL = " + ".join(
    _bm25_term_sql(f"tf_{t}", f"df_{t}") for t in _BM25_TERMS
)


@register(
    "q134_bm25_search",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS dl,
             {", ".join(
                 f"CAST(len(list_filter(string_split(text, ' '), w -> w = '{t}')) AS INT) AS tf_{t}"
                 for t in _BM25_TERMS
             )}
      FROM documents
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
             {", ".join(
                 f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
                 for t in _BM25_TERMS
             )}
      FROM t
    )
    SELECT doc_id, CAST(dl AS INT) AS dl,
           {", ".join(f"tf_{t}" for t in _BM25_TERMS)},
           ROUND({_BM25_SCORE_SQL}, 6) AS bm25
    FROM t, s
    WHERE tf_hash + tf_scan + tf_merge > 0
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
    doc="BM25 top-20 keyword retrieval (corpus stats broadcast, rounded-score tiebroken top-k)",
    tags=("text", "retrieval", "topk"),
)
def q134_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: scan 1 reduces to ONE row of corpus statistics
    (broadcast back via crossJoin); scan 2 is a pure map computing term
    frequencies + score; the only shuffle is the top-k (TakeOrdered —
    per-partition heads, no full sort)."""
    docs = load_table(spark, "documents", sf_dir)
    t = docs.select(
        "doc_id",
        F.expr("size(split(text, ' '))").alias("dl"),
        *[
            F.expr(f"size(filter(split(text, ' '), w -> w = '{term}'))").alias(
                f"tf_{term}"
            )
            for term in _BM25_TERMS
        ],
    )
    stats = t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("CAST(SUM(dl) AS DOUBLE) / COUNT(*)").alias("avgdl"),
        *[
            F.expr(f"CAST(SUM(CASE WHEN tf_{term} > 0 THEN 1 ELSE 0 END) AS BIGINT)").alias(
                f"df_{term}"
            )
            for term in _BM25_TERMS
        ],
    )
    return (
        t.crossJoin(F.broadcast(stats))
        .where(F.expr(" + ".join(f"tf_{t}" for t in _BM25_TERMS)) > 0)
        .select(
            "doc_id",
            "dl",
            *[f"tf_{t}" for t in _BM25_TERMS],
            F.round(F.expr(_BM25_SCORE_SQL), 6).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q144 — late-interaction (MaxSim) retrieval over multi-vector documents.
# The ColBERT-style scorer: a document is a BAG of token vectors, a query
# scores as sum over its token vectors of the MAX dot product against any
# document token — far finer-grained than single-vector cosine, and the
# modern dense-retrieval rerank shape. The fixture's 64-dim embeddings are
# declared as 8 token vectors x 8 dims (the multi-vector layout is the
# semantics under test; a real encoder would emit the tokens directly).
#
# Plan: the bounded query set (2 vectors) broadcasts over one corpus scan;
# the 8x8 dot-product/max/sum lattice is ONE generated codegen expression
# (no explode — the token fan-out never materializes rows); a 2-partition
# window takes top-10 per query. Linear scan per query at any corpus
# size, embarrassingly parallel.
#
# Cross-engine exactness: both dialects are generated from the same
# lattice with left-associated dot products and pairwise-nested greatest/
# additions, all over float->double widened elements — identical IEEE op
# sequence, identical bits, raw-double ORDER BY with vec_id tiebreak.
# ---------------------------------------------------------------------------
_MS_TOK, _MS_DIM = 8, 8
_MS_TOPK = 10
_MS_NQ = 2


def _maxsim_expr(qcol: str, dcol: str, idx) -> str:
    """MaxSim score expression; ``idx(col, k)`` renders 1-based element
    access in the target dialect (shared lattice -> identical IEEE ops)."""

    def dot(qt: int, dt: int) -> str:
        terms = [
            f"(CAST({idx(qcol, qt * _MS_DIM + k + 1)} AS DOUBLE) * "
            f"CAST({idx(dcol, dt * _MS_DIM + k + 1)} AS DOUBLE))"
            for k in range(_MS_DIM)
        ]
        e = terms[0]
        for t in terms[1:]:
            e = f"({e} + {t})"
        return e

    maxes = [
        "greatest(" + ", ".join(dot(qt, dt) for dt in range(_MS_TOK)) + ")"
        for qt in range(_MS_TOK)
    ]
    e = maxes[0]
    for m in maxes[1:]:
        e = f"({e} + {m})"
    return e


@register(
    "q144_maxsim_retrieval",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS qe
      FROM embeddings WHERE vec_id < {_MS_NQ}
    ),
    scored AS (
      SELECT q.q_id, d.vec_id,
             {_maxsim_expr("qe", "embedding", lambda c, k: f"{c}[{k}]")} AS score
      FROM embeddings d JOIN q ON d.vec_id <> q.q_id
    ),
    ranked AS (
      SELECT q_id, vec_id, score,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY score DESC, vec_id) AS rank
      FROM scored
    )
    SELECT q_id, vec_id, score, rank FROM ranked WHERE rank <= {_MS_TOPK}
    """,
    doc="ColBERT-style MaxSim late-interaction top-k over 8x8-dim multi-vector embeddings",
    tags=("similarity", "retrieval", "maxsim"),
)
def q144_maxsim_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.where(F.col("vec_id") < _MS_NQ).selectExpr(
        "vec_id AS q_id", "embedding AS qe"
    )
    score = _maxsim_expr("qe", "embedding", lambda c, k: f"element_at({c}, {k})")
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .selectExpr("q_id", "vec_id", f"{score} AS score")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _MS_TOPK)
        .select("q_id", "vec_id", "score", "rank")
    )
