"""Text-analysis queries over ``documents`` (north-star operators).

All expressions are JVM-side Column functions from operators/text.py —
no Python UDFs — each mirrored exactly by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table
from feature_store_test_spark.operators import text as Tx
from feature_store_test_spark.registry import register


# ---------------------------------------------------------------------------
# Q23 — per-document token statistics (token counting + lexical diversity).
# avg_token_len is computed arithmetically from char counts (single-space
# separation invariant) — no explode, pure scan-side math.
# ---------------------------------------------------------------------------
@register(
    "q23_text_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
           ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS ttr,
           ROUND((CAST(LENGTH(text) AS DOUBLE) - (len(string_split(text, ' ')) - 1))
                 / len(string_split(text, ' ')), 6) AS avg_token_len,
           n_chars = LENGTH(text) AS n_chars_ok
    FROM documents
    """,
    doc="per-doc token count, distinct tokens, type-token ratio, mean token length",
    tags=("text", "scalar"),
)
def q23_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        Tx.n_tokens("text").alias("n_tokens"),
        Tx.n_unique_tokens("text").alias("n_unique_tokens"),
        Tx.type_token_ratio("text").alias("ttr"),
        Tx.avg_token_len("text").alias("avg_token_len"),
        (F.col("n_chars") == F.length("text")).alias("n_chars_ok"),
    )


# ---------------------------------------------------------------------------
# Q24 — marker-based language-id vs the labeled lang: confusion-matrix
# counts. The marker heuristic is deterministic (argmax with alphabetical
# tiebreak); accuracy on the synthetic corpus is irrelevant — the declared
# semantic is the heuristic itself.
# ---------------------------------------------------------------------------
@register(
    "q24_lang_id_confusion",
    oracle="""
    WITH scored AS (
      SELECT lang,
             len(list_filter(string_split(text,' '), w -> w IN ('the','a','fast'))) AS c_en,
             len(list_filter(string_split(text,' '), w -> w IN ('data','table','row'))) AS c_es,
             len(list_filter(string_split(text,' '), w -> w IN ('join','group','sort'))) AS c_de
      FROM documents
    )
    SELECT lang,
           CASE WHEN c_de >= GREATEST(c_en, c_es) THEN 'de'
                WHEN c_en >= c_es THEN 'en'
                ELSE 'es' END AS predicted_lang,
           COUNT(*) AS n_docs
    FROM scored
    GROUP BY 1, 2
    """,
    doc="language-id heuristic confusion matrix (marker stopword argmax)",
    tags=("text", "agg"),
)
def q24_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select("lang", Tx.predicted_lang("text").alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Q25 — composite quality score + per-source aggregation: the filter stage
# of a training-data pipeline (score → threshold → per-source yield).
# ---------------------------------------------------------------------------
@register(
    "q25_quality_score",
    oracle="""
    WITH q AS (
      SELECT source,
             ROUND(
               0.5 * LEAST(len(string_split(text,' ')) / 50.0, 1.0)
             + 0.5 * (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
                      / len(string_split(text,' ')))
             - 0.25 * ROUND(CAST(len(list_filter(string_split(text,' '),
                        w -> w IN ('the','a','fast','data','table','row','join','group','sort')))
                        AS DOUBLE) / len(string_split(text,' ')), 6)
             , 6) AS quality
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           SUM(CASE WHEN quality >= 0.6 THEN 1 ELSE 0 END) AS n_good,
           ROUND(AVG(quality), 6) AS avg_quality
    FROM q GROUP BY source
    """,
    doc="per-source document quality yield (length/diversity/stopword composite)",
    tags=("text", "agg"),
)
def q25_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    q = docs.select("source", Tx.quality_score("text").alias("quality"))
    return q.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("quality") >= 0.6, 1).otherwise(0)).alias("n_good"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


# ---------------------------------------------------------------------------
# Q26 — BPE-ish regexp token counts aggregated per lang.
# ---------------------------------------------------------------------------
@register(
    "q26_token_counts",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS total_tokens,
           ROUND(CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_tokens_per_doc
    FROM documents
    GROUP BY lang
    """,
    doc="regexp (BPE-ish) token counting aggregated by language",
    tags=("text", "agg"),
)
def q26_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tc = Tx.bpe_ish_token_count("text")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tc).alias("total_tokens"),
        F.round(F.sum(tc).cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_tokens_per_doc"
        ),
    )


# ---------------------------------------------------------------------------
# Q27 — document fingerprinting: full-content md5, head-8-word rolling key,
# and a compact 16-hex prefix — the join keys of every dedup stage.
# ---------------------------------------------------------------------------
@register(
    "q27_doc_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(text) AS fp_md5,
           substr(md5(text), 1, 16) AS fp_short,
           md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fp_head8
    FROM documents
    """,
    doc="content / short / head-8-word md5 fingerprints per document",
    tags=("text", "dedup"),
)
def q27_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        Tx.fingerprint("text").alias("fp_md5"),
        F.substring(Tx.fingerprint("text"), 1, 16).alias("fp_short"),
        Tx.prefix_fingerprint("text", 8).alias("fp_head8"),
    )
