"""Text-analysis queries over ``documents`` (north-star operators).

All expressions are JVM-side Column functions from operators/text.py —
no Python UDFs — each mirrored exactly by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table_spread as load_table
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
           CAST(SUM(CASE WHEN quality >= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
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
           CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS BIGINT) AS total_tokens,
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


# ---------------------------------------------------------------------------
# Q101 — distinctive terms per document: rank each doc's terms by tf/df
# (term frequency over document frequency — the idf-free TF-IDF core; both
# engines divide the same exact integers, and IEEE double division is
# bit-identical, so the ranking needs no rounding discipline). Plan: one
# explode -> (doc,term) count [shuffle on (doc,term)], vocabulary df from
# that same frame [shuffle on term, tiny output], df BROADCAST back onto
# tf (vocabulary ~ millions of terms fits executors at 100 TB corpus
# scale; web-scale vocab would switch to a sort-merge join on term), then
# a per-doc ranking window. The doc text itself never shuffles — only
# (doc_id, term, counts) rows do.
# ---------------------------------------------------------------------------
@register(
    "q101_distinctive_terms",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM tokens WHERE term <> '' GROUP BY 1, 2
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    )
    SELECT doc_id, term, tf, df
    FROM tf JOIN df USING (term)
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY tf * 1.0 / df DESC, term
    ) <= 3
    ORDER BY doc_id, term
    """,
    doc="top-3 distinctive terms per doc by tf/df ratio (TF-IDF core)",
    tags=("text", "tfidf", "window", "agg", "join"),
)
def q101_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    tokens = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    # One exchange serves both the tf aggregation and the per-doc ranking
    # window: hash partitioning on doc_id alone satisfies the (doc_id,
    # term) clustering requirement, and the window's doc_id requirement,
    # so EnsureRequirements inserts no further shuffle. Shuffle volume is
    # ~the raw token stream either way (terms are mostly unique per doc,
    # so the map-side combine the plain groupBy would get saves little).
    tokens = tokens.repartition(F.col("doc_id"))
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf") * 1.0 / F.col("df")).desc(), "term"
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df")
        .orderBy("doc_id", "term")
    )


# ---------------------------------------------------------------------------
# Q117 — the curation funnel composed end-to-end in ONE declared plan:
# quality-gate (q25's composite >= 0.6) → exact dedup keep-first within
# the survivors (q20's head-5 fingerprint, min doc_id wins) → per-language
# yield report with stage-by-stage counts. This is the shape of a real
# pretraining curation job; Catalyst fuses the whole funnel into two
# aggregations (fingerprint reduce, language report) over one scan —
# composition costs no extra passes.
# ---------------------------------------------------------------------------
@register(
    "q117_curation_funnel",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, n_chars,
             md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS fp,
             ROUND(
               0.5 * LEAST(len(string_split(text,' ')) / 50.0, 1.0)
             + 0.5 * (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
                      / len(string_split(text,' ')))
             - 0.25 * ROUND(CAST(len(list_filter(string_split(text,' '),
                        w -> w IN ('the','a','fast','data','table','row','join','group','sort')))
                        AS DOUBLE) / len(string_split(text,' ')), 6)
             , 6) AS quality
      FROM documents
    ),
    gated AS (SELECT * FROM scored WHERE quality >= 0.6),
    kept AS (
      SELECT fp, MIN(doc_id) AS keep_id FROM gated GROUP BY fp
    ),
    keepers AS (
      SELECT g.lang, g.n_chars
      FROM gated g JOIN kept k ON g.doc_id = k.keep_id
    )
    SELECT lang,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept
    FROM keepers
    GROUP BY lang
    """,
    doc="curation funnel: quality gate -> exact dedup keep-first -> per-lang yield",
    tags=("text", "dedup", "pipeline", "funnel"),
)
def q117_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    scored = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        Tx.prefix_fingerprint("text", 5).alias("fp"),
        Tx.quality_score("text").alias("quality"),
    )
    gated = scored.where(F.col("quality") >= 0.6)
    kept = gated.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    keepers = gated.join(kept, gated.doc_id == kept.keep_id, "left_semi")
    return keepers.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("bigint").alias("chars_kept"),
    )
