"""Corpus-trained BPE tokenization queries (q150, q151).

The DuckDB oracle REPLAYS BPE TRAINING ITSELF via a recursive CTE — the
working table is the per-word segmentation state; each iteration computes
weighted adjacent-pair counts over it, picks the deterministic best pair
(count DESC, pair lexicographic ASC), and rewrites every word with one
greedy left-to-right merge pass (a list_reduce lambda). The Spark side
trains the identical loop in the driver on the distributedly-counted vocab
table (operators/bpe.py). Hash-equality of the two merge tables (q150) is
therefore a full end-to-end training-parity check, and q151 checks the
applied segmentation on every document.

Scale: the only corpus-sized work on either side of the Spark plan is the
word-count shuffle (map-side combinable, vocab-bounded output) and the
final explode ⋈ broadcast(segmentation) count — no Python in the
per-document path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table_spread as load_table
from feature_store_test_spark.data import local_rows_df
from feature_store_test_spark.operators import bpe
from feature_store_test_spark.registry import register

_N_MERGES = bpe.DEFAULT_N_MERGES

# Shared recursive-training prefix. State row = (iter, word, cnt, toks,
# mpa, mpb) where (mpa, mpb) is the merge applied to produce this state.
# The best-pair subquery aggregates over the WORKING TABLE (the previous
# iteration's rows only — standard recursive-CTE semantics, verified on
# DuckDB 1.0); an empty subquery result (no pairs remain) terminates the
# recursion, matching train_bpe's early stop.
_BPE_CTE = f"""
WITH RECURSIVE
vocab AS (
  SELECT w AS word, COUNT(*)::BIGINT AS cnt
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        FROM documents)
  GROUP BY 1
),
bpe(iter, word, cnt, toks, mpa, mpb) AS (
  SELECT 0, word, cnt,
         list_transform(range(1, len(word)+1), i -> word[i]),
         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
  FROM vocab
  UNION ALL
  SELECT iter+1, word, cnt,
    list_reduce(
      list_transform(toks, x -> [x]),
      (acc, x) -> CASE WHEN acc[-1] = best.pa AND x[1] = best.pb
                  THEN list_slice(acc, 1, len(acc)-1) || [best.pa || best.pb]
                  ELSE acc || x END),
    best.pa, best.pb
  FROM bpe,
    (SELECT pa, pb FROM (
       SELECT p[1] AS pa, p[2] AS pb, SUM(cnt) AS c
       FROM (SELECT cnt,
                    unnest(list_zip(list_slice(toks, 1, len(toks)-1),
                                    list_slice(toks, 2, len(toks)))) AS p
             FROM bpe)
       GROUP BY 1, 2 ORDER BY c DESC, pa, pb LIMIT 1)) AS best(pa, pb)
  WHERE iter < {_N_MERGES}
)
"""


# ---------------------------------------------------------------------------
# Q150 — the trained merge table itself: (rank, pa, pb, merged). Spark trains
# in the driver on the distributed word count; DuckDB trains in the
# recursive CTE; the hash compare proves the two training loops are the
# same algorithm.
# ---------------------------------------------------------------------------
@register(
    "q150_bpe_train",
    oracle=_BPE_CTE
    + """
    SELECT DISTINCT iter::BIGINT AS rank, mpa AS pa, mpb AS pb,
           mpa || mpb AS merged
    FROM bpe WHERE iter > 0
    ORDER BY rank
    """,
    doc="corpus-trained BPE merge table (training parity vs recursive-SQL replay)",
    tags=("text", "tokenize", "bpe", "train"),
)
def q150_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = bpe.trained_bpe(spark, sf_dir, _N_MERGES)
    rows = [(i + 1, a, b, a + b) for i, (a, b) in enumerate(merges)]
    out = local_rows_df(
        spark, rows, "rank long, pa string, pb string, merged string"
    )
    return out.coalesce(1).sortWithinPartitions("rank")


# ---------------------------------------------------------------------------
# Q151 — per-document BPE token counts under the trained merges. The
# corpus-sized Spark work is explode(words) ⋈ broadcast(word → n_subtokens)
# — training's final state already segments every corpus word, so encoding
# is a join, not a UDF.
# ---------------------------------------------------------------------------
@register(
    "q151_bpe_token_counts",
    oracle=_BPE_CTE
    + """
    , final AS (
        SELECT word, len(toks)::BIGINT AS n_sub
        FROM bpe WHERE iter = (SELECT MAX(iter) FROM bpe)
    ),
    docw AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        FROM documents
    )
    SELECT doc_id, COUNT(*)::BIGINT AS n_words,
           SUM(f.n_sub)::BIGINT AS n_bpe_tokens
    FROM docw JOIN final f ON w = f.word
    GROUP BY doc_id ORDER BY doc_id
    """,
    doc="per-document BPE token counts via broadcast of the trained segmentation",
    tags=("text", "tokenize", "bpe", "agg", "join"),
)
def q151_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, seg = bpe.trained_bpe(spark, sf_dir, _N_MERGES)
    seg_rows = [(w, len(t)) for w, t in sorted(seg.items())]
    seg_df = local_rows_df(spark, seg_rows, "word string, n_sub long")
    docs = load_table(spark, "documents", sf_dir)
    # No rounded toks_per_word ratio column: Spark's ROUND(double, 6)
    # (HALF_UP on the shortest-decimal string) and DuckDB's (scaled-binary)
    # can diverge at the 6th decimal on tie-adjacent ratios — above the
    # harness's 9-dp normalization (r7 ADVICE). The exact integer pair
    # (n_bpe_tokens, n_words) carries the same information. No trailing
    # presentation sort either: per-document output grows with the corpus
    # (q106/q88 precedent; the harness sorts rows itself before hashing).
    return (
        bpe.corpus_words(docs)
        .join(F.broadcast(seg_df), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_bpe_tokens"),
        )
    )
