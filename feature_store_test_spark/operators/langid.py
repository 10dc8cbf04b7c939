"""Cavnar-Trenkle trigram rank-distance language identification.

Factored train/classify halves of q157 (queries/text.py) so the batch
query and the streaming twin (streaming/langid.py) share ONE
implementation — the same split as operators/dedup.py vs
streaming/neardedup.py. All-integer (transcendental-free), pure SQL:
classification is a rank-distance join against a broadcast profile
table, no Python stages.

Reference parity: the reference has no text analysis at all; this is
north-star surface (BASELINE.json: text analysis / language ID).

Scale: training is one (lang, tri) count + per-lang top-K window —
profiles are |langs| x K rows (~hundreds), broadcast everywhere after.
Classification explodes each doc into its trigrams once, takes the
per-doc top-K, and joins the broadcast profiles — per-doc work bounded
by K, shuffles bounded by (doc, tri) distinct counts. 100x-probed
sub-linear as q157 (r9: 20.6x wall for 100x data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LANGID_K = 64


def trigram_rows(df: DataFrame, *carry_cols: str) -> DataFrame:
    """Explode ``text`` into lowercase character trigrams: one row per
    position, columns (*carry_cols, tri). Docs shorter than 3 chars are
    dropped (Spark's sequence(1, n) with n < 1 DESCENDS instead of
    returning empty — the q157 gate)."""
    carry = list(carry_cols)
    return (
        df.selectExpr(*carry, "lower(text) AS s")
        .where(F.length("s") >= 3)
        .selectExpr(*carry, "explode(sequence(1, length(s) - 2)) AS i", "s")
        .selectExpr(*carry, "substring(s, i, 3) AS tri")
    )


def doc_trigram_counts(
    docs: DataFrame, id_col: str = "doc_id", *carry_cols: str
) -> DataFrame:
    """One (id, *carry, tri, cnt) frame — the single trigram explode +
    count both halves of the pipeline can share (round 11): training
    needs per-(lang, tri) totals, classification needs per-(doc, tri)
    counts, and both are aggregations OF this frame. Callers that
    materialize it (managed_cache) pay the corpus explode ONCE instead
    of once per consumer; see q157 for the cost gate (the cache is a win
    only below a corpus-size crossover)."""
    tri = trigram_rows(docs, id_col, *carry_cols)
    return tri.groupBy(id_col, *carry_cols, "tri").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def train_trigram_profiles(
    docs: DataFrame,
    lang_col: str = "lang",
    k: int = LANGID_K,
    doc_tri_counts: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(profiles, langs) from a labeled corpus.

    profiles: (cand_lang, tri, rl) — each language's top-``k`` trigrams
    by frequency, rank ties broken on the trigram (engine-portable).
    langs: DISTINCT non-NULL labels — NULL is never a candidate (an
    unlabeled class is nothing to predict into; also load-bearing for
    cross-engine tie-break parity — Spark orders NULLS FIRST ascending,
    DuckDB NULLS LAST, so a NULL candidate in an exact distance tie
    would flip predictions between engines; code-review r9).

    ``doc_tri_counts``: optional shared (id, lang, tri, cnt) frame from
    ``doc_trigram_counts`` — per-(lang, tri) totals are the SUM of the
    per-doc counts (exact same integers), skipping a second corpus
    explode when the caller shares one."""
    wl = Window.partitionBy("cand_lang").orderBy(F.col("cnt").desc(), "tri")
    if doc_tri_counts is None:
        counts = trigram_rows(docs, lang_col).groupBy(
            F.col(lang_col).alias("cand_lang"), "tri"
        ).agg(F.count(F.lit(1)).alias("cnt"))
    else:
        counts = doc_tri_counts.groupBy(
            F.col(lang_col).alias("cand_lang"), "tri"
        ).agg(F.sum("cnt").alias("cnt"))
    profiles = counts.select(
        "cand_lang", "tri", F.row_number().over(wl).alias("rl")
    ).where(F.col("rl") <= k)
    langs = (
        docs.where(F.col(lang_col).isNotNull())
        .select(F.col(lang_col).alias("cand_lang"))
        .distinct()
    )
    return profiles, langs


def classify_trigrams(
    docs: DataFrame,
    profiles: DataFrame,
    langs: DataFrame,
    id_col: str = "doc_id",
    k: int = LANGID_K,
    carry_cols: list[str] | None = None,
    doc_tri_counts: DataFrame | None = None,
) -> DataFrame:
    """Predict each doc's language by minimum rank distance.

    Returns (id_col, *carry_cols, predicted_lang). Distance between a
    doc's top-``k`` trigram ranks and a language profile is
    SUM(|rd - rl|) with the out-of-profile penalty ``k`` (the
    Cavnar-Trenkle convention); ties break on cand_lang. ``profiles``
    and ``langs`` are broadcast — they are K x |langs| and |langs| rows.
    Docs with no trigrams (< 3 chars) are absent from the output, the
    same contract as the batch query. ``doc_tri_counts``: optional shared
    (id, *carry, tri, cnt) frame (see ``doc_trigram_counts``)."""
    carry = list(carry_cols or [])
    wd = Window.partitionBy(id_col).orderBy(F.col("cnt").desc(), "tri")
    counts = (
        trigram_rows(docs, id_col, *carry)
        .groupBy(id_col, *carry, "tri")
        .agg(F.count(F.lit(1)).alias("cnt"))
        if doc_tri_counts is None
        else doc_tri_counts
    )
    dp = counts.select(
        id_col, *carry, "tri", F.row_number().over(wd).alias("rd")
    ).where(F.col("rd") <= k)
    # Match-only distance algebra (round 10, guide §2.3 — shuffle fewer
    # rows): d(doc, lang) = Σ_tri [matched ? |rd−rl| : k]
    #                     = n_tris·k − Σ_matched (k − |rd−rl|),
    # exact in integers. The previous form crossJoined every doc-trigram
    # with every candidate language BEFORE the left join, so the distance
    # aggregation consumed |doc_tris| × |langs| rows; this one aggregates
    # only PROFILE MATCHES (a trigram joins just the languages whose
    # top-K contains it) plus one doc×lang dense frame of bounded width —
    # the |langs| multiplier is gone from the shuffled row count (exact
    # same predictions, A/B'd row-identical; sf0.1 min 1.72 -> 1.51).
    # gains groups (and joins back) on [id_col, cand_lang] ONLY: carry
    # columns are constant per id and ride the dense side — using them as
    # extra equi-join keys made them null-UNSAFE (ADVICE r10: a doc with a
    # NULL carry value would miss all its gains rows and collapse to the
    # alphabetically-first language). Dropping them from the gains shuffle
    # also narrows its rows (guide §2.3).
    gains = (
        dp.join(F.broadcast(profiles), "tri")
        .groupBy(id_col, "cand_lang")
        .agg(F.sum(F.lit(k) - F.abs(F.col("rd") - F.col("rl"))).alias("g"))
    )
    dense = (
        dp.groupBy(id_col, *carry)
        .agg(F.count(F.lit(1)).alias("__n"))
        .crossJoin(F.broadcast(langs))
    )
    dist = (
        dense.join(gains.hint("shuffle_hash"), [id_col, "cand_lang"], "left")
        .select(
            id_col,
            *carry,
            "cand_lang",
            (F.col("__n") * F.lit(k) - F.coalesce("g", F.lit(0))).alias("d"),
        )
    )
    wp = Window.partitionBy(id_col).orderBy("d", "cand_lang")
    return (
        dist.select(
            id_col,
            *carry,
            F.col("cand_lang").alias("predicted_lang"),
            F.row_number().over(wp).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
