"""Fuzzy string matching: edit-distance near-duplicate detection.

The classic record-linkage / catalog-dedup primitive the exact and
shingle families can't express: two names that differ by a typo
(levenshtein distance <= d) are duplicates even when no shingle
survives. Both engines ship the same Wagner-Fischer ``levenshtein`` —
an integer, so the oracle comparison is exact by construction — with
one documented UNIT divergence: Spark computes edit distance over
UTF-8 CODEPOINTS, DuckDB over BYTES (measured: levenshtein('café',
'cafe') = 1 in Spark, 2 in DuckDB; pinned in
tests/test_fuzzy.py::test_levenshtein_unicode_unit_divergence). The
engine's declared semantics are Spark's codepoint distance — the
linguistically meaningful one; the DuckDB oracle hash-matches on the
ASCII fixtures and any ASCII corpus, and a non-ASCII catalog would
need a byte-encoded oracle column, not a Spark-side change. The
length-band blocking below measures length in CHARACTERS on both
sides, which bounds codepoint distance correctly.

Scale design (the similarity-join length-filter):
* collapse to DISTINCT names first (groupBy + count) — catalog name
  columns are vocabulary-bounded relative to row count, and every
  downstream cost is in vocabulary size, not corpus size;
* block candidate pairs by the PROVABLE length filter — levenshtein
  (a, b) <= d implies abs(len(a) - len(b)) <= d — realized as an
  equi-join: the left side explodes each name to the d+1 length keys
  [len, len+d], the right side joins on its own length. A pair with
  len_a < len_b meets exactly once (key = len_b); equal-length pairs
  meet in both orders and the name-order filter keeps one. Never an
  all-pairs cross join;
* the quadratic levenshtein itself runs only on length-compatible
  candidates inside one codegen'd filter.

Candidate-count contract (pinned by tests/test_fuzzy.py's dominant-
cluster test): with L(k) = distinct names of length k and d = _MAX_DIST,

    candidates = sum_k [ C(L(k), 2) + L(k) * (L(k+1) + ... + L(k+d)) ]

— quadratic only in per-length-band VOCABULARY. Row-level skew (30% of
all rows duplicating one name cluster) never reaches the join: the
distinct-collapse absorbs it first, and the length filter bounds
cross-band fan-out at d+1 bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table
from feature_store_test_spark.registry import register

_MAX_DIST = 2


# ---------------------------------------------------------------------------
# Q139 — fuzzy catalog dedup over part names: distinct-collapse, length-band
# blocked self-join, exact levenshtein verify. Reference parity: extends the
# exact-dedup family (SURVEY §2 north-star) with the typo-tolerant matcher a
# catalog ingest pipeline needs.
# ---------------------------------------------------------------------------
@register(
    "q139_fuzzy_name_match",
    oracle=f"""
    WITH d AS (
      SELECT p_name, COUNT(*) AS cnt FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist,
           a.cnt + b.cnt AS n_affected
    FROM d a JOIN d b
      ON (length(a.p_name) < length(b.p_name)
          AND length(b.p_name) <= length(a.p_name) + {_MAX_DIST})
      OR (length(a.p_name) = length(b.p_name) AND a.p_name < b.p_name)
    WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_DIST}
    """,
    doc="edit-distance fuzzy dedup of part names (length-band blocked)",
    tags=("dedup", "fuzzy", "join"),
)
def q139_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("cnt"))
    d = _MAX_DIST
    # left explodes to the band keys; right joins on its exact length
    left = names.selectExpr(
        "p_name AS name_a",
        "cnt AS cnt_a",
        "length(p_name) AS len_a",
        f"explode(sequence(length(p_name), length(p_name) + {d})) AS k",
    )
    right = names.selectExpr(
        "p_name AS name_b", "cnt AS cnt_b", "length(p_name) AS len_b"
    )
    return (
        left.join(right, left["k"] == right["len_b"])
        .where(f"len_a < len_b OR (len_a = len_b AND name_a < name_b)")
        .where(f"levenshtein(name_a, name_b) <= {d}")
        .selectExpr(
            "name_a",
            "name_b",
            "levenshtein(name_a, name_b) AS dist",
            "cnt_a + cnt_b AS n_affected",
        )
    )


# ---------------------------------------------------------------------------
# Q147 — entity resolution end-to-end: the operator COMPOSITION the fuzzy
# matcher exists for. q139's length-band levenshtein edges feed the same
# connected-components operator the document dedup family uses
# (operators/graph.py — iterative min-label propagation, lineage-
# truncated), and every catalog name resolves to its family's canonical
# (lexicographically smallest) name — typo chains A~B~C collapse into one
# entity even when lev(A, C) > d. The oracle replays the fixpoint with a
# recursive CTE over identically-defined edges (different algorithm, same
# unique answer — the labeling is engine-invariant). Scale: vocabulary-
# bounded like q139; the propagation shuffles (name, label) pairs only,
# O(family diameter) rounds.
# ---------------------------------------------------------------------------
@register(
    "q147_entity_resolution",
    oracle=f"""
    WITH RECURSIVE
    d AS (
      SELECT p_name, COUNT(*) AS cnt FROM part GROUP BY p_name
    ),
    edges AS (
      SELECT a.p_name AS s, b.p_name AS t
      FROM d a JOIN d b
        ON abs(length(a.p_name) - length(b.p_name)) <= {_MAX_DIST}
       AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_DIST}
    ),
    und AS (SELECT s, t FROM edges UNION SELECT t AS s, s AS t FROM edges),
    reach(src, dst) AS (
      SELECT p_name, p_name FROM d
      UNION
      SELECT r.src, u.t FROM reach r JOIN und u ON r.dst = u.s
    )
    SELECT r.src AS p_name, MIN(r.dst) AS canonical_name, MIN(d.cnt) AS n_rows
    FROM reach r JOIN d ON d.p_name = r.src
    GROUP BY r.src
    """,
    doc="entity resolution: levenshtein edges -> connected components -> canonical catalog name",
    tags=("dedup", "fuzzy", "graph", "iterative"),
)
def q147_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from feature_store_test_spark.operators.graph import connected_components

    part = load_table(spark, "part", sf_dir)
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("cnt"))
    # connected_components' monotone convergence check sums NUMERIC
    # labels; map names to order-preserving dense ids (min id <-> min
    # name, so the component id round-trips to the lexicographic
    # canonical). The global sort is over the collapsed VOCABULARY —
    # the same bounded frame every other stage here works on.
    ids = names.select(
        "p_name", F.row_number().over(Window.orderBy("p_name")).alias("nid")
    )
    d = _MAX_DIST
    left = ids.selectExpr(
        "p_name AS name_a",
        "nid AS nid_a",
        "length(p_name) AS len_a",
        f"explode(sequence(length(p_name), length(p_name) + {d})) AS k",
    )
    right = ids.selectExpr(
        "p_name AS name_b", "nid AS nid_b", "length(p_name) AS len_b"
    )
    edges = (
        left.join(right, left["k"] == right["len_b"])
        .where("len_a < len_b OR (len_a = len_b AND name_a < name_b)")
        .where(f"levenshtein(name_a, name_b) <= {d}")
        .select("nid_a", "nid_b")
    )
    cc = connected_components(edges, "nid_a", "nid_b")
    canon = ids.selectExpr("nid AS comp_nid", "p_name AS canonical_name")
    return (
        ids.join(cc, ids["nid"] == cc["node"], "left")
        .select("p_name", F.coalesce("component", F.col("nid")).alias("comp_nid"))
        .join(F.broadcast(canon), "comp_nid")
        .join(names, "p_name")
        .select("p_name", "canonical_name", F.col("cnt").alias("n_rows"))
    )
