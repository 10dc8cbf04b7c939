"""Deduplication operators (north-star: exact, MinHash+LSH, SimHash, Jaccard).

Design for 100 TB:
- Exact dedup: hash-groupBy on a fingerprint column — one shuffle of
  (fingerprint, doc_id), never of document bodies.
- MinHash+LSH: shingle → k minhashes → b bands → bucket self-join. The
  self-join happens on *band buckets*, so candidate generation is linear in
  bucket sizes instead of O(n²); verification runs only on candidate pairs.
- All hashing is md5-based (seeded by concatenation) so signatures are
  deterministic and identical across engines — minhash takes the
  lexicographic MIN of hex digests, which is order-free and
  shuffle-insensitive.

SimHash lives in operators/text-adjacent query code: a 16-dimension
nibble-simhash over md5 digests (each hex position contributes ±1 weighted
votes), chosen because it is bit-exactly reproducible in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, out: str = "shingle"
) -> DataFrame:
    """Distinct n-word shingles per document: (id_col, shingle) rows.

    Declarative: split → transform(sequence) → array_distinct → explode.
    The explode multiplies rows ~doc_len×, but each output row is just
    (id, short string) — at 100 TB of documents this is the standard
    shingle-table materialization that every downstream dedup op shares.
    """
    words = F.split(F.col(text_col), " ")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(words, i + j + 1) for j in range(n)]),
    )
    return df.select(
        F.col(id_col), F.explode(F.array_distinct(shingles)).alias(out)
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str, shingle_col: str = "shingle", k: int = 8
) -> DataFrame:
    """k md5-seeded minhashes per doc: (id, seed, minhash-hex).

    min(md5(seed || '|' || shingle)) per (doc, seed): a permutation-free
    minhash family; lexicographic min over hex strings is deterministic.
    One shuffle on (id, seed) with map-side partial min.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("seed")
    return (
        shingles.select(F.col(id_col), F.col(shingle_col), seeds)
        .withColumn(
            "h",
            F.md5(F.concat_ws("|", F.col("seed").cast("string"), F.col(shingle_col))),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, k: int = 8, bands: int = 4
) -> DataFrame:
    """Band the k-signature into ``bands`` buckets and self-join buckets.

    Returns distinct (id_a, id_b) with id_a < id_b. Docs agreeing on ALL
    rows of any band (r = k/bands minhashes) become candidates:
    P(candidate) = 1 - (1 - J^r)^bands.
    """
    r = k // bands
    banded = (
        signatures.withColumn("band", (F.col("seed") / r).cast("int"))
        # In-band signature: minhashes in seed order, concatenated then hashed.
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("seed"), F.col("minhash")))
                        ),
                        lambda s: s["minhash"],
                    ),
                    "",
                )
            ).alias("bucket")
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard_verify(
    shingles: DataFrame,
    pairs: DataFrame,
    id_col: str,
    shingle_col: str = "shingle",
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard on candidate pairs: |A∩B| / (|A|+|B|-|A∩B|).

    Joins run only over candidate pairs (LSH output), so the quadratic
    verification cost is bounded by actual near-duplicates, not corpus size.
    """
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = shingles.select(F.col(id_col).alias("id_a"), F.col(shingle_col))
    sb = shingles.select(F.col(id_col).alias("id_b"), F.col(shingle_col))
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", shingle_col])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    za = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(za, "id_a")
        .join(zb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
