"""Sketch-accelerated exact analytics: count-min heavy hitters.

The companion pattern to the Bloom semi join (operators/bloomjoin.py):
compress a data-sized problem through a FIXED-size sketch whose errors
are one-sided, then make the final answer exact with a bounded rerank.

q138 finds corpus heavy-hitter tokens (frequency ≥ 1/30 of all token
occurrences) without ever shuffling the full token vocabulary:

1. build a count-min sketch — depth 3 × width 1024 counters — as ONE
   groupBy over (seed, bucket): ≤3072 rows out of any corpus size,
   map-side combined;
2. probe every token occurrence against the broadcast sketch (three
   broadcast hash joins + LEAST); CMS estimates only OVER-count, so
   every true heavy hitter survives the threshold test;
3. rerank: exact counts for the surviving candidate set only (CMS
   theory bounds it: at most 1/ε keys can have estimate ≥ εN, plus
   width-bounded collision inflation), then the exact threshold filter.

Steps 2+3 give exactly the true heavy-hitter set — the oracle is the
plain exact GROUP BY / HAVING. At this fixture's 31-word vocabulary the
sketch is overkill; at a real crawl's 10^8-token vocabulary the sketch
is what keeps the shuffle bounded (the full groupBy in the oracle form
shuffles every distinct token).

Threshold semantics are float-free (cnt·30 ≥ N integer cross-multiply);
the reported frequency is one bigint/bigint double division, identical
in both engines unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table_spread as load_table
from feature_store_test_spark.registry import managed_cache, register

_DEPTH = 3
_WIDTH = 1024


@register(
    "q138_heavy_hitters",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok)
    SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt,
           COUNT(*) / (SELECT CAST(n AS DOUBLE) FROM tot) AS freq
    FROM tok
    GROUP BY w
    HAVING COUNT(*) * 30 >= (SELECT n FROM tot)
    """,
    doc="exact heavy-hitter tokens via count-min sketch candidates + bounded rerank",
    tags=("sketch", "text", "agg"),
)
def q138_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(F.explode(F.split("text", " ")).alias("w"))
    tot = tok.agg(F.count(F.lit(1)).alias("n"))

    # 1. fixed-size sketch: one shuffle of ≤ DEPTH·WIDTH pre-combined rows
    sketch = managed_cache(
        tok.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(seed).alias("seed"),
                            F.pmod(F.xxhash64("w", F.lit(seed)), F.lit(_WIDTH)).alias(
                                "bucket"
                            ),
                        )
                        for seed in range(_DEPTH)
                    ]
                )
            ).alias("sb")
        )
        .select("sb.seed", "sb.bucket")
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    # 2. probe: map-side estimate per occurrence, distinct the survivors
    probe = tok.crossJoin(F.broadcast(tot))
    for seed in range(_DEPTH):
        s = F.broadcast(
            sketch.where(F.col("seed") == seed).select(
                F.col("bucket").alias(f"_cms_b{seed}"),
                F.col("c").alias(f"_cms_c{seed}"),
            )
        )
        probe = probe.join(
            s,
            F.pmod(F.xxhash64("w", F.lit(seed)), F.lit(_WIDTH))
            == F.col(f"_cms_b{seed}"),
        )
    est = F.least(*[F.col(f"_cms_c{seed}") for seed in range(_DEPTH)])
    candidates = managed_cache(
        probe.where(est * 30 >= F.col("n")).select("w").distinct()
    )

    # 3. exact rerank over the bounded candidate set only
    return (
        tok.join(F.broadcast(candidates), "w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("cnt") * 30 >= F.col("n"))
        .select("w", "cnt", (F.col("cnt") / F.col("n").cast("double")).alias("freq"))
    )
