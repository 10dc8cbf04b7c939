"""Count-min heavy hitters (queries/sketches.py) + trade PageRank
(queries/graphrank.py) + SCD2 intervals (queries/analytics.py q137)
structural properties beyond the oracle hash check."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_test_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# q138 — count-min sketch
# ---------------------------------------------------------------------------


def test_heavy_hitters_match_exact_groupby(spark):
    got = {
        (r["w"], r["cnt"])
        for r in all_queries()["q138_heavy_hitters"].fn(spark, SF_DIR).collect()
    }
    from feature_store_test_spark.data import load_table_spread

    tok = load_table_spread(spark, "documents", SF_DIR).select(
        F.explode(F.split("text", " ")).alias("w")
    )
    n = tok.count()
    want = {
        (r["w"], r["count"])
        for r in tok.groupBy("w").count().where(F.col("count") * 30 >= n).collect()
    }
    assert got == want
    assert len(got) > 0  # the threshold actually selects something


def test_cms_candidates_superset_under_forced_collisions(spark):
    # width 8 forces every bucket to mix many words — estimates inflate,
    # candidates can only GROW, and the exact rerank must still land on
    # the true heavy hitters
    import feature_store_test_spark.queries.sketches as sk

    old_w = sk._WIDTH
    sk._WIDTH = 8
    try:
        got = {
            r["w"] for r in all_queries()["q138_heavy_hitters"].fn(spark, SF_DIR).collect()
        }
    finally:
        sk._WIDTH = old_w
    want = {
        r["w"] for r in all_queries()["q138_heavy_hitters"].fn(spark, SF_DIR).collect()
    }
    assert got == want


def test_sketch_is_fixed_size(spark):
    from feature_store_test_spark.data import load_table_spread
    import feature_store_test_spark.queries.sketches as sk

    docs = load_table_spread(spark, "documents", SF_DIR)
    tok = docs.select(F.explode(F.split("text", " ")).alias("w"))
    rows = (
        tok.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(seed).alias("seed"),
                            F.pmod(F.xxhash64("w", F.lit(seed)), F.lit(sk._WIDTH)).alias(
                                "bucket"
                            ),
                        )
                        for seed in range(sk._DEPTH)
                    ]
                )
            ).alias("sb")
        )
        .select("sb.seed", "sb.bucket")
        .groupBy("seed", "bucket")
        .count()
        .count()
    )
    assert rows <= sk._DEPTH * sk._WIDTH


# ---------------------------------------------------------------------------
# q136 — trade PageRank
# ---------------------------------------------------------------------------


def test_pagerank_distribution_properties(spark):
    rows = all_queries()["q136_trade_pagerank"].fn(spark, SF_DIR).collect()
    assert len(rows) == 25  # every nation ranked, even without inbound trade
    ranks = [r["pagerank"] for r in rows]
    # teleport floor: every node holds at least (1-d)/n
    assert all(r >= 0.15 / 25 - 1e-9 for r in ranks)
    # without dangling-mass recycling total mass can only leak, never grow
    assert sum(ranks) <= 1.0 + 1e-6


# ---------------------------------------------------------------------------
# q137 — SCD2 intervals
# ---------------------------------------------------------------------------


def test_scd2_intervals_tile_each_user_history(spark):
    rows = all_queries()["q137_scd2_intervals"].fn(spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: (r["valid_from"], r["event_id"]))
        # exactly one open (current) interval per user, and it is the last
        currents = [r for r in ivs if r["is_current"]]
        assert len(currents) == 1 and currents[0] is ivs[-1]
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]  # gap-free tiling
            assert a["event_type"] != b["event_type"]  # true change points
