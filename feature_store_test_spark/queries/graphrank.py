"""Graph centrality over an aggregated entity graph (trade PageRank).

The 100 TB graph-analytics shape: the expensive, data-sized work is
collapsing a fact table into a bounded entity graph (here: nation →
nation trade volume, |V| = 25, |E| ≤ 625 — a four-table join and one
aggregation over lineitem); the iterative solve then runs over
vocabulary-bounded DataFrames, five rounds of (join → groupBy) whose
shuffles carry at most |E| rows regardless of corpus size. This is the
same aggregate-then-iterate discipline as the dedup connected
components (operators/graph.py) — never iterate over the fact table.

Cross-engine exactness: edge weights are exact decimal sums cast to
double; the row-normalized transition weights and the five unrolled
rank updates are the same arithmetic text in both engines; per-node
inbound sums run over ≤25 doubles so accumulation-order drift stays at
the last-ulp level and the single 6-dp round on the final (irrational)
rank absorbs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from feature_store_test_spark.data import load_table_spread as load_table
from feature_store_test_spark.registry import managed_cache, register

_N_ITER = 5
_DAMPING = 0.85

# bounded-collect memo: nation count per (application id, sf_dir) — the
# dimension is static within a session/sf pair (same staleness contract as
# data._reader_cache, which already keys the underlying scan on file
# identity)
_node_count_memo: dict[tuple[str, str], float] = {}


def _pagerank_oracle() -> str:
    rounds = []
    prev = "r0"
    for k in range(1, _N_ITER + 1):
        rounds.append(
            f"""r{k} AS (
      SELECT nodes.nation, 0.15 / nn.n + 0.85 * COALESCE(m.s, 0.0) AS rank
      FROM nodes CROSS JOIN nn
      LEFT JOIN (
        SELECT p.dst AS nation, SUM({prev}.rank * p.p) AS s
        FROM {prev} JOIN p ON p.src = {prev}.nation
        GROUP BY p.dst
      ) m ON m.nation = nodes.nation
    )"""
        )
        prev = f"r{k}"
    rounds_sql = ",\n    ".join(rounds)
    return f"""
    WITH e AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS w
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY c.c_nationkey, s.s_nationkey
    ),
    p AS (
      SELECT src, dst, w / SUM(w) OVER (PARTITION BY src) AS p FROM e
    ),
    nodes AS (SELECT n_nationkey AS nation FROM nation),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT nation, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
    {rounds_sql}
    SELECT n.n_name AS nation, ROUND({prev}.rank, 6) AS pagerank
    FROM {prev} JOIN nation n ON n.n_nationkey = {prev}.nation
    """


# ---------------------------------------------------------------------------
# Q136 — weighted PageRank of the nation trade graph. Which nations sit
# at the center of the supply network when customers' purchase volume
# "votes" for supplier nations: rank flows along trade edges weighted by
# gross lineitem value, damping 0.85, 5 synchronous iterations from a
# uniform start (simplified PageRank: dangling mass is not recycled —
# declared semantics, identical in the oracle).
# ---------------------------------------------------------------------------
@register(
    "q136_trade_pagerank",
    oracle=_pagerank_oracle(),
    doc="weighted PageRank over the customer-nation -> supplier-nation trade graph",
    tags=("graph", "iterative", "join", "agg"),
)
def q136_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = load_table(spark, "nation", sf_dir)

    e = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("w")
        )
    )
    p = managed_cache(
        e.select(
            "src",
            "dst",
            (F.col("w") / F.sum("w").over(Window.partitionBy("src"))).alias("p"),
        )
    )
    nodes = nation.select(F.col("n_nationkey").alias("nation"))
    # |nodes| as a driver scalar (bounded by construction: the nation
    # dimension — same policy as the other bounded single-row collects):
    # the previous crossJoin(broadcast(nn)) PER ITERATION put a broadcast
    # build inside every round's dependency chain. Memoized per
    # (application id, sf_dir) — ADVICE r10: the eager count() otherwise
    # runs a scheduler job at EVERY plan construction.
    key = (spark.sparkContext.applicationId, sf_dir)
    n = _node_count_memo.get(key)
    if n is None:
        n = float(nodes.count())
        _node_count_memo[key] = n
    r = nodes.select("nation", (F.lit(1.0) / F.lit(n)).alias("rank"))
    # Iteration frames are vocabulary-bounded (≤|V| ranks, ≤|E|
    # transitions). ONE broadcast — the transition table p, reused by all
    # rounds (ReusedExchange) — keeps the rank⋈p join map-side; the tiny
    # per-round rank updates join SHUFFLE_HASH inside the main job
    # instead of each materializing its own broadcast-build job (round
    # 10: 9 jobs -> 3, interleaved min 2.284 -> 1.516, result parity
    # exact — every nested inbound broadcast was a scheduler job whose
    # chain serialized the rounds). Bounded tables shuffle pennies at
    # any corpus size, so the shape is scale-safe.
    for _ in range(_N_ITER):
        inbound = (
            r.join(F.broadcast(p), F.col("src") == F.col("nation"))
            .groupBy(F.col("dst").alias("in_nation"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("s"))
        )
        r = (
            nodes.join(
                inbound.hint("shuffle_hash"),
                F.col("in_nation") == F.col("nation"),
                "left",
            )
            .select(
                "nation",
                (
                    F.lit(0.15) / F.lit(n)
                    + F.lit(0.85) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return r.join(
        F.broadcast(nation), F.col("n_nationkey") == F.col("nation")
    ).select(F.col("n_name").alias("nation"), F.round("rank", 6).alias("pagerank"))
