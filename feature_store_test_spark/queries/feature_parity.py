"""Feature-store parity queries (SURVEY.md §2.4, §2.9, §2.10, §3).

The driver's ``events`` table stands in for the reference's purchases CSV:
user_id → customer_id, value → purchase_value, $.k of props → loyalty_score
(a second numeric measure, so the engineered output has the reference's full
6-column shape: key, event_time, latest/avg of two measures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from feature_store_test_spark.functions import dec_sum, json_number_field

from feature_store_test_spark.data import load_table
from feature_store_test_spark.engineering import engineer_features
from feature_store_test_spark.registry import register


def purchases_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → reference-shaped purchases (two numeric measures)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        F.col("event_id"),
        F.col("user_id").alias("customer_id"),
        F.col("ts").alias("purchase_timestamp"),
        F.col("value").alias("purchase_value"),
        json_number_field("props", "k").alias("loyalty_score"),
    )


# ---------------------------------------------------------------------------
# Q16 — engineer_features parity (§2.4 A1-A4; /root/reference/core/utils.py:167-230
# with Q1/Q2 fixed). One groupBy shuffle; latest via max_by over (ts, id).
# ---------------------------------------------------------------------------
@register(
    "q16_engineer_features",
    oracle="""
    WITH agg AS (
      SELECT user_id,
             MAX(ts) AS purchase_timestamp,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
               AS avg_purchase_value,
             ROUND(CAST(SUM(CAST(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS DOUBLE)
                   AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_loyalty_score
      FROM events GROUP BY user_id
    ),
    latest AS (
      SELECT user_id,
             value AS latest_purchase_value,
             CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS DOUBLE) AS latest_loyalty_score
      FROM events
      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT a.user_id AS customer_id, a.purchase_timestamp, l.latest_purchase_value,
           a.avg_purchase_value, a.avg_loyalty_score, l.latest_loyalty_score
    FROM agg a JOIN latest l USING (user_id)
    """,
    doc="reference engineer_features: 6-column per-key snapshot (Q1/Q2 fixed)",
    tags=("feature-store", "agg"),
)
def q16_engineer_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    purchases = purchases_from_events(spark, sf_dir)
    feats = engineer_features(
        purchases,
        key="customer_id",
        event_time="purchase_timestamp",
        value_cols=["purchase_value", "loyalty_score"],
        tiebreak="event_id",
    )
    return feats.select(
        "customer_id",
        "purchase_timestamp",
        "latest_purchase_value",
        "avg_purchase_value",
        "avg_loyalty_score",
        "latest_loyalty_score",
    )


# ---------------------------------------------------------------------------
# Q17 — the SQL training-dataset path (§2.1 S4, §3.2): Spark SQL over a
# registered feature view, projection + ORDER BY — the reference's Athena
# query (/root/reference/core/feature_store_manager.py:135-141) with
# Catalyst replacing Athena. Q3 semantics: full history, no dedup.
# ---------------------------------------------------------------------------
@register(
    "q17_training_dataset",
    oracle="""
    SELECT user_id AS customer_id,
           ts AS purchase_timestamp,
           value AS purchase_value,
           CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS DOUBLE) AS loyalty_score
    FROM events
    WHERE event_type IN ('purchase', 'click', 'view')
    ORDER BY customer_id, purchase_timestamp DESC
    """,
    doc="SQL path: full-history training projection with ORDER BY (Athena → spark.sql)",
    tags=("sql", "feature-store"),
)
def q17_training_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, "events", sf_dir).createOrReplaceTempView("events_v")
    return spark.sql(
        """
        SELECT user_id AS customer_id,
               ts AS purchase_timestamp,
               value AS purchase_value,
               CAST(get_json_object(props, '$.k') AS DOUBLE) AS loyalty_score
        FROM events_v
        WHERE event_type IN ('purchase', 'click', 'view')
        ORDER BY customer_id, purchase_timestamp DESC
        """
    )


# ---------------------------------------------------------------------------
# Q18 — the (old+new)/2 incremental-average chain (§2.4 A6, §2.13 Q4),
# computed in closed form: after events v_1..v_n (time order),
#   state = Σ v_i · w_i,  w_i = 2^-(n-i+1) for i ≥ 2, w_1 = 2^-(n-1).
# This is the batch oracle for the streaming upsert pipeline — the
# streaming foreachBatch MERGE must converge to exactly this state.
# Scale: one window pass (sequence numbers) + one groupBy; weights are
# exact powers of two so the fold is order-insensitive to fp error.
# ---------------------------------------------------------------------------
@register(
    "q18_incremental_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             COUNT(*)    OVER (PARTITION BY user_id) AS n
      FROM events
    )
    SELECT user_id,
           MAX(n) AS n_events,
           ROUND(SUM(value * CASE WHEN rn = 1 THEN POWER(2.0, -(n - 1))
                                  ELSE POWER(2.0, -(n - rn + 1)) END), 6)
             AS inc_avg_value
    FROM seq
    GROUP BY user_id
    """,
    doc="closed-form (old+new)/2 exponential average per key (streaming-state oracle)",
    tags=("feature-store", "window", "agg"),
)
def q18_incremental_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    seq = ev.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    weight = F.when(
        F.col("rn") == 1, F.pow(F.lit(2.0), -(F.col("n") - 1))
    ).otherwise(F.pow(F.lit(2.0), -(F.col("n") - F.col("rn") + 1)))
    return seq.groupBy("user_id").agg(
        F.max("n").alias("n_events"),
        F.round(F.sum(F.col("value") * weight), 6).alias("inc_avg_value"),
    )


# ---------------------------------------------------------------------------
# Q44 — the reference's record wire format (§1.1 "Record", §2.8 F3): every
# value serialized to strings as {FeatureName, ValueAsString} pairs
# (/root/reference/core/feature_store_manager.py:225-230, :269-274; parsed
# back at core/utils.py:145-164). The engine keeps native types end-to-end
# and strings ONLY at this explicit serving edge — emitted long-format so
# the shape is one (key, feature, value-string) row per feature.
# ---------------------------------------------------------------------------
@register(
    "q44_serving_records",
    oracle="""
    WITH latest AS (
      SELECT user_id, ts, value
      FROM events
      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT user_id AS customer_id, 'customer_id' AS feature_name,
           CAST(user_id AS VARCHAR) AS value_as_string FROM latest
    UNION ALL
    SELECT user_id, 'purchase_timestamp', strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') FROM latest
    UNION ALL
    SELECT user_id, 'latest_purchase_value', CAST(value AS VARCHAR) FROM latest
    """,
    doc="reference record serialization: stringly {FeatureName,ValueAsString} serving edge",
    tags=("feature-store", "serving", "scalar"),
)
def q44_serving_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from feature_store_test_spark.operators.latest import latest_per_key_agg

    ev = load_table(spark, "events", sf_dir)
    latest = latest_per_key_agg(
        ev.select("user_id", "ts", "value", "event_id"), "user_id", ["ts", "event_id"]
    )
    pairs = F.array(
        F.struct(
            F.lit("customer_id").alias("feature_name"),
            F.col("user_id").cast("string").alias("value_as_string"),
        ),
        F.struct(
            F.lit("purchase_timestamp").alias("feature_name"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias("value_as_string"),
        ),
        F.struct(
            F.lit("latest_purchase_value").alias("feature_name"),
            F.col("value").cast("string").alias("value_as_string"),
        ),
    )
    return latest.select(
        F.col("user_id").alias("customer_id"), F.explode(pairs).alias("r")
    ).select(
        "customer_id",
        F.col("r.feature_name").alias("feature_name"),
        F.col("r.value_as_string").alias("value_as_string"),
    )


# ---------------------------------------------------------------------------
# Q45 — the J1 enrichment lookup join in batch form
# (/root/reference/core/inference.py:89-126): each event joined to the
# latest stored state of its key; missing keys take the reference's
# defaults (avg := event value, loyalty := 0) via coalesce. Broadcast of
# the (small) latest-state side replaces 2 HTTPS round-trips per event.
# ---------------------------------------------------------------------------
@register(
    "q45_enrichment_join",
    oracle="""
    WITH state AS (
      SELECT user_id,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
               AS avg_value
      FROM events WHERE event_type <> 'purchase' GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.value AS latest_purchase_value,
           COALESCE(s.avg_value, e.value) AS avg_purchase_value,
           CASE WHEN s.user_id IS NULL THEN TRUE ELSE FALSE END AS used_defaults
    FROM (SELECT * FROM events WHERE event_type = 'purchase') e
    LEFT JOIN state s ON e.user_id = s.user_id
    """,
    doc="stream-to-store enrichment join with miss defaults (J1, batch form)",
    tags=("join", "feature-store", "broadcast"),
)
def q45_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    state = (
        ev.where(F.col("event_type") != "purchase")
        .groupBy("user_id")
        .agg(
            F.round(
                dec_sum("value", 2) / F.count(F.lit(1)),
                6,
            ).alias("avg_value")
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase")
    return (
        purchases.join(F.broadcast(state), "user_id", "left")
        .select(
            "event_id",
            "user_id",
            F.col("value").alias("latest_purchase_value"),
            F.coalesce("avg_value", "value").alias("avg_purchase_value"),
            F.col("avg_value").isNull().alias("used_defaults"),
        )
    )


# ---------------------------------------------------------------------------
# Q67 — data skipping on the versioned store: two append commits, a
# range-clustered rewrite (compact(cluster_by) = OPTIMIZE ZORDER analog),
# then a key-range read served through per-file min/max stats pruning.
# The oracle is the plain filter on the source table — skipping must be
# invisible to results while (as tests/test_store.py asserts) touching a
# fraction of the files. Scale: this is THE point-read story at 100 TB —
# file pruning happens against the commit log before Spark lists a single
# data file.
# ---------------------------------------------------------------------------
@register(
    "q67_store_skipping_read",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
    FROM orders
    WHERE o_custkey >= 100 AND o_custkey <= 120
    """,
    doc="clustered store rewrite + stats-pruned key-range read (Delta OPTIMIZE/skipping analog)",
    tags=("feature-store", "storage", "skipping"),
)
def q67_store_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from feature_store_test_spark.store.table import VersionedParquetTable

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    tbl = VersionedParquetTable(spark, tempfile.mkdtemp(prefix="fsts_q67_"), o.schema)
    tbl.append(o.where(F.col("o_orderkey") % 2 == 0))
    tbl.append(o.where(F.col("o_orderkey") % 2 == 1))
    tbl.compact(cluster_by=["o_custkey"], n_files=8)
    return tbl.read(
        where=[("o_custkey", ">=", 100), ("o_custkey", "<=", 120)]
    ).drop("_commit_version")
