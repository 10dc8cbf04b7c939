"""Table profiling: the column-statistics sweep every ingest pipeline
runs before trusting a new drop of data.

q148 profiles every lineitem column — row count, null count, exact
distinct count — as ONE job of per-column aggregation branches unioned
together. Round 10 replaced the single multi-distinct aggregation: Spark
plans N distinct groups via Expand, which multiplied every input row
x(N+1) through one task's hash aggregate and shuffled (gid, <all 16
columns, 15 of them NULL>) rows ~140 bytes wide — measured 3.08s at
sf0.1 with the whole expand+partial-agg serialized on the single-row-
group scan task. The union form gives each column its own two-level
aggregate: parquet prunes the scan to that one column, the partial
dedup/count happens map-side on single-column rows (guide §2.3: shuffle
narrow rows, not nulled-out wide ones), and the 16 branches run
CONCURRENTLY inside the one job — min 0.877s, output and job count
identical. At 100 TB the branches together read the same total bytes as
the one all-column scan (parquet is columnar), and each branch's shuffle
carries only its own distinct values. Counts only, deliberately:
min/max/mean would need cross-engine STRING formatting of doubles and
timestamps to share one column, which is exactly the value-rendering
divergence the oracle discipline avoids. The declared scale swap for the
distinct counts is approx_count_distinct (q37's HLL family) with the
same downstream shape.

Both the Spark branches and the DuckDB oracle are generated from the
same column list — the profiler can never drift from its own contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_store_test_spark.data import SCHEMAS, load_table
from feature_store_test_spark.registry import register

_PROFILE_TABLE = "lineitem"
_PROFILE_COLS = [f.name for f in SCHEMAS[_PROFILE_TABLE].fields]


def _oracle() -> str:
    parts = [
        f"""SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_null,
               COUNT(DISTINCT {c}) AS n_distinct
        FROM {_PROFILE_TABLE}"""
        for c in _PROFILE_COLS
    ]
    return "\nUNION ALL\n".join(parts)


@register(
    "q148_table_profile",
    oracle=_oracle(),
    doc=f"one-pass column profiler over {_PROFILE_TABLE}: rows / nulls / exact distinct per column",
    tags=("profiling", "agg", "quality"),
)
def q148_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, _PROFILE_TABLE, sf_dir)
    # one branch per column (module docstring): a SINGLE distinct per
    # aggregate plans as a plain two-level aggregate — no Expand — so
    # each branch shuffles only its own column's distinct values, and
    # the union evaluates every branch concurrently in one job
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count(c).alias("__nn"),
                F.countDistinct(c).alias("n_distinct"),
            ).select(
                F.lit(c).alias("column_name"),
                "n_rows",
                (F.col("n_rows") - F.col("__nn")).alias("n_null"),
                "n_distinct",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
