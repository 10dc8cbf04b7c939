"""Table profiling: the one-pass column-statistics sweep every ingest
pipeline runs before trusting a new drop of data.

q148 profiles every lineitem column — row count, null count, exact
distinct count — in ONE Spark aggregation (2 expressions per column in a
single HashAggregate; Spark plans multi-distinct via expand, still one
scan of the parquet), then unpivots to the long (column, metric) form a
quality dashboard consumes. Counts only, deliberately: min/max/mean
would need cross-engine STRING formatting of doubles and timestamps to
share one column, which is exactly the value-rendering divergence the
oracle discipline avoids. The declared scale swap for the distinct
counts is approx_count_distinct (q37's HLL family) with the same
downstream shape.

Both the Spark aggregation and the DuckDB oracle are generated from the
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
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack}) AS (column_name, __nn, __nd)",
    ).selectExpr(
        "column_name",
        "n_rows",
        "n_rows - __nn AS n_null",
        "__nd AS n_distinct",
    )
