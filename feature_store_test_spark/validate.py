"""Declarative data-quality validation (training-data pipeline stage).

Rules are named SQL predicates evaluated in ONE scan: each rule becomes a
conditional count (no per-rule passes, no Python). ``check`` returns the
violation report; ``quarantine`` splits a DataFrame into (clean, violating)
— the batch twin of the streaming pipeline's validate→DLQ stage
(streaming/inference.py), which uses the same predicate form.

Scale: one pass + a tiny agg; quarantine is two filtered scans sharing the
cached input (or one pass with a marker column when the caller prefers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """One row per rule: (rule, n_violations, violation_rate).

    ``rules``: name -> SQL predicate that GOOD rows satisfy; NULL predicate
    results count as violations (SQL three-valued logic is not a pass).
    """
    total = F.count(F.lit(1))
    aggs = [
        F.sum(
            F.when(~F.coalesce(F.expr(pred), F.lit(False)), 1).otherwise(0)
        ).alias(name)
        for name, pred in rules.items()
    ]
    wide = df.agg(total.alias("__n"), *aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(name).cast("long").alias("n_violations"),
            )
            for name in rules
        ]
    )
    return wide.select(F.col("__n"), F.explode(entries).alias("e")).select(
        F.col("e.rule").alias("rule"),
        F.col("e.n_violations").alias("n_violations"),
        F.round(F.col("e.n_violations") / F.col("__n"), 6).alias("violation_rate"),
    )


def quarantine(df: DataFrame, rules: dict[str, str]) -> tuple[DataFrame, DataFrame]:
    """(clean, violating): rows failing ANY rule are quarantined."""
    combined = " AND ".join(f"coalesce({p}, false)" for p in rules.values())
    clean = df.where(F.expr(combined))
    bad = df.where(~F.expr(combined))
    return clean, bad
