"""Skew-aware aggregation: explicit two-stage salted groupBy.

AQE's skew-join splitting handles joins; for *aggregations* over heavily
skewed keys (one user with 10^9 events), pre-salting bounds any single
task's group size: stage 1 aggregates (key, salt) partials, stage 2 merges
partials per key. Correct for any algebraic aggregate expressed as
(partial, merge) pairs — here sum/count/min/max, which cover the engine's
money aggregates and averages.

At 100 TB this is the difference between one straggler task holding the
job and N_SALT parallel partials; the cost is a second (tiny) shuffle of
pre-aggregated rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation with a random salt on the first shuffle.

    ``aggs``: output name -> (merge_fn_name, partial_expr) where
    merge_fn_name is one of sum/min/max and partial_expr is the stage-1
    aggregate Column. Counts are sums of partial counts; averages are
    derived from merged sum+count by the caller (never averaged partials).
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salt).cast("int"))
    partials = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (_fn, expr) in aggs.items()]
    )
    merge = {"sum": F.sum, "min": F.min, "max": F.max}
    return partials.groupBy(*keys).agg(
        *[
            merge[fn](F.col(f"__p_{name}")).alias(name)
            for name, (fn, _expr) in aggs.items()
        ]
    )
