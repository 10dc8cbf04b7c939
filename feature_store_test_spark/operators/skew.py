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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join: salt-replicate the small side, salt the big side.

    Each big-side row gets a random salt in [0, n_salt); the small side is
    replicated n_salt times (one copy per salt value); the join runs on
    (key, salt). A hot key's rows therefore spread over n_salt tasks
    instead of landing in one straggler partition. The join RESULT is
    independent of the salt assignment — every big row still meets exactly
    one copy of its matching small rows — so the operator is deterministic
    and oracle-checkable even though the salt is random.

    Cost: small side shuffled n_salt× (use AFTER ruling out broadcast —
    broadcast is strictly better when the small side fits; this is for the
    mid-size dimension × skewed fact case). AQE's skew-join split is the
    automatic alternative; this form works even when AQE is off or the
    skew is in a single key that AQE's quantile stats miss.

    ``how`` supports inner/left joins (semantics preserved per big row).
    """
    salted_big = big.withColumn("__salt_b", (F.rand(seed=42) * n_salt).cast("int"))
    replicated = small.withColumn(
        "__salt_s", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    cond = (F.col(big_key) == F.col(small_key)) & (
        F.col("__salt_b") == F.col("__salt_s")
    )
    return salted_big.join(replicated, cond, how).drop("__salt_b", "__salt_s")


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
