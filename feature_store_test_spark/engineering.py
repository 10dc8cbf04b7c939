"""Reference-parity feature engineering.

Re-expresses ``engineer_features`` (/root/reference/core/utils.py:167-230)
as one declarative Spark plan. Two deliberate semantic fixes, documented in
SURVEY.md §2.13:
- Q1: "latest" is by (event_time, unique id) total order, not file order
  (the reference's pandas ``agg('last')`` depends on CSV row order).
- Q2: the avg/latest loyalty columns are mapped correctly (the reference's
  MultiIndex rename swaps them).

Output schema mirrors the reference feature group
(/root/reference/core/feature_store_manager.py:85-92):
    key, event_time(max), latest_<v> , avg_<v> per value column.

Scale: a single groupBy shuffle on the key. "latest" values ride the same
aggregation via one max(struct(time, id, values...)) — no second window
pass over the input, no join between an agg branch and a window branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_store_test_spark.functions import dec_sum


def engineer_features(
    df: DataFrame,
    key: str,
    event_time: str,
    value_cols: list[str],
    tiebreak: str,
    avg_round_dp: int | None = 6,
) -> DataFrame:
    """Per-key snapshot features: latest value + running mean per value column.

    ``tiebreak`` is a unique column ordering rows within equal timestamps,
    making "latest" deterministic under any shuffle (SURVEY §2.13 Q1).
    Averages are computed from exact decimal(18,2) sums (driver fixtures are
    2-dp money values) then rounded — engine-stable and oracle-stable.
    """
    # ONE struct-max carries the timestamp and every latest_<v> at once:
    # max(struct(ts, tiebreak, v1, v2, ...)) is lexicographic on the
    # (unique) (ts, tiebreak) prefix, so its trailing fields are exactly
    # max_by(v, (ts, tiebreak)) for each v, and its leading field is
    # max(ts). One binary comparison per row replaces 1 + len(value_cols)
    # separate ordered aggregates. The exact money ticks are pre-projected
    # ONCE per value column — inline dec_sum evaluates its tick tree in
    # both the hi- and lo-sum update paths (hash-agg codegen shares no
    # subexpressions across aggregate functions; same finding as q01) —
    # and recombined with dec_sum's own formula, so results stay
    # bit-identical. Both changes together: 0.48s -> 0.30s at sf0.1.
    from feature_store_test_spark.functions import dec_ticks, ticks_total

    pre = df.select(
        key,
        event_time,
        tiebreak,
        *value_cols,
        *[dec_ticks(F.col(v), 2).alias(f"__t_{v}") for v in value_cols],
    )
    latest = F.max(F.struct(F.col(event_time), F.col(tiebreak), *value_cols))
    aggs = [latest.alias("__latest"), F.count(F.lit(1)).alias("__n")]
    for v in value_cols:
        hi = F.shiftright(F.col(f"__t_{v}"), 22)
        lo = F.col(f"__t_{v}") - hi * F.lit(1 << 22)
        aggs.append(F.sum(hi).alias(f"__t_{v}_hi"))
        aggs.append(F.sum(lo).alias(f"__t_{v}_lo"))
    out = [
        F.col(key),
        F.col(f"__latest.{event_time}").alias(event_time),
    ]
    for v in value_cols:
        avg = ticks_total(F.col(f"__t_{v}_hi"), F.col(f"__t_{v}_lo"), 2) / F.col(
            "__n"
        )
        if avg_round_dp is not None:
            avg = F.round(avg, avg_round_dp)
        out.append(F.col(f"__latest.{v}").alias(f"latest_{v}"))
        out.append(avg.alias(f"avg_{v}"))
    return pre.groupBy(key).agg(*aggs).select(*out)
