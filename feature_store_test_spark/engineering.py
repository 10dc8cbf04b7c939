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
aggregation via max_by(value, (time, id)) — no second window pass over the
input, no join between an agg branch and a window branch.
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
    order = F.struct(F.col(event_time), F.col(tiebreak))
    aggs = [F.max(event_time).alias(event_time)]
    for v in value_cols:
        aggs.append(F.max_by(F.col(v), order).alias(f"latest_{v}"))
        avg = dec_sum(v, 2) / F.count(F.lit(1))
        if avg_round_dp is not None:
            avg = F.round(avg, avg_round_dp)
        aggs.append(avg.alias(f"avg_{v}"))
    return df.groupBy(key).agg(*aggs)
