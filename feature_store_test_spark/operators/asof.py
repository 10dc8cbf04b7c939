"""As-of (point-in-time) join.

The reference does this one key at a time: each inference event point-reads
the latest stored feature record (/root/reference/core/inference.py:111-118
via core/feature_store_manager.py:184-187). At scale the same semantics is a
set-oriented *as-of join*: for every left row, the most recent right row with
right_time <= (or <) left_time for the same key.

Implementation: the merge-scan pattern —
    union(left, right) → window(partition key, order (time, side)) →
    running last_value(right payload, ignorenulls) → keep left rows.

Cost: ONE hash shuffle on the key + an in-partition sort. No range
cross-join, no per-row subquery, no broadcast requirement on either side —
the shape that survives 100 TB on both sides. Skewed keys are split by AQE;
a time-bucketed pre-partition (repartitionByRange on (key, time)) can be
layered on when a single key's history exceeds one partition's memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_values: list[str],
    strict: bool = False,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (``direction="backward"``) or at-or-after (``"forward"``) its time.

    Args:
        on: join key column name(s); must be identically named on both sides.
        left_time / right_time: event-time columns.
        right_values: right columns to surface (must not collide with left).
        strict: True → right strictly earlier (backward) / strictly later
                (forward); False → ties match, right wins.
        direction: "backward" (latest right ≤ left, the feature-store
                point-in-time default) or "forward" (earliest right ≥ left —
                conversion/outcome attribution).
        tolerance_seconds: if set, matches farther than this from the left
                time are nulled out (pandas merge_asof tolerance) — the
                match still costs one window pass; tolerance is a post-hoc
                null, not a second join.

    Left rows with no matching right row get NULLs (left-outer semantics),
    mirroring the reference's missing-key default path
    (/root/reference/core/inference.py:121-126).

    Cost is identical in both directions: one hash shuffle + in-partition
    sort (the forward scan just orders time descending).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    collisions = set(right_values) & set(left.columns)
    if collisions:
        raise ValueError(f"right_values collide with left columns: {sorted(collisions)}")

    # At equal times: strict → left sorts first in scan order (right row
    # NOT yet visible); non-strict → right sorts first (visible).
    l_ord, r_ord = (0, 1) if strict else (1, 0)

    payload_t = right.select(
        F.struct(
            F.col(right_time).alias("__rt"),
            *[F.col(c).alias(c) for c in right_values],
        ).alias("__rv")
    ).schema["__rv"].dataType
    ltypes = {f.name: f.dataType for f in left.schema.fields}

    l_side = left.select(
        *left.columns,
        F.col(left_time).alias("__t"),
        F.lit(l_ord).alias("__ord"),
        F.lit(None).cast(payload_t).alias("__rv"),
        F.lit(1).alias("__is_left"),
    )
    r_side = right.where(F.col(right_time).isNotNull()).select(
        *[
            (F.col(c) if c in keys else F.lit(None).cast(ltypes[c])).alias(c)
            for c in left.columns
        ],
        F.col(right_time).alias("__t"),
        F.lit(r_ord).alias("__ord"),
        F.struct(
            F.col(right_time).alias("__rt"),
            *[F.col(c).alias(c) for c in right_values],
        ).alias("__rv"),
        F.lit(0).alias("__is_left"),
    )

    time_ord = F.col("__t") if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(time_ord, "__ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_side.unionByName(r_side)
        .withColumn("__match", F.last("__rv", ignorenulls=True).over(w))
        .where(F.col("__is_left") == 1)
    )
    if tolerance_seconds is not None:
        # integer-microsecond arithmetic: a double-cast gap (epoch seconds
        # ~1.7e9, ulp 2.4e-7s) could flip a <=-boundary match whose gap
        # equals the tolerance to the microsecond; long math is exact
        gap_us = F.abs(
            F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__match.__rt"))
        )
        tol_us = int(round(float(tolerance_seconds) * 1_000_000))
        matched = matched.withColumn(
            "__match",
            F.when(gap_us <= F.lit(tol_us), F.col("__match")),
        )
    return matched.select(
        *left.columns,
        *[F.col(f"__match.{c}").alias(c) for c in right_values],
    )
