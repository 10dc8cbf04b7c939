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

from pyspark.sql import DataFrame
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

    # At equal times: strict → left sorts first in scan order (right row
    # NOT yet visible); non-strict → right sorts first (visible).
    l_ord, r_ord = (0, 1) if strict else (1, 0)

    # Single-parse selectExpr strings throughout (round 10, the r6
    # construction playbook): each Column-API transformation is analyzed
    # eagerly JVM-side, and this operator sat near the top of
    # BENCH_SELF.plan_construction via q15/q113. The payload struct DDL
    # and left column types come from the two sides' schemas DIRECTLY
    # (one analysis each) instead of analyzing an extra throwaway
    # right.select(struct(...)) projection.
    def q(c: str) -> str:
        return "`" + c.replace("`", "``") + "`"

    rtypes = {f.name: f.dataType for f in right.schema.fields}
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    lcols = list(ltypes)
    collisions = set(right_values) & set(lcols)
    if collisions:
        raise ValueError(
            f"right_values collide with left columns: {sorted(collisions)}"
        )
    payload_ddl = (
        "struct<__rt:"
        + rtypes[right_time].simpleString()
        + "".join(f",{c}:{rtypes[c].simpleString()}" for c in right_values)
        + ">"
    )
    payload_expr = "named_struct('__rt', " + q(right_time) + "".join(
        f", '{c}', {q(c)}" for c in right_values
    ) + ")"

    l_side = left.selectExpr(
        *[q(c) for c in lcols],
        f"{q(left_time)} AS __t",
        f"{l_ord} AS __ord",
        f"CAST(NULL AS {payload_ddl}) AS __rv",
        "1 AS __is_left",
    )
    r_side = right.where(f"{q(right_time)} IS NOT NULL").selectExpr(
        *[
            (
                q(c)
                if c in keys
                else f"CAST(NULL AS {ltypes[c].simpleString()}) AS {q(c)}"
            )
            for c in lcols
        ],
        f"{q(right_time)} AS __t",
        f"{r_ord} AS __ord",
        f"{payload_expr} AS __rv",
        "0 AS __is_left",
    )

    time_ord = "__t" if direction == "backward" else "__t DESC"
    win = (
        f"OVER (PARTITION BY {', '.join(q(k) for k in keys)}"
        f" ORDER BY {time_ord}, __ord"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    matched = (
        l_side.unionByName(r_side)
        .selectExpr("*", f"last(__rv, true) {win} AS __match")
        .where("__is_left = 1")
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
    return matched.selectExpr(
        *[q(c) for c in lcols],
        *[f"__match.{q(c)} AS {q(c)}" for c in right_values],
    )
