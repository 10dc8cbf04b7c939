"""Binned (bucketed) range join — the scale-safe form of interval joins.

A naive range join (``probe.ts BETWEEN build.start AND build.end``) has no
equi key, so Spark falls back to BroadcastNestedLoopJoin — O(n·m) work and
a broadcast requirement on one whole side. The standard distributed fix
(used by Databricks' range-join optimization and Flink's interval joins) is
**binning**: quantize time into fixed-width bins, explode each interval to
every bin it overlaps, map each probe row to its single bin, then run a
plain shuffled **equi join on the bin id** and re-check the exact range
predicate. Each (probe, interval) pair meets in exactly one bin — the
probe's — so no dedup pass is needed.

Scale properties:
- The nested loop becomes one hash shuffle on ``bin``; work is
  O(matches + bins_touched) instead of O(n·m).
- Explosion factor on the build side = avg interval length / bin width —
  pick the bin width near the median interval length to keep it small.
- Bin skew (a hot hour) is ordinary join skew: AQE skew-join or salting
  applies unchanged.

Reference parity: the reference has no range join; this generalizes its
point-lookup enrichment (core/inference.py:89-126) to interval semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    probe: DataFrame,
    intervals: DataFrame,
    probe_ts: str,
    start: str,
    end: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Join each ``probe`` row to every interval containing its timestamp.

    ``intervals`` must carry ``start``/``end`` timestamp columns (inclusive
    bounds). Returns probe columns + interval columns for each match.
    Implemented as explode-to-bins + equi join + exact refine (see module
    docstring); correct for any interval length, including ones spanning
    many bins.
    """
    bin_of = lambda c: (F.unix_timestamp(F.col(c)) / bin_seconds).cast("long")  # noqa: E731
    iv = intervals.withColumn(
        "__bin", F.explode(F.sequence(bin_of(start), bin_of(end)))
    )
    pr = probe.withColumn("__bin", bin_of(probe_ts))
    return (
        pr.join(iv, "__bin")
        .where(F.col(probe_ts).between(F.col(start), F.col(end)))
        .drop("__bin")
    )
