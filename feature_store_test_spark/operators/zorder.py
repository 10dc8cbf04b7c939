"""Z-order (Morton) clustering key: multi-dimensional data skipping.

Range clustering on ``[a, b]`` sorts lexicographically — files get tight
min/max stats on ``a`` but each file still spans the full range of ``b``,
so only leading-column predicates prune. Interleaving the BITS of the two
(or more) normalized columns places rows on a space-filling curve: each
file covers a small hyper-rectangle, its min/max stats are tight on EVERY
clustered dimension, and predicates on any of them skip files. This is
what Delta's OPTIMIZE ZORDER BY does (via range_partition_id + interleave;
see the public delta-io implementation); the idea goes back to Morton 1966
and the UB-tree literature.

At 100 TB: clustering is a one-off rewrite cost; after it, a selective
predicate on any clustered dimension reads O(matching files), not O(table).
The z-value is computed entirely with JVM bit ops (shift/and/or) inside
whole-stage codegen — no Python in the path — and is dropped before write;
only the physical row order (and therefore the per-file stats) changes.

Normalization here is linear min-max scaling into ``2^bits`` buckets.
Delta instead uses rank-based bounds (sampled range partitioning) which is
robust to skew; linear scaling keeps the key a pure per-row function (no
sampling pass) and the subsequent ``repartitionByRange`` on the z-value is
itself rank-based, so file BOUNDARIES still adapt to skew — only bucket
resolution inside a heavily-skewed dimension degrades.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(buckets: list[Column], bits: int = 16) -> Column:
    """Morton-interleave integer bucket columns (each in ``[0, 2^bits)``)
    into one long: result bit ``(bits-1-b)*n + i`` = bit ``b`` of col ``i``.
    Pure JVM shift/and/or expression — codegen-friendly, no UDF."""
    z = F.lit(0).cast("long")
    for b in range(bits - 1, -1, -1):
        for c in buckets:
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = F.shiftleft(z, 1).bitwiseOR(bit)
    return z


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Z-order key over numeric/timestamp columns of ``df``.

    Computes global min/max per column (one small agg job — at scale these
    bounds come free from table-log file stats instead) and min-max scales
    each into ``2^bits`` buckets, then interleaves. NULLs map to bucket 0,
    sorting them to the curve origin (deterministic, prunable).
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    aggs = []
    for c in cols:
        d = F.col(c).cast("double")
        aggs += [F.min(d).alias(f"mn_{c}"), F.max(d).alias(f"mx_{c}")]
    bounds = df.agg(*aggs).collect()[0].asDict()
    n_buckets = (1 << bits) - 1
    buckets = []
    for c in cols:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        if mn is None or mx is None or mx == mn:
            buckets.append(F.lit(0))
            continue
        scaled = (F.col(c).cast("double") - F.lit(mn)) / F.lit(mx - mn)
        buckets.append(
            F.coalesce(
                F.floor(scaled * n_buckets).cast("long"), F.lit(0)
            )
        )
    return interleave_bits(buckets, bits=bits)
