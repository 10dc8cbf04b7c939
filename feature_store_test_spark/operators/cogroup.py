"""Co-grouped pandas operators — the escape hatch for per-key algorithms
that genuinely need both sides of a join materialized together.

``df.groupBy(k).cogroup(other.groupBy(k)).applyInPandas(fn)`` hands ``fn``
one (left_pdf, right_pdf) pair per key: Spark co-shuffles both inputs on
the key (one exchange each, Arrow-batched transfer), so the Python code
sees a key's COMPLETE history from both sides but never the whole dataset
— the per-key footprint, not the table size, bounds memory. That is the
right altitude for algorithms pandas already ships (merge_asof, resample,
ewm) when their relational re-expression would be a contortion.

The engine's own as-of join (operators/asof.py) stays the default — it is
pure JVM and ~an order of magnitude cheaper (no Arrow hop, whole-stage
codegen). ``cogroup_asof`` exists as (a) the template for per-key pandas
logic that has NO relational form, and (b) a cross-check: tests assert it
produces byte-identical results to the relational operator.

Reference parity note: the reference's per-event point-read loop
(/root/reference/core/inference.py:111-118) is the degenerate one-key
case of exactly this co-grouped shape.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def cogroup_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
) -> DataFrame:
    """Per-key ``pd.merge_asof``: attach the latest right row at-or-before
    each left row's time. Semantics match ``asof.asof_join(strict=False)``
    (right wins ties); left rows with no earlier right row get nulls.
    """
    right_values = list(right_values)
    out_fields = [left.schema[c] for c in left.columns] + [
        right.schema[c] for c in right_values
    ]
    out_schema = T.StructType(out_fields)
    left_cols = list(left.columns)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=left_cols + right_values)
        lpdf = lpdf.sort_values(left_time, kind="mergesort")
        if rpdf.empty:
            for c in right_values:
                lpdf[c] = None
            return lpdf[left_cols + right_values]
        # rename the right time key so it can never collide with a left column
        rts = "__rts"
        rpdf = (
            rpdf[[right_time] + right_values]
            .rename(columns={right_time: rts})
            .sort_values(rts, kind="mergesort")
        )
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=left_time,
            right_on=rts,
            direction="backward",  # latest right_time <= left_time
        )
        return merged[left_cols + right_values]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(merge, schema=out_schema)
    )
