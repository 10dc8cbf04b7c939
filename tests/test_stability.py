"""Shuffle-partitioning stability: every registered query must produce
identical values when the same plan runs under a different partitioning.

This is the failure mode behind round 1's q40 driver red: a window whose
ORDER BY is not a total order per partition assigns ties in partition
order, so the result silently depends on parallelism and engine. Running
each query at two shuffle-partition settings (32 and 7 — coprime-ish so
hash boundaries genuinely move) surfaces any such latent tie.

``spark.sql.shuffle.partitions`` is runtime-settable, so both runs share
one session; rows are compared with the oracle harness's normalization
(column-sorted, floats at 9 dp), order-insensitively.
"""

from __future__ import annotations

from feature_store_test_spark.oracle import _normalize_rows
from feature_store_test_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"


def test_all_queries_stable_across_partitioning(spark):
    specs = all_queries()
    bad: list[str] = []
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name, spec in specs.items():
            runs = []
            for parts in ("32", "7"):
                spark.conf.set("spark.sql.shuffle.partitions", parts)
                df = spec.fn(spark, SF_DIR)
                rows = [tuple(r) for r in df.collect()]
                runs.append(_normalize_rows(list(df.columns), rows))
            if runs[0] != runs[1]:
                diff = next(
                    (i, a, b)
                    for i, (a, b) in enumerate(zip(runs[0], runs[1]))
                    if a != b
                )
                bad.append(f"{name}: first diff at sorted row {diff[0]}")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert not bad, "partitioning-dependent results: " + "; ".join(bad)
