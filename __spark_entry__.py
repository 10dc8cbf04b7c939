"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``feature_store_test_spark`` package; this file
only adapts the registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _ensure_session_confs(spark: SparkSession) -> None:
    """Apply runtime-settable confs the engine relies on (the driver may
    hand us a session built without them)."""
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.adaptive.enabled": "true",
        # per-Column-call Python call-site capture costs 3+ py4j RPCs per
        # expression; the flag is read lazily and cached, so setting it
        # here (before the first Column builds) covers driver-built
        # sessions too
        "spark.python.sql.dataFrameDebugging.enabled": "false",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a live session — keep going
    from feature_store_test_spark.bootstrap import ship_package

    ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_session_confs(spark)
    from feature_store_test_spark.queries.relational import q01_pricing_summary

    return q01_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from feature_store_test_spark.registry import all_queries

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in all_queries().items():
        def make(fn):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                _ensure_session_confs(spark)
                return fn(spark, sf_dir)

            return run

        out[name] = make(spec.fn)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    from feature_store_test_spark.registry import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
