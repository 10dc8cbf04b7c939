"""Local DuckDB-oracle comparison harness.

Mimics the driver's correctness gate: run each registered Spark query and
its DuckDB oracle SQL on the same parquet tables, then compare
(row count, column names, order-insensitive values) with the documented
normalization (floats rounded to 9 dp, timestamps at µs).

Used by tests/test_oracle.py at sf0.001 so mismatches surface before the
driver runs the real gate at sf0.01.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import SparkSession

from feature_store_test_spark.data import TABLE_NAMES


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int
    oracle_rows: int


def _normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_normalize_cell(x) for x in v)
    return v


def _normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_normalize_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        # Spark-written tables are directories of part files (e.g. the
        # scaleprobe 10x replica); DuckDB needs the glob form for those
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def compare_query(
    spark: SparkSession, name: str, sf_dir: str, con: duckdb.DuckDBPyConnection
) -> CompareResult:
    from feature_store_test_spark.registry import all_queries

    from feature_store_test_spark.registry import (
        persistent_rdd_ids,
        release_caches,
        release_new_rdds,
    )

    spec = all_queries()[name]
    baseline = persistent_rdd_ids(spark)
    try:
        sdf = spec.fn(spark, sf_dir)
        s_cols = list(sdf.columns)
        s_rows = [tuple(r) for r in sdf.collect()]
    finally:
        # query-scoped caches (managed_cache) and RDD-level checkpoint
        # blocks (localCheckpoint) free once the result is materialized —
        # a full compare_all sweep must not accumulate persisted RDDs
        # across 100+ queries
        release_caches()
        release_new_rdds(spark, baseline)

    if spec.oracle is None:
        return CompareResult(name, True, "rows-only (no oracle)", len(s_rows), -1)

    cur = con.execute(spec.oracle)
    o_cols = [d[0] for d in cur.description]
    o_rows = [tuple(r) for r in cur.fetchall()]

    if sorted(s_cols) != sorted(o_cols):
        return CompareResult(
            name, False, f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}",
            len(s_rows), len(o_rows),
        )
    if len(s_rows) != len(o_rows):
        return CompareResult(
            name, False, f"row count: spark={len(s_rows)} oracle={len(o_rows)}",
            len(s_rows), len(o_rows),
        )
    ns, no = _normalize_rows(s_cols, s_rows), _normalize_rows(o_cols, o_rows)
    if ns != no:
        diff = next(
            (i, a, b) for i, (a, b) in enumerate(zip(ns, no)) if a != b
        )
        return CompareResult(
            name, False, f"value mismatch at sorted row {diff[0]}:\n  spark={diff[1]}\n  oracle={diff[2]}",
            len(s_rows), len(o_rows),
        )
    return CompareResult(name, True, "ok", len(s_rows), len(o_rows))


def compare_all(spark: SparkSession, sf_dir: str) -> list[CompareResult]:
    from feature_store_test_spark.registry import all_queries

    con = duckdb_connection(sf_dir)
    results = []
    for name in all_queries():
        try:
            results.append(compare_query(spark, name, sf_dir, con))
        except Exception as e:  # noqa: BLE001 — harness must report, not die
            results.append(CompareResult(name, False, f"EXCEPTION: {e}", -1, -1))
    return results
