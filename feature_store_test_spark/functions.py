"""Shared column-expression helpers (the engine's scalar-function layer).

Everything here returns lazy ``Column`` expressions built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, never Python
row-at-a-time. The helpers encode the cross-engine float discipline that
makes every query hash-match its DuckDB oracle (see oracle.py):

* money/quantity sums go through ``decimal(18,s)`` integer arithmetic —
  bit-identical regardless of partial-aggregation order;
* hash bucketing uses md5 hex prefixes compared lexicographically —
  identical in any engine, deterministic across re-runs;
* no helper ever rounds a value that can terminate on a rounding boundary.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def dec_sum(col: str | F.Column, scale: int = 2, out: str | None = None) -> F.Column:
    """Exact money sum: ``CAST(SUM(CAST(x AS DECIMAL(18,scale))) AS DOUBLE)``.

    Decimal integer arithmetic is summation-order-free, so Spark's partial
    aggregates and DuckDB's sequential sum produce the same bits; a raw
    double sum differs in low bits between engines (and between runs, once
    partition order changes).
    """
    c = F.col(col) if isinstance(col, str) else col
    expr = F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
    return expr.alias(out) if out else expr


def revenue() -> F.Column:
    """TPC-H per-line revenue: ``l_extendedprice * (1 - l_discount)``."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def md5_bucket(key: str | F.Column, n_hex: int = 2) -> F.Column:
    """Deterministic hash bucket: first ``n_hex`` hex chars of md5(key).

    Compared lexicographically against hex-string cutoffs ('cd' ≈ 205/256)
    for reproducible splits/sampling — a pure function of the key, so
    membership never reshuffles as data grows and any engine agrees.
    """
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(c.cast("string")), 1, n_hex)
