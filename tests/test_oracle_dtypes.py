"""Driver-gate dtype parity: Spark schema vs DuckDB-through-pandas dtypes.

Round 1 lesson: the local comparator fetches oracle rows via ``fetchall()``
(DuckDB HUGEINT -> Python int, compares equal to Spark's long), but the
driver's gate goes through pandas, where HUGEINT becomes float64 — so an
oracle emitting an uncast integer ``SUM`` hash-mismatches in the driver
while staying green locally (q40/q51 in CORRECTNESS_r01). This test closes
that gap structurally: for every registered oracle, the DuckDB result's
pandas dtype kind must agree with the Spark plan's schema on numeric/bool
columns. Plan-only on the Spark side and LIMIT 0 on the DuckDB side, so
the whole sweep is seconds, not minutes.

date-vs-datetime64 differences are exempt: DuckDB DATE converts to pandas
datetime64 while Spark DateType converts to datetime.date objects, and the
driver's normalization provably treats those as equal (q82/q92/q93/q94/q114
were driver-green in round 1 with exactly that shape).
"""

from __future__ import annotations

import pytest

from feature_store_test_spark.oracle import duckdb_connection
from feature_store_test_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _spark_kind(dt) -> str:
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "i"
    if s in ("float", "double") or s.startswith("decimal"):
        return "f"
    if s == "boolean":
        return "b"
    return "other"


def _duck_kind(dtype) -> str:
    k = dtype.kind
    if k in ("i", "u"):
        return "i"
    if k == "f":
        return "f"
    if k == "b":
        return "b"
    return "other"


def test_numeric_dtypes_survive_pandas(spark):
    con = duckdb_connection(SF_DIR)
    specs = all_queries()
    bad: list[tuple[str, str, str, str]] = []
    for name, spec in specs.items():
        if spec.oracle is None:
            continue
        sdf = spec.fn(spark, SF_DIR)  # plan only — never executed
        s_types = {f.name: _spark_kind(f.dataType) for f in sdf.schema.fields}
        rel = con.sql("SELECT * FROM (" + spec.oracle + ") LIMIT 0")
        o_dtypes = rel.df().dtypes
        for col, duck_dtype in zip(rel.columns, o_dtypes):
            sk = s_types.get(col)
            ok = _duck_kind(duck_dtype)
            if sk in ("i", "f", "b") or ok in ("i", "f", "b"):
                if sk != ok:
                    bad.append((name, col, str(sk), str(duck_dtype)))
    assert not bad, (
        "oracle columns whose pandas dtype diverges from the Spark schema "
        "(uncast HUGEINT SUM? int-vs-float?): " + repr(bad)
    )


def test_no_container_types_in_oracle_outputs(spark):
    """Round-3 lesson (q39b in CORRECTNESS_r03): the driver canonicalizes
    both result sets through pandas ``DataFrame.sort_values``, which
    factorizes object columns via a hash table — a top-level
    Array/Map/Struct column arrives as a list/dict cell and crashes with
    ``TypeError: unhashable type`` before any comparison. Same bug class
    as round 1's dtype drift, one level up: the local comparator's
    tuple-sort handles containers fine, so only this guard (not the
    oracle gate) catches it. Every oracle-checked query must keep a
    scalar-only top-level schema on BOTH engines; serialize member lists
    to sorted comma-joined strings instead (q39b does this now)."""
    from pyspark.sql import types as T

    bad: list[tuple[str, str, str]] = []
    con = duckdb_connection(SF_DIR)
    for name, spec in all_queries().items():
        if spec.oracle is None:
            continue
        sdf = spec.fn(spark, SF_DIR)  # plan only — never executed
        for f in sdf.schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append((name, f.name, f.dataType.simpleString()))
        rel = con.sql("SELECT * FROM (" + spec.oracle + ") LIMIT 0")
        for col, typ in zip(rel.columns, rel.types):
            ts = str(typ)
            if "[]" in ts or ts.startswith(("STRUCT", "MAP", "LIST")):
                bad.append((name, col, f"duckdb:{ts}"))
    assert not bad, (
        "container-typed columns in oracle-checked outputs (the driver's "
        "pandas canonicalizer cannot hash list/dict cells): " + repr(bad)
    )


def test_oracle_results_survive_pandas_sort_values():
    """Emulate the driver's exact canonicalization — ``sort_values`` over
    every column of every oracle's materialized sf0.001 result. DuckDB
    side only (cheap); the Spark side is structurally covered by
    ``test_no_container_types_in_oracle_outputs`` (scalar schema => no
    unhashable cells) and value-equal to this result via the oracle
    gate."""
    con = duckdb_connection(SF_DIR)
    failures: list[tuple[str, str]] = []
    for name, spec in all_queries().items():
        if spec.oracle is None:
            continue
        df = con.execute(spec.oracle).df()
        try:
            df.sort_values(list(df.columns))
        except TypeError as e:
            failures.append((name, str(e)))
    assert not failures, f"driver canonicalization would crash: {failures}"


@pytest.mark.parametrize("name", ["q40_sessionize", "q51_data_quality"])
def test_round1_red_queries_match_via_pandas(spark, name):
    """The two round-1 driver reds, compared through the pandas path."""
    import pandas as pd

    spec = all_queries()[name]
    con = duckdb_connection(SF_DIR)
    sdf = spec.fn(spark, SF_DIR).toPandas()
    odf = con.execute(spec.oracle).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    cols = sorted(sdf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        sc, oc = s[c], o[c]
        if str(sc.dtype).startswith("datetime") or str(oc.dtype).startswith(
            "datetime"
        ):
            sc = pd.to_datetime(sc).astype("datetime64[us]")
            oc = pd.to_datetime(oc).astype("datetime64[us]")
        assert sc.dtype.kind == oc.dtype.kind, (name, c, sc.dtype, oc.dtype)
        pd.testing.assert_series_equal(
            sc, oc, check_names=False, check_dtype=False
        )


def test_oracle_results_survive_pandas_at_sf001_size():
    """Round-5 guard (VERDICT item): the driver's sample rotates into the
    newest query families first, and those (q127 redaction strings, q144
    lattice doubles) emit their largest values at the driver's sf0.01
    compare point — so run the driver-canonicalization sweep against the
    MATERIALIZED sf0.01 results, not just sf0.001:

    - ``sort_values`` over every column must not crash (unhashable cells);
    - every integer-kind column must stay below 2^53 in magnitude, the
      point where the driver's float64-through-pandas path starts rounding
      integers (the round-1 HUGEINT class of failure, value-level edition).
    """
    con = duckdb_connection("/root/testdata/sf0.01")
    crash: list[tuple[str, str]] = []
    overflow: list[tuple[str, str, int]] = []
    for name, spec in all_queries().items():
        if spec.oracle is None:
            continue
        df = con.execute(spec.oracle).df()
        try:
            df.sort_values(list(df.columns))
        except TypeError as e:
            crash.append((name, str(e)))
            continue
        for col in df.columns:
            s = df[col]
            if s.dtype.kind in ("i", "u") and len(s):
                m = int(s.abs().max())
                if m >= 1 << 53:
                    overflow.append((name, col, m))
    assert not crash, f"driver canonicalization would crash at sf0.01: {crash}"
    assert not overflow, (
        "integer oracle columns exceeding float64-exact range at sf0.01 "
        "(the driver's pandas path would round them): " + repr(overflow)
    )
