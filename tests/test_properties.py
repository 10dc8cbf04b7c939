"""Property-based checks (hypothesis).

1. The closed-form (old+new)/2 weighting used by q18 equals the naive
   sequential fold — pure-python property, thousands of cases.
2. asof_join equals a naive per-row reference implementation on randomized
   small inputs — few Spark-sized examples, randomized shapes.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------- 1
def closed_form(values: list[float]) -> float:
    """q18's weight formula: w_i = 2^-(n-i+1) for i>=2, w_1 = 2^-(n-1)."""
    n = len(values)
    total = 0.0
    for i, v in enumerate(values, start=1):
        w = 2.0 ** (-(n - 1)) if i == 1 else 2.0 ** (-(n - i + 1))
        total += v * w
    return total


def naive_fold(values: list[float]) -> float:
    avg = values[0]
    for v in values[1:]:
        avg = (avg + v) / 2.0
    return avg


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=50))
def test_closed_form_equals_sequential_fold(values):
    assert abs(closed_form(values) - naive_fold(values)) <= 1e-6 * max(
        1.0, abs(naive_fold(values))
    )


# ---------------------------------------------------------------------- 2
def naive_asof(left_rows, right_rows, strict):
    out = []
    for k, t, lbl in left_rows:
        best = None
        for rk, rt, v in right_rows:
            if rk != k:
                continue
            if (rt < t) if strict else (rt <= t):
                if best is None or rt >= best[0]:
                    best = (rt, v)
        out.append((k, t, lbl, best[1] if best else None))
    return sorted(out, key=lambda r: (r[0], r[1], r[2]))


event = st.tuples(
    st.integers(min_value=0, max_value=3),       # key
    st.integers(min_value=0, max_value=30),      # time (hours)
    st.integers(min_value=0, max_value=100),     # payload tag
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(event, min_size=1, max_size=12),
    right=st.lists(event, min_size=0, max_size=12),
    strict=st.booleans(),
)
def test_asof_join_matches_naive(spark, left, right, strict):
    from feature_store_test_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    lrows = [(k, base + dt.timedelta(hours=t), f"L{i}") for i, (k, t, _) in enumerate(left)]
    # make right rows unique per (key, time): keep max payload like the
    # operator's last-in-order tie handling
    seen = {}
    for k, t, v in right:
        key = (k, t)
        seen[key] = max(seen.get(key, -1), v)
    rrows = [(k, base + dt.timedelta(hours=t), float(v)) for (k, t), v in seen.items()]

    ldf = spark.createDataFrame(lrows, "k long, t timestamp, lbl string")
    rdf = spark.createDataFrame(
        rrows or [(99, base, 0.0)], "k long, rt timestamp, v double"
    )
    got = sorted(
        ((r.k, r.t, r.lbl, r.v) for r in asof_join(ldf, rdf, "k", "t", "rt", ["v"], strict=strict).collect()),
        key=lambda r: (r[0], r[1], r[2]),
    )
    want = naive_asof(
        [(k, base + dt.timedelta(hours=t), f"L{i}") for i, (k, t, _) in enumerate(left)],
        rrows if rrows else [(99, base, 0.0)],
        strict,
    )
    assert got == want


# ---------------------------------------------------------------------- 3
def naive_asof_fwd(left_rows, right_rows, strict, tol_s):
    out = []
    for k, t, lbl in left_rows:
        best = None
        for rk, rt, v in right_rows:
            if rk != k:
                continue
            if (rt > t) if strict else (rt >= t):
                if best is None or rt < best[0]:
                    best = (rt, v)
        if best is not None and tol_s is not None and (best[0] - t).total_seconds() > tol_s:
            best = None
        out.append((k, t, lbl, best[1] if best else None))
    return sorted(out, key=lambda r: (r[0], r[1], r[2]))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(event, min_size=1, max_size=12),
    right=st.lists(event, min_size=0, max_size=12),
    strict=st.booleans(),
    tol_hours=st.one_of(st.none(), st.integers(min_value=0, max_value=30)),
)
def test_forward_asof_with_tolerance_matches_naive(spark, left, right, strict, tol_hours):
    from feature_store_test_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    lrows = [(k, base + dt.timedelta(hours=t), f"L{i}") for i, (k, t, _) in enumerate(left)]
    seen = {}
    for k, t, v in right:
        seen[(k, t)] = max(seen.get((k, t), -1), v)
    # forward ties pick the payload the scan sees LAST in descending time
    # order — for unique (k, time) rows the match is unambiguous
    rrows = [(k, base + dt.timedelta(hours=t), float(v)) for (k, t), v in seen.items()]
    tol_s = None if tol_hours is None else tol_hours * 3600.0

    ldf = spark.createDataFrame(lrows, "k long, t timestamp, lbl string")
    rdf = spark.createDataFrame(
        rrows or [(99, base, 0.0)], "k long, rt timestamp, v double"
    )
    got = sorted(
        (
            (r.k, r.t, r.lbl, r.v)
            for r in asof_join(
                ldf, rdf, "k", "t", "rt", ["v"],
                strict=strict, direction="forward", tolerance_seconds=tol_s,
            ).collect()
        ),
        key=lambda r: (r[0], r[1], r[2]),
    )
    want = naive_asof_fwd(lrows, rrows if rrows else [(99, base, 0.0)], strict, tol_s)
    assert got == want


def test_q152_max_span_semantics_handcrafted(spark, tmp_path):
    """Pin the suffix-window algebra on a crafted corpus: doc B repeats a
    14-token span of doc A -> one maximal run of exactly 14 covered
    tokens (5 sliding 10-anchors merged), not 5 separate spans."""
    import pyspark.sql.functions as F

    from feature_store_test_spark.queries.dedup import q152_max_span_dedup

    words_a = [f"w{i}" for i in range(30)]
    # doc B: 3 unique tokens, then tokens 5..18 of A (14 tokens), then unique
    words_b = ["x0", "x1", "x2"] + words_a[5:19] + ["y0", "y1", "y2"]
    docs = spark.createDataFrame(
        [
            (0, " ".join(words_a), "en", "s", len(" ".join(words_a))),
            (1, " ".join(words_b), "en", "s", len(" ".join(words_b))),
            (2, "too short", "en", "s", 9),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf)
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {r["doc_id"]: r.asDict() for r in q152_max_span_dedup(spark, sf).collect()}
    # doc 0 is globally first at every anchor -> zero coverage
    assert out[0]["n_dup_runs"] == 0 and out[0]["n_covered_tokens"] == 0
    # doc 1: anchors at positions 3..7 duplicate doc 0's -> one merged run
    # covering tokens [3, 16] = 14 tokens
    assert out[1]["n_dup_runs"] == 1
    assert out[1]["n_covered_tokens"] == 14
    assert out[1]["max_run_len"] == 14
    # doc 2 shorter than the anchor width: zeros, still present
    assert out[2] == {
        "doc_id": 2, "n_tokens": 2, "n_dup_runs": 0,
        "n_covered_tokens": 0, "max_run_len": 0,
    }
