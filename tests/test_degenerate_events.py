"""Degenerate-event regression net: single-event users, exact timestamp
ties within a user, a user whose events all share one instant, and empty
props — through the window/sessionize/funnel/aggregation family.

Timestamp TIES are the interesting rows: every ranking/lag/as-of query
declares a deterministic tiebreak (event_id), and these rows prove the
tiebreak is actually wired in — a missing one shows up here as
nondeterminism or a wrong row count, not as an oracle mismatch on the
tie-free fixtures.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from feature_store_test_spark.registry import all_queries, release_caches


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture()
def degenerate_events(spark, tmp_path):
    rows = [
        # user 1: a single event
        (0, _ts("2024-01-01T00:00:00"), 1, "view", 10.0, '{"k": 1}'),
        # user 2: two events at the SAME instant (tiebreak on event_id)
        (1, _ts("2024-01-02T12:00:00"), 2, "view", 5.0, '{"k": 2}'),
        (2, _ts("2024-01-02T12:00:00"), 2, "purchase", 7.0, '{"k": 3}'),
        # user 3: every event on one instant
        (3, _ts("2024-01-03T08:30:00"), 3, "view", 1.0, '{"k": 4}'),
        (4, _ts("2024-01-03T08:30:00"), 3, "view", 2.0, '{"k": 5}'),
        (5, _ts("2024-01-03T08:30:00"), 3, "purchase", 3.0, '{"k": 6}'),
        # user 4: empty props string
        (6, _ts("2024-01-04T09:00:00"), 4, "click", 4.0, ""),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(sf + "/events.parquet")
    return sf


QUERIES = [
    ("q08_latest_event_per_user", 4),   # one row per user
    ("q16_engineer_features", 4),       # one feature row per user
    ("q34_tumbling_windows", None),
    ("q40_sessionize", 4),              # each user's events = one session
    ("q48_native_session_window", 4),
    ("q89_funnel_stages", None),
    ("q93_new_vs_returning", 4),        # four active days
    ("q96_heavy_hitters", None),
    ("q98_modal_event_type", 4),        # one modal type per user
    ("q100_event_transitions", None),
    ("q145_decayed_spend", None),
]


@pytest.mark.parametrize("name,expected", QUERIES)
def test_degenerate_events_do_not_crash(spark, degenerate_events, name, expected):
    df = all_queries()[name].fn(spark, degenerate_events)
    rows = df.collect()
    # determinism under ties: the same plan collected twice returns the
    # same multiset of rows
    again = all_queries()[name].fn(spark, degenerate_events).collect()
    release_caches()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again)), name
    if expected is not None:
        assert len(rows) == expected, name
