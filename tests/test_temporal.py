"""As-of join (cogroup + merge_asof) and gap sessionization."""

from datetime import datetime

from pyspark.sql import functions as F

from kg_obo_spark.operators.temporal import asof_join, session_stats, sessionize


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [
            ("u1", 1, _ts("2026-01-01T10:00:00")),
            ("u1", 2, _ts("2026-01-01T12:00:00")),
            ("u2", 3, _ts("2026-01-01T09:00:00")),
            ("u3", 4, _ts("2026-01-01T09:00:00")),  # no right rows at all
        ],
        "k string, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2026-01-01T09:30:00"), "a"),
            ("u1", _ts("2026-01-01T11:00:00"), "b"),
            ("u2", _ts("2026-01-01T10:00:00"), "late"),  # after u2's event
        ],
        "k string, ts timestamp, label string",
    )
    out = {r["event_id"]: r["r_label"] for r in asof_join(left, right, key="k").collect()}
    assert out == {1: "a", 2: "b", 3: None, 4: None}


def test_sessionize_boundaries(spark):
    rows = [
        (1, 10, _ts("2026-01-01T10:00:00")),
        (1, 11, _ts("2026-01-01T10:10:00")),   # same session (<=30min)
        (1, 12, _ts("2026-01-01T11:30:00")),   # new session (80min gap)
        (2, 20, _ts("2026-01-01T10:00:00")),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    s = sessionize(ev, gap_seconds=1800, order_tiebreak="event_id")
    got = {r["event_id"]: r["session_id"] for r in s.collect()}
    assert got == {10: 0, 11: 0, 12: 1, 20: 0}
    stats = {(r["user_id"], r["session_id"]): r for r in session_stats(s).collect()}
    assert stats[(1, 0)]["n_events"] == 2
    assert stats[(1, 0)]["duration_us"] == 600_000_000
    assert stats[(1, 1)]["n_events"] == 1 and stats[(1, 1)]["duration_us"] == 0


def test_sessionize_exact_gap_stays(spark):
    rows = [
        (1, 1, _ts("2026-01-01T10:00:00")),
        (1, 2, _ts("2026-01-01T10:30:00")),  # exactly 1800s -> same session
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = {r["event_id"]: r["session_id"] for r in sessionize(ev, gap_seconds=1800).collect()}
    assert got == {1: 0, 2: 0}
