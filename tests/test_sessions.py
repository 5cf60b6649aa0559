"""Gap-based sessionization (operators/sessions.py)."""

from __future__ import annotations

import datetime

from llm_document_parser_spark.operators.sessions import (
    session_stats,
    sessionize,
)


def _events(spark):
    t = datetime.datetime
    rows = [
        (1, 10, t(2024, 1, 1, 10, 0, 0)),
        (2, 10, t(2024, 1, 1, 10, 20, 0)),   # 20 min gap -> same session
        (3, 10, t(2024, 1, 1, 11, 0, 0)),    # 40 min gap -> new session
        (4, 10, t(2024, 1, 1, 11, 29, 59)),  # 29:59 -> same
        (5, 10, t(2024, 1, 1, 12, 0, 0)),    # 30:01 -> new
        (6, 20, t(2024, 1, 2, 0, 0, 0)),     # other user, single event
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_session_assignment(spark):
    out = {
        r["event_id"]: r["session_no"]
        for r in sessionize(_events(spark), tiebreak_col="event_id").collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 1}


def test_exact_gap_is_same_session(spark):
    t = datetime.datetime
    df = spark.createDataFrame(
        [(1, 1, t(2024, 1, 1, 0, 0, 0)), (2, 1, t(2024, 1, 1, 0, 30, 0))],
        "event_id long, user_id long, ts timestamp",
    )
    out = sessionize(df, tiebreak_col="event_id").collect()
    # gap == 30 min exactly: NOT greater than the gap -> same session
    assert {r["session_no"] for r in out} == {1}


def test_session_stats(spark):
    stats = {
        (r["user_id"], r["session_no"]): r
        for r in session_stats(_events(spark), tiebreak_col="event_id").collect()
    }
    assert stats[(10, 1)]["n_events"] == 2
    assert stats[(10, 1)]["duration_secs"] == 1200
    assert stats[(10, 2)]["n_events"] == 2
    assert stats[(20, 1)]["n_events"] == 1
    assert stats[(20, 1)]["duration_secs"] == 0


def test_single_exchange_plan(spark):
    plan = (
        sessionize(_events(spark), tiebreak_col="event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
