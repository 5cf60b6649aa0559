"""Recrawl scheduling: hand-built capture logs with known change
patterns, clamp/backoff/default branches, and the single-Exchange plan."""

from __future__ import annotations

from llm_document_parser_spark.operators.recrawl import recrawl_schedule

HOUR = 3600
DAY = 86400


def _caps(spark):
    rows = [
        # u_fast: changes every capture, 1h gaps → revisit span//(2*3)=30min
        # → clamped up to min_secs (1h)
        ("u_fast", 0, "a"), ("u_fast", HOUR, "b"),
        ("u_fast", 2 * HOUR, "c"), ("u_fast", 3 * HOUR, "d"),
        # u_slow: never changes over 3 captures, 1-day gaps → 4x backoff
        ("u_slow", 0, "x"), ("u_slow", DAY, "x"), ("u_slow", 2 * DAY, "x"),
        # u_once: single capture → default
        ("u_once", 5, "y"),
        # u_mid: one change across 4 captures, 2-day gaps →
        # span 6d // (2*1) = 3d (inside clamps)
        ("u_mid", 0, "p"), ("u_mid", 2 * DAY, "p"),
        ("u_mid", 4 * DAY, "q"), ("u_mid", 6 * DAY, "q"),
        # u_glacial: never changes, huge gaps → backoff hits max clamp
        ("u_glacial", 0, "z"), ("u_glacial", 20 * DAY, "z"),
    ]
    return spark.createDataFrame(rows, "url string, ts long, digest string")


def test_recrawl_schedule_branches(spark):
    got = {r["url"]: r for r in recrawl_schedule(_caps(spark)).collect()}

    fast = got["u_fast"]
    assert (fast["n_caps"], fast["changes"]) == (4, 3)
    assert fast["change_rate"] == 1.0
    assert fast["avg_gap_secs"] == HOUR
    assert fast["next_gap_secs"] == HOUR  # 3h//6 = 30min, clamped to min
    assert fast["next_fetch_ts"] == 3 * HOUR + HOUR

    slow = got["u_slow"]
    assert (slow["changes"], slow["change_rate"]) == (0, 0.0)
    assert slow["next_gap_secs"] == 4 * DAY  # backoff, under max

    once = got["u_once"]
    assert once["n_caps"] == 1 and once["change_rate"] is None
    assert once["avg_gap_secs"] is None
    assert once["next_gap_secs"] == DAY  # default_secs
    assert once["next_fetch_ts"] == 5 + DAY

    mid = got["u_mid"]
    assert (mid["changes"], mid["avg_gap_secs"]) == (1, 2 * DAY)
    assert mid["next_gap_secs"] == 3 * DAY

    glacial = got["u_glacial"]
    assert glacial["next_gap_secs"] == 30 * DAY  # 80d backoff → max clamp


def test_recrawl_schedule_single_exchange(spark):
    plan = (
        recrawl_schedule(_caps(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the window's url hash-partitioning satisfies the groupBy → one shuffle
    assert plan.count("Exchange") == 1


def test_recrawl_schedule_unordered_input(spark):
    """Capture order comes from ts, not input order."""
    rows = [("u", 2 * HOUR, "c"), ("u", 0, "a"), ("u", HOUR, "a")]
    df = spark.createDataFrame(rows, "url string, ts long, digest string")
    r = recrawl_schedule(df).first()
    assert (r["n_caps"], r["changes"]) == (3, 1)  # a→a no flip, a→c flip
