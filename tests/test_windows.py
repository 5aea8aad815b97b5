"""Window/aggregation operator tests: sessionization + grouped quantiles."""

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from tilematrix_spark.functions import windows


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 12, minute, second, micro)


def test_sessionize_gap_split(spark):
    rows = [
        # user 1: 3 events within 30min, then a 31-min gap -> 2 sessions
        (1, 1, _ts(0)),
        (2, 1, _ts(10)),
        (3, 1, _ts(29)),
        (4, 1, dt.datetime(2024, 1, 1, 13, 0, 0, 1)),  # 31min + 1us after event 3
        # user 2: single event
        (5, 2, _ts(5)),
        # user 3: gap of EXACTLY 30min is NOT a split (strict >)
        (6, 3, _ts(0)),
        (7, 3, _ts(30)),
        # user 4: sub-second gap precision: 1800.000001s IS a split
        (8, 4, _ts(0)),
        (9, 4, _ts(30, 0, 1)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp_ntz")
    out = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_us"])
        for r in windows.sessionize(df, gap_s=1800).collect()
    }
    assert out[(1, 0)] == (3, 29 * 60 * 1_000_000)
    assert out[(1, 1)] == (1, 0)
    assert out[(2, 0)] == (1, 0)
    assert out[(3, 0)] == (2, 30 * 60 * 1_000_000)  # exactly 30min: one session
    assert out[(4, 0)] == (1, 0)
    assert out[(4, 1)] == (1, 0)  # 30min + 1us: split
    assert len(out) == 6


def test_sessionize_tie_order(spark):
    # two events at the SAME microsecond straddling a gap boundary: ordering
    # must fall back to event_id deterministically in both engines
    rows = [(1, 9, _ts(0)), (2, 9, _ts(0)), (3, 9, _ts(40))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp_ntz")
    out = {
        r["session_idx"]: r["n_events"]
        for r in windows.sessionize(df, gap_s=1800).collect()
    }
    assert out == {0: 2, 1: 1}


def test_grouped_quantiles_interpolation(spark):
    vals = [1.0, 2.0, 3.0, 10.0]
    df = spark.createDataFrame([(1, v) for v in vals], "g long, v double")
    row = windows.grouped_quantiles(df, ["g"], "v", probs=(0.5, 0.9)).collect()[0]
    assert row["n"] == 4
    # linear interpolation at rank p*(n-1): numpy 'linear' is the same rule
    assert row["p50"] == round(float(np.quantile(vals, 0.5)), 6)
    assert row["p90"] == round(float(np.quantile(vals, 0.9)), 6)


def test_grouped_quantiles_approx_path(spark):
    df = spark.createDataFrame([(1, float(i)) for i in range(101)], "g long, v double")
    row = windows.grouped_quantiles(df, ["g"], "v", probs=(0.5,), exact=False).collect()[0]
    assert abs(row["p50"] - 50.0) <= 1.0  # t-digest approximate
