"""Window/aggregation operators beyond plain rollups: event-time
sessionization and grouped exact quantiles.

Scale shapes:
* ``sessionize``: one shuffle on the user key; the gap-flag + running-sum
  window is whole-stage-codegen'd.  Skewed power-users are bounded by the
  per-user window (no cross-user state); at trillion-row scale pre-partition
  by (user, day) and stitch boundary sessions, or use
  streaming.stream_exact_dedup's applyInPandasWithState pattern.
* ``grouped_quantiles``: exact percentiles hold the group's values sorted in
  memory — safe when group count is bounded (tile grids at low zoom: O(4^z)
  groups).  At high zoom / unbounded groups switch to
  ``F.percentile_approx`` (t-digest, mergeable partial aggregation) — same
  call shape, bounded state.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_s: int = 1800,
) -> DataFrame:
    """Split each user's event stream into sessions at gaps > ``gap_s``.

    Returns one row per (user, session_idx): n_events, start_us, end_us,
    duration_us.  Timestamps compare at microsecond precision
    (second-resolution unix_timestamp would merge sub-second gaps
    differently across engines).  Ordering ties break on ``order_col`` with
    an explicit ROWS frame — deterministic across engines.
    """
    # tz-independent epoch micros: the events table stores TIMESTAMP_NTZ,
    # and unix_micros(cast-to-timestamp) would shift by the session zone
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {ts_col})"
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lag_w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(order_col))
    gap_flag = F.when(
        us - F.lag(us).over(lag_w) > F.lit(gap_s * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    with_s = df.select(
        F.col(user_col), F.col(ts_col), F.col(order_col), us.alias("_us")
    ).withColumn("session_idx", F.sum(gap_flag).over(w))
    return with_s.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
        (F.max("_us") - F.min("_us")).alias("duration_us"),
    )


def grouped_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probs: Sequence[float] = (0.5, 0.9),
    exact: bool = True,
) -> DataFrame:
    """Per-group percentiles of ``value_col``.  exact=True uses
    ``F.percentile`` (linear interpolation on the sorted group — identical
    definition to DuckDB's quantile_cont); exact=False uses
    ``F.percentile_approx`` for unbounded group counts."""
    fn = F.percentile if exact else F.percentile_approx
    aggs = [
        F.round(fn(F.col(value_col), F.lit(float(p))), 6).alias(
            f"p{int(round(p * 100))}"
        )
        for p in probs
    ]
    return df.groupBy(*group_cols).agg(F.count("*").alias("n"), *aggs)


def exact_distinct_per_key(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """EXACT distinct counts per key, scale-safe: dedup (keys, value) first
    (partial-aggregates map-side, so the shuffle carries distinct pairs,
    not rows), then count per key.  This is the shape that survives hot
    keys at corpus scale — a direct ``countDistinct`` builds the whole
    distinct set inside one aggregation; two-stage lets the dedup shuffle
    spread over (keys ⊗ value) before the per-key count collapses it.
    Exact and engine-portable (value-oracled), unlike HLL sketches
    (``approx_count_distinct``), whose estimates differ per implementation
    — use the approx form only when a few % error is acceptable and swap is
    then one line."""
    keys = list(keys)
    pairs = df.select(*keys, distinct_col).distinct()
    return pairs.groupBy(*keys).agg(F.count(F.lit(1)).alias(out_col))
