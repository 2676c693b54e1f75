"""Time-series resampling: regular ticks per key + forward fill.

Event streams are irregular; downstream feature pipelines want regular
grids ("the latest reading as of every hour"). The scalable shape:

1. one aggregate per key → (min_ts, max_ts) — tiny,
2. ``sequence(min, max, interval)`` + ``explode`` generates the tick
   grid JVM-side (no driver loop, no Python),
3. the existing single-shuffle as-of join (:mod:`sopspark.operators.
   asof`) attaches the last at-or-before observation to every tick —
   forward fill IS an as-of join against the grid.

Total: one agg + one window shuffle. The naive per-key collect-and-loop
or a grid×events inequality join would be O(n·m).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sopspark.operators.asof import asof_join


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    step: str = "1 hour",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per key, one row per ``step`` tick from its first to its last
    observation, carrying the most recent at-or-before observation's
    columns (suffixed ``_r`` on collision). Ticks are anchored at each
    key's first observation (not calendar-aligned), matching
    ``sequence(min, max, interval)`` on both engines."""
    span = df.groupBy(key_col).agg(
        F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1")
    )
    ticks = span.select(
        key_col,
        F.explode(
            F.sequence(F.col("_t0"), F.col("_t1"), F.expr(f"INTERVAL {step}"))
        ).alias("tick"),
    )
    return asof_join(
        ticks, df, on=key_col, left_ts="tick", right_ts=ts_col, tiebreak=tiebreak
    )
