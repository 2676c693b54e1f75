"""``sessionize`` — gap-based event sessionization.

The classic event-stream operator a transcript/agent-log pipeline needs
upstream of turn assembly (the reference's input model is a flat quad
stream, so this lives beyond its CLI surface — it is part of this engine's
large-scale training-data toolkit, like dedup and curation).

Scale design: exactly ONE shuffle — the window partition on the actor key.
Both windows (the ``lag`` gap flag and the running ``sum`` that numbers
sessions) share the same ``partitionBy(actor).orderBy(ts, id)`` spec, so
Catalyst evaluates them in a single Window node over a single exchange;
per-session aggregates then reuse the same hash-partitioning (actor is a
prefix of the (actor, session) grouping key, so AQE keeps them co-located).
Skewed actors (bots emitting millions of events) bound the window state
per actor; for pathological single-actor skew, pre-split by day before
sessionizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    actor_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str | None = None,
    gap_seconds: int = 1800,
    out_col: str = "session_ord",
) -> DataFrame:
    """Assign 1-based session ordinals per actor: a new session starts when
    the gap to the previous event exceeds ``gap_seconds``. Ordering is
    ``(ts, order_col)`` so equal timestamps stay deterministic."""
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(actor_col).orderBy(*order)
    # exact integer microseconds (not a truncating cast-to-seconds) so the
    # gap comparison is engine-portable and boundary-exact; the cast makes
    # TIMESTAMP_NTZ inputs acceptable (exact under the UTC session tz the
    # engine pins in session.py)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_ts = F.lag(us).over(w)
    new_sess = F.when(
        prev_ts.isNull() | (us - prev_ts > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(
        out_col,
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame,
    actor_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str | None = None,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-actor session summary: session count, event count, and the
    largest single-session event count — one shuffle end to end."""
    s = sessionize(df, actor_col, ts_col, order_col, gap_seconds)
    per_sess = s.groupBy(actor_col, "session_ord").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return per_sess.groupBy(actor_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("_n").alias("n_events"),
        F.max("_n").alias("max_session_events"),
    )
