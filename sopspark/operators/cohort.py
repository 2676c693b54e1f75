"""Retention cohort analysis: the classic product-analytics rollup.

Users are grouped into weekly cohorts by their FIRST event; for each
(cohort week, week offset) the operator counts how many of that cohort's
users were active — the retention-curve table every analytics stack
materializes (the reference CLI has no analogue; this is an
engine-original operator family member).

Scale shape: one min-aggregate keyed on the user (cohort assignment),
one distinct on (user, week) — both map-side combined — and an equi-join
of activity against the user-sized cohort table, then a final count
aggregate. Three narrow-key shuffles total, all AQE-coalescible; no
window functions and nothing user-quadratic. Week truncation is
Monday-start in both Spark (`date_trunc('week', ts)`) and DuckDB, so
the offsets are exact integers and the SQL twin matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Weekly retention table: ``(cohort_week, offset_weeks, n_users)``
    where ``n_users`` counts the cohort's users active ``offset_weeks``
    after their first-ever week. ``offset_weeks = 0`` rows equal the
    cohort sizes. ``max_offset`` optionally caps the horizon."""
    wk = F.date_trunc("week", F.col(ts_col))
    activity = (
        events.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("_u"), wk.alias("_wk"))
        .distinct()
    )
    cohort = activity.groupBy("_u").agg(F.min("_wk").alias("_cohort"))
    joined = activity.join(cohort, "_u").withColumn(
        "offset_weeks",
        (F.datediff(F.col("_wk"), F.col("_cohort")) / 7).cast("int"),
    )
    if max_offset is not None:
        joined = joined.where(F.col("offset_weeks") <= max_offset)
    return (
        joined.groupBy(
            F.col("_cohort").cast("date").alias("cohort_week"), "offset_weeks"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


def retention_oracle_sql(events_sql: str, max_offset: int | None = None) -> str:
    """DuckDB twin. ``events_sql`` must yield (user_id, ts)."""
    cap = f"WHERE offset_weeks <= {max_offset}" if max_offset is not None else ""
    return f"""
    WITH activity AS (
      SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS wk
      FROM ({events_sql}) WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), cohort AS (
      SELECT u, MIN(wk) AS cohort FROM activity GROUP BY u
    ), offsets AS (
      SELECT cohort, CAST(date_diff('day', cohort, wk) / 7 AS INT) AS offset_weeks
      FROM activity JOIN cohort USING (u)
    )
    SELECT CAST(cohort AS DATE) AS cohort_week, offset_weeks,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM offsets {cap}
    GROUP BY 1, 2 ORDER BY cohort_week, offset_weeks
    """


def transition_matrix(
    events: DataFrame,
    actor_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-actor event
    sequences: ``(from_state, to_state, n, p)`` where ``p`` is the
    row-normalized transition probability — the user-journey model
    behind next-action prediction and funnel diagnostics.

    One window shuffle keyed on the actor (lead over deterministic
    (ts, tiebreak) order) + one map-side-combined pair count; the
    row normalizer is a second tiny aggregate joined back on the
    from-state (states are low-cardinality, so it broadcasts).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(actor_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    pairs = (
        events.select(
            F.col(actor_col),
            F.col(state_col).alias("from_state"),
            F.col(ts_col),
            F.col(tiebreak_col),
        )
        .withColumn("to_state", F.lead("from_state").over(w))
        .where(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    totals = pairs.groupBy("from_state").agg(F.sum("n").alias("_tot"))
    return pairs.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        "n",
        F.round(F.col("n") / F.col("_tot"), 6).alias("p"),
    )


def transition_oracle_sql(events_sql: str) -> str:
    """DuckDB twin of :func:`transition_matrix`. ``events_sql`` must
    yield (user_id, event_type, ts, event_id)."""
    return f"""
    WITH seq AS (
      SELECT event_type AS from_state,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_state
      FROM ({events_sql})
    ), pairs AS (
      SELECT from_state, to_state, COUNT(*) AS n
      FROM seq WHERE to_state IS NOT NULL GROUP BY 1, 2
    ), totals AS (
      SELECT from_state, SUM(n) AS tot FROM pairs GROUP BY 1
    )
    SELECT p.from_state, p.to_state, CAST(p.n AS BIGINT) AS n,
           ROUND(CAST(p.n AS DOUBLE) / t.tot, 6) AS p
    FROM pairs p JOIN totals t USING (from_state)
    ORDER BY from_state, to_state
    """
