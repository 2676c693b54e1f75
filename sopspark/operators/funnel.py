"""Ordered-sequence (conversion-funnel) matching over event streams.

The windowed-funnel analytics operator (the shape of ClickHouse's
``windowFunnel`` / Amplitude-style conversion queries), Spark-first: ONE
shuffle on the user key, then a per-user sorted-array scan — no
self-join-per-step (the naive k-step funnel as k-1 self-joins shuffles the
event table k times and explodes on hot users).

Semantics (deterministic, oracle-replicable): step 1 matches the earliest
(ts, id)-ordered event of its type; step i+1 matches the earliest event of
its type STRICTLY after step i's timestamp (ties at the same instant do not
advance). Optional ``window_seconds`` requires the whole funnel to fit in a
time window anchored at step 1.

Scale shape: events are pre-filtered to the funnel's own types before the
groupBy, so per-user state is bounded by funnel-relevant activity, not raw
event volume; the aggregate is map-side combined (collect_list partials)
and the scan is one pass over the sorted array. Hot-key regime: cap or
salt per-user arrays like kg/link.py::salted_agg_count before the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    window_seconds: int | None = None,
) -> DataFrame:
    """Per-user funnel progress: ``(user, n_steps, t_first, t_last)``.

    ``n_steps`` = how many of ``steps`` completed in order; ``t_first`` /
    ``t_last`` = timestamps of the first and the last COMPLETED step
    (null when ``n_steps`` is 0).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    n = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])

    evs = (
        df.where(F.col(type_col).isin(steps))
        .groupBy(user_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(ts_col), F.col(id_col), F.col(type_col)))
            ).alias("_evs")
        )
    )
    # scan state: (step reached so far, ts of last matched step, ts of
    # first matched step); events arrive in (ts, id) order from sort_array
    init = F.struct(
        F.lit(0).alias("step"),
        F.lit(None).cast("timestamp").alias("t_last"),
        F.lit(None).cast("timestamp").alias("t_first"),
    )

    def advance(acc, e):
        want = F.element_at(step_arr, acc["step"] + 1)
        in_window = (
            F.lit(True)
            if window_seconds is None
            else (
                acc["t_first"].isNull()
                | (
                    e[ts_col].cast("long") - acc["t_first"].cast("long")
                    <= F.lit(int(window_seconds))
                )
            )
        )
        matches = (
            (acc["step"] < n)
            & (e[type_col] == want)
            & (acc["t_last"].isNull() | (e[ts_col] > acc["t_last"]))
            & in_window
        )
        return F.struct(
            F.when(matches, acc["step"] + 1).otherwise(acc["step"]).alias("step"),
            F.when(matches, e[ts_col]).otherwise(acc["t_last"]).alias("t_last"),
            F.when(matches & (acc["step"] == 0), e[ts_col])
            .otherwise(acc["t_first"])
            .alias("t_first"),
        )

    state = F.aggregate(F.col("_evs"), init, advance)
    return evs.select(
        user_col,
        state["step"].alias("n_steps"),
        state["t_first"].alias("t_first"),
        state["t_last"].alias("t_last"),
    )
