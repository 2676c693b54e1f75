"""As-of (temporal point-in-time) join.

The reference has no temporal join — its streams carry no event time — but
a transcript/event pipeline at scale constantly needs "the latest prior X
for each Y" (last click before a purchase, last tool call before an error,
feature value as of a label timestamp). A naive implementation is an
inequality join (``l.ts >= r.ts``) which Spark can only execute as a
broadcast-nested-loop or a range join — O(n·m) per key and a non-starter
at 100 TB.

This implementation is the single-shuffle union-window plan:

1. tag left and right rows and union them into one relation,
2. one hash exchange on the join key,
3. a running ``last(right_payload, ignorenulls=True)`` window ordered by
   ``(ts, side, tiebreak)`` — right rows sort before left rows at equal
   timestamps so ``<=`` semantics hold, and the tiebreak column makes the
   pick deterministic when several right rows share a timestamp,
4. keep the left rows and unpack the carried payload.

The window frame is a running frame (``rowsBetween(unboundedPreceding,
currentRow)``), so Spark streams it in sort order with O(1) state per
partition — no per-key materialization, and the whole join costs exactly
one shuffle. Skewed keys behave like any windowed aggregation: AQE cannot
split a window partition, so a pathologically hot key should be pre-split
upstream (e.g. sessionized) — documented, not hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the single right row with the greatest
    ``right_ts <= left_ts`` (direction="backward") or smallest
    ``right_ts >= left_ts`` ("forward") sharing the ``on`` key.

    Right columns (except the key) come back suffixed; unmatched left rows
    keep nulls (left-outer semantics). ``tiebreak`` names a right column
    that breaks right-side timestamp ties deterministically (greatest wins
    backward, smallest wins forward); when None, ties break on the packed
    payload struct. ``tolerance_us`` drops matches further than that many
    microseconds from the left timestamp.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    rcols = [c for c in right.columns if c != on]
    payload = F.struct(*[F.col(c).alias(c) for c in rcols])
    lcols = [c for c in left.columns]

    # a null right timestamp can never satisfy <= / >= — drop those rows
    # up front (asc_nulls_first would otherwise sort them to the partition
    # head and hand them out as spurious matches)
    r = right.where(F.col(right_ts).isNotNull()).select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        (F.col(tiebreak) if tiebreak else F.lit(None)).alias("_tb"),
        payload.alias("_pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).alias("_tb"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    both = r.unionByName(l)

    # the _pay struct participates in the ordering only when no explicit
    # tiebreak is given (it makes ties deterministic, but a struct with an
    # unorderable field — e.g. a map column — cannot be a sort key, so an
    # explicit tiebreak must opt out of it)
    pay_asc = [F.col("_pay").asc_nulls_first()] if tiebreak is None else []
    pay_desc = [F.col("_pay").desc_nulls_first()] if tiebreak is None else []
    if direction == "backward":
        # right rows first at equal ts (<= includes them); last() picks the
        # right row with max (ts, tiebreak) among those at-or-before.
        order = [F.col("_t").asc_nulls_first(), F.col("_side").asc(),
                 F.col("_tb").asc_nulls_first(), *pay_asc]
    else:
        # scan time-descending so the running last() is the EARLIEST
        # at-or-after right row; right still sorts before left at equal ts.
        order = [F.col("_t").desc_nulls_last(), F.col("_side").asc(),
                 F.col("_tb").desc_nulls_first(), *pay_desc]

    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        both.withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
        .withColumn("_mt", F.last(F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    # a null LEFT timestamp satisfies neither <= nor >= — mask any match
    # the scan order handed it (backward's asc_nulls_first already yields
    # none; forward's desc_nulls_last would otherwise see every right row)
    matched = matched.withColumn(
        "_m", F.when(F.col("_t").isNotNull(), F.col("_m"))
    ).withColumn("_mt", F.when(F.col("_t").isNotNull(), F.col("_mt")))
    if tolerance_us is not None:
        gap = F.abs(
            F.unix_micros(F.col("_t").cast("timestamp"))
            - F.unix_micros(F.col("_mt").cast("timestamp"))
        )
        keep = F.col("_m").isNotNull() & (gap <= F.lit(tolerance_us))
        matched = matched.withColumn("_m", F.when(keep, F.col("_m"))).withColumn(
            "_mt", F.when(keep, F.col("_mt"))
        )

    seen = set(lcols) | {on}
    out = [F.col(f"_l_{c}").alias(c) for c in lcols] + (
        [] if on in lcols else [F.col("_k").alias(on)]
    )
    for c in rcols:
        name = c + suffix if c in seen else c
        out.append(F.col("_m")[c].alias(name))
    return matched.select(*out)
