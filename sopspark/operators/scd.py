"""Type-2 slowly-changing-dimension merge (entity-attribute history).

A KG/warehouse pipeline tracks how entity attributes change over time:
each key keeps a history of rows with ``[valid_from, valid_to)`` ranges,
exactly one open row (``valid_to IS NULL``) per live key. ``scd2_merge``
applies one batch of updates:

  * changed attributes → the open row closes at the update's effective
    time and a new open row is inserted,
  * unchanged attributes → no-op (idempotent re-delivery),
  * unseen keys → a new open row.

Scale shape: the update batch is reduced to one row per key (window
``row_number`` over the batch — batch-sized, not history-sized), then a
single equi-join against the OPEN rows only; closed history rows stream
through untouched. Everything shuffles once on the key. At 100 TB the
production twin is an Iceberg ``MERGE INTO`` with the same key + the
closed-rows pass-through; semantics here are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    eff_col: str = "eff_ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Apply one update batch to an SCD2 history table.

    ``current``: (key, *attrs, valid_from, valid_to) — valid_to null for
    open rows. ``updates``: (key, *attrs, eff_col). With several updates
    per key in one batch, the latest effective time wins (earlier ones in
    the same batch are skipped, matching a per-batch MERGE). Updates not
    strictly newer than the open row's valid_from are ignored.
    """
    wk = Window.partitionBy(key).orderBy(F.col(eff_col).desc())
    latest = (
        updates.withColumn("_rn", F.row_number().over(wk))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    closed = current.where(F.col(to_col).isNotNull())
    open_ = current.where(F.col(to_col).isNull())

    u = latest.select(
        F.col(key),
        F.col(eff_col).alias("_eff"),
        *[F.col(a).alias(f"_u_{a}") for a in attrs],
    )
    j = open_.join(u, key, "full_outer")

    same = F.lit(True)
    for a in attrs:
        same = same & F.col(a).eqNullSafe(F.col(f"_u_{a}"))
    has_open = F.col(from_col).isNotNull()
    has_upd = F.col("_eff").isNotNull()
    applies = has_upd & (~has_open | (F.col("_eff") > F.col(from_col)))
    changed = applies & has_open & ~same

    # surviving open rows: unchanged, or no applicable update
    keep_open = j.where(has_open & ~changed).select(*current.columns)
    # closed-out versions of changed rows
    close_out = j.where(changed).select(
        *[
            F.col("_eff").alias(c) if c == to_col else F.col(c)
            for c in current.columns
        ]
    )
    # new open rows: changed keys + brand-new keys
    inserts = j.where(applies & (changed | ~has_open)).select(
        *[
            F.col(f"_u_{c}").alias(c)
            if c in attrs
            else (
                F.col("_eff").alias(c)
                if c == from_col
                else (
                    F.lit(None).cast(current.schema[to_col].dataType).alias(c)
                    if c == to_col
                    else F.col(c)
                )
            )
            for c in current.columns
        ]
    )
    return closed.unionByName(keep_open).unionByName(close_out).unionByName(inserts)
