"""Banded range (interval) join.

"Find all pairs within Δt of each other" is an inequality join — Spark's
only native plans for it are broadcast-nested-loop or a cartesian filter,
both O(n·m) per key and hopeless at scale. The standard distributed
rewrite is BANDING: quantize time into buckets of width Δt, equi-join on
(key, bucket) for the three adjacent buckets, then apply the exact
predicate as a post-filter. Every qualifying pair lands in at least one
of the bucket alignments (|t_l − t_r| ≤ Δt ⟹ bucket distance ≤ 1), and
each pair is produced exactly once because the candidate generator
explodes only the LEFT side into its three neighboring buckets while the
right side stays single-bucket.

Cost: one shuffle per side on (key, bucket) — the equi-join — with 3×
left-side duplication; AQE handles bucket skew like any hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    max_gap_us: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs sharing ``on`` with
    ``|left_ts − right_ts| <= max_gap_us`` (microseconds).

    Inner-join semantics; right columns come back suffixed on collision.
    Null timestamps never pair.
    """
    if max_gap_us <= 0:
        raise ValueError("max_gap_us must be positive")

    lus = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rus = F.unix_micros(F.col(right_ts).cast("timestamp"))

    l = (
        left.where(F.col(left_ts).isNotNull())
        .withColumn("_us_l", lus)
        .withColumn(
            "_bk",
            F.explode(
                F.array(
                    F.floor(F.col("_us_l") / max_gap_us) - 1,
                    F.floor(F.col("_us_l") / max_gap_us),
                    F.floor(F.col("_us_l") / max_gap_us) + 1,
                )
            ),
        )
    )
    r = (
        right.where(F.col(right_ts).isNotNull())
        .withColumn("_us_r", rus)
        .withColumn("_bk", F.floor(F.col("_us_r") / max_gap_us))
    )

    lcols = set(left.columns)
    rename = [
        F.col(c).alias(c + suffix) if c in lcols and c != on else F.col(c)
        for c in right.columns
        if c != on
    ]
    r = r.select(F.col(on), F.col("_bk"), F.col("_us_r"), *rename)

    joined = l.join(r, [on, "_bk"]).where(
        F.abs(F.col("_us_l") - F.col("_us_r")) <= max_gap_us
    )
    return joined.drop("_bk", "_us_l", "_us_r")
