"""Scalable exact statistics: histogram-based interpolated percentiles.

Spark's built-in ``percentile`` aggregate buffers EVERY group value in the
aggregation state — exact, but O(rows-per-group) memory, which at 100 TB
with a handful of groups is an executor OOM, not a statistic. For integer
/ low-cardinality measures the exact interpolated percentile is
computable from the VALUE HISTOGRAM instead:

1. ``groupBy(group, value).count()`` — map-side combined, state bounded
   by |distinct values| per group (thousands, not billions),
2. a cumulative-count window per group over the (tiny) histogram,
3. the interpolated percentile reads the values at ranks ``floor(h)`` and
   ``ceil(h)`` where ``h = (n-1)·q`` — two conditional-min lookups — and
   blends them with ``frac = h - floor(h)``.

The result is bit-identical to ``percentile(value, q)`` / DuckDB's
``quantile_cont`` (same R-7 interpolation), verified by the
``corpus_stats`` oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def percentiles_by_histogram(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: dict[str, float],
) -> DataFrame:
    """Per-group exact interpolated percentiles of an integer-ish measure.

    Returns one row per group with, for each ``name: q`` in ``qs``, a
    double column ``name``; plus ``n`` (count) and ``mean``.
    """
    # null measures are ignored, matching the builtin percentile()/avg()
    # (a NULL bucket would otherwise sort first and shift every rank)
    hist = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wg = Window.partitionBy(group_col)
    wcum = wg.orderBy(value_col)
    cum = (
        hist.withColumn("_cum", F.sum("_c").over(wcum))
        .withColumn("_n", F.sum("_c").over(wg))
        .withColumn("_sum", F.sum(F.col(value_col).cast("double") * F.col("_c")).over(wg))
    )

    aggs = [
        F.max("_n").cast("bigint").alias("n"),
        (F.max("_sum") / F.max("_n").cast("double")).alias("mean"),
    ]
    for name, q in qs.items():
        # h = (n-1)·q; value at 0-indexed rank k = min value with cum > k
        h = (F.col("_n") - 1).cast("double") * F.lit(float(q))
        lo_k = F.floor(h)
        hi_k = F.ceil(h)
        v_lo = F.min(F.when(F.col("_cum") > lo_k, F.col(value_col).cast("double")))
        v_hi = F.min(F.when(F.col("_cum") > hi_k, F.col(value_col).cast("double")))
        frac = F.max(h - lo_k.cast("double"))
        aggs.append((v_lo + frac * (v_hi - v_lo)).alias(name))

    return cum.groupBy(group_col).agg(*aggs)
