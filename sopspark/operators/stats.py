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


def global_ntile(
    df: DataFrame,
    order_cols: list,
    k: int,
    out_col: str = "ntile",
) -> DataFrame:
    """Exact ``NTILE(k) OVER (ORDER BY order_cols)`` WITHOUT the
    single-reducer global sort a no-partition Window costs.

    A plain ``Window.orderBy(...)`` moves EVERY row through one task —
    unrunnable when the input is corpus-sized. This instead:

    1. ``repartitionByRange`` on the ordering (a distributed sort: each
       partition holds one contiguous key range, in partition-index
       order) + ``sortWithinPartitions``,
    2. a partition-LOCAL ``row_number`` window keyed on
       ``spark_partition_id()`` (bounded state, no funnel),
    3. per-partition row counts collected to the driver (≤ shuffle
       partitions rows) become cumulative offsets, mapped back as a
       literal ``create_map`` — global rank = local rank + offset,
    4. the NTILE bucket is then pure arithmetic on (rank, n): with
       ``base, rem = divmod(n, k)``, the first ``rem`` buckets hold
       ``base+1`` rows, the rest ``base`` — identical tie semantics to
       the SQL-standard NTILE (the ``quality_deciles`` DuckDB oracle
       machine-verifies the equivalence bit-for-bit).

    ``order_cols`` must be a total order (include a unique tie-break)
    — same requirement any deterministic NTILE has. The input lineage
    is localCheckpointed so the count pass does not recompute upstream.
    """
    spark = df.sparkSession
    n_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    ranked = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["_pid"]: r["_c"]
        for r in ranked.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c")).collect()
    }
    n = sum(counts.values())
    if n == 0:
        return ranked.withColumn(out_col, F.lit(None).cast("int")).drop("_pid")
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("_pid"),
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    rn = F.row_number().over(w) + off  # 1-based global rank
    base, rem = divmod(n, k)
    if base == 0:
        tile = rn  # fewer rows than buckets: row i lands in bucket i
    else:
        cutoff = rem * (base + 1)
        tile = F.when(rn <= cutoff, F.floor((rn - 1) / (base + 1)) + 1).otherwise(
            rem + F.floor((rn - cutoff - 1) / base) + 1
        )
    return ranked.withColumn(out_col, tile.cast("int")).drop("_pid")


def rolling_zscore(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    window_rows: int = 10,
    threshold: float = 2.0,
    min_baseline: int = 3,
) -> DataFrame:
    """Per-entity rolling anomaly detection: each event's value is
    z-scored against the mean/stddev of its ``window_rows`` PRECEDING
    events (current row excluded, so a spike cannot dilute its own
    baseline); rows with ``|z| >= threshold`` are flagged — the standard
    streaming-metrics outlier primitive.

    One window shuffle keyed on the entity; mean, stddev, and the
    baseline count share the single frame. Deterministic (ts, tiebreak)
    ordering; a row with fewer than ``min_baseline`` preceding events
    has no statistically meaningful baseline and is never flagged (a
    2-point baseline flags nearly anything).
    z is rounded to 4 decimals (stddev accumulation order differs
    between engines at ~1e-12 — rounding absorbs it for the SQL twin).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(entity_col)
        .orderBy(F.col(ts_col), F.col(order_tiebreak))
        .rowsBetween(-window_rows, -1)
    )
    mu = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    nb = F.count(value_col).over(w)
    z = F.round((F.col(value_col) - mu) / sd, 4)
    return (
        events.select(entity_col, order_tiebreak, ts_col, value_col)
        .withColumn("_nb", nb)
        .withColumn("z", z)
        .where(
            (F.col("_nb") >= min_baseline)
            & F.col("z").isNotNull()
            & (F.abs(F.col("z")) >= threshold)
        )
        .drop("_nb")
    )


def rolling_zscore_oracle_sql(
    events_sql: str, window_rows: int = 10, threshold: float = 2.0,
    min_baseline: int = 3,
) -> str:
    """DuckDB twin of :func:`rolling_zscore`. ``events_sql`` must yield
    (user_id, event_id, ts, value)."""
    return f"""
    WITH scored AS (
      SELECT user_id, event_id, ts, value,
             COUNT(value) OVER w AS nb,
             ROUND((value - AVG(value) OVER w) / STDDEV_SAMP(value) OVER w, 4) AS z
      FROM ({events_sql})
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {window_rows} PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, ts, value, z
    FROM scored
    WHERE nb >= {min_baseline} AND z IS NOT NULL AND ABS(z) >= {threshold}
    ORDER BY user_id, event_id
    """
