"""Mergeable cardinality sketches: KMV (k-minimum-values) distinct count.

Spark's built-in ``approx_count_distinct`` is an HLL whose register state
is opaque — it can't be oracle-verified and can't be persisted/merged by
downstream SQL engines. A KMV sketch over the engine-shared 48-bit md5
lane is (a) deterministic — the estimate is a pure function of the value
SET, independent of partitioning, ordering, and retries — and (b) exactly
replicable in any SQL engine ("the k smallest distinct hashes"), so the
DuckDB oracle pins it bit-for-bit.

Scale shape (two bounded stages, no unbounded per-group state):

1. ``mapInPandas`` partial sketch: each Arrow batch keeps at most k
   smallest distinct hashes per group — output is ≤ k rows per (group ×
   batch), bounded memory, no shuffle.
2. one hash exchange on the group key; ``collect_set`` over the pruned
   hashes (≤ k × num_partitions values per group — bounded by the plan,
   not by the data), sort, slice to k.

Estimator (Bar-Yossef et al. 2002): with U = k-th smallest hash as a
fraction of the hash space, ``D ≈ (k-1)/U``; exact when fewer than k
distinct values exist.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_SPACE = float(1 << 48)


def _pruned_hashes(
    df: DataFrame, group_col: str, value_col: str, k: int
) -> DataFrame:
    """(group, h) rows pruned to ≤ k smallest distinct hashes per (group ×
    Arrow batch) — the bounded-state stage every KMV entry point shares.

    Null values hash to null and count nothing toward any group's distinct
    set — filtered identically on the oracle side (md5(NULL) IS NULL there
    too); a group whose values are ALL null therefore has no output row in
    either engine.
    """
    from sopspark.text.dedup import md5_hash48

    hashed = df.select(
        F.col(group_col).cast("string").alias(group_col),
        md5_hash48(F.col(value_col).cast("string")).alias("h"),
    ).where(F.col("h").isNotNull())

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield (
                pdf.drop_duplicates()
                .sort_values([group_col, "h"])
                # dropna=False: a null GROUP key is a real group (matching
                # Spark's groupBy and the SQL oracle), not a row to discard
                .groupby(group_col, sort=False, dropna=False)
                .head(k)
            )

    return hashed.mapInPandas(partial, schema=f"{group_col} string, h bigint")


def kmv_sketch_table(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """The MERGEABLE sketch representation: per group, the sorted array of
    (at most) k smallest distinct hashes. Shippable across jobs/tables and
    unioned with :func:`kmv_merge`; the input stream is pruned batch-side
    first, so the final collect_set holds ≤ k × num_partitions values per
    group — bounded by the plan, never by the data."""
    return _pruned_hashes(df, group_col, value_col, k).groupBy(group_col).agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("hs")
    )


def kmv_merge(a: DataFrame, b: DataFrame, group_col: str, k: int = 64) -> DataFrame:
    """Merge two sketch tables: union the retained hashes per group and
    keep the k smallest distinct — EXACTLY the sketch of the unioned
    inputs (the KMV merge property), so sharded corpora sketch
    independently and combine without rescanning."""
    both = a.unionByName(b)
    ex = both.select(group_col, F.explode("hs").alias("h"))
    return ex.groupBy(group_col).agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("hs")
    )


def kmv_finalize(sketch: DataFrame, group_col: str, k: int = 64) -> DataFrame:
    """Sketch table → (n_hashes, kth_hash, est_distinct): ``n_hashes`` =
    min(k, true distinct), ``kth_hash`` the largest retained hash, and the
    estimate — exact when the group has fewer than k distinct values."""
    n = F.size("hs")
    kth = F.element_at("hs", -1)
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) / (kth.cast("double") / F.lit(HASH_SPACE))
    )
    return sketch.select(
        F.col(group_col),
        n.alias("n_hashes"),
        kth.cast("bigint").alias("kth_hash"),
        F.round(est, 4).alias("est_distinct"),
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate — literally
    ``kmv_finalize(kmv_sketch_table(...))``."""
    return kmv_finalize(kmv_sketch_table(df, group_col, value_col, k), group_col, k)


def cms_sketch(
    df: DataFrame, value_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of a key column:
    d hash lanes × w buckets of counts. Returns ``(lane, bucket, cnt)``
    — at most d·w rows regardless of input size, so the sketch is a
    broadcastable, element-wise-mergeable summary (union two sketch
    tables and re-sum to merge shards).

    Scale shape: one map-side explode to d rows per input row, then a
    single hash aggregate on (lane, bucket) — partial combine collapses
    each partition to ≤ d·w rows before the exchange, so shuffle volume
    is bounded by the PLAN (d·w·partitions), never by the data. Hashes
    are the engine-shared 48-bit md5 lanes (seeded per lane), so a SQL
    engine replicates the sketch bit-for-bit.
    """
    from sopspark.text.dedup import md5_hash48

    v = F.col(value_col).cast("string")
    lanes = F.array(*[
        F.struct(
            F.lit(j).alias("lane"),
            F.pmod(md5_hash48(v, seed=j), F.lit(w)).cast("int").alias("bucket"),
        )
        for j in range(d)
    ])
    return (
        df.where(v.isNotNull())
        .select(F.explode(lanes).alias("lb"))
        .groupBy(F.col("lb.lane").alias("lane"), F.col("lb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """Point-estimate each key in ``keys`` against a :func:`cms_sketch`
    table: min over lanes of the key's bucket count (the CMS guarantee:
    ``est >= true``, overestimates only from collisions). The join is
    keys×d rows against ≤ d·w sketch rows — the sketch side broadcasts."""
    from sopspark.text.dedup import md5_hash48

    v = F.col(key_col).cast("string")
    lanes = F.array(*[
        F.struct(
            F.lit(j).alias("lane"),
            F.pmod(md5_hash48(v, seed=j), F.lit(w)).cast("int").alias("bucket"),
        )
        for j in range(d)
    ])
    probes = keys.select(F.col(key_col), F.explode(lanes).alias("lb")).select(
        key_col, F.col("lb.lane").alias("lane"), F.col("lb.bucket").alias("bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["lane", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est"))
    )


def cms_oracle_sql(
    key_expr: str, table: str, d: int = 4, w: int = 256
) -> str:
    """DuckDB twin: the identical sketch + point estimates for every
    distinct key of ``table`` (rows where ``key_expr`` is null are
    excluded, matching the Spark side)."""
    from sopspark.text.dedup import md5hex48_sql

    parts = []
    for j in range(d):
        h = md5hex48_sql(f"CONCAT('{j}:', CAST({key_expr} AS VARCHAR))")
        parts.append(
            f"SELECT {j} AS lane, {h} % {w} AS bucket, "
            f"CAST({key_expr} AS VARCHAR) AS k FROM {table} "
            f"WHERE {key_expr} IS NOT NULL"
        )
    lane_rows = " UNION ALL ".join(parts)
    return f"""
WITH lanes AS MATERIALIZED ({lane_rows}),
sketch AS MATERIALIZED (
  SELECT lane, bucket, COUNT(*) AS cnt FROM lanes GROUP BY lane, bucket
),
probes AS MATERIALIZED (SELECT DISTINCT lane, bucket, k FROM lanes)
SELECT k, CAST(MIN(cnt) AS BIGINT) AS est
FROM probes JOIN sketch USING (lane, bucket)
GROUP BY k
"""


def kmv_oracle_sql(group_col: str, value_expr: str, table: str, k: int = 64) -> str:
    """DuckDB SQL computing the identical per-group KMV sketch."""
    from sopspark.text.dedup import md5hex48_sql

    h = md5hex48_sql(f"CAST({value_expr} AS VARCHAR)")
    return f"""
WITH hashed AS (
  SELECT DISTINCT CAST({group_col} AS VARCHAR) AS g,
         {h} AS h
  FROM {table}
  WHERE {value_expr} IS NOT NULL
), ranked AS (
  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
  FROM hashed
), topk AS (
  SELECT g, COUNT(*) AS n_hashes, MAX(h) AS kth_hash
  FROM ranked WHERE rn <= {k} GROUP BY g
)
SELECT g AS {group_col},
       CAST(n_hashes AS INT) AS n_hashes,
       kth_hash,
       round(CASE WHEN n_hashes < {k} THEN CAST(n_hashes AS DOUBLE)
                  ELSE {float(k - 1)!r} / (CAST(kth_hash AS DOUBLE) / {HASH_SPACE!r})
             END, 4) AS est_distinct
FROM topk
"""
