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
