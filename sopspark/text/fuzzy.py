"""Exact fuzzy matching for entity resolution: all pairs within edit
distance 1, without the quadratic join.

FastSS deletion signatures (Bocek et al. 2007, "Fast Similarity Search
in Large Dictionaries"): for each string s, its signature set is
``{s} ∪ {s with one character deleted}``. Two strings within edit
distance 1 ALWAYS share a signature (equal → s itself; deletion → the
shorter string; substitution at i → both drop position i), so an
equi-join of the exploded signature index finds every qualifying pair —
candidates are then verified with the built-in ``levenshtein`` (the
signature intersection admits false positives like "ab"/"ba", never
false negatives).

Scale shape: |s|+1 signature rows per string (bounded, map-side
explode), one equi-join on the signature string, pair-dedup, then a
JVM ``levenshtein`` verify per surviving pair. The signature join key is
a near-unique string, so posting lists stay tiny — this is the standard
blocking structure for fuzzy entity dedup at corpus scale. The DuckDB
oracle is the UNBLOCKED quadratic levenshtein join, so parity
machine-verifies the blocking's completeness (recall = 1.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _signatures(col):
    """{s} ∪ del1(s) as an array column (JVM-side, no Python)."""
    n = F.length(col)
    dels = F.when(
        n >= 1,  # sequence(1, 0) would DESCEND, not return empty
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat(col.substr(F.lit(1), i - 1), col.substr(i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.concat(F.array(col), dels))


def fuzzy_pairs_ed1(
    df: DataFrame, text_col: str = "name", id_col: str = "id"
) -> DataFrame:
    """Every unordered pair of rows whose ``text_col`` values are within
    edit distance 1 (including exact duplicates at distance 0). Returns
    ``(id_a, id_b, dist)``."""
    base = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_t")
    ).where(F.col(text_col).isNotNull())
    sigs = base.select(
        "_id", "_t", F.explode(_signatures(F.col("_t"))).alias("_sig")
    )
    a = sigs.select(F.col("_id").alias("_ida"), F.col("_t").alias("_ta"), "_sig")
    b = sigs.select(F.col("_id").alias("_idb"), F.col("_t").alias("_tb"), "_sig")
    cands = (
        a.join(b, "_sig")
        .where(F.col("_ida") < F.col("_idb"))
        .select("_ida", "_idb", "_ta", "_tb")
        .dropDuplicates(["_ida", "_idb"])
    )
    return (
        cands.withColumn("dist", F.levenshtein("_ta", "_tb"))
        .where(F.col("dist") <= 1)
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            F.col("dist").cast("int").alias("dist"),
        )
    )
