"""Entity linking: broadcast alias-dictionary join + candidate scoring.

north_star: "entity linking scores candidate IRIs via broadcast-joined alias
dictionaries with salted repartitioning to defuse hot-entity skew".

Design for scale:
  * the alias dictionary is small relative to mentions → ``F.broadcast``
    hash join: the mention side never shuffles for the join, so the hot
    alias ("Bob" ≈ 10% of all mentions by construction) is harmless here —
    every partition joins locally against the broadcast map.
  * candidate scoring / argmax runs as ONE hash aggregate keyed by the
    mention *occurrence* (conv_id, turn_idx, m_id, p) — occurrence keys are
    unique, so the aggregate has no skew and partial (map-side) aggregation
    collapses nearly everything before the exchange. The deterministic
    argmax is ``min_by(candidate, struct(-prior, candidate))`` — highest
    prior, ties to the lexicographically smallest IRI.
  * truly skewed per-entity aggregations (entity mention histograms, where
    "Bob" is one giant key) go through :func:`salted_agg_count` — the
    two-phase salted aggregate — with AQE skew handling as backstop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _argmax(value: str, prior: str) -> Column:
    return F.min_by(value, F.struct((-F.col(prior)).alias("np"), F.col(value).alias("v")))


def link_entities(mentions: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """Mention rows → linked triples (conv_id, s, p, o_iri, o_lit).

    ``mentions``: output of :func:`sopspark.kg.extract.extract_triples`
    (s_alias, p, o_alias|o_lit, o_etype per occurrence).
    ``alias_dict``: (alias, iri, prior, etype).

    Unlinkable mentions (alias absent from the dictionary) are dropped —
    precision over recall, mirroring the reference's drop-on-error stream
    discipline (``src/filter.rs:36``).
    """
    person = F.broadcast(
        alias_dict.where(F.col("etype") == "person").select(
            F.col("alias").alias("s_alias"),
            F.col("iri").alias("s_cand"),
            F.col("prior").alias("s_prior"),
        )
    )
    objects = F.broadcast(
        alias_dict.select(
            F.col("alias").alias("o_alias"),
            F.col("etype").alias("o_etype"),
            F.col("iri").alias("o_cand"),
            F.col("prior").alias("o_prior"),
        )
    )

    joined = mentions.join(person, on="s_alias", how="inner").join(
        objects, on=["o_alias", "o_etype"], how="left"
    )

    linked = (
        joined.groupBy("conv_id", "turn_idx", "m_id", "p")
        .agg(
            _argmax("s_cand", "s_prior").alias("s"),
            _argmax("o_cand", "o_prior").alias("o_iri"),
            F.first("o_lit", ignorenulls=True).alias("o_lit"),
            F.first("o_etype", ignorenulls=True).alias("o_etype"),
        )
        # drop occurrences whose object slot needed linking but found nothing
        .where(F.col("o_etype").isNull() | F.col("o_iri").isNotNull())
        .select("conv_id", "turn_idx", "s", "p", "o_iri", "o_lit")
    )
    return linked


# ---------------------------------------------------------------------------
# skew tooling
# ---------------------------------------------------------------------------

def salted_agg_count(df: DataFrame, key: str, salt_buckets: int = 32) -> DataFrame:
    """Two-phase salted count per key: ``groupBy(key, salt) → groupBy(key)``.

    For hot keys (one entity owning ≥10% of rows) a single-phase groupBy
    hashes every row of the hot key to one reducer; salting splits it over
    ``salt_buckets`` reducers first, then combines the (tiny) partials.
    Spark's map-side partial aggregation already helps for plain counts —
    this is the explicit pattern for aggregates where partials don't
    collapse (e.g. large collect-style states), and the documented
    north_rule skew defusal.
    """
    salted = df.withColumn("_salt", F.pmod(F.crc32(F.monotonically_increasing_id().cast("string")), F.lit(salt_buckets)))
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias("n"))


def entity_histogram(linked: DataFrame, salt_buckets: int = 32) -> DataFrame:
    """Per-entity mention counts (subject position) — the skewed aggregate
    the synthetic hot alias exercises."""
    return salted_agg_count(linked.select(F.col("s").alias("entity")), "entity", salt_buckets)
