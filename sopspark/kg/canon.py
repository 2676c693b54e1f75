"""Canonicalization stages: skolemize, owl:sameAs merge, graph materialize.

north_star: "canonicalization applies RDF skolemization plus a
GraphFrames/iterative connected-components union-find for owl:sameAs merging
before materializing N-Quads-equivalent graph tables".

Scale design:
  * skolemization is a pure Catalyst column rewrite (sha2 of the scoped
    bnode label) — after it, the dataset is ground and RDFC-1.0 c14n of the
    bulk degenerates to canonical serialization + a distributed sort
    (SURVEY.md §4.3.1 fast path).
  * the sameAs mapping is produced by :func:`sopspark.plans.graph.
    connected_components` (O(log n) rounds) and is tiny relative to the
    triple corpus → broadcast remap join by default; pass
    ``broadcast_mapping=False`` when the equivalence graph itself is huge
    and a shuffled join (AQE-skew-protected) is the right physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sopspark.kg.vocab import XSD
from sopspark.plans.graph import connected_components
from sopspark.terms import BNODE, IRI

SKOLEM_NS = "http://example.org/.well-known/genid/"


def skolemize(df: DataFrame, ns: str = SKOLEM_NS) -> DataFrame:
    """Replace every blank node with a deterministic skolem IRI derived from
    its (globally scoped) label. Pure Catalyst; no shuffle."""

    def fix(tag: str):
        t = F.col(tag)
        skolem = F.struct(
            F.lit(IRI).cast("tinyint").alias("kind"),
            F.concat(F.lit(ns), F.sha2(t["value"], 256)).alias("value"),
            F.lit(None).cast("string").alias("dt"),
            F.lit(None).cast("string").alias("lang"),
        )
        return F.when(t.isNotNull() & (t["kind"] == BNODE), skolem).otherwise(t)

    out = df
    for tag in ("s", "p", "o", "g"):
        out = out.withColumn(tag, fix(tag))
    return out


def sameas_closure(sameas: DataFrame) -> DataFrame:
    """owl:sameAs edge table (iri_a, iri_b) → (iri, rep) representative map.

    Chains and cycles collapse to the lexicographically smallest IRI of each
    equivalence class (deterministic)."""
    cc = connected_components(sameas)
    return cc.select(F.col("node").alias("iri"), F.col("rep").alias("rep"))


def remap_strings(
    triples: DataFrame, mapping: DataFrame, cols: list[str], broadcast_mapping: bool = True
) -> DataFrame:
    """Rewrite string IRI columns through the representative map."""
    m = F.broadcast(mapping) if broadcast_mapping else mapping
    out = triples
    for c in cols:
        mm = m.select(F.col("iri").alias(f"_{c}_iri"), F.col("rep").alias(f"_{c}_rep"))
        out = (
            out.join(mm, on=out[c] == mm[f"_{c}_iri"], how="left")
            .withColumn(c, F.coalesce(F.col(f"_{c}_rep"), F.col(c)))
            .drop(f"_{c}_iri", f"_{c}_rep")
        )
    return out


def materialize_graph(
    linked: DataFrame,
    sameas_mapping: DataFrame | None = None,
    conv_ns: str | None = None,
    broadcast_mapping: bool = True,
) -> DataFrame:
    """Linked triples (conv_id, s, p, o_iri, o_lit) → quad DataFrame in the
    engine's term-struct schema, sameAs-merged and deduplicated.

    ``conv_ns`` set → each conversation's triples land in a named graph
    ``<conv_ns + conv_id>`` (the dispatch-able layout); otherwise default
    graph.
    """
    t = linked
    if sameas_mapping is not None:
        t = remap_strings(t, sameas_mapping, ["s", "o_iri"], broadcast_mapping)

    def iri_term(col):
        return F.when(
            col.isNotNull(),
            F.struct(
                F.lit(IRI).cast("tinyint").alias("kind"),
                col.alias("value"),
                F.lit(None).cast("string").alias("dt"),
                F.lit(None).cast("string").alias("lang"),
            ),
        )

    o_term = F.when(F.col("o_iri").isNotNull(), iri_term(F.col("o_iri"))).otherwise(
        F.struct(
            F.lit(2).cast("tinyint").alias("kind"),
            F.col("o_lit").alias("value"),
            F.lit(XSD + "integer").cast("string").alias("dt"),
            F.lit(None).cast("string").alias("lang"),
        )
    )
    g_term = (
        iri_term(F.concat(F.lit(conv_ns), F.col("conv_id")))
        if conv_ns
        else F.lit(None).cast("struct<kind:tinyint,value:string,dt:string,lang:string>")
    )

    quads = t.select(
        iri_term(F.col("s")).alias("s"),
        iri_term(F.col("p")).alias("p"),
        o_term.alias("o"),
        g_term.alias("g"),
        F.lit(None).cast("string").alias("err"),
    )
    return quads.dropDuplicates(["s", "p", "o", "g"])


def merge_incremental(existing: DataFrame, new: DataFrame, keys=("s", "p", "o")) -> DataFrame:
    """Idempotently merge a new batch of materialized triples into an
    existing graph table: ``existing ∪ (new ⟕̸ existing)`` via a left-anti
    join on the triple key. Running the KG pipeline per transcript batch
    and merging with this operator yields exactly the one-shot result
    (the sameAs equivalence source is batch-independent), which is the
    resumable / incremental ingestion mode the north_star's checkpointed
    pipeline needs — re-delivered batches are absorbed with no duplicates.

    Scale: one shuffle on the triple key for the anti join (or zero if
    ``existing``'s key projection is broadcastable); at 100 TB the
    production form is Iceberg ``MERGE INTO`` on the same key — this is
    the engine-level equivalent with identical semantics.
    """
    ks = list(keys)
    add = new.join(existing.select(*ks).dropDuplicates(ks), on=ks, how="left_anti")
    return existing.unionByName(add.select(*existing.columns)).dropDuplicates(ks)
