"""Serialize sink — canonical N-Quads / N-Triples writer.

Reference: ``sop serialize -f nq|nt -c`` (``src/serialize.rs:89-131``). We
always emit the canonical literal form (``src/serialize.rs:75-84,159-163``):
escapes limited to ``\\ " \\n \\r``, ``^^xsd:string`` omitted. When the target
is a triples-only format (NT), named-graph quads are dropped, mirroring
``src/serialize.rs:205-227``.

The whole encode is Catalyst (``concat``/``when``/``regexp_replace`` from
:mod:`sopspark.terms`), so serialization is part of whole-stage codegen and
the write is a parallel ``df.write.text`` — one output file per partition,
the distributed analogue of the reference's single output stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sopspark.terms import nq_line, nt_term


def to_nq_lines(df: DataFrame, triples_only: bool = False) -> DataFrame:
    """Quad DataFrame → single-column ``line`` DataFrame of canonical NQ/NT."""
    ok = df.where(F.col("err").isNull()) if "err" in df.columns else df
    if triples_only:
        # triples-only target: drop named-graph quads (reference warns once;
        # we expose the drop count via .count() on the complement if wanted)
        ok = ok.where(F.col("g").isNull())
    return ok.select(nq_line(F.col("s"), F.col("p"), F.col("o"), F.col("g")).alias("line"))


def serialize_nquads(
    df: DataFrame,
    path: str,
    triples_only: bool = False,
    sort: bool = False,
    single_file: bool = False,
) -> None:
    """Write canonical N-Quads text. ``sort=True`` produces the globally
    code-point-sorted document (the c14n output contract); sorting is a
    distributed range-partitioned sort, not a driver collect."""
    lines = to_nq_lines(df, triples_only=triples_only)
    if sort:
        lines = lines.orderBy("line")
    if single_file:
        lines = lines.coalesce(1)
    lines.write.mode("overwrite").text(path)


def collect_nq_lines(df: DataFrame, triples_only: bool = False, sort: bool = True) -> list[str]:
    """Test helper: materialize the canonical lines to the driver."""
    lines = to_nq_lines(df, triples_only=triples_only)
    rows = lines.collect()
    out = [r["line"] for r in rows]
    return sorted(out) if sort else out


# ---------------------------------------------------------------------------
# Turtle writer (``sop serialize -f ttl -p PREFIXES``, src/serialize.rs:133-203)
# ---------------------------------------------------------------------------

DEFAULT_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "foaf": "http://xmlns.com/foaf/0.1/",
}

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _ttl_iri(value, prefixes: dict[str, str]):
    """IRI string column → prefixed name when the namespace matches and the
    local part is PN_LOCAL-safe, else ``<...>`` (term-level compression —
    never rewrites inside literal text)."""
    out = F.concat(F.lit("<"), value, F.lit(">"))
    for pfx, ns in prefixes.items():
        local = value.substr(F.lit(len(ns) + 1), F.length(value))
        cond = value.startswith(ns) & local.rlike("^[A-Za-z_][A-Za-z0-9_-]*$")
        out = F.when(cond, F.concat(F.lit(pfx + ":"), local)).otherwise(out)
    return out


def _ttl_term(t, prefixes: dict[str, str], predicate: bool = False):
    from sopspark.terms import BNODE, IRI, LITERAL, escape_literal

    iri_enc = _ttl_iri(t["value"], prefixes)
    if predicate:
        iri_enc = F.when(t["value"] == _RDF_TYPE, F.lit("a")).otherwise(iri_enc)
    lit_enc = F.concat(
        F.lit('"'),
        escape_literal(t["value"]),
        F.lit('"'),
        F.when(t["lang"].isNotNull(), F.concat(F.lit("@"), t["lang"]))
        .when(t["dt"].isNotNull(), F.concat(F.lit("^^"), _ttl_iri(t["dt"], prefixes)))
        .otherwise(F.lit("")),
    )
    return (
        F.when(t["kind"] == IRI, iri_enc)
        .when(t["kind"] == BNODE, F.concat(F.lit("_:"), t["value"]))
        .when(t["kind"] == LITERAL, lit_enc)
    )


def to_turtle_blocks(df: DataFrame, prefixes: dict[str, str] | None = None) -> DataFrame:
    """Quad DataFrame → one Turtle block per subject (``;``/``,``-grouped),
    sorted deterministically. Triples-only: named-graph quads are dropped
    (``src/serialize.rs:205-227``). Fully distributed — two hash aggregates
    (subject+predicate, then subject), no driver materialization."""
    prefixes = DEFAULT_PREFIXES if prefixes is None else prefixes
    ok = df.where(F.col("err").isNull()) if "err" in df.columns else df
    ok = ok.where(F.col("g").isNull())
    enc = ok.select(
        _ttl_term(F.col("s"), prefixes).alias("se"),
        _ttl_term(F.col("p"), prefixes, predicate=True).alias("pe"),
        _ttl_term(F.col("o"), prefixes).alias("oe"),
    )
    po = enc.groupBy("se", "pe").agg(
        F.concat_ws(", ", F.sort_array(F.collect_set("oe"))).alias("os")
    )
    blocks = po.groupBy("se").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pe", "os"))),
                lambda x: F.concat(x["pe"], F.lit(" "), x["os"]),
            ),
            " ;\n    ",
        ).alias("body")
    )
    return blocks.select(
        F.col("se").alias("sort_key"),
        F.concat(F.col("se"), F.lit(" "), F.col("body"), F.lit(" .")).alias("block"),
    )


def to_trig_blocks(df: DataFrame, prefixes: dict[str, str] | None = None) -> DataFrame:
    """Quad DataFrame → TriG: default-graph subject blocks plus one
    ``<g> { ... }`` block per named graph (same two-aggregate shape as
    Turtle with the graph name prepended to every grouping key)."""
    prefixes = DEFAULT_PREFIXES if prefixes is None else prefixes
    ok = df.where(F.col("err").isNull()) if "err" in df.columns else df
    enc = ok.select(
        F.when(F.col("g").isNotNull(), _ttl_term(F.col("g"), prefixes)).alias("ge"),
        _ttl_term(F.col("s"), prefixes).alias("se"),
        _ttl_term(F.col("p"), prefixes, predicate=True).alias("pe"),
        _ttl_term(F.col("o"), prefixes).alias("oe"),
    )
    po = enc.groupBy("ge", "se", "pe").agg(
        F.concat_ws(", ", F.sort_array(F.collect_set("oe"))).alias("os")
    )
    subj = po.groupBy("ge", "se").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pe", "os"))),
                lambda x: F.concat(x["pe"], F.lit(" "), x["os"]),
            ),
            " ;\n    ",
        ).alias("body")
    ).select(
        "ge",
        "se",
        F.concat(F.col("se"), F.lit(" "), F.col("body"), F.lit(" .")).alias("sblock"),
    )
    default = subj.where(F.col("ge").isNull()).select(
        F.concat(F.lit("0"), F.col("se")).alias("sort_key"), F.col("sblock").alias("block")
    )
    named = (
        subj.where(F.col("ge").isNotNull())
        .groupBy("ge")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("se", "sblock"))),
                    lambda x: x["sblock"],
                ),
                "\n",
            ).alias("inner")
        )
        .select(
            F.concat(F.lit("1"), F.col("ge")).alias("sort_key"),
            F.concat(F.col("ge"), F.lit(" {\n"), F.col("inner"), F.lit("\n}")).alias("block"),
        )
    )
    return default.unionByName(named)


def serialize_trig(
    df: DataFrame,
    path: str,
    prefixes: dict[str, str] | None = None,
    single_file: bool = True,
) -> None:
    """Write a TriG document (prefix header, default graph first, then
    named-graph blocks in code-point order)."""
    prefixes = DEFAULT_PREFIXES if prefixes is None else prefixes
    spark = df.sparkSession
    header = spark.createDataFrame(
        [("", f"@prefix {p}: <{ns}> .") for p, ns in sorted(prefixes.items())],
        "sort_key string, block string",
    )
    out = header.unionByName(to_trig_blocks(df, prefixes)).orderBy("sort_key")
    if single_file:
        out = out.coalesce(1)
    out.select("block").write.mode("overwrite").text(path)


def serialize_turtle(
    df: DataFrame,
    path: str,
    prefixes: dict[str, str] | None = None,
    single_file: bool = True,
) -> None:
    """Write a Turtle document: @prefix header, then subject blocks in
    code-point order (deterministic output for golden comparison)."""
    prefixes = DEFAULT_PREFIXES if prefixes is None else prefixes
    spark = df.sparkSession
    header = spark.createDataFrame(
        [("", f"@prefix {p}: <{ns}> .") for p, ns in sorted(prefixes.items())],
        "sort_key string, block string",
    )
    out = header.unionByName(to_turtle_blocks(df, prefixes)).orderBy("sort_key")
    if single_file:
        out = out.coalesce(1)
    out.select("block").write.mode("overwrite").text(path)
