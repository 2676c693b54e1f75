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
