"""``filter`` and ``map`` — the streaming per-quad transforms.

Reference semantics:
  * ``sop filter EXPR`` keeps quads where the SPARQL expression over bound
    ``?s ?p ?o ?g`` is true; expression errors drop the quad
    (``src/filter.rs:26-52``).
  * ``sop map -s E -p E -o E -g E`` rewrites each component (defaults are
    identity); a row whose s/p/o expression errors is dropped, while the
    graph expression may legitimately produce "unbound" → default graph
    (``src/map.rs:37-83``, single-``?`` pop at ``src/map.rs:49``).

Both compile the expression **once** to Catalyst columns
(:mod:`sopspark.functions.expr`) — deliberately NOT the reference's
one-SPARQL-query-per-row evaluation strategy, which would be a per-row
interpreter; these stages stay inside whole-stage codegen and are pure
narrow transforms (zero shuffle) at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sopspark.functions.expr import compile_expr, compile_filter


def filter_quads(df: DataFrame, expr: str, recognize_datatypes: bool = True) -> DataFrame:
    pred = compile_filter(expr, recognize_datatypes=recognize_datatypes)
    if "err" in df.columns:
        # error rows flow through to the sink untouched (inline error channel)
        return df.where(F.col("err").isNotNull() | pred)
    return df.where(pred)


def map_quads(
    df: DataFrame,
    s: str | None = None,
    p: str | None = None,
    o: str | None = None,
    g: str | None = None,
    recognize_datatypes: bool = True,
) -> DataFrame:
    exprs = {"s": s or "?s", "p": p or "?p", "o": o or "?o", "g": g or "?g"}
    cols = {
        tag: compile_expr(e, recognize_datatypes=recognize_datatypes).alias(tag)
        for tag, e in exprs.items()
    }
    keep = [c for c in df.columns if c not in ("s", "p", "o", "g")]
    out = df.select(*[cols[t] for t in ("s", "p", "o", "g")], *[F.col(c) for c in keep])
    # drop rows where a non-graph component errored (NULL); g may be NULL
    cond = F.col("s").isNotNull() & F.col("p").isNotNull() & F.col("o").isNotNull()
    if "err" in out.columns:
        return out.where(F.col("err").isNotNull() | cond)
    return out.where(cond)
