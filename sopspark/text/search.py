"""Full-text relevance scoring: TF-IDF / BM25 top-k keyword search.

A training-data pipeline constantly runs "find the documents about X"
sweeps (targeted decontamination, topic bucketing, eval-set mining). The
scalable shape is NOT an inverted index — at 100 TB the index build is a
full shuffle of every posting. For a bounded query-term set the whole
computation is a map-only scan plus one single-row aggregate:

1. tokenize once (pure Catalyst ``split``/``filter`` — no Python),
2. per query term, term frequency via ``size(filter(tokens, = term))`` —
   a fixed-width column vector, no explode, no shuffle,
3. ONE global aggregate produces corpus stats (N, total doc length, and
   each term's document frequency) — a single row, broadcast back via
   cross join (Catalyst turns it into BroadcastNestedLoopJoin of 1 row),
4. the BM25 score is a closed-form expression over those columns, and
   top-k is ``orderBy(desc).limit(k)`` — Spark's TakeOrderedAndProject,
   which never materializes a global sort.

So: one scan + one 1-row aggregate + one top-k. Filters and projections
still push down to the parquet scan because everything is columnar
expressions over ``text``.

BM25 uses the Lucene/ATIRE idf variant ``ln(1 + (N - df + 0.5)/(df +
0.5))`` which is non-negative for df ≤ N.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN_SPLIT = "[^a-z0-9]+"


def tokens_col(text_col: str = "text") -> Column:
    """Lower-cased alphanumeric tokens, empties removed (Catalyst-only)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT), lambda x: x != ""
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    topk: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 relevance to ``query_terms``.

    Returns (id_col, score, n_hits) where n_hits counts query terms
    present in the document; ties break on ascending id for determinism.
    """
    terms = []
    for t in query_terms:
        t = t.lower()
        if not re.fullmatch("[a-z0-9]+", t):
            raise ValueError(f"query term must be a single token: {t!r}")
        terms.append(t)
    if not terms:
        raise ValueError("query_terms must be non-empty")

    def eq(term: str):
        # single-arg lambda: a 2-arg lambda would be read by F.filter as
        # the (element, index) form and shadow the captured term
        return lambda x: x == F.lit(term)

    # explode_outer(array(...)) is a generator barrier: it materializes the
    # token array ONCE per row per pass. Referencing tokens_col() directly
    # in _dl and each _tf would re-inline the split under ProjectCollapsing,
    # and nested higher-order functions defeat codegen's subexpression
    # elimination (~3x measured at sf0.1) — same failure mode as the
    # round-2 fingerprint plan.
    tk = docs.select(
        F.col(id_col), F.explode_outer(F.array(tokens_col(text_col))).alias("_tk")
    )
    toks = tk.select(
        F.col(id_col),
        F.size("_tk").alias("_dl"),
        *[
            F.size(F.filter(F.col("_tk"), eq(t))).alias(f"_tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_sumdl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("bigint")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )

    scored = toks.crossJoin(F.broadcast(stats))
    n = F.col("_n").cast("double")
    # avgdl enters as dl*N/sum(dl) so every operand is exact until the one
    # double division — keeps the oracle bit-comparable.
    norm = F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * F.col("_dl").cast("double") * n / F.col("_sumdl").cast("double")
    )
    parts = []
    hits = []
    for i in range(len(terms)):
        tf = F.col(f"_tf_{i}").cast("double")
        df = F.col(f"_df_{i}").cast("double")
        idf = F.log(F.lit(1.0) + (n - df + F.lit(0.5)) / (df + F.lit(0.5)))
        parts.append(idf * tf * F.lit(k1 + 1.0) / (tf + norm))
        hits.append((F.col(f"_tf_{i}") > 0).cast("int"))
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    n_hits = hits[0]
    for h in hits[1:]:
        n_hits = n_hits + h

    return (
        scored.select(
            F.col(id_col),
            F.round(score, 6).alias("score"),
            n_hits.alias("n_hits"),
        )
        .where(F.col("n_hits") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(topk)
    )


def bm25_oracle_sql(
    query_terms: list[str],
    topk: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB SQL computing the identical BM25 top-k (same expression
    shape, same tie-break) for the driver's value-hash comparison."""
    terms = [t.lower() for t in query_terms]
    tok = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
    tf_cols = ", ".join(
        f"len(list_filter({tok}, x -> x = '{t}')) AS tf_{i}" for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}" for i in range(len(terms))
    )
    score_parts = " + ".join(
        f"ln(1.0 + (CAST(n AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
        f" / (CAST(df_{i} AS DOUBLE) + 0.5))"
        f" * CAST(tf_{i} AS DOUBLE) * {k1 + 1.0!r}"
        f" / (CAST(tf_{i} AS DOUBLE) + {k1!r} * ({1.0 - b!r}"
        f" + {b!r} * CAST(dl AS DOUBLE) * CAST(n AS DOUBLE) / CAST(sumdl AS DOUBLE)))"
        for i in range(len(terms))
    )
    hit_parts = " + ".join(
        f"(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(terms))
    )
    return f"""
WITH toks AS (
  SELECT {id_col}, len({tok}) AS dl, {tf_cols} FROM {table}
), stats AS (
  SELECT COUNT(*) AS n, SUM(dl) AS sumdl, {df_cols} FROM toks
)
SELECT {id_col},
       round({score_parts}, 6) AS score,
       CAST({hit_parts} AS INT) AS n_hits
FROM toks CROSS JOIN stats
WHERE {hit_parts} > 0
ORDER BY score DESC, {id_col} ASC
LIMIT {topk}
"""


def tfidf_topk(
    docs: DataFrame,
    topk: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (sklearn's public smooth-idf formula: ``tf · (ln((N+1)/(df+1)) + 1)``)
    — the keyword-profile column that drives topic bucketing and
    "what is this document about" sweeps.

    Scale shape: explode → ``groupBy(doc, term)`` count (map-side
    combined, ONE corpus-token shuffle), document frequencies from the tf
    table (second map-side-combined agg), N as a 1-row broadcast, scores
    map-side, and top-k under a doc-keyed window (bounded partitions —
    never a global sort). Ranking uses the ROUNDED score with an ascending
    term tie-break so the order is reproducible across engines.

    Returns ``(id_col, term, tf, score, rank)``, ``rank ∈ [1, topk]``.
    """
    tk = docs.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("term"))
    tf = tk.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfr = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    n = docs.agg(F.count_distinct(F.col(id_col)).alias("_n"))
    scored = (
        tf.join(dfr, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf").cast("double")
                * (
                    F.log(
                        (F.col("_n").cast("double") + F.lit(1.0))
                        / (F.col("_df").cast("double") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(id_col, "term", "tf", "score", "rank")
    )
