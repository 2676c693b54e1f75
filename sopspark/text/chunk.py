"""Fixed-size overlapping token-window chunking for RAG indexing.

A retrieval pipeline over a 100 TB corpus needs documents sliced into
windows small enough to embed, with overlap so no answer span is cut at
a boundary. The whole operator is map-side Catalyst — ``split`` →
``posexplode(sequence(...))`` → ``slice``/``array_join`` — so it is a
zero-shuffle narrow transform that scales linearly with input bytes and
keeps whole-stage codegen intact (no Python in the path).

Window rule (deterministic, engine-portable): tokens are the
``sep``-split of the text; windows start at multiples of
``stride = chunk_size - overlap``; a document with ``n <= chunk_size``
tokens yields exactly one chunk, else ``ceil((n-chunk_size)/stride)+1``
chunks, so every token is covered and each consecutive pair of chunks
shares at least ``overlap`` tokens (the final window may be shorter).
The DuckDB oracle replicates the same rule with ``string_split`` +
``unnest(range(...))`` + list slicing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    overlap: int = 16,
    sep: str = " ",
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Returns ``(id_col, chunk_idx, chunk_text, n_tokens)`` with
    ``chunk_idx`` counting windows from 0 in document order.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("require 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    # \Q..\E: literal separator (F.split takes a Java regex)
    toks = F.split(F.col(text_col), "\\Q" + sep + "\\E")
    n = F.size(toks)
    num = F.when(n <= chunk_size, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_size)) / F.lit(float(stride))).cast("int") + 1
    )
    exploded = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), num - 1)).alias("chunk_idx"),
    )
    window = F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1, chunk_size)
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(window, sep).alias("chunk_text"),
        F.size(window).cast("int").alias("n_tokens"),
    )


def chunk_oracle_sql(
    docs_sql: str,
    chunk_size: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`chunk_documents` (space separator).
    ``docs_sql`` must yield (``id_col``, text)."""
    stride = chunk_size - overlap
    return f"""
    WITH d AS (
      SELECT {id_col}, string_split(text, ' ') AS toks FROM ({docs_sql})
    ), sized AS (
      SELECT {id_col}, toks,
             CASE WHEN len(toks) <= {chunk_size} THEN 1
                  ELSE CAST(ceil((len(toks) - {chunk_size}) / {stride}.0) AS INT) + 1
             END AS num
      FROM d
    ), ex AS (
      SELECT {id_col}, toks, unnest(range(num)) AS i FROM sized
    )
    SELECT {id_col}, CAST(i AS INT) AS chunk_idx,
           array_to_string(toks[i*{stride}+1 : i*{stride}+{chunk_size}], ' ') AS chunk_text,
           CAST(len(toks[i*{stride}+1 : i*{stride}+{chunk_size}]) AS INT) AS n_tokens
    FROM ex
    ORDER BY {id_col}, chunk_idx
    """
