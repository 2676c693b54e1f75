"""Distributed connected components via alternating large-star / small-star.

Used for owl:sameAs closure (north_star) and for grouping blank nodes into
c14n components (SURVEY.md §4.3). The algorithm is the public
two-operation MapReduce CC of Kiveris et al. ("Connected Components in
MapReduce and Beyond", SoCC'14), expressed entirely as DataFrame joins and
aggregations — O(log n) rounds, no collect_list (no hot-key memory blowup),
each round two hash aggregates + one broadcast-free join.

Why not GraphFrames: not available in this environment, and the star
algorithm is ~40 lines of DataFrame code with the same asymptotics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _min_neighbor(sym: DataFrame) -> DataFrame:
    """m(u) = min(N(u) ∪ {u}) for the given (a, b) edge list."""
    return sym.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))


def _large_star(edges: DataFrame) -> DataFrame:
    sym = edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = _min_neighbor(sym)
    out = (
        sym.where(F.col("b") > F.col("a"))
        .join(mins, on="a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )
    return out.where(F.col("a") != F.col("b")).distinct()


def _small_star(edges: DataFrame) -> DataFrame:
    oriented = edges.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    ).where(F.col("a") != F.col("b"))
    mins = _min_neighbor(oriented)
    joined = oriented.join(mins, on="a")
    to_min = joined.select(F.col("b").alias("a"), F.col("m").alias("b"))
    self_edge = mins.select(F.col("a"), F.col("m").alias("b"))
    out = to_min.unionByName(self_edge)
    return out.where(F.col("a") != F.col("b")).distinct()


def _driver_union_find(rows: list[tuple], spark, dtype: str = "string") -> DataFrame:
    """Small-input physical plan: union-find on the driver — the CC analogue
    of broadcasting a small dimension instead of shuffling."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    # every root IS its class minimum by induction: a union merges two
    # classes whose roots are their minima and keeps the smaller as root
    out = [(n, find(n)) for n in parent]
    from sopspark.session import local_df

    # LocalRelation output: the downstream broadcast remap joins build
    # their hash tables without scheduling a job
    return local_df(spark, out, f"node {dtype}, rep {dtype}")


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    checkpoint_every: int = 3,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """(a, b) undirected edge list → (node, rep) with rep = min node id of
    the component. Deterministic; string or numeric ids both work (min is
    lexicographic for strings).

    Inputs under ``driver_threshold`` edges run as driver-side union-find
    (O(n α(n)), one job) — at 100 TB the equivalence-edge table is still
    typically ≪ the corpus; the distributed star iterations kick in above
    the threshold.
    """
    e = edges.select(F.col(edges.columns[0]).alias("a"), F.col(edges.columns[1]).alias("b"))

    if driver_threshold > 0:
        # driver-literal edge lists (createDataFrame) optimize to a
        # LocalRelation: collect() is a driver-side array copy, no job, no
        # shuffle — skip the distinct entirely (union-find absorbs duplicate
        # edges). This keeps the tiny-sameAs path at zero cluster jobs,
        # which matters for the serial fraction of the scaling ratio.
        try:
            plan = e._jdf.queryExecution().optimizedPlan()
            is_local = plan.getClass().getSimpleName() == "LocalRelation"
        except Exception:
            is_local = False
        if is_local:
            head = e.collect()
            if len(head) <= driver_threshold:
                dtype = dict(e.dtypes)["a"]
                return _driver_union_find(
                    [
                        (r["a"], r["b"])
                        for r in head
                        # mirror the distributed path's null-propagating
                        # `a != b` filter: a null endpoint must be dropped,
                        # not crash Python's None ordering in union-find
                        if r["a"] is not None
                        and r["b"] is not None
                        and r["a"] != r["b"]
                    ],
                    edges.sparkSession,
                    dtype,
                )

    e = e.where(F.col("a") != F.col("b")).distinct()

    if driver_threshold > 0:
        head = e.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            dtype = dict(e.dtypes)["a"]  # keep numeric ids numeric (min = numeric min)
            return _driver_union_find([(r["a"], r["b"]) for r in head], edges.sparkSession, dtype)

    e = e.localCheckpoint()

    prev_sig = None
    for i in range(max_iter):
        e = _small_star(_large_star(e))
        if (i + 1) % checkpoint_every == 0:
            e = e.localCheckpoint()  # truncate lineage across rounds
        # convergence: edge-set signature (order-insensitive hash + count)
        sig = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),  # order-insensitive, overflow-free
        ).collect()[0]
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])

    # after convergence every edge points node → component root
    mapping = e.select(F.col("a").alias("node"), F.col("b").alias("rep"))
    roots = e.select(F.col("b").alias("node")).distinct().withColumn("rep", F.col("node"))
    return mapping.unionByName(roots).distinct()
