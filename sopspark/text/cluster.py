"""Distributed Lloyd's k-means over an embedding column.

The scalable shape (same as Spark MLlib's): the DATA never moves — each
iteration is one map pass computing every row's nearest centroid (the
k×dim centroid table rides along as literals, i.e. a broadcast of a few
KB) followed by one map-side-combined aggregate producing the k new
centroids, which are collected to the driver (k×dim doubles). At 100 TB
the per-iteration cost is exactly one scan + one tiny agg; nothing is
ever shuffled except k·P partial centroid rows.

Determinism (what makes a SQL oracle possible): centroids are
initialized from the k smallest-id rows (no RNG); every distance and
every centroid coordinate is rounded to ``round_dp`` decimals each
round, so double-precision summation-order noise (~1e-13) cannot leak
into the discrete assignment; distance ties break toward the smallest
cluster id. The DuckDB twin (:func:`kmeans_oracle_sql`) unrolls the
identical rounds with ``list_distance`` + a (dist, cluster) row_number.

Empty clusters drop out (no re-seeding), identically in both engines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist_to(vec_col, centroid: list[float], round_dp: int):
    """Catalyst reference expression for one (row, centroid) euclidean
    distance — the semantics :func:`_with_distances` reproduces bitwise.
    Kept as the executable spec (and for ad-hoc single-centroid use);
    the hot path uses the batch kernel."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    sq = F.aggregate(
        F.zip_with(vec_col, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.round(F.sqrt(sq), round_dp)


def _with_distances(v: DataFrame, cents: list[list[float]]) -> DataFrame:
    """``(_id, _v)`` → ``(_id, _v, _d0.._d{m-1})``: unrounded euclidean
    distance to each centroid, computed as a mapInArrow numpy kernel.

    Bitwise-identical to the Catalyst ``zip_with + aggregate`` fold it
    replaces (which, as an interpreted higher-order expression, cost ~1 µs
    per ELEMENT): the fold squares each difference then sums strictly left
    to right in float64; accumulating one dimension at a time across the
    batch (``acc += (X[:,j]-c[j])**2``) performs the identical IEEE op
    sequence per row (no FMA, no pairwise reassociation), and ``sqrt`` is
    correctly rounded in both runtimes. The authoritative ``F.round`` and
    the (dist, cluster) lexicographic argmin stay in Spark, on identical
    inputs. Rows whose vector is NULL, has the wrong length, or contains
    NULL elements get NULL distances — the same outcome the fold produced.
    """
    import numpy as np

    C = np.asarray(cents, dtype=np.float64)
    m, dim = C.shape
    id_ddl = v.schema["_id"].dataType.simpleString()

    def fn(batches):
        import pyarrow as pa

        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            lst = b.column(1).to_pylist()
            valid = np.array(
                [
                    x is not None and len(x) == dim and None not in x
                    for x in lst
                ],
                dtype=bool,
            )
            dcols = np.full((m, n), np.nan, dtype=np.float64)
            if valid.any():
                X = np.asarray(
                    [lst[i] for i in np.nonzero(valid)[0]], dtype=np.float64
                )
                for ci in range(m):
                    acc = np.zeros(X.shape[0], dtype=np.float64)
                    for j in range(dim):
                        dlt = X[:, j] - C[ci, j]
                        acc += dlt * dlt
                    dcols[ci, valid] = np.sqrt(acc)
            yield pa.RecordBatch.from_arrays(
                [b.column(0), b.column(1)]
                + [pa.array(dcols[ci], mask=~valid) for ci in range(m)],
                names=["_id", "_v"] + [f"_d{ci}" for ci in range(m)],
            )

    dcols_ddl = ", ".join(f"_d{ci} double" for ci in range(m))
    return v.mapInArrow(
        fn, schema=f"_id {id_ddl}, _v array<double>, {dcols_ddl}"
    )


def kmeans_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """Run ``iters`` Lloyd rounds; return ``(id_col, cluster, dist)``
    with each row's final cluster and (rounded) euclidean distance."""
    if k < 1 or iters < 1:
        raise ValueError("require k >= 1 and iters >= 1")
    v = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    init = v.orderBy("_id").limit(k).collect()
    if not init:
        return (
            v.select(
                F.col("_id").alias(id_col),
                F.lit(0).alias("cluster"),
                F.lit(0.0).alias("dist"),
            )
        )
    centroids: dict[int, list[float]] = {j: list(r["_v"]) for j, r in enumerate(init)}
    dim = len(init[0]["_v"])

    assigned = None
    for it in range(iters):
        cids = sorted(centroids)
        dv = _with_distances(v, [centroids[c] for c in cids])
        cands = [
            F.struct(
                F.round(F.col(f"_d{i}"), round_dp).alias("d"),
                F.lit(cid).alias("c"),
            )
            for i, cid in enumerate(cids)
        ]
        # lexicographic least of (dist, cluster): nearest centroid,
        # smallest id on ties — one codegen expression, no join
        best = cands[0] if len(cands) == 1 else F.least(*cands)
        assigned = dv.withColumn("_best", best).select(
            "_id", "_v",
            F.col("_best.d").alias("dist"),
            F.col("_best.c").alias("cluster"),
        )
        if it + 1 < iters:
            rows = (
                assigned.groupBy("cluster")
                .agg(*[
                    F.round(F.avg(F.col("_v")[i]), round_dp).alias(f"c{i}")
                    for i in range(dim)
                ])
                .collect()
            )
            centroids = {
                r["cluster"]: [r[f"c{i}"] for i in range(dim)] for r in rows
            }
    return assigned.select(
        F.col("_id").alias(id_col), "cluster", "dist"
    )


def kmeans_oracle_sql(
    emb_sql: str, k: int = 8, iters: int = 3, round_dp: int = 6
) -> str:
    """DuckDB twin of :func:`kmeans_assign`. ``emb_sql`` must yield
    (id, embedding); output is (id, cluster, dist) after ``iters``
    rounds of the identical deterministic update."""
    sql = f"""
    WITH emb AS MATERIALIZED (
      SELECT id, CAST(embedding AS DOUBLE[]) AS v FROM ({emb_sql})
    ),
    c0 AS MATERIALIZED (
      SELECT rn - 1 AS cluster, v AS c FROM (
        SELECT id, v, row_number() OVER (ORDER BY id) AS rn FROM emb
      ) WHERE rn <= {k}
    )"""
    for i in range(1, iters + 1):
        p = i - 1
        sql += f""",
    a{i} AS MATERIALIZED (
      SELECT id, v, cluster, dist FROM (
        SELECT e.id, e.v, c.cluster,
               ROUND(list_distance(e.v, c.c), {round_dp}) AS dist,
               row_number() OVER (
                 PARTITION BY e.id
                 ORDER BY ROUND(list_distance(e.v, c.c), {round_dp}), c.cluster
               ) AS rn
        FROM emb e CROSS JOIN c{p} c
      ) WHERE rn = 1
    )"""
        if i < iters:
            sql += f""",
    c{i} AS MATERIALIZED (
      SELECT cluster, list(m ORDER BY dim) AS c FROM (
        SELECT cluster, dim, ROUND(AVG(val), {round_dp}) AS m FROM (
          SELECT cluster, unnest(v) AS val, generate_subscripts(v, 1) AS dim
          FROM a{i}
        ) GROUP BY cluster, dim
      ) GROUP BY cluster
    )"""
    sql += f"""
    SELECT id, cluster, dist FROM a{iters} ORDER BY id"""
    return sql


def pq_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """Product quantization codes (Jégou et al. TPAMI'11, the FAISS ``PQ``
    shape): the vector splits into ``m`` contiguous subspaces, each
    subspace trains its own ``k``-centroid Lloyd codebook
    (:func:`kmeans_assign` — deterministic first-k init, broadcast
    centroid literals, per-round driver state = k×(dim/m) floats), and a
    vector's code is its nearest-centroid id per subspace — ``m·log2(k)``
    bits instead of ``dim·32``.

    Returns ``(id_col, c0..c{m-1}, d0..d{m-1})`` — per-subspace code and
    (rounded) euclidean distance to the chosen centroid, flat columns so
    the DuckDB twin (per-subspace :func:`kmeans_oracle_sql` on the sliced
    vector, joined on id) hash-compares exactly. Scale shape: data never
    shuffles — m sequential map-only assignment passes; only the m·k
    codebook rows ever reach the driver.
    """
    first = df.select(F.size(vec_col).alias("n")).first()
    dim = int(first["n"]) if first else 0
    if m < 1 or dim % m != 0:
        raise ValueError(f"dim {dim} must divide into m={m} subspaces")
    sub = dim // m

    # The m subspace trainings are INDEPENDENT blocking job chains (each:
    # one init collect + iters-1 centroid-update collects). Run them from a
    # thread pool so the driver round-trips overlap and executor slots
    # back-fill across chains instead of serializing m short jobs — the
    # per-subspace computation (and its determinism) is unchanged.
    def _train(j: int) -> DataFrame:
        dj = df.select(
            F.col(id_col), F.slice(F.col(vec_col), j * sub + 1, sub).alias("_sub")
        )
        return kmeans_assign(
            dj, "_sub", id_col, k=k, iters=iters, round_dp=round_dp
        ).select(
            F.col(id_col),
            F.col("cluster").alias(f"c{j}"),
            F.col("dist").alias(f"d{j}"),
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max(1, m)) as pool:
        parts = list(pool.map(_train, range(m)))
    out = parts[0]
    for aj in parts[1:]:
        out = out.join(aj, id_col)
    return out
