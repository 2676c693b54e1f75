"""Bloom-filter runtime pruning for semi-joins.

The explicit-API twin of Spark's own InjectRuntimeFilter rewrite
(`sql/catalyst/optimizer/InjectRuntimeFilter.scala` in apache/spark): build
a compact bloom bitmap over the (filtered) build side's join keys, broadcast
it, and pre-filter the probe side BEFORE the shuffle/exact join — at 100 TB
the probe scan drops non-matching rows map-side, so the semi-join's exchange
ships only candidate rows. The final exact ``left_semi`` join removes bloom
false positives, so the result is byte-identical to a plain semi-join (the
DuckDB oracle is exactly that).

Plan shape: build-side agg is one narrow shuffle on ``m_bits/64`` word
indices (map-side ``bit_or`` combine ⇒ shuffle volume ≤ #words × #tasks
longs, independent of build rows); the bitmap is ONE row broadcast to every
probe task; the probe check is pure Catalyst bit math in the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEED = 0x5B10


def _positions(key, m_bits: int, hashes: int):
    """h deterministic bit positions per key (xxhash64 lanes)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(_SEED + j)), F.lit(m_bits)).cast("long")
        for j in range(hashes)
    ]


def bloom_bitmap(
    build: DataFrame, key_col: str, m_bits: int = 1 << 18, hashes: int = 5
) -> DataFrame:
    """ONE-row DataFrame holding a dense ``array<long>[m_bits/64]`` bloom
    bitmap of the build side's keys. Distributed end-to-end: bit positions
    explode map-side, ``bit_or`` combines per 64-bit word, and the dense
    array assembles from the sparse word map in a single final projection —
    no driver collect."""
    n_words = m_bits // 64
    ex = build.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, hashes))).alias("_pos")
    )
    words = ex.select(
        F.expr("CAST(_pos DIV 64 AS INT)").alias("_w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(_pos, 64) AS INT))").alias("_b"),
    )
    sparse = words.groupBy("_w").agg(F.bit_or("_b").alias("_bits"))
    onerow = sparse.agg(
        F.map_from_entries(F.collect_list(F.struct("_w", "_bits"))).alias("_m")
    )
    return onerow.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("_m"), i.cast("int")), F.lit(0).cast("long")
            ),
        ).alias("_bloom")
    )


def bloom_candidates(
    probe: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    m_bits: int = 1 << 18,
    hashes: int = 5,
) -> DataFrame:
    """Probe rows whose key passes the bloom check (superset of the exact
    match set — no false negatives by construction)."""
    # shiftleft's python wrapper only takes a literal shift count, so the
    # column-shift bit test is one SQL expression per hash lane
    checks = []
    for j in range(hashes):
        pos = f"pmod(xxhash64(`{key_col}`, {_SEED + j}), {m_bits})"
        checks.append(
            f"(element_at(_bloom, CAST({pos} DIV 64 AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({pos}, 64) AS INT))) != 0"
        )
    return (
        probe.crossJoin(F.broadcast(bitmap))
        .where(F.expr(" AND ".join(checks)))
        .drop("_bloom")
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    m_bits: int = 1 << 18,
    hashes: int = 5,
) -> DataFrame:
    """``probe LEFT SEMI JOIN build`` with a broadcast bloom prefilter on
    the probe side. Result is exactly the semi-join (false positives are
    removed by the final exact join); the bloom stage exists so the
    exchange only ships candidate rows."""
    build_key = build_key or probe_key
    bitmap = bloom_bitmap(build, build_key, m_bits, hashes)
    cand = bloom_candidates(probe, bitmap, probe_key, m_bits, hashes)
    keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    return cand.join(keys, probe_key, "left_semi")
