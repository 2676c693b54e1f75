#!/usr/bin/env python
"""10x linearity evidence: the same headline + dedup/ANN entries at sf0.1
and at a synthesized sf1 (10x corpus), reported as wall-growth ratios.

The 100TB-scale story otherwise rests on plan-shape argument alone; this
gives one measured datapoint that no entry grows superlinearly in data.

sf1 synthesis (deterministic, no external data): each sf0.1 document is
replicated 10x with doc_id*10+r; replicas r>0 have every token suffixed
with ``~r`` so the ten shards share NO shingles/terms — the corpus grows
the way diverse real data grows (10x more distinct content), rather than
10x more copies of the same content, which would multiply the TRUE
duplicate-pair count and conflate data-character change with algorithmic
scaling. Shard 0 is byte-identical to sf0.1, so per-shard statistics
(duplicate rate, term frequencies, span structure) match the base corpus.

The kg_pipeline headline scales through its own synthesizer
(n_convs x10 on the identical generator).

Usage: python linearity_bench.py  → one JSON line with per-entry walls at
both scales and the growth ratio; also appended by hand to
BENCH/BASELINE.md. SPARK_GRAFT_BENCH_REPS (default 2) controls best-of-N.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".benchdata", "sf1")


def ensure_sf1(spark) -> None:
    out = f"{SF1}/documents.parquet"
    probe = os.path.join(out, "_SUCCESS")
    if os.path.exists(probe):
        return
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    reps = spark.range(10).select(F.col("id").cast("int").alias("r"))
    big = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") * 10 + F.col("r")).alias("doc_id"),
            F.when(F.col("r") == 0, F.col("text"))
            .otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda x: F.concat(x, F.lit("~"), F.col("r").cast("string")),
                    ),
                    " ",
                )
            )
            .alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text"))
    )
    big.repartition(32).write.mode("overwrite").parquet(out)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

    from sopspark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="sopspark-linearity")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_sf1(spark)

    from sopspark.queries import QUERIES
    from bench import kg_throughput

    ENTRIES = ["minhash_dedup", "dedup_clusters", "dup_spans", "tfidf_topk"]

    # warm the code paths once (JVM/codegen compilation out of timed spans)
    kg_throughput(spark, n_convs=100)
    for name in ENTRIES:
        QUERIES[name](spark, SF01).limit(1).count()

    def best_wall(fn) -> float:
        walls = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            walls.append(time.time() - t0)
        return round(min(walls), 3)

    result: dict[str, dict] = {}
    base_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "200000"))
    for label, n in (("sf0.1", base_convs), ("sf1", base_convs * 10)):
        w = best_wall(lambda: kg_throughput(spark, n_convs=n))
        result.setdefault("kg_pipeline", {})[label] = w
    for name in ENTRIES:
        for label, d in (("sf0.1", SF01), ("sf1", SF1)):
            w = best_wall(
                lambda: QUERIES[name](spark, d)
                .write.mode("overwrite")
                .format("noop")
                .save()
            )
            result.setdefault(name, {})[label] = w
    for name, row in result.items():
        row["ratio"] = round(row["sf1"] / row["sf0.1"], 2)
    print(json.dumps({"metric": "sf1_vs_sf01_wall_ratio", "entries": result,
                      "reps": reps, "cpus": cpus}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
