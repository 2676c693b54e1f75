#!/usr/bin/env python
"""Per-round benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}``.

Headline metric: triple-extraction throughput (turns/sec) of the full
transcript→KG pipeline (assemble → extract → link → sameAs merge →
materialize), the BASELINE.json north-rule metric. Corpus size scales with
the sf directory; override with $SPARK_GRAFT_BENCH_CONVS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def kg_throughput(spark, n_convs: int, partitions: int | None = None) -> tuple[float, int, float]:
    """Returns (turns/sec, n_turns, wall_sec) for the full KG pipeline.
    ``partitions`` pins the corpus split count — scaling comparisons must
    process the IDENTICAL input layout at every parallelism level."""
    from sopspark.kg.canon import materialize_graph, sameas_closure
    from sopspark.kg.extract import assemble_turns, extract_triples
    from sopspark.kg.link import link_entities
    from sopspark.kg.synth import alias_df, sameas_df, synth_corpus

    transcripts, _ = synth_corpus(spark, n_convs=n_convs, seed=42, partitions=partitions)
    transcripts = transcripts.persist()
    n_turns = transcripts.count()  # materialize input outside the timed span

    t0 = time.time()
    mentions = extract_triples(assemble_turns(transcripts))
    linked = link_entities(mentions, alias_df(spark))
    quads = materialize_graph(linked, sameas_closure(sameas_df(spark)))
    n_triples = quads.count()
    wall = time.time() - t0
    transcripts.unpersist()
    assert n_triples > 0
    return n_turns / wall, n_turns, wall


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    # headline corpus sized so throughput is compute-bound, not fixed-cost
    # bound (at 20k convs the 4 s wall is mostly scheduling overhead and
    # understates turns/sec by >10x vs the 1M-conv scaling runs)
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", str(max(200, int(2_000_000 * sf)))))

    from sopspark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="sopspark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from sopspark.queries import QUERIES

    # Hash-variant policy: the headline minhash_dedup / simhash_neardup rows
    # time the xxhash64 fast path (the library default, comparable 1:1 with
    # BENCH_r01); the md5 engine-shared variants that the DuckDB oracles pin
    # are benched separately as *_md5 so round-over-round numbers compare
    # like with like.
    def _minhash_fast(spark, d):
        from pyspark.sql import functions as F
        from sopspark.text.dedup import minhash_dedup

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return minhash_dedup(docs, num_perm=16, bands=4, threshold=0.7, hash_fn="xxhash64")

    def _simhash_neardup_fast(spark, d):
        from sopspark.text.dedup import simhash_near_dup_pairs

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return simhash_near_dup_pairs(docs, max_hamming=3, bits=64, hash_fn="xxhash64")

    def _dedup_clusters_fast(spark, d):
        from sopspark.text.dedup import dedup_clusters

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return dedup_clusters(docs, para_sep=" a ", para_min_chars=20, hash_fn="xxhash64")

    def _dedup_clusters_md5(spark, d):
        # md5 hash lane ONLY (adaptive CC path): the registry twin
        # (QUERIES["dedup_clusters"]) additionally FORCES the distributed
        # star iterations so the oracle can verify them — a
        # correctness-harness knob, not a production path, so benching it
        # here would conflate two deltas (the r3 de-conflation rule).
        from sopspark.text.dedup import dedup_clusters

        docs = spark.read.parquet(f"{d}/documents.parquet")
        return dedup_clusters(docs, para_sep=" a ", para_min_chars=20, hash_fn="md5")

    OPERATOR_BENCHES: dict = {
        "filter_expr": QUERIES["filter_expr"],
        "map_expr": QUERIES["map_expr"],
        "dedup": QUERIES["dedup"],
        "turn_assembly": QUERIES["turn_assembly"],
        "agg_pushdown": QUERIES["agg_pushdown"],
        "broadcast_join": QUERIES["broadcast_join"],
        "minhash_dedup": _minhash_fast,
        "minhash_dedup_md5": QUERIES["minhash_dedup"],
        "simhash_neardup": _simhash_neardup_fast,
        "simhash_neardup_md5": QUERIES["simhash_neardup"],
        "docs_curation": QUERIES["docs_curation"],
        "fingerprint": QUERIES["fingerprint"],
        "sessionize": QUERIES["sessionize"],
        "stratified_sample": QUERIES["stratified_sample"],
        "pii_redact": QUERIES["pii_redact"],
        "pack_sequences": QUERIES["pack_sequences"],
        "contamination": QUERIES["contamination"],
        "collapse_repeats": QUERIES["collapse_repeats"],
        "asof_join": QUERIES["asof_join"],
        "bm25_search": QUERIES["bm25_search"],
        "kmv_sketch": QUERIES["kmv_sketch"],
        "event_windows": QUERIES["event_windows"],
        "lm_score": QUERIES["lm_score"],
        "mixture_sample": QUERIES["mixture_sample"],
        "range_join": QUERIES["range_join"],
        "pagerank": QUERIES["pagerank"],
        "rollup_agg": QUERIES["rollup_agg"],
        "topk_per_group": QUERIES["topk_per_group"],
        "scd2_merge": QUERIES["scd2_merge"],
        "tpch_pricing": QUERIES["tpch_pricing"],
        "tpch_shipping": QUERIES["tpch_shipping"],
        "tpch_local_volume": QUERIES["tpch_local_volume"],
        "resample_ffill": QUERIES["resample_ffill"],
        "gopher_quality": QUERIES["gopher_quality"],
        "semdedup": QUERIES["semdedup"],
        "bloom_semi_join": QUERIES["bloom_semi_join"],
        "funnel": QUERIES["funnel"],
        "paragraph_dedup": QUERIES["paragraph_dedup"],
        "triangle_count": QUERIES["triangle_count"],
        "label_propagation": QUERIES["label_propagation"],
        "chunk_documents": QUERIES["chunk_documents"],
        "kmeans": QUERIES["kmeans"],
        "bfs_levels": QUERIES["bfs_levels"],
        "cms_heavy_hitters": QUERIES["cms_heavy_hitters"],
        "jaccard_join": QUERIES["jaccard_join"],
        "normalize_text": QUERIES["normalize_text"],
        "hard_negatives": QUERIES["hard_negatives"],
        "group_split": QUERIES["group_split"],
        "kcore": QUERIES["kcore"],
        "ppr": QUERIES["ppr"],
        "fuzzy_pairs": QUERIES["fuzzy_pairs"],
        "minhash_probe": QUERIES["minhash_probe"],
        "dsir": QUERIES["dsir"],
        "retention_cohorts": QUERIES["retention_cohorts"],
        "clustering_coef": QUERIES["clustering_coef"],
        "transition_matrix": QUERIES["transition_matrix"],
        "pmi": QUERIES["pmi"],
        "rolling_zscore": QUERIES["rolling_zscore"],
        "tpch_profit": QUERIES["tpch_profit"],
        "quality_deciles": QUERIES["quality_deciles"],
        "salted_join": QUERIES["salted_join"],
        "dedup_clusters": _dedup_clusters_fast,
        "dedup_clusters_md5": _dedup_clusters_md5,
        "embedding_quantize": QUERIES["embedding_quantize"],
        "dup_spans": QUERIES["dup_spans"],
        "strip_dup_text": QUERIES["strip_dup_text"],
        "tfidf_topk": QUERIES["tfidf_topk"],
        "random_projection": QUERIES["random_projection"],
        "pq_codes": QUERIES["pq_codes"],
        "bpe_train": QUERIES["bpe_train"],
        "bpe_tokenize": QUERIES["bpe_tokenize"],
        "margin_mining": QUERIES["margin_mining"],
        "weighted_sample": QUERIES["weighted_sample"],
        "hits": QUERIES["hits"],
        "link_prediction": QUERIES["link_prediction"],
        "scc": QUERIES["scc"],
    }

    # warmup: run the same code paths once at tiny scale so JVM/whole-stage
    # codegen compilation (~3-5 s cold) doesn't land inside the timed spans
    kg_throughput(spark, n_convs=100)
    for fn in OPERATOR_BENCHES.values():
        fn(spark, sf_dir).limit(1).count()

    timings: dict[str, float] = {}

    # best-of-N timing: this sandbox is a shared microVM whose host CPU
    # availability swings 2-6x between minutes; the min over N back-to-back
    # runs estimates the uncontended wall far more stably than one sample.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    # headline: KG pipeline throughput (warm, best-of-reps)
    best = None
    for _ in range(reps):
        tps_i, n_turns, kg_wall_i = kg_throughput(spark, n_convs)
        if best is None or kg_wall_i < best[1]:
            best = (tps_i, kg_wall_i)
    tps, kg_wall = best
    timings["kg_pipeline"] = round(kg_wall, 3)

    # operator benches over the sf tables (warm, best-of-reps)
    for name, fn in OPERATOR_BENCHES.items():
        walls = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            walls.append(time.time() - t0)
        timings[name] = round(min(walls), 3)

    # iterative graph/cluster algos: split fixed job cost from steady-state
    # per-round cost by also timing a 1-round run. round_sec is the marginal
    # wall of one extra synchronous round — the number that actually scales
    # with data (the fixed cost amortizes at real scale); a lost
    # localCheckpoint or a per-round plan regression shows up here first.
    ITERATIVE: dict[str, tuple[str, int]] = {
        "pagerank": ("iters", 10),
        "ppr": ("iters", 10),
        "label_propagation": ("iters", 5),
        "kcore": ("rounds", 6),
        "bfs_levels": ("rounds", 4),
        "kmeans": ("iters", 3),
    }
    for name, (kw, n_rounds) in ITERATIVE.items():
        walls1 = []
        for _ in range(reps):
            t0 = time.time()
            QUERIES[name](spark, sf_dir, **{kw: 1}).write.mode("overwrite").format(
                "noop"
            ).save()
            walls1.append(time.time() - t0)
        first = min(walls1)
        timings[f"{name}_first_round_sec"] = round(first, 3)
        timings[f"{name}_round_sec"] = round(
            max(timings[name] - first, 0.0) / (n_rounds - 1), 3
        )

    # derived *_round_sec entries are rates/breakdowns, not additional wall
    # time — summing them would double-count and break round-over-round
    # total comparisons
    total = round(
        sum(v for k, v in timings.items() if not k.endswith("_round_sec")), 3
    )
    payload = {
        "metric": "kg_extraction_turns_per_sec",
        "value": round(tps, 1),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "detail": {
            "n_convs": n_convs,
            "n_turns": n_turns,
            "kg_wall_sec": round(kg_wall, 3),
            "total_bench_sec": total,
            "cpus": cpus,
        },
    }
    # Full payload (every timing + breakdown rows + detail) goes to a file —
    # the driver's stdout capture keeps only the last 2000 chars, which the
    # r4 JSON line outgrew ("parsed": null). The PRINTED line is a compact
    # subset under a hard 1900-byte budget: drop the derived
    # *_first_round_sec/*_round_sec breakdown rows first (they live in the
    # file), then the detail dict, then fall back to 2-decimal rounding.
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    try:
        os.makedirs(bench_dir, exist_ok=True)
        with open(os.path.join(bench_dir, "bench_full.json"), "w") as f:
            json.dump(payload, f, indent=1)
    except OSError:
        pass

    def _compact(p: dict) -> str:
        return json.dumps(p, separators=(",", ":"))

    printed = dict(payload)
    printed["full"] = "BENCH/bench_full.json"
    line = _compact(printed)
    if len(line) > 1900:
        printed["queries"] = {
            k: v for k, v in timings.items() if "_round_sec" not in k
        }
        line = _compact(printed)
    if len(line) > 1900:
        printed.pop("detail", None)
        line = _compact(printed)
    if len(line) > 1900:
        printed["queries"] = {k: round(v, 2) for k, v in printed["queries"].items()}
        line = _compact(printed)
    while len(line) > 1900 and printed["queries"]:
        # last resort: shed the FASTEST entries (least information) until
        # the line fits — the file always has everything
        drop = min(printed["queries"], key=printed["queries"].get)
        del printed["queries"][drop]
        line = _compact(printed)
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
