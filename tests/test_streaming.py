"""Structured Streaming: the batch operators compose unchanged on streams."""

import time

from pyspark.sql import functions as F

from sopspark.operators.filter_map import filter_quads, map_quads
from sopspark.streaming.pipeline import (
    stream_canonical_lines,
    stream_parse_nquads,
    windowed_event_counts,
)


def test_stream_parse_filter_map(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.nq").write_text(
        "<http://e/a> <http://e/p> <http://e/o> .\n"
        "<http://e/b> <http://e/ignored> <http://e/o> .\n"
        "garbage line\n"
    )
    quads = stream_parse_nquads(spark, str(src))
    assert quads.isStreaming
    piped = map_quads(
        filter_quads(quads, "?p = <http://e/p>"), g="<http://e/stream>"
    )
    lines = stream_canonical_lines(piped)
    q = (
        lines.writeStream.format("memory")
        .queryName("sink1")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r.line for r in spark.sql("select * from sink1").collect()]
    assert got == ["<http://e/a> <http://e/p> <http://e/o> <http://e/stream> ."]


def test_stream_incremental_batches(spark, tmp_path):
    src = tmp_path / "in2"
    src.mkdir()
    (src / "b1.nq").write_text("<http://e/1> <http://e/p> <http://e/o> .\n")
    quads = stream_parse_nquads(spark, str(src))
    lines = stream_canonical_lines(quads)
    q = lines.writeStream.format("memory").queryName("sink2").trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert spark.sql("select count(*) n from sink2").collect()[0].n == 1
    # second file → second incremental run picks up only the new data
    (src / "b2.nq").write_text("<http://e/2> <http://e/p> <http://e/o> .\n")
    q2 = lines.writeStream.format("memory").queryName("sink3").trigger(availableNow=True).start()
    q2.awaitTermination(120)
    assert spark.sql("select count(*) n from sink3").collect()[0].n == 2


def test_windowed_counts_batch_parity(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_event_counts(events, window="1 hour", watermark="2 hours")
    rows = out.collect()
    assert len(rows) > 0
    assert sum(r.n for r in rows) == events.count()


def test_stateful_turn_progress(spark, tmp_path):
    from sopspark.streaming.pipeline import stateful_turn_progress

    src = tmp_path / "turns"
    src.mkdir()
    (src / "t1.csv").write_text("c1,0\nc1,1\nc2,0\n")
    stream = (
        spark.readStream.schema("conv_id string, turn_idx int")
        .option("header", "false")
        .csv(str(src))
    )
    out = stateful_turn_progress(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("statesink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # second batch extends c1's state across micro-batches
    (src / "t2.csv").write_text("c1,2\nc3,0\n")
    q2 = (
        out.writeStream.format("memory")
        .queryName("statesink2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = {r.conv_id: (r.n_turns, r.max_turn_idx) for r in spark.sql("select * from statesink2").collect()}
    assert rows["c1"] == (3, 2)  # 2 turns from batch 1 + 1 from batch 2, state carried
    assert rows["c3"] == (1, 0)

    # batch fallback: same schema, totals match
    batch = spark.createDataFrame([("c1", 0), ("c1", 1), ("c2", 5)], "conv_id string, turn_idx int")
    got = {r.conv_id: (r.n_turns, r.max_turn_idx) for r in stateful_turn_progress(batch).collect()}
    assert got == {"c1": (2, 1), "c2": (1, 5)}


def test_stream_kg_extraction_end_to_end(spark, tmp_path):
    """Streaming transcript files → extraction → linking → memory sink,
    matching the batch extractor's output on the same rows (minus pronoun
    coreference, which is batch/window-only)."""
    from sopspark.kg.synth import alias_df
    from sopspark.streaming.pipeline import stream_extract_triples, stream_link_entities

    src = tmp_path / "turns"
    src.mkdir()
    (src / "t1.json").write_text(
        '{"conv_id": "c1", "turn_idx": 0, "text": "Alice knows Bob."}\n'
        '{"conv_id": "c1", "turn_idx": 1, "text": "Bob works at Acme Corp."}\n'
    )
    schema = "conv_id string, turn_idx int, text string"
    turns = spark.readStream.schema(schema).json(str(src))
    linked = stream_link_entities(stream_extract_triples(turns), alias_df(spark))
    assert linked.isStreaming
    q = (
        linked.writeStream.format("memory")
        .queryName("kg_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.s, r.p, r.o_iri) for r in spark.sql("select * from kg_sink").collect()}
    assert len(got) == 2
    preds = {p for _, p, _ in got}
    assert any(p.endswith("knows") for p in preds)
    assert any(p.endswith("worksAt") for p in preds)


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """session_window sessionization (streaming path, availableNow) agrees
    with the batch gap-ordinal operator on session count and sizes."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sopspark.operators.sessionize import session_stats
    from sopspark.streaming.pipeline import streaming_sessionize

    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 0, 0)),
        (1, 2, dt.datetime(2024, 1, 1, 0, 10)),
        (1, 3, dt.datetime(2024, 1, 1, 0, 45)),
        (2, 4, dt.datetime(2024, 1, 1, 0, 0)),
    ]
    schema = "user_id long, event_id long, ts timestamp"
    batch = spark.createDataFrame(rows, schema)

    pq = str(tmp_path / "events_pq")
    batch.write.parquet(pq)
    stream = spark.readStream.schema(schema).parquet(pq)
    q = (
        streaming_sessionize(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["user_id"], r["n_events"])
        for r in spark.sql("select * from sess_sink").collect()
    }
    # user 1: {00:00,00:10} then {00:45} (35-min gap splits); user 2: {00:00}
    assert got == {(1, 2), (1, 1), (2, 1)}

    stats = {
        r["user_id"]: (r["n_sessions"], r["max_session_events"])
        for r in session_stats(batch, gap_seconds=1800, order_col="event_id").collect()
    }
    assert stats == {1: (2, 2), 2: (1, 1)}


def test_streaming_curation_map_ops(spark, tmp_path):
    """Map-only curation operators (PII redaction, repeat collapse, langid,
    quality) compose directly onto a streaming source — pure projections,
    no state, so the same Catalyst expressions run under Structured
    Streaming unchanged."""
    import json

    src = tmp_path / "docs"
    src.mkdir()
    rows = [
        {"doc_id": 1, "text": "mail me at bob@example.com the the plan"},
        {"doc_id": 2, "text": "the of and to a in is it that for x"},
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("doc_id long, text string").json(str(src))
    )
    assert stream.isStreaming
    from sopspark.text.analysis import collapse_repeats, detect_language, redact_pii

    out = collapse_repeats(redact_pii(detect_language(stream)))
    q = (
        out.writeStream.format("memory").queryName("cur_sink")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: r for r in spark.sql("select * from cur_sink").collect()}
    assert got[1].n_emails == 1 and "<EMAIL>" in got[1].text_redacted
    assert "the the" not in got[1].text_collapsed
    assert got[2].lang_pred == "en"


def test_streaming_range_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join (availableNow) produces the
    same pair set as the batch banded range_join."""
    import datetime as dt

    from sopspark.operators.rangejoin import range_join
    from sopspark.streaming.pipeline import streaming_range_join

    t0 = dt.datetime(2024, 1, 1)
    lrows = [(1, 10, t0), (2, 10, t0 + dt.timedelta(minutes=90)), (3, 20, t0)]
    rrows = [
        (100, 10, t0 + dt.timedelta(minutes=30)),   # within 1h of id=1 and id=2
        (101, 10, t0 + dt.timedelta(minutes=170)),  # within 1h of neither
        (102, 20, t0 + dt.timedelta(minutes=59)),   # within 1h of id=3
    ]
    ls, rs = "id long, k long, ts timestamp", "rid long, k long, ts timestamp"
    lb, rb = spark.createDataFrame(lrows, ls), spark.createDataFrame(rrows, rs)

    want = {
        (r["id"], r["rid"])
        for r in range_join(lb, rb, on="k", max_gap_us=3_600_000_000).collect()
    }
    assert want == {(1, 100), (2, 100), (3, 102)}

    lp, rp = str(tmp_path / "l_pq"), str(tmp_path / "r_pq")
    lb.write.parquet(lp)
    rb.write.parquet(rp)
    q = (
        streaming_range_join(
            spark.readStream.schema(ls).parquet(lp),
            spark.readStream.schema(rs).parquet(rp),
            on="k",
            max_gap="1 hour",
        )
        .writeStream.format("memory")
        .queryName("rj_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["l_id"], r["r_rid"])
        for r in spark.sql("select * from rj_sink").collect()
    }
    assert got == want


def test_streaming_exact_dedup_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark drops re-deliveries inside the
    watermark horizon with bounded state; matches batch dedup here."""
    import datetime as dt

    from sopspark.streaming.pipeline import streaming_exact_dedup

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0), (1, t0), (2, t0 + dt.timedelta(minutes=1)),
        (2, t0 + dt.timedelta(minutes=2)), (3, t0 + dt.timedelta(minutes=3)),
    ]
    schema = "k long, ts timestamp"
    batch = spark.createDataFrame(rows, schema)
    pq = str(tmp_path / "dd_pq")
    batch.write.parquet(pq)
    q = (
        streaming_exact_dedup(
            spark.readStream.schema(schema).parquet(pq), keys=["k"], watermark="1 hour"
        )
        .writeStream.format("memory")
        .queryName("dd_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["k"] for r in spark.sql("select * from dd_sink").collect())
    assert got == [1, 2, 3]
    # batch fallback gives the same key set
    assert sorted(
        r["k"] for r in streaming_exact_dedup(batch, keys=["k"]).collect()
    ) == [1, 2, 3]


def test_streaming_kg_ingest_matches_batch(spark, tmp_path):
    """foreachBatch ingestion: two transcript micro-batches merged
    incrementally equal the one-shot batch pipeline's triple set."""
    from sopspark.kg.canon import materialize_graph, sameas_closure
    from sopspark.kg.extract import assemble_turns, extract_triples
    from sopspark.kg.link import link_entities
    from sopspark.kg.synth import alias_df, sameas_df, synth_corpus
    from sopspark.operators.serialize import collect_nq_lines
    from sopspark.streaming.pipeline import streaming_kg_ingest

    transcripts, _ = synth_corpus(spark, n_convs=24, seed=42)
    # one-shot reference
    want = set(
        collect_nq_lines(
            materialize_graph(
                link_entities(
                    extract_triples(assemble_turns(transcripts)), alias_df(spark)
                ),
                sameas_closure(sameas_df(spark)),
            )
        )
    )

    # two parquet files → two-ish micro-batches (maxFilesPerTrigger=1)
    src = str(tmp_path / "stream_src")
    transcripts.where("conv_id < 'c0000012'").coalesce(1).write.mode("overwrite").parquet(src)
    transcripts.where("conv_id >= 'c0000012'").coalesce(1).write.mode("append").parquet(src)
    wd = str(tmp_path / "wd")
    stream = (
        spark.readStream.schema(transcripts.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_kg_ingest(stream, wd)
    q.awaitTermination(240)
    import os

    got = set(collect_nq_lines(spark.read.parquet(os.path.join(wd, "graph"))))
    assert got == want


def test_streaming_heavy_hitters_matches_batch(spark, tmp_path):
    """Two micro-batches of additive CMS merge equal the one-shot batch
    sketch, and replaying an absorbed batch is a no-op (exactly-once)."""
    from sopspark.text.sketch import cms_sketch, cms_estimate
    from sopspark.streaming.pipeline import streaming_heavy_hitters

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "ts"
    )
    src = str(tmp_path / "src")
    ev.where("user_id % 2 = 0").coalesce(1).write.mode("overwrite").parquet(src)
    ev.where("user_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)

    wd = str(tmp_path / "wd")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_heavy_hitters(stream, "user_id", wd, d=4, w=64)
    q.awaitTermination(120)

    got = spark.read.parquet(f"{wd}/cms")
    want = cms_sketch(ev, "user_id", d=4, w=64)
    gs = sorted((r.lane, r.bucket, r.cnt) for r in got.collect())
    ws = sorted((r.lane, r.bucket, r.cnt) for r in want.collect())
    assert gs == ws  # merged micro-batch sketches == one-shot sketch

    # estimates over the streamed sketch behave (>= true counts)
    keys = ev.select("user_id").distinct()
    est = {r.user_id: r.est
           for r in cms_estimate(got.select("lane", "bucket", "cnt"),
                                 keys, "user_id", d=4, w=64).collect()}
    from collections import Counter
    true = Counter(r.user_id for r in ev.collect())
    assert all(est[u] >= c for u, c in true.items())

    # replay idempotence, exercised DIRECTLY: re-deliver the LAST absorbed
    # batch_id to the merge step — the guard must refuse it. (foreachBatch
    # only ever replays the last uncommitted batch, so equality is the
    # whole replay contract; a same-incarnation regression cannot happen.)
    from sopspark.streaming.pipeline import _cms_merge_batch

    out_path, bak_path = f"{wd}/cms", f"{wd}/cms._prev"
    replay = ev.where("user_id % 2 = 1")
    assert _cms_merge_batch(replay, 1, "user_id", out_path, bak_path, 4, 64) is False
    gs2 = sorted((r.lane, r.bucket, r.cnt)
                 for r in spark.read.parquet(out_path).collect())
    assert gs2 == gs

    # crash recovery: simulate dying between the two swap renames (only
    # the backup exists) — the next batch must merge FROM the backup and
    # never hit a no-table window
    import os

    os.rename(out_path, bak_path)
    extra = spark.createDataFrame([(999999, None)], ev.schema)
    assert _cms_merge_batch(extra, 2, "user_id", out_path, bak_path, 4, 64) is True
    recovered = spark.read.parquet(out_path)
    total = sum(r.cnt for r in recovered.collect()) / 4  # d lanes each count every row
    assert total == ev.count() + 1 and not os.path.isdir(bak_path)


def test_stateful_conversation_assembly_cross_batch(spark, tmp_path):
    """A conversation SPLIT across micro-batches reassembles completely:
    feeding the assembled output to the batch extraction stages yields
    the one-shot pipeline's triples (lifting streaming_kg_ingest's
    conversation-complete-batch precondition)."""
    from sopspark.kg.extract import assemble_turns, extract_triples
    from sopspark.kg.synth import synth_corpus
    from sopspark.streaming.pipeline import stateful_conversation_assembly

    transcripts, _ = synth_corpus(spark, n_convs=12, seed=42)
    want = sorted(
        (r.conv_id, r.turn_idx, r.s_alias, r.p)
        for r in extract_triples(assemble_turns(transcripts)).collect()
    )

    # split EVERY conversation across two files by turn parity
    src = str(tmp_path / "src")
    transcripts.where("turn_idx % 2 = 0").coalesce(1).write.mode("overwrite").parquet(src)
    transcripts.where("turn_idx % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    # sentinel far-future file pushes the watermark past every timeout
    sent = transcripts.limit(1).selectExpr(
        "'__sentinel__' AS conv_id", "turn_idx", "role", "text", "tool",
        "ts + INTERVAL 10 DAYS AS ts",
    )
    sent.coalesce(1).write.mode("append").parquet(src)

    out_dir = str(tmp_path / "assembled")

    def run():
        stream = (
            spark.readStream.schema(transcripts.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        assembled = stateful_conversation_assembly(stream, gap="30 minutes",
                                                   watermark="0 seconds")
        q = (
            assembled.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    # event-time timeouts fire in the batch AFTER the watermark passes, and
    # availableNow stops at end-of-data — a second sentinel file gives the
    # resumed run (same checkpoint) that one extra batch
    sent2 = sent.selectExpr("'__sentinel2__' AS conv_id", "turn_idx", "role",
                            "text", "tool", "ts + INTERVAL 1 DAY AS ts")
    sent2.coalesce(1).write.mode("append").parquet(src)
    run()
    # startswith, not LIKE: leading underscores are LIKE wildcards
    out = spark.read.parquet(out_dir).where(
        ~F.col("conv_id").startswith("__sentinel")
    )
    # every original turn re-emitted exactly once, conversation-complete
    assert out.count() == transcripts.count()
    got = sorted(
        (r.conv_id, r.turn_idx, r.s_alias, r.p)
        for r in extract_triples(assemble_turns(out)).collect()
    )
    assert got == want


def test_streaming_minhash_ingest_matches_batch(spark, tmp_path):
    """Two-micro-batch MinHash ingest (within-batch LSH + cross-batch index
    probe) finds EXACTLY the pairs the one-shot batch LSH finds over the
    full corpus; replaying the whole source against fresh checkpoints
    leaves both tables unchanged (idempotent merges, self-pairs filtered)."""
    import os
    import shutil

    from sopspark.streaming.pipeline import streaming_minhash_ingest
    from sopspark.text.dedup import (
        jaccard_of_signatures,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    sigs = minhash_signatures(docs, num_perm=16)
    cand = minhash_lsh_pairs(sigs, bands=4, num_perm=16)
    want = {
        tuple(r)
        for r in jaccard_of_signatures(cand, sigs)
        .where(F.col("jaccard_est") >= 0.7)
        .select("a", "b", F.round("jaccard_est", 6).alias("jaccard_est"))
        .collect()
    }
    assert want, "fixture must contain near-dup pairs"

    src = str(tmp_path / "src")
    docs.where("doc_id < 250").coalesce(1).write.mode("overwrite").parquet(src)
    docs.where("doc_id >= 250").coalesce(1).write.mode("append").parquet(src)
    wd = str(tmp_path / "wd")

    def run():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_minhash_ingest(stream, wd, num_perm=16, bands=4, threshold=0.7)
        q.awaitTermination(300)

    run()
    got = {tuple(r) for r in spark.read.parquet(f"{wd}/dup_pairs").select("a", "b", "jaccard_est").collect()}
    assert got == want
    assert spark.read.parquet(f"{wd}/minhash_index").count() == docs.count()

    # full replay (checkpoint wiped): merges must be no-ops
    shutil.rmtree(os.path.join(wd, "_minhash_ckpt"))
    run()
    got2 = {tuple(r) for r in spark.read.parquet(f"{wd}/dup_pairs").select("a", "b", "jaccard_est").collect()}
    assert got2 == want
    assert spark.read.parquet(f"{wd}/minhash_index").count() == docs.count()


def test_streaming_minhash_ingest_reingest_updates_signature(spark, tmp_path):
    """A corrected re-delivery of an existing doc_id must deterministically
    replace its signature in the index (a bare dropDuplicates could keep
    the stale row and mis-probe every later batch)."""
    import time as _time

    from sopspark.streaming.pipeline import streaming_minhash_ingest
    from sopspark.text.dedup import minhash_signatures

    schema = "doc_id long, text string"
    src = str(tmp_path / "src")
    wd = str(tmp_path / "wd")
    old = spark.createDataFrame([(1, "the original text of document one here")], schema)
    old.coalesce(1).write.mode("overwrite").parquet(src)

    def run():
        stream = (
            spark.readStream.schema(old.schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = streaming_minhash_ingest(stream, wd, num_perm=16, bands=4, threshold=0.7)
        q.awaitTermination(180)

    run()
    new = spark.createDataFrame(
        [(1, "a completely rewritten body for document one now")], schema
    )
    _time.sleep(1.1)  # distinct mtime so the file source sees a NEW file
    new.coalesce(1).write.mode("append").parquet(src)
    run()

    want = minhash_signatures(new, num_perm=16).collect()[0]["sig"]
    got = spark.read.parquet(f"{wd}/minhash_index").collect()
    assert len(got) == 1 and got[0]["doc_id"] == 1
    assert list(got[0]["sig"]) == list(want)


def test_streaming_minhash_ingest_migrates_legacy_pairs_layout(spark, tmp_path):
    """A workdir whose dup_pairs was written by the pre-partitioned (flat
    swap-managed) layout must keep its evidence: root-level part files move
    into a batch=-1 partition before the first new batch writes."""
    from sopspark.streaming.pipeline import streaming_minhash_ingest

    wd = str(tmp_path / "wd")
    legacy = spark.createDataFrame(
        [(7, 9, 0.875)], "a long, b long, jaccard_est double"
    )
    legacy.coalesce(1).write.mode("overwrite").parquet(f"{wd}/dup_pairs")

    docs = spark.createDataFrame(
        [(1, "totally unique text one"), (2, "other unique body two")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "src")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = streaming_minhash_ingest(stream, wd, num_perm=16, bands=4, threshold=0.7)
    q.awaitTermination(180)

    pairs = spark.read.parquet(f"{wd}/dup_pairs").select("a", "b", "jaccard_est")
    assert (7, 9, 0.875) in {tuple(r) for r in pairs.collect()}


def test_cms_batch_id_regression_treated_as_new_incarnation(spark, tmp_path):
    """A checkpoint reset that keeps the sketch restarts batch ids at 0;
    the replay guard must NOT freeze the sketch forever — a regression
    (batch_id < last_batch) merges as a new query incarnation, while an
    exact replay (batch_id == last_batch) is still refused."""
    from sopspark.streaming.pipeline import _cms_merge_batch

    wd = str(tmp_path / "wd")
    out_path, bak_path = f"{wd}/cms", f"{wd}/cms._prev"
    ev = spark.createDataFrame([(i % 5, None) for i in range(40)], "user_id long, pad string")
    assert _cms_merge_batch(ev, 7, "user_id", out_path, bak_path, 4, 64) is True
    # exact replay of the absorbed batch: refused
    assert _cms_merge_batch(ev, 7, "user_id", out_path, bak_path, 4, 64) is False
    # new incarnation (checkpoint wiped, ids restart): merged, not frozen
    extra = spark.createDataFrame([(999, None)], ev.schema)
    assert _cms_merge_batch(extra, 0, "user_id", out_path, bak_path, 4, 64) is True
    total = sum(r.cnt for r in spark.read.parquet(out_path).collect()) / 4
    assert total == 41


def test_minhash_legacy_migration_does_not_resurrect_stale_backup(spark, tmp_path):
    """A pre-partitioned workdir that crashed mid-swap leaves BOTH the live
    dup_pairs table and its ._prev backup. Migration must keep the live
    rows and DELETE the stale backup — a later batch must not re-inject
    outdated evidence into batch=-1."""
    from sopspark.streaming.pipeline import streaming_minhash_ingest

    wd = str(tmp_path / "wd")
    live = spark.createDataFrame([(7, 9, 0.875)], "a long, b long, jaccard_est double")
    live.coalesce(1).write.mode("overwrite").parquet(f"{wd}/dup_pairs")
    stale = spark.createDataFrame([(1, 2, 0.5)], "a long, b long, jaccard_est double")
    stale.coalesce(1).write.mode("overwrite").parquet(f"{wd}/dup_pairs._prev")

    docs = spark.createDataFrame(
        [(1, "totally unique text one"), (2, "other unique body two")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "src")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = streaming_minhash_ingest(stream, wd, num_perm=16, bands=4, threshold=0.7)
    q.awaitTermination(180)

    import os

    assert not os.path.isdir(f"{wd}/dup_pairs._prev")
    got = {tuple(r) for r in spark.read.parquet(f"{wd}/dup_pairs")
           .select("a", "b", "jaccard_est").collect()}
    assert (7, 9, 0.875) in got and (1, 2, 0.5) not in got

    # second delivery into the SAME workdir: nothing resurrects
    docs2 = spark.createDataFrame([(3, "third unique piece three")], docs.schema)
    docs2.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "src2"))
    q2 = streaming_minhash_ingest(
        spark.readStream.schema(docs.schema).parquet(str(tmp_path / "src2")),
        wd, num_perm=16, bands=4, threshold=0.7,
        checkpoint=str(tmp_path / "ck2"),
    )
    q2.awaitTermination(180)
    got2 = {tuple(r) for r in spark.read.parquet(f"{wd}/dup_pairs")
            .select("a", "b", "jaccard_est").collect()}
    assert (1, 2, 0.5) not in got2 and (7, 9, 0.875) in got2


def test_graph_null_endpoints_dropped_both_paths(spark):
    """Null endpoints: the LocalRelation union-find fast path must drop
    them like the distributed path (no Python None-comparison crash), and
    pagerank must neither emit a NULL node nor leak rank mass."""
    from sopspark.kg.graphalgo import pagerank
    from sopspark.plans.graph import connected_components

    from sopspark.session import local_df

    edges = local_df(
        spark,
        [("a", "b"), ("b", None), (None, "c"), ("c", "c"), ("c", "d")],
        "a string, b string",
    )
    cc = {(r["node"], r["rep"]) for r in connected_components(edges).collect()}
    assert cc == {("a", "a"), ("b", "a"), ("c", "c"), ("d", "c")}

    pr_edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", None), (None, "a")], "src string, dst string"
    )
    ranks = pagerank(pr_edges, iters=5).collect()
    assert all(r["node"] is not None for r in ranks)
    assert abs(sum(r["rank"] for r in ranks) - 1.0) < 1e-9
