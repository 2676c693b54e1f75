"""Structured Streaming front-end for the quad pipeline.

The reference is batch-over-streams (lazy pull iterators, no event time —
``README.md:196-199``); its streaming subcommands (`filter`/`map`/`merge`)
are exactly the stages that compose unchanged over an unbounded source. We
expose that directly: ``stream_parse_nquads`` returns a *streaming* quad
DataFrame, and every narrow operator in :mod:`sopspark.operators`
(filter_quads, map_quads, merge, absolutize, …) composes on it as-is —
same code, batch or stream. Blocking operators (query/canonicalize) need a
bounded trigger (``availableNow``) or a windowed restatement.

``windowed_event_counts`` shows the event-time path the reference lacks:
watermark + tumbling window over a transcript-like stream — late rows
beyond the watermark are dropped by Spark's state store, giving the
exactly-once windowed aggregates a 10^12-turn ingest needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sopspark.sources.ntriples import parse_lines_df


def stream_parse_nquads(spark: SparkSession, path: str) -> DataFrame:
    """Streaming source: watch ``path`` for NT/NQ files → streaming quad
    DataFrame (same schema as the batch parser; mapInPandas is supported
    on streaming DataFrames for stateless transforms)."""
    lines = spark.readStream.format("text").load(path)
    return parse_lines_df(lines)


def stream_canonical_lines(quads: DataFrame) -> DataFrame:
    """Streaming canonical N-Quads lines (no global sort — ordering is a
    batch-only concept; the canonical *document* is produced by a final
    batch sort over the sink table)."""
    from sopspark.terms import nq_line

    ok = quads.where(F.col("err").isNull()) if "err" in quads.columns else quads
    return ok.select(nq_line(F.col("s"), F.col("p"), F.col("o"), F.col("g")).alias("line"))


def stateful_turn_progress(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-conversation running (n_turns, max_turn_idx) maintained in the
    state store across micro-batches, emitted (Update mode) every batch a
    conversation receives data.

    This is the streaming twin of the batch window-ordered turn assembly:
    at 10^12-turn ingest the state is one small row per live conversation,
    partitioned by conv_id (the natural shuffle key), and the state store
    bounds memory independent of history length. Works on batch frames too
    (falls back to a plain groupBy aggregate — same output schema).
    """
    if not turns.isStreaming:
        return turns.groupBy(F.col(conv_col).alias("conv_id")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_turns"),
            F.max(idx_col).cast("bigint").alias("max_turn_idx"),
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, mx = state.get if state.exists else (0, -1)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, int(pdf[idx_col].max()))
        state.update((n, mx))
        yield pd.DataFrame({"conv_id": [key[0]], "n_turns": [n], "max_turn_idx": [mx]})

    return turns.groupBy(conv_col).applyInPandasWithState(
        update,
        outputStructType="conv_id string, n_turns bigint, max_turn_idx bigint",
        stateStructType="n bigint, mx bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts — works on batch or streaming
    frames (same plan; streaming adds state-store eviction of windows older
    than the watermark)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), key_col, "n")
    )


def stream_extract_triples(turns: DataFrame) -> DataFrame:
    """Streaming triple extraction: the SAME vectorized template extractor
    as the batch path (`sopspark.kg.extract._extract_batch`) applied per
    micro-batch — stateless, so it composes on an unbounded transcript
    stream with no watermark or shuffle.

    Cross-turn pronoun coreference is intentionally absent here: it needs
    ordered per-conversation history, which on a stream belongs in an
    ``applyInPandasWithState`` stage (see :func:`stateful_turn_progress`
    for the state-carrying pattern); the batch pipeline resolves it via the
    turn-assembly window instead."""
    from sopspark.kg.extract import extract_triples

    # the batch extractor IS the streaming extractor (mapInPandas is a
    # stateless streaming-compatible transform) — only prev_ante differs
    return extract_triples(
        turns.select(
            "conv_id",
            "turn_idx",
            "text",
            F.lit(None).cast("string").alias("prev_ante"),
        )
    )


def stream_link_entities(mentions: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """Streaming entity linking: the batch linker is already zero-shuffle
    (broadcast dictionary joins only), so it composes on a streaming
    mention DataFrame unchanged — stream-static joins against a broadcast
    static side are natively supported."""
    from sopspark.kg.link import link_entities

    return link_entities(mentions, alias_dict)


def streaming_sessionize(
    events: DataFrame,
    actor_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time sessionization via native session windows: per-actor
    sessions close after ``gap`` of event-time silence, with the watermark
    bounding state (a session whose end falls behind the watermark is
    finalized and evicted from the state store).

    The streaming twin of :func:`sopspark.operators.sessionize.sessionize`:
    that one numbers sessions ordinally over bounded history; this one
    emits (actor, session_start, session_end, n_events) incrementally over
    an unbounded stream — merging windows state-side, one shuffle on the
    actor key. Works on batch frames too (the watermark is a no-op there),
    which is how the test pins it against the batch operator's sessions.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.col(actor_col), F.session_window(F.col(ts_col), gap).alias("sw")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            actor_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Watermarked stream-stream interval join: pairs sharing ``on`` whose
    event times are within ``max_gap`` of each other.

    This is the one interval-join shape Spark executes NATIVELY at scale —
    a stream-stream inner join with a symmetric time-range condition. The
    watermark plus the range predicate bound both state stores: a buffered
    row is evicted once the other stream's watermark passes
    ``ts + max_gap`` (the batch twin is
    :func:`sopspark.operators.rangejoin.range_join`, which bands instead
    because a batch shuffle join has no state store to bound).

    Works on batch frames too (watermarks are no-ops there), which is how
    the test pins it against the batch operator.
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    l = lw.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_lts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (on, left_ts)],
    )
    r = rw.select(
        F.col(on).alias("_rk"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (on, right_ts)],
    )
    cond = (
        (l["_k"] == r["_rk"])
        & (r["_rts"] >= l["_lts"] - F.expr(f"INTERVAL {max_gap}"))
        & (r["_rts"] <= l["_lts"] + F.expr(f"INTERVAL {max_gap}"))
    )
    return (
        l.join(r, cond)
        .select(
            F.col("_k").alias(on),
            F.col("_lts").alias("left_ts"),
            F.col("_rts").alias("right_ts"),
            *[c for c in l.columns if c.startswith("l_")],
            *[c for c in r.columns if c.startswith("r_")],
        )
    )


def streaming_exact_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key in the state store only
    until the watermark passes its event time — re-deliveries inside the
    watermark horizon are dropped, and state is evicted after it (the
    unbounded-state ``dropDuplicates`` would grow forever on a stream).
    Works on batch frames too (falls back to plain dropDuplicates there,
    which is the same answer when every duplicate fits one batch)."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def _current_dir(out_path: str, bak_path: str) -> str | None:
    """Crash recovery: if a swap died after moving current → backup but
    before renaming the new table in, the backup IS the table."""
    import os

    if os.path.isdir(out_path):
        return out_path
    if os.path.isdir(bak_path):
        return bak_path
    return None


def _swap_in(tmp: str, out_path: str, bak_path: str) -> None:
    """Crash-safe table swap shared by every foreachBatch sink: at every
    step a restart finds a complete table via :func:`_current_dir`.
    The backup is only cleared (a) when a live ``out_path`` is about to
    replace it, or (b) AFTER the new table is installed — when
    recovering from the backup (``out_path`` missing), deleting it
    before the final rename would leave a window with NO complete table.
    """
    import os
    import shutil

    if os.path.isdir(out_path):
        if os.path.isdir(bak_path):
            shutil.rmtree(bak_path)
        os.rename(out_path, bak_path)
    os.rename(tmp, out_path)
    if os.path.isdir(bak_path):
        shutil.rmtree(bak_path)


def streaming_kg_ingest(
    stream, workdir: str, graph_dir: str = "graph"
):
    """Continuous transcript→KG ingestion: per micro-batch, run the batch
    extraction+linking stages and MERGE the new triples into the
    materialized graph table via ``kg.canon.merge_incremental`` — the
    streaming twin of the checkpointed batch pipeline, with exactly-once
    table updates from foreachBatch + idempotent merge (a replayed batch
    re-merges to the identical table).

    Returns the StreamingQuery; the graph parquet lives at
    ``workdir/graph_dir``. Input schema = the input_hint transcript table.

    PRECONDITION: each micro-batch must carry conversation-COMPLETE
    transcripts (e.g. one file per conversation shard, the layout the
    batch pipeline's writers produce) — turn assembly windows over
    conv_id within the batch, so a conversation split across two batches
    would reassemble per batch and emit different antecedent triples than
    the one-shot pipeline. When batches may split conversations, put
    :func:`stateful_conversation_assembly` in front: it buffers turns in
    the state store and re-emits conversation-complete rows at the
    event-time gap timeout, satisfying this precondition.
    """
    import os

    from sopspark.kg.canon import materialize_graph, merge_incremental, sameas_closure
    from sopspark.kg.extract import assemble_turns, extract_triples
    from sopspark.kg.link import link_entities
    from sopspark.kg.synth import alias_df, sameas_df

    out_path = os.path.join(workdir, graph_dir)
    bak_path = out_path + "._prev"

    def upsert(batch: DataFrame, batch_id: int) -> None:
        import shutil

        spark = batch.sparkSession
        if batch.isEmpty():
            return
        quads = materialize_graph(
            link_entities(extract_triples(assemble_turns(batch)), alias_df(spark)),
            sameas_closure(sameas_df(spark)),
        )
        cur = _current_dir(out_path, bak_path)
        merged = merge_incremental(spark.read.parquet(cur), quads) if cur else quads
        tmp = out_path + f"._b{batch_id}"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        merged.write.mode("overwrite").parquet(tmp)
        _swap_in(tmp, out_path, bak_path)

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", os.path.join(workdir, "_stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )


def _cms_merge_batch(
    batch: DataFrame,
    batch_id: int,
    value_col: str,
    out_path: str,
    bak_path: str,
    d: int,
    w: int,
) -> bool:
    """One micro-batch of :func:`streaming_heavy_hitters`, exposed for
    direct replay testing. Returns True iff the batch was merged (False:
    empty batch, or an already-absorbed ``batch_id`` replay — the
    exactly-once guard)."""
    import os
    import shutil

    from sopspark.text.sketch import cms_sketch

    spark = batch.sparkSession
    if batch.isEmpty():
        return False
    fresh = cms_sketch(batch, value_col, d=d, w=w)
    cur = _current_dir(out_path, bak_path)
    if cur:
        prior = spark.read.parquet(cur)
        prior_last = (
            prior.head()["last_batch"] if prior.limit(1).collect() else None
        )
        if prior_last is not None and prior_last >= batch_id:
            # foreachBatch replays at most the LAST uncommitted batch, so
            # within one query incarnation batch_id >= prior_last always
            # holds and equality means "already absorbed". A batch id
            # REGRESSION (batch_id < prior_last) can only mean a new query
            # incarnation over a kept sketch (checkpoint wiped or moved):
            # skipping would silently freeze the sketch forever, so merge
            # and let last_batch restart from the new query's counter.
            if prior_last == batch_id:
                return False  # replayed batch: already absorbed
            import logging

            logging.getLogger(__name__).warning(
                "streaming_heavy_hitters: batch id regressed %s -> %s — "
                "treating as a new query incarnation over the kept sketch",
                prior_last,
                batch_id,
            )
        merged = (
            prior.select("lane", "bucket", "cnt")
            .unionByName(fresh)
            .groupBy("lane", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
    else:
        merged = fresh
    out = merged.withColumn("last_batch", F.lit(batch_id).cast("long"))
    tmp = out_path + f"._b{batch_id}"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    out.write.mode("overwrite").parquet(tmp)
    _swap_in(tmp, out_path, bak_path)
    return True


def streaming_heavy_hitters(
    stream: DataFrame,
    value_col: str,
    workdir: str,
    d: int = 4,
    w: int = 256,
    sketch_dir: str = "cms",
):
    """Continuous count-min-sketch maintenance: per micro-batch, sketch
    the batch (≤ d·w rows) and element-wise MERGE into the persisted
    sketch table — the streaming twin of ``text.sketch.cms_sketch``,
    exploiting the sketch's additive mergeability so state is O(d·w)
    forever, never O(keys).

    CMS merge is additive, NOT idempotent, so a replayed micro-batch
    would double-count; the table therefore carries the last merged
    ``batch_id`` in-row (atomic with the counts via the crash-safe
    directory swap) and upsert skips any batch it has already absorbed —
    foreachBatch replay becomes a no-op, giving exactly-once counts.

    Returns the StreamingQuery; query the sketch with
    ``text.sketch.cms_estimate`` over ``workdir/sketch_dir``.
    """
    import os

    out_path = os.path.join(workdir, sketch_dir)
    bak_path = out_path + "._prev"

    def upsert(batch: DataFrame, batch_id: int) -> None:
        _cms_merge_batch(batch, batch_id, value_col, out_path, bak_path, d, w)

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", os.path.join(workdir, "_cms_ckpt"))
        .trigger(availableNow=True)
        .start()
    )


def stateful_conversation_assembly(
    turns: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
):
    """Cross-batch conversation assembly: buffer each conversation's
    turns in the state store until no new turn has arrived within
    ``gap`` of event time (watermark-driven ``EventTimeTimeout``), then
    emit the COMPLETE conversation sorted by turn_idx and clear the
    state.

    This lifts :func:`streaming_kg_ingest`'s documented precondition
    (conversation-complete micro-batches): feed THIS operator's output
    to the batch extraction stages and a conversation split across
    arbitrarily many micro-batches reassembles exactly as the one-shot
    pipeline sees it. State is one buffered conversation per live key —
    bounded by conversation length (the same bound batch windowing
    assumes) and evicted at timeout; keys partition by conv_id, the
    natural shuffle key. Input/output schema = the input_hint transcript
    table (conv_id, turn_idx, role, text, tool, ts).

    Works on batch frames too (identity — a batch frame is already
    conversation-complete).
    """
    if not turns.isStreaming:
        return turns

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # full interval grammar like withWatermark's: "<qty> <unit>" pairs,
    # repeatable ("1 hour 30 minutes"), ms..week units
    mult = {
        "millisecond": 1, "second": 1000, "minute": 60000,
        "hour": 3600000, "day": 86400000, "week": 604800000,
    }
    parts = gap.split()
    if not parts or len(parts) % 2:
        raise ValueError(f"bad gap interval: {gap!r}")
    try:
        gap_ms = sum(
            int(q) * mult[u.rstrip("s")]
            for q, u in zip(parts[::2], parts[1::2])
        )
    except (KeyError, ValueError) as exc:
        raise ValueError(f"bad gap interval: {gap!r}") from exc

    out_schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    state_schema = (
        "idx array<int>, role array<string>, text array<string>, "
        "tool array<string>, ts array<bigint>, last_ms bigint"
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            idx, role, text, tool, ts_us, _last = state.get
            state.remove()
            order = sorted(range(len(idx)), key=lambda i: idx[i])
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]] * len(idx),
                    "turn_idx": [int(idx[i]) for i in order],
                    "role": [role[i] for i in order],
                    "text": [text[i] for i in order],
                    "tool": [tool[i] for i in order],
                    "ts": pd.to_datetime([ts_us[i] for i in order], unit="us"),
                }
            )
            return
        if state.exists:
            idx, role, text, tool, ts_us = (list(x) for x in state.get[:5])
            last_ms = int(state.get[5])
        else:
            idx, role, text, tool, ts_us, last_ms = [], [], [], [], [], 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            idx += [int(v) for v in pdf["turn_idx"]]
            role += list(pdf["role"])
            text += list(pdf["text"])
            tool += [None if pd.isna(v) else v for v in pdf["tool"]]
            us = (pdf["ts"].astype("int64") // 1000).tolist()  # ns -> µs
            ts_us += [int(v) for v in us]
            last_ms = max(last_ms, max(int(v) // 1000 for v in us))  # µs -> ms
        state.update((idx, role, text, tool, ts_us, last_ms))
        state.setTimeoutTimestamp(last_ms + gap_ms)
        yield pd.DataFrame(
            {"conv_id": [], "turn_idx": [], "role": [], "text": [],
             "tool": [], "ts": []}
        )

    return (
        turns.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_minhash_ingest(
    stream: DataFrame,
    workdir: str,
    *,
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.7,
    hash_fn: str = "xxhash64",
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint: str | None = None,
):
    """Continuous near-duplicate ingest — the streaming twin of the batch
    MinHash pipeline, shaped like production dedup-at-ingest:

    per micro-batch:

      1. sign the NEW documents (:func:`~sopspark.text.dedup.
         minhash_signatures` — the corpus is never rescanned),
      2. probe the persisted signature index
         (:func:`~sopspark.text.dedup.minhash_probe`: batch bands × index
         bands equi-join) for cross-batch duplicates,
      3. find within-batch duplicates (LSH self-join + signature
         verification over the batch alone),
      4. APPEND this batch's normalized ``(a < b)`` pairs to a
         ``batch=<id>`` partition of the pairs table (overwrite of the
         batch's own partition → replay-idempotent, and history is never
         rewritten, so per-batch cost tracks the batch, not corpus age),
         then merge the new signatures into the index through the
         crash-safe :func:`_swap_in` (in-place update is required there:
         a re-ingested doc_id must REPLACE its signature). Pairs land
         first, so a crash between the two steps replays against the OLD
         index and re-derives the identical partition; self-pairs a
         replay-after-index-swap would produce are filtered.

    Durable state is the two parquet tables (signatures: one fixed-width
    row per doc; pairs: duplicate evidence) — both ≪ corpus; nothing
    accumulates in the streaming state store. The index rewrite is the one
    whole-table pass per batch — size batches (or compact off-line) so the
    signature table rewrite amortizes; the evidence table never rewrites.
    Returns the StreamingQuery; tables land at ``workdir/minhash_index``
    and ``workdir/dup_pairs`` (read the latter with a trailing
    ``distinct()`` when a re-ingested doc may have contributed the same
    pair to two batch partitions).
    """
    import os

    from sopspark.text.dedup import (
        jaccard_of_signatures,
        minhash_lsh_pairs,
        minhash_probe,
        minhash_signatures,
    )

    idx_path = os.path.join(workdir, "minhash_index")
    idx_bak = idx_path + "._prev"
    pairs_path = os.path.join(workdir, "dup_pairs")

    def _migrate_legacy_pairs() -> None:
        """One-time layout migration: a workdir written before the
        batch-partitioned pairs table holds root-level part files (or, if
        the old run crashed mid-swap, a ``._prev`` backup). Mixing those
        with ``batch=<id>`` subdirs would fail partition discovery
        ('conflicting directory structures'), and the backup would be
        silently orphaned — move them into a ``batch=-1`` partition."""
        bak = pairs_path + "._prev"
        legacy = None
        if os.path.isdir(pairs_path) and any(
            f.startswith("part-") for f in os.listdir(pairs_path)
        ):
            legacy = pairs_path
        elif os.path.isdir(bak):
            legacy = bak
        if legacy is None:
            return
        import shutil

        dst = os.path.join(pairs_path, "batch=-1")
        os.makedirs(dst, exist_ok=True)
        for f in os.listdir(legacy):
            if f.startswith("part-"):
                os.rename(os.path.join(legacy, f), os.path.join(dst, f))
            elif f == "_SUCCESS":
                os.remove(os.path.join(legacy, f))
        # the backup is STALE data once the live table migrated — remove it
        # unconditionally, or a later batch would resurrect it into the
        # same batch=-1 partition (a mid-swap crash can leave BOTH dirs)
        shutil.rmtree(bak, ignore_errors=True)

    def upsert(batch: DataFrame, batch_id: int) -> None:
        import shutil

        spark = batch.sparkSession
        if batch.isEmpty():
            return
        _migrate_legacy_pairs()
        sigs = minhash_signatures(
            batch, text_col, id_col, num_perm, shingle_k, hash_fn
        ).localCheckpoint()

        cand = minhash_lsh_pairs(sigs, id_col, bands, num_perm=num_perm, hash_fn=hash_fn)
        within = (
            jaccard_of_signatures(cand, sigs, id_col)
            .where(F.col("jaccard_est") >= threshold)
            .select("a", "b", F.round("jaccard_est", 6).alias("jaccard_est"))
        )
        cur_idx = _current_dir(idx_path, idx_bak)
        new_pairs = within
        if cur_idx:
            cross = minhash_probe(
                spark.read.parquet(cur_idx),
                sigs,
                id_col,
                bands=bands,
                threshold=threshold,
                hash_fn=hash_fn,
                num_perm=num_perm,
            ).select(
                F.least("new_id", "index_id").alias("a"),
                F.greatest("new_id", "index_id").alias("b"),
                "jaccard_est",
            ).where(F.col("a") != F.col("b"))
            new_pairs = within.unionByName(cross)

        # pairs are APPEND-ONLY evidence: each batch writes its normalized
        # distinct pairs to its own batch=<id> partition (overwrite → a
        # replayed batch re-derives the identical set into the same dir).
        # History is never read back or rewritten, so per-batch cost stays
        # proportional to the batch — a union + full re-distinct of the
        # whole table would make batch latency grow with corpus age
        # (O(N²) cumulative IO over the ingest lifetime). A re-ingested
        # doc may contribute a pair to a second batch partition; readers
        # wanting exactly-once pairs apply distinct over (a, b).
        new_pairs.distinct().write.mode("overwrite").parquet(
            os.path.join(pairs_path, f"batch={batch_id}")
        )

        # NEW signatures win deterministically on re-ingest of an existing
        # id (left_anti keeps only old rows whose id is absent from the
        # batch) — a bare dropDuplicates would keep an ARBITRARY row per
        # id, so a corrected document could silently retain its stale
        # signature and mis-probe every later batch
        idx = (
            sigs
            if cur_idx is None
            else spark.read.parquet(cur_idx)
            .join(sigs.select(id_col), id_col, "left_anti")
            .unionByName(sigs)
        )
        tmp = idx_path + f"._b{batch_id}"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        idx.write.mode("overwrite").parquet(tmp)
        _swap_in(tmp, idx_path, idx_bak)

    # a new SOURCE into the same workdir needs its own checkpoint (offsets
    # are per-source); the durable dedup state lives in the parquet tables,
    # not the checkpoint, so this is safe to point elsewhere — but runs
    # SHARING one workdir must be sequential: with distinct checkpoints
    # Spark no longer rejects two concurrent queries, and two concurrent
    # ingests could race _swap_in's whole-index rewrite and lose or
    # corrupt signatures (there is no cross-process lock on workdir)
    return (
        stream.writeStream.foreachBatch(upsert)
        .option(
            "checkpointLocation",
            checkpoint or os.path.join(workdir, "_minhash_ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
