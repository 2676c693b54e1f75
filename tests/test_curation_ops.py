"""Closed-form tests for the round-2 curation/KG operators: sessionize,
PII redaction, stratified sampling, incremental KG merge."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60, second)


def test_sessionize_gap_boundaries(spark):
    from sopspark.operators.sessionize import session_stats, sessionize

    rows = [
        # user 1: events at 0, 10, 45, 46 min with 30-min gap → sessions
        # {0,10}, {45,46}; the 45-min event is 35 min after 10 → new session
        (1, 1, _ts(0)),
        (1, 2, _ts(10)),
        (1, 3, _ts(45)),
        (1, 4, _ts(46)),
        # user 2: gap of exactly 30:00 is NOT a break (strict >)
        (2, 5, _ts(0)),
        (2, 6, _ts(30)),
        # user 2: 30:00.000001 after previous IS a break
        (2, 7, dt.datetime(2024, 1, 1, 1, 0, 0, 1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    s = sessionize(df, "user_id", "ts", order_col="event_id", gap_seconds=1800)
    got = {r["event_id"]: r["session_ord"] for r in s.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1, 6: 1, 7: 2}

    stats = {
        r["user_id"]: (r["n_sessions"], r["n_events"], r["max_session_events"])
        for r in session_stats(df, "user_id", "ts", order_col="event_id").collect()
    }
    assert stats == {1: (2, 4, 2), 2: (2, 3, 2)}


def test_redact_pii_counts_and_text(spark):
    from sopspark.text.analysis import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d+x@e-f.org, call +441-123-4567 at 10.0.0.1"),
            (2, "no pii here, 1234-567-8901 is too long a prefix but matches tail"),
            (3, "999.999.999.999 still matches the ip shape"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) == (2, 1, 1)
    assert out[1]["text_redacted"] == "mail <EMAIL> and <EMAIL>, call <PHONE> at <IP>"
    # '234-567-8901' inside a longer digit run still matches (documented:
    # patterns are unanchored shapes, not validators)
    assert out[2]["n_phones"] == 1
    assert out[3]["n_ips"] == 1


def test_stratified_sample_deterministic_and_rate(spark):
    from sopspark.text.analysis import stratified_sample

    n = 4000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("und").alias("lang_pred"),
    )
    rates = {"en": 0.5, "und": 0.0}
    a = sorted(r["doc_id"] for r in stratified_sample(df, rates).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(df, rates).collect())
    assert a == b, "hash sampling must be reproducible"
    assert all(x % 2 == 0 for x in a), "und stratum rate 0 → dropped"
    # Bernoulli(0.5) over 2000 'en' docs: expect ~1000 ± 5σ
    assert 800 <= len(a) <= 1200


def test_merge_incremental_idempotent(spark):
    from sopspark.kg.canon import merge_incremental

    base = spark.createDataFrame(
        [("a", "p", "1"), ("b", "p", "2")], "s string, p string, o string"
    )
    batch = spark.createDataFrame(
        [("b", "p", "2"), ("c", "p", "3")], "s string, p string, o string"
    )
    once = merge_incremental(base, batch)
    assert sorted(tuple(r) for r in once.collect()) == [
        ("a", "p", "1"),
        ("b", "p", "2"),
        ("c", "p", "3"),
    ]
    # re-delivering the same batch changes nothing
    twice = merge_incremental(once, batch)
    assert sorted(tuple(r) for r in twice.collect()) == sorted(
        tuple(r) for r in once.collect()
    )


def test_sessionize_matches_reference_model(spark):
    """Property check against a pure-Python reference model on drawn
    event sets (one Spark job per example, few examples)."""
    import random

    from sopspark.operators.sessionize import sessionize

    rng = random.Random(7)
    for _ in range(4):
        rows = []
        eid = 0
        for user in range(1, 4):
            t = 0
            for _e in range(rng.randint(0, 12)):
                t += rng.choice([1, 60, 1799, 1800, 1801, 4000])
                rows.append((user, eid, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t)))
                eid += 1
        if not rows:
            continue
        # reference: per user in (ts, event_id) order, bump on gap > 1800 s
        expect = {}
        by_user = {}
        for u, e, ts in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
            prev, ord_ = by_user.get(u, (None, 0))
            if prev is None or (ts - prev).total_seconds() > 1800:
                ord_ += 1
            by_user[u] = (ts, ord_)
            expect[e] = ord_
        df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
        got = {
            r["event_id"]: r["session_ord"]
            for r in sessionize(df, "user_id", "ts", order_col="event_id").collect()
        }
        assert got == expect


def test_stratified_sample_monotone_in_rate(spark):
    """A stratum's sample at rate r is a subset of its sample at rate
    r' > r (hash thresholding ⇒ nested samples — the property that makes
    rate changes incremental rather than a reshuffle of the corpus)."""
    from pyspark.sql import functions as F

    from sopspark.text.analysis import stratified_sample

    df = spark.range(3000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang_pred")
    )
    small = {r["doc_id"] for r in stratified_sample(df, {"en": 0.3}).collect()}
    big = {r["doc_id"] for r in stratified_sample(df, {"en": 0.6}).collect()}
    assert small <= big
    assert len(small) < len(big)


def test_pack_sequences_budget_and_determinism(spark):
    """Chunked packing: bins are non-decreasing per shard, bin increments
    exactly when the pre-doc running total crosses a budget multiple, and
    assignment is a pure function of (id, tokens) — rerun identical."""
    from sopspark.text.analysis import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = pack_sequences(docs, budget=100, shards=4).orderBy("shard", "doc_id").collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        cum = 0
        for r in rows:
            assert r.bin == cum // 100
            cum += r.n_tokens
    again = pack_sequences(docs, budget=100, shards=4).orderBy("shard", "doc_id").collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_contamination_closed_form(spark):
    """A candidate that IS a benchmark doc's text scores 1.0; disjoint
    vocabulary scores 0.0."""
    from sopspark.text.analysis import contamination

    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (11, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.contamination for r in contamination(cand, bench, k=8).collect()}
    assert got[10] == 1.0 and got[11] == 0.0


def test_collapse_repeats_closed_form(spark):
    from sopspark.text.analysis import collapse_repeats

    df = spark.createDataFrame(
        [(1, "a a the the the b"), (2, "x y z"), (3, "q q q q")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.text_collapsed, r.n_collapsed) for r in collapse_repeats(df).collect()}
    assert got[1] == ("a the b", 3)
    assert got[2] == ("x y z", 0)
    assert got[3] == ("q", 3)


def test_mixture_sample_rates_and_determinism(spark):
    from sopspark.text.analysis import mixture_sample

    rows = [(i, "web" if i < 800 else ("code" if i < 900 else "books"))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # targets: web 100, code 80, books 20 → rates 0.125, 0.8, keep-all (20/100 docs... books has 100 docs → 0.2)
    out = mixture_sample(df, {"web": 0.5, "code": 0.4, "books": 0.1}, total=200)
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    # hash-Bernoulli: expected web=100 of 800, code=80 of 100, books=20 of 100
    assert 60 <= counts["web"] <= 140
    assert 60 <= counts["code"] <= 95
    assert 10 <= counts["books"] <= 32
    # unknown domains are dropped entirely
    assert set(counts) == {"web", "code", "books"}

    # deterministic under repartitioning (pure hash filter, no RNG state)
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(
        r.doc_id
        for r in mixture_sample(
            df.repartition(17), {"web": 0.5, "code": 0.4, "books": 0.1}, total=200
        ).collect()
    )
    assert ids1 == ids2

    # saturation: a domain whose target exceeds its size keeps every row
    sat = mixture_sample(df, {"books": 1.0}, total=5000)
    assert sat.count() == 100


def test_bigram_lm_score_closed_form(spark):
    import math

    from sopspark.text.analysis import bigram_lm_score

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in bigram_lm_score(docs, alpha=0.5).collect()}
    # bigrams: (<s>,a)x3, (a,b)x2, (a,c)x1 → C(<s>)=3, C(a)=3, V=|{a,b,c}|=3
    p_sa = (3 + 0.5) / (3 + 0.5 * 3)
    p_ab = (2 + 0.5) / (3 + 0.5 * 3)
    p_ac = (1 + 0.5) / (3 + 0.5 * 3)
    want1 = round((math.log(p_sa) + math.log(p_ab)) / 2, 6)
    want3 = round((math.log(p_sa) + math.log(p_ac)) / 2, 6)
    assert got[1].n_bigrams == 2 and abs(got[1].lm_logp - want1) < 1e-6
    assert got[2].lm_logp == got[1].lm_logp  # identical docs score equal
    assert abs(got[3].lm_logp - want3) < 1e-6
    assert got[3].lm_logp < got[1].lm_logp  # rarer continuation scores lower


def test_gopher_quality_closed_form(spark):
    from sopspark.text.analysis import gopher_quality

    rows = [
        # 2 dup lines of 'aaaa' (4 chars each) among 3 lines; dup_line_frac
        # = 1 - 2/3; dup chars = 8 of 12
        (1, "aaaa\naaaa\nbbbb"),
        # 'x y' bigram repeated 5x in 19 chars; bigram covers 2 word chars
        (2, "x y x y x y x y x y"),
        # symbols: 3 hashes + one '...' + one unicode ellipsis over 3 words
        (3, "### word… ..."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality(df).collect()}

    assert out[1]["dup_line_frac"] == round(1 - 2 / 3, 6)
    assert out[1]["dup_line_char_frac"] == round(8 / 12, 6)
    assert out[2]["top_bigram_char_frac"] == round(5 * 2 / 19, 6)
    assert out[2]["dup_line_frac"] == 0.0
    assert out[3]["symbol_word_ratio"] == round((3 + 1 + 1) / 3, 6)
    assert out[3]["alpha_word_frac"] == round(1 / 3, 6)
    # every fixture fails at least one Gopher rule
    assert not any(r["gopher_keep"] for r in out.values())


def test_gopher_quality_keep_path(spark):
    from sopspark.text.analysis import gopher_quality

    good = " ".join(
        ["the quick brown fox jumps over a lazy dog and it is fine that"]
        + [f"w{i} r{i} f{i}" for i in range(20)]
    )
    df = spark.createDataFrame([(1, good)], "doc_id long, text string")
    row = gopher_quality(df).collect()[0]
    assert row["gopher_keep"], dict(row.asDict())


def test_group_split_no_leakage_and_stability(spark):
    from sopspark.text.analysis import group_split

    rows = [(u, i) for u in range(60) for i in range(3)]
    df = spark.createDataFrame(rows, ["user_id", "event_id"])
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = group_split(df, "user_id", w, seed=3).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, set()).add(r.split)
    # leakage-free: one split per group
    assert all(len(s) == 1 for s in by_user.values())
    # deterministic across runs
    again = {r.user_id: r.split
             for r in group_split(df, "user_id", w, seed=3).collect()}
    assert again == {u: next(iter(s)) for u, s in by_user.items()}
    # all three splits occupied at 60 groups and fractions are sane
    from collections import Counter
    frac = Counter(again.values())
    assert set(frac) == {"train", "val", "test"} and frac["train"] > frac["val"]


def test_group_split_rejects_bad_weights(spark):
    import pytest
    from sopspark.text.analysis import group_split

    df = spark.createDataFrame([(1, 1)], ["user_id", "event_id"])
    with pytest.raises(ValueError):
        group_split(df, "user_id", {"train": 0.8, "val": 0.1})


def test_group_split_null_keys_quarantined(spark):
    from sopspark.text.analysis import group_split

    df = spark.createDataFrame([(1, 1), (None, 2), (3, 3)], "user_id int, x int")
    out = {r.x: r.split
           for r in group_split(df, "user_id", {"a": 0.5, "b": 0.5}).collect()}
    assert out[2] is None and out[1] in ("a", "b") and out[3] in ("a", "b")


def test_dsir_prefers_target_like_docs(spark):
    from sopspark.text.analysis import dsir_logweights

    target = spark.createDataFrame(
        [(100 + i, "the stock market rallied as bond yields fell today")
         for i in range(4)],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(
        [(1, "the stock market rallied while bond yields fell"),   # target-like
         (2, "purple elephants juggle quantum bananas under rainbows"),
         (3, "stock yields rallied the market fell")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.dsir_logw for r in dsir_logweights(raw, target).collect()}
    # the target-domain document outranks the nonsense one
    assert out[1] > out[2]
    # all scores finite even with fully-unseen bigrams (backoff works)
    assert all(abs(v) < 1e6 for v in out.values())


def test_quality_deciles_balanced_and_ordered(spark):
    from sopspark.queries import QUERIES

    rows = QUERIES["quality_deciles"](spark, "/root/testdata/sf0.001").collect()
    from collections import Counter
    sizes = Counter(r.decile for r in rows)
    assert set(sizes) == set(range(1, 11))
    assert max(sizes.values()) - min(sizes.values()) <= 1  # ntile balance
    # decile 1 holds the highest (most corpus-typical) scores
    by_decile = {}
    for r in rows:
        by_decile.setdefault(r.decile, []).append(r.lm_logp)
    assert min(by_decile[1]) >= max(by_decile[10])
