"""Closed-form tests for the round-3 scale operators: as-of join, BM25
search, KMV distinct sketch."""

import datetime as dt
import math

from pyspark.sql import functions as F


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _mk(spark):
    left = spark.createDataFrame(
        [(1, 10, _t(10)), (2, 10, _t(20)), (3, 20, _t(5)), (4, 30, _t(9))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _t(3), 1.0),
            (101, 10, _t(10), 2.0),   # equal ts → visible to left id=1
            (102, 10, _t(10), 3.0),   # same ts tie → greater rid wins
            (103, 10, _t(15), 4.0),
            (104, 20, _t(6), 5.0),    # after left id=3 → backward: no match
        ],
        "rid long, k long, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_semantics(spark):
    from sopspark.operators.asof import asof_join

    left, right = _mk(spark)
    out = {
        r["id"]: (r["rid"], r["v"])
        for r in asof_join(left, right, on="k", tiebreak="rid").collect()
    }
    # id=1 at t10: right rows at t3,t10,t10 are <=; tie at t10 → rid 102
    assert out[1] == (102, 3.0)
    # id=2 at t20: latest <= is t15
    assert out[2] == (103, 4.0)
    # id=3 at t5: the only k=20 right row is at t6 → unmatched (left outer)
    assert out[3] == (None, None)
    # id=4: key 30 has no right rows at all
    assert out[4] == (None, None)


def test_asof_forward_and_tolerance(spark):
    from sopspark.operators.asof import asof_join

    left, right = _mk(spark)
    fwd = {
        r["id"]: r["rid"]
        for r in asof_join(left, right, on="k", tiebreak="rid", direction="forward").collect()
    }
    # forward: earliest at-or-after; tie at t10 → SMALLEST rid wins
    assert fwd[1] == 101
    assert fwd[2] is None          # nothing at/after t20 for k=10
    assert fwd[3] == 104           # t6 >= t5

    tol = {
        r["id"]: r["rid"]
        for r in asof_join(
            left, right, on="k", tiebreak="rid", tolerance_us=2_000_000
        ).collect()
    }
    # id=2 matched t15, 5 s away → dropped by a 2 s tolerance
    assert tol[2] is None and tol[1] == 102


def test_bm25_scores_and_ranking(spark):
    from sopspark.text.search import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark join"),
            (2, "spark join"),
            (3, "nothing relevant here"),
            (4, "join of the rare kind"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ["spark"], topk=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert ids == [1, 2]  # doc 3/4 have no hits; tf=3 beats tf=1
    assert rows[0]["score"] > rows[1]["score"] > 0
    assert rows[0]["n_hits"] == 1

    # closed-form check for doc 2: N=4, df=2, dl=2, avgdl=14/4
    n, df, tf, dl, avgdl, k1, b = 4.0, 2.0, 1.0, 2.0, 14.0 / 4.0, 1.2, 0.75
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    want = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert abs(rows[1]["score"] - round(want, 6)) < 1e-6


def test_kmv_exact_below_k_and_estimate(spark):
    from sopspark.text.sketch import kmv_distinct

    rows = [("a", i % 7) for i in range(100)] + [("b", i) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in kmv_distinct(df, "g", "v", k=32).collect()}
    # group a: 7 distinct < k → exact
    assert out["a"]["n_hashes"] == 7 and out["a"]["est_distinct"] == 7.0
    # group b: the estimate is a deterministic closed form of the value
    # set — pin it against a direct hashlib computation of the k-th
    # smallest 48-bit md5 lane
    import hashlib

    hs = sorted(
        {int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16) for v in range(500)}
    )
    want = round(31.0 / (hs[31] / float(1 << 48)), 4)
    est = out["b"]["est_distinct"]
    assert out["b"]["n_hashes"] == 32
    assert est == want and out["b"]["kth_hash"] == hs[31]

    # determinism: estimate is a pure function of the value set, not layout
    out2 = {
        r["g"]: r["est_distinct"]
        for r in kmv_distinct(df.repartition(13), "g", "v", k=32).collect()
    }
    assert out2["b"] == est and out2["a"] == 7.0


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized reference-model check: asof_join (backward) must agree
    with pandas.merge_asof on every row, including duplicate-timestamp
    ties (pandas keeps the last sorted right row at equal ts; sorting by
    (ts, rid) makes that the greatest rid — our tiebreak)."""
    import numpy as np
    import pandas as pd

    from sopspark.operators.asof import asof_join

    rng = np.random.default_rng(7)
    n_l, n_r = 300, 300
    base = dt.datetime(2024, 1, 1)
    lpdf = pd.DataFrame(
        {
            "id": np.arange(n_l),
            "k": rng.integers(0, 5, n_l),
            "ts": [base + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 50, n_l)],
        }
    )
    rpdf = pd.DataFrame(
        {
            "rid": np.arange(1000, 1000 + n_r),
            "k": rng.integers(0, 6, n_r),  # key 5 never matches
            "ts": [base + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 50, n_r)],
            "v": rng.random(n_r),
        }
    )
    want = pd.merge_asof(
        lpdf.sort_values(["ts", "id"], kind="stable"),
        rpdf.sort_values(["ts", "rid"], kind="stable"),
        on="ts",
        by="k",
        direction="backward",
    ).set_index("id")["rid"].to_dict()

    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    got = {
        r["id"]: r["rid"]
        for r in asof_join(left, right, on="k", tiebreak="rid").collect()
    }
    assert len(got) == n_l
    for i in range(n_l):
        w = want[i]
        w = None if pd.isna(w) else int(w)
        assert got[i] == w, f"row {i}: got {got[i]}, want {w}"


def test_asof_null_timestamps_and_map_payload(spark):
    """Review fixes: null right-ts rows never match, null left-ts rows get
    no match (both directions), and a map-typed right column doesn't break
    the window ordering when an explicit tiebreak is given."""
    left = spark.createDataFrame(
        [(1, 10, _t(10)), (2, 10, None)], "id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, 10, None, 1.0), (101, 10, _t(5), 2.0)],
        "rid long, k long, ts timestamp, v double",
    )
    from sopspark.operators.asof import asof_join

    for direction in ("backward", "forward"):
        out = {
            r["id"]: r["rid"]
            for r in asof_join(
                left, right, on="k", tiebreak="rid", direction=direction
            ).collect()
        }
        # null left ts → no match either way
        assert out[2] is None
        # null right ts (rid=100) is never a match candidate
        assert out[1] != 100

    # map payload column: orderable only because tiebreak opts out of the
    # _pay sort key
    rmap = spark.createDataFrame(
        [(101, 10, _t(5), {"a": "b"})],
        "rid long, k long, ts timestamp, props map<string,string>",
    )
    got = asof_join(left, right=rmap, on="k", tiebreak="rid").collect()
    assert {r["id"]: r["rid"] for r in got}[1] == 101


def test_kmv_null_group_and_values(spark):
    """Null group keys form a real group; null values count nothing; an
    all-null-value group disappears (matching the SQL oracle) instead of
    crashing element_at on an empty array."""
    from sopspark.text.sketch import kmv_distinct

    rows = [("a", 1), ("a", None), (None, 5), (None, 6), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in kmv_distinct(df, "g", "v", k=8).collect()}
    assert out["a"]["est_distinct"] == 1.0          # null value ignored
    assert out[None]["est_distinct"] == 2.0         # null group kept
    assert "b" not in out                           # all-null group: no row


def test_range_join_banding_exact(spark):
    """The banded plan must equal the naive inequality join: boundary gap
    == Δt is kept, Δt+1µs dropped, bucket-edge pairs (different buckets,
    small gap) found, and no pair is emitted twice."""
    from sopspark.operators.rangejoin import range_join

    gap = 10_000_000  # 10 s bands
    left = spark.createDataFrame(
        [(1, 1, _t(10)), (2, 1, _t(29)), (3, 2, _t(40))],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 1, _t(20)),   # 10 s from id=1 (== Δt, keep) and 9 s from id=2
            (101, 1, _t(0)),    # 10 s from id=1 — bucket distance 1, keep
            (102, 1, _t(21)),   # 11 s from id=1 → drop; 8 s from id=2 keep
            (103, 2, _t(55)),   # 15 s from id=3 → drop
        ],
        "rid long, k long, ts timestamp",
    )
    got = sorted(
        (r["id"], r["rid"])
        for r in range_join(left, right, on="k", max_gap_us=gap).collect()
    )
    assert got == [(1, 100), (1, 101), (2, 100), (2, 102)]
    # exactly once each (banding must not duplicate same-bucket pairs)
    assert len(got) == len(set(got))


def test_pagerank_closed_form_and_dangling(spark):
    """3-node closed form: a→b, a→c, b→c, c dangling. Σrank stays 1 and
    the 2-iteration values match a hand-rolled reference computation."""
    from sopspark.kg.graphalgo import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=2, damping=0.85).collect()}

    # reference model
    ranks = {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}
    deg = {"a": 2, "b": 1}
    for _ in range(2):
        contrib = {"b": ranks["a"] / 2, "c": ranks["a"] / 2 + ranks["b"]}
        dang = ranks["c"]
        ranks = {
            v: (1 - 0.85) / 3 + 0.85 * (contrib.get(v, 0.0) + dang / 3)
            for v in ("a", "b", "c")
        }
    for v in ("a", "b", "c"):
        assert abs(got[v] - ranks[v]) < 1e-12, (v, got[v], ranks[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got["c"] > got["b"] > got["a"]  # sink collects the most rank


def test_histogram_percentiles_match_builtin(spark):
    """percentiles_by_histogram must equal Spark's exact percentile()
    (R-7 interpolation) on a randomized multiset, while keeping state
    bounded by distinct values instead of rows."""
    import numpy as np

    from sopspark.operators.stats import percentiles_by_histogram

    rng = np.random.default_rng(11)
    rows = [(["a", "b"][int(g)], int(v)) for g, v in
            zip(rng.integers(0, 2, 500), rng.integers(0, 40, 500))]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: r
        for r in percentiles_by_histogram(df, "g", "v", {"p25": 0.25, "p50": 0.5, "p99": 0.99}).collect()
    }
    want = {
        r["g"]: r
        for r in df.groupBy("g").agg(
            F.expr("percentile(v, 0.25) as p25"),
            F.expr("percentile(v, 0.5) as p50"),
            F.expr("percentile(v, 0.99) as p99"),
            F.count(F.lit(1)).alias("n"),
            F.avg("v").alias("mean"),
        ).collect()
    }
    for g in ("a", "b"):
        assert got[g]["n"] == want[g]["n"]
        assert abs(got[g]["mean"] - want[g]["mean"]) < 1e-9
        for q in ("p25", "p50", "p99"):
            assert abs(got[g][q] - want[g][q]) < 1e-9, (g, q)


def test_range_join_matches_naive_pandas(spark):
    """Randomized reference-model check: the banded plan equals the naive
    cross-filter join on 300x300 random rows with duplicate timestamps."""
    import numpy as np
    import pandas as pd

    from sopspark.operators.rangejoin import range_join

    rng = np.random.default_rng(3)
    base = dt.datetime(2024, 1, 1)
    lpdf = pd.DataFrame({
        "id": np.arange(300),
        "k": rng.integers(0, 6, 300),
        "ts": [base + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 120, 300)],
    })
    rpdf = pd.DataFrame({
        "rid": np.arange(1000, 1300),
        "k": rng.integers(0, 6, 300),
        "ts": [base + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 120, 300)],
    })
    gap = 7_000_000  # 7 s
    merged = lpdf.merge(rpdf, on="k", suffixes=("", "_r"))
    naive = {
        (int(r.id), int(r.rid))
        for r in merged.itertuples()
        if abs((r.ts - r.ts_r).total_seconds() * 1e6) <= gap
    }
    got = {
        (r["id"], r["rid"])
        for r in range_join(
            spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), on="k", max_gap_us=gap
        ).collect()
    }
    assert got == naive and len(got) > 100


def test_scd2_merge_semantics(spark):
    """SCD2: changed attrs close + reinsert, unchanged no-op (idempotent),
    new keys insert, stale updates ignored, latest-in-batch wins."""
    from sopspark.operators.scd import scd2_merge

    cur = spark.createDataFrame(
        [
            (1, "red", _t(0), _t(5)),     # closed history row
            (1, "blue", _t(5), None),     # open
            (2, "green", _t(0), None),    # open, update won't change it
            (3, "black", _t(8), None),    # open, stale update arrives
        ],
        "k long, color string, valid_from timestamp, valid_to timestamp",
    )
    upd = spark.createDataFrame(
        [
            (1, "gold", _t(7)),
            (1, "silver", _t(9)),   # same batch, later → wins
            (2, "green", _t(9)),    # unchanged → no-op
            (3, "white", _t(6)),    # eff <= valid_from → ignored
            (4, "pink", _t(9)),     # new key
        ],
        "k long, color string, eff_ts timestamp",
    )
    out = scd2_merge(cur, upd, key="k", attrs=["color"])
    rows = {(r.k, r.color, r.valid_from, r.valid_to) for r in out.collect()}
    assert rows == {
        (1, "red", _t(0), _t(5)),
        (1, "blue", _t(5), _t(9)),      # closed at the winning update
        (1, "silver", _t(9), None),     # new open row
        (2, "green", _t(0), None),      # untouched
        (3, "black", _t(8), None),      # stale update ignored
        (4, "pink", _t(9), None),       # inserted
    }

    # idempotence: re-applying the same batch is a no-op
    again = scd2_merge(out, upd, key="k", attrs=["color"])
    assert {(r.k, r.color, r.valid_from, r.valid_to) for r in again.collect()} == rows
    # invariant: exactly one open row per live key
    opens = [r.k for r in out.where("valid_to is null").collect()]
    assert sorted(opens) == [1, 2, 3, 4]


def test_histogram_percentiles_ignore_nulls(spark):
    """Review fix: NULL measures are ignored, matching the builtin."""
    from sopspark.operators.stats import percentiles_by_histogram

    df = spark.createDataFrame(
        [("a", None), ("a", 1), ("a", 2)], "g string, v long"
    )
    r = percentiles_by_histogram(df, "g", "v", {"p50": 0.5}).collect()[0]
    assert r["n"] == 2 and r["p50"] == 1.5 and r["mean"] == 1.5


def test_kmv_sketch_merge_property(spark):
    """KMV mergeability: sketch(A) ⊕ sketch(B) == sketch(A ∪ B) exactly —
    sharded corpora sketch independently and combine without rescanning."""
    from sopspark.text.sketch import (
        kmv_distinct,
        kmv_finalize,
        kmv_merge,
        kmv_sketch_table,
    )

    rows_a = [("g", i) for i in range(300)]
    rows_b = [("g", i) for i in range(150, 450)]  # overlapping halves
    a = spark.createDataFrame(rows_a, "g string, v long")
    b = spark.createDataFrame(rows_b, "g string, v long")
    merged = kmv_finalize(
        kmv_merge(
            kmv_sketch_table(a, "g", "v", k=32),
            kmv_sketch_table(b, "g", "v", k=32),
            "g",
            k=32,
        ),
        "g",
        k=32,
    ).collect()[0]
    direct = kmv_distinct(a.unionByName(b), "g", "v", k=32).collect()[0]
    assert merged["kth_hash"] == direct["kth_hash"]
    assert merged["est_distinct"] == direct["est_distinct"]


def test_salted_agg_matches_plain_on_zipf_skew(spark):
    """Hot-key stress: one key owns half the rows; the salted two-phase
    count must equal the plain GROUP BY exactly."""
    import numpy as np

    from sopspark.kg.link import salted_agg_count

    rng = np.random.default_rng(13)
    hot = ["K0"] * 5000
    tail = [f"K{int(x)}" for x in rng.integers(1, 200, 5000)]
    df = spark.createDataFrame([(k,) for k in hot + tail], "entity string")
    got = {
        r["entity"]: r["n"]
        for r in salted_agg_count(df, "entity", salt_buckets=32).collect()
    }
    want = {r["entity"]: r["count"] for r in df.groupBy("entity").count().collect()}
    assert got == want and got["K0"] == 5000


def test_resample_ffill_grid_and_carry(spark):
    """Ticks anchor at each key's first observation; every tick carries
    the latest at-or-before value; grid stops at the last observation."""
    from sopspark.operators.resample import resample_ffill

    rows = [
        (1, 100, _t(0), 1.0),
        (1, 101, _t(25), 2.0),   # between tick 20 and 30
        (1, 102, _t(55), 3.0),   # max ts 55 → ticks 0..50 (sequence stops <= max)
        (2, 200, _t(7), 9.0),
    ]
    df = spark.createDataFrame(rows, "k long, event_id long, ts timestamp, v double")
    out = resample_ffill(df, key_col="k", ts_col="ts", step="10 seconds", tiebreak="event_id")
    got = {(r["k"], r["tick"].second): r["v"] for r in out.collect()}
    # key 1: ticks 0,10,20,30,40,50 — values carry forward
    assert got[(1, 0)] == 1.0 and got[(1, 10)] == 1.0 and got[(1, 20)] == 1.0
    assert got[(1, 30)] == 2.0 and got[(1, 40)] == 2.0 and got[(1, 50)] == 2.0
    # key 2: single observation → single tick at its own ts
    assert got[(2, 7)] == 9.0
    assert len(got) == 7


def test_bloom_semi_join_equals_exact_semi(spark):
    """Bloom prefilter never drops a true match (no false negatives), and
    the final exact join removes any false positives — result identical to
    a plain left-semi join, for long and string keys."""
    from pyspark.sql import functions as F

    from sopspark.operators.bloomjoin import bloom_semi_join

    probe = spark.range(0, 5000).select(F.col("id").alias("k"))
    build = spark.range(0, 5000, 7).select(F.col("id").alias("k"))
    got = sorted(r.k for r in bloom_semi_join(probe, build, "k").collect())
    want = sorted(range(0, 5000, 7))
    assert got == want

    sp = probe.select(F.concat(F.lit("u"), F.col("k")).alias("k"))
    sb = build.select(F.concat(F.lit("u"), F.col("k")).alias("k"))
    got_s = sorted(r.k for r in bloom_semi_join(sp, sb, "k").collect())
    assert got_s == sorted(f"u{x}" for x in range(0, 5000, 7))


def test_bloom_semi_join_empty_build_and_pruning(spark):
    from pyspark.sql import functions as F

    from sopspark.operators.bloomjoin import bloom_bitmap, bloom_candidates, bloom_semi_join

    probe = spark.range(0, 2000).select(F.col("id").alias("k"))
    empty = probe.where(F.lit(False))
    assert bloom_semi_join(probe, empty, "k").count() == 0

    build = spark.range(0, 2000, 100).select(F.col("id").alias("k"))
    cand = bloom_candidates(probe, bloom_bitmap(build, "k"), "k")
    n_cand = cand.count()
    # candidates must cover all 20 true matches but prune most of the rest
    assert 20 <= n_cand < 400


def test_funnel_order_ties_and_window(spark):
    """Closed-form funnel semantics: strict ordering between steps,
    same-instant ties do not advance, the window anchors at step 1."""
    import datetime as dt

    from sopspark.operators.funnel import funnel

    T = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        (1, 1, T(0), "view"), (1, 2, T(5), "click"), (1, 3, T(9), "purchase"),
        (2, 4, T(0), "click"), (2, 5, T(1), "view"), (2, 6, T(2), "click"),
        (3, 7, T(0), "purchase"),
        (4, 8, T(0), "view"), (4, 9, T(0), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, event_type string")
    got = {r.user_id: (r.n_steps, r.t_first, r.t_last)
           for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert got[1] == (3, T(0), T(9))
    assert got[2] == (2, T(1), T(2))   # pre-view click ignored
    assert got[3] == (0, None, None)
    assert got[4] == (1, T(0), T(0))   # same-instant click does not advance

    # 240 s window anchored at the first view: click at +300 s is outside
    gw = {r.user_id: r.n_steps
          for r in funnel(df, ["view", "click", "purchase"], window_seconds=240).collect()}
    assert gw[1] == 1 and gw[2] == 2


def test_funnel_matches_reference_model(spark):
    """Randomized property check against a pure-Python scan."""
    import datetime as dt
    import random

    from sopspark.operators.funnel import funnel

    rng = random.Random(11)
    steps = ["a", "b", "c"]
    rows = []
    eid = 0
    for u in range(1, 30):
        t = 0
        for _ in range(rng.randint(1, 15)):
            t += rng.choice([0, 1, 5])
            rows.append((u, eid, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t),
                         rng.choice(steps + ["x"])))
            eid += 1
    expect = {}
    by_u = {}
    for u, e, ts, ty in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        if ty not in steps:
            continue
        st, tl, tf = by_u.get(u, (0, None, None))
        if st < len(steps) and ty == steps[st] and (tl is None or ts > tl):
            st, tl = st + 1, ts
            tf = tf or ts
        by_u[u] = (st, tl, tf)
        expect[u] = (st, tf, tl)
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, event_type string")
    got = {r.user_id: (r.n_steps, r.t_first, r.t_last)
           for r in funnel(df, steps).collect()}
    assert got == expect


def test_triangle_count_k4_with_noise(spark):
    from sopspark.kg.graphalgo import triangle_count

    # K4 (every vertex in 3 triangles) + a pendant vertex, with duplicate,
    # reversed, and self-loop edges that canonicalization must absorb
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 1), (2, 1), (3, 3)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0}


def test_triangle_count_triangle_free(spark):
    from sopspark.kg.graphalgo import triangle_count

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    out = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert set(out) == {1, 2, 3, 4} and set(out.values()) == {0}


def test_label_propagation_matches_reference_model(spark):
    import random
    from collections import Counter
    from sopspark.kg.graphalgo import label_propagation

    def ref_lpa(edges, iters):
        adj = {}
        for s, d in edges:
            if s is None or d is None or s == d:
                continue
            a, b = min(s, d), max(s, d)
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        lab = {v: v for v in adj}
        for _ in range(iters):
            lab = {
                v: min(Counter(lab[u] for u in nbrs).items(),
                       key=lambda kv: (-kv[1], kv[0]))[0]
                for v, nbrs in adj.items()
            }
        return lab

    rng = random.Random(13)
    for _ in range(4):
        n = rng.randint(4, 18)
        edges = [(rng.randint(0, n), rng.randint(0, n))
                 for _ in range(rng.randint(3, 35))]
        iters = rng.choice([1, 2, 5])
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r.node: r.community
               for r in label_propagation(df, iters=iters).collect()}
        assert got == ref_lpa(edges, iters)


def test_label_propagation_two_cliques_bridge(spark):
    from sopspark.kg.graphalgo import label_propagation

    # two triangles joined by one bridge edge: each keeps its own community
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.community for r in label_propagation(df, iters=5).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_kmeans_separated_clusters(spark):
    from sopspark.text.cluster import kmeans_assign

    # two tight blobs far apart: k=2 must split them exactly
    rows = [(i, [0.0 + 0.01 * i, 0.0]) for i in range(5)] + \
           [(i, [100.0 + 0.01 * i, 50.0]) for i in range(5, 10)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r.cluster for r in kmeans_assign(df, k=2, iters=3).collect()}
    a = {out[i] for i in range(5)}
    b = {out[i] for i in range(5, 10)}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_kmeans_k1_and_validation(spark):
    import pytest
    from sopspark.text.cluster import kmeans_assign

    df = spark.createDataFrame([(1, [1.0, 2.0]), (2, [3.0, 4.0])], ["vec_id", "embedding"])
    out = kmeans_assign(df, k=1, iters=2).collect()
    assert {r.cluster for r in out} == {0}
    with pytest.raises(ValueError):
        kmeans_assign(df, k=0)


def test_bfs_levels_path_graph(spark):
    from sopspark.kg.graphalgo import bfs_levels

    # path 1-2-3-4-5-6 plus isolated source 9: rounds cap at 3 hops
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], ["src", "dst"]
    )
    sources = spark.createDataFrame([(1,), (9,)], ["node"])
    got = {r.node: r.dist for r in bfs_levels(edges, sources, rounds=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 9: 0}  # 5,6 beyond the cap


def test_bfs_levels_directed_vs_undirected(spark):
    from sopspark.kg.graphalgo import bfs_levels

    edges = spark.createDataFrame([(2, 1), (2, 3)], ["src", "dst"])
    sources = spark.createDataFrame([(1,)], ["node"])
    undirected = {r.node: r.dist
                  for r in bfs_levels(edges, sources, rounds=3).collect()}
    assert undirected == {1: 0, 2: 1, 3: 2}
    directed = {r.node: r.dist
                for r in bfs_levels(edges, sources, rounds=3, directed=True).collect()}
    assert directed == {1: 0}  # no out-edges from 1


def test_cms_never_underestimates(spark):
    from sopspark.text.sketch import cms_sketch, cms_estimate

    rows = [(f"k{i % 7}",) for i in range(100)] + [("hot",)] * 40
    df = spark.createDataFrame(rows, ["k"])
    sk = cms_sketch(df, "k", d=4, w=8)  # tiny width: force collisions
    est = {r.k: r.est for r in
           cms_estimate(sk, df.select("k").distinct(), "k", d=4, w=8).collect()}
    from collections import Counter
    true = Counter(k for k, in rows)
    assert all(est[k] >= true[k] for k in true)
    assert est["hot"] >= 40


def test_cms_sketch_merges(spark):
    from pyspark.sql import functions as F
    from sopspark.text.sketch import cms_sketch, cms_estimate

    a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 2, ["k"])
    b = spark.createDataFrame([("x",)] * 3 + [("z",)] * 4, ["k"])
    merged = (
        cms_sketch(a, "k", d=4, w=16).unionByName(cms_sketch(b, "k", d=4, w=16))
        .groupBy("lane", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_sketch(a.unionByName(b), "k", d=4, w=16)
    ms = sorted(tuple(r) for r in merged.collect())
    ws = sorted(tuple(r) for r in whole.collect())
    assert ms == ws  # merge of shard sketches == sketch of the union
    keys = spark.createDataFrame([("x",), ("y",), ("z",)], ["k"])
    est = {r.k: r.est for r in cms_estimate(merged, keys, "k", d=4, w=16).collect()}
    assert est["x"] >= 8 and est["y"] >= 2 and est["z"] >= 4


def test_hard_negatives_excludes_same_label(spark):
    from sopspark.text.similarity import hard_negatives

    rows = [
        (1, [1.0, 0.0], "a"),
        (2, [0.99, 0.1], "a"),   # nearest to 1 but same label -> excluded
        (3, [0.9, 0.3], "b"),
        (4, [0.0, 1.0], "b"),
        (5, [0.5, 0.5], None),   # null label: never a negative
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    anchors = df.where("vec_id = 1")
    got = [(r.neighbor_id, r.rank) for r in
           hard_negatives(df, anchors, k=3).orderBy("rank").collect()]
    # only the different-label vectors 3 and 4 qualify, nearest first
    assert got == [(3, 1), (4, 2)]


def test_kcore_fixpoint_and_fixed_rounds(spark):
    from sopspark.kg.graphalgo import kcore

    # K4 {1..4} + a pendant path 4-5-6 + noise dup/self-loop
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6), (2, 1), (3, 3)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    fix = {r.node: r.degree for r in kcore(df, k=3, rounds=None).collect()}
    assert fix == {1: 3, 2: 3, 3: 3, 4: 3}   # the true 3-core
    one = {r.node: r.degree for r in kcore(df, k=3, rounds=1).collect()}
    assert one == fix                        # this graph converges in 1 peel
    empty = {r.node: r.degree for r in kcore(df, k=5, rounds=None).collect()}
    assert empty == {}                       # no 5-core exists


def test_ppr_all_sources_equals_pagerank(spark):
    from sopspark.kg.graphalgo import pagerank, personalized_pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 2), (5, 1)], ["src", "dst"]
    )
    nodes = (edges.select(edges.src.alias("node"))
             .unionByName(edges.select(edges.dst.alias("node"))).distinct())
    # restarting uniformly over ALL nodes IS standard PageRank
    pr = {r.node: r.rank for r in pagerank(edges, iters=8).collect()}
    ppr = {r.node: r.rank
           for r in personalized_pagerank(edges, nodes, iters=8).collect()}
    assert set(pr) == set(ppr)
    assert all(abs(pr[n] - ppr[n]) < 1e-9 for n in pr)


def test_ppr_mass_conserved_and_source_biased(spark):
    import pytest
    from sopspark.kg.graphalgo import personalized_pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (4, 3), (2, 3), (9, 10), (10, 9)],
        ["src", "dst"],
    )
    sources = spark.createDataFrame([(1,)], ["node"])
    out = {r.node: r.rank
           for r in personalized_pagerank(edges, sources, iters=12).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-9          # probability conserved
    assert out[1] >= 0.15 - 1e-9                        # source keeps >= (1-d)·r0
    assert out[9] == 0.0 and out[10] == 0.0             # unreachable: exactly 0
    with pytest.raises(ValueError):
        personalized_pagerank(edges, sources.where("node > 99"))


def test_retention_cohorts_closed_form(spark):
    import datetime as dt
    from sopspark.operators.cohort import retention_cohorts

    mon = dt.datetime(2024, 1, 1)  # a Monday
    rows = [
        (1, mon), (1, mon + dt.timedelta(days=8)),    # cohort w0, active w0+w1
        (2, mon + dt.timedelta(days=2)),              # cohort w0, only w0
        (3, mon + dt.timedelta(days=7)),              # cohort w1, only w1
        (1, mon + dt.timedelta(days=1)),              # same week dup ignored
        (None, mon),                                  # null user dropped
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(str(r.cohort_week), r.offset_weeks): r.n_users
           for r in retention_cohorts(df).collect()}
    assert got == {
        ("2024-01-01", 0): 2,   # users 1,2 in cohort week 0
        ("2024-01-01", 1): 1,   # only user 1 returns in week 1
        ("2024-01-08", 0): 1,   # user 3's own cohort
    }
    capped = {(str(r.cohort_week), r.offset_weeks)
              for r in retention_cohorts(df, max_offset=0).collect()}
    assert capped == {("2024-01-01", 0), ("2024-01-08", 0)}


def test_clustering_coefficient_closed_forms(spark):
    from sopspark.kg.graphalgo import clustering_coefficient

    # K4 (coef 1.0 everywhere) + pendant 5 (deg 1 -> 0.0); node 4 then has
    # degree 4, triangles 3 -> 2*3/(4*3) = 0.5
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: (r.degree, r.triangles, r.clustering)
           for r in clustering_coefficient(df).collect()}
    assert got[1] == (3, 3, 1.0) and got[2] == (3, 3, 1.0) and got[3] == (3, 3, 1.0)
    assert got[4] == (4, 3, 0.5)
    assert got[5] == (1, 0, 0.0)


def test_transition_matrix_closed_form(spark):
    import datetime as dt
    from sopspark.operators.cohort import transition_matrix

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: a -> b -> a ; user 2: a -> b
        (1, "a", t0, 1), (1, "b", t0 + dt.timedelta(minutes=1), 2),
        (1, "a", t0 + dt.timedelta(minutes=2), 3),
        (2, "a", t0, 4), (2, "b", t0 + dt.timedelta(minutes=1), 5),
        (3, "c", t0, 6),  # singleton: no transitions
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp, event_id long")
    got = {(r.from_state, r.to_state): (r.n, r.p)
           for r in transition_matrix(df).collect()}
    # from "a": two transitions, both to b (user 1's trailing "a" has no
    # outgoing edge) -> p = 1.0; from "b": one transition back to a
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}
    # row-stochastic: probabilities per from_state sum to 1
    from collections import defaultdict
    sums = defaultdict(float)
    for (f, _), (_, p) in got.items():
        sums[f] += p
    assert all(abs(s - 1.0) < 1e-4 for s in sums.values())


def test_rolling_zscore_flags_spike(spark):
    import datetime as dt
    import statistics
    from sopspark.operators.stats import rolling_zscore

    t0 = dt.datetime(2024, 1, 1)
    vals = [10.0, 10.5, 9.5, 10.2, 9.8, 100.0, 10.1]  # spike at idx 5
    rows = [(1, i, t0 + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, value double")
    got = {r.event_id: r.z for r in rolling_zscore(df, window_rows=10, threshold=2.0).collect()}
    base = vals[:5]
    want = round((100.0 - statistics.mean(base)) / statistics.stdev(base), 4)
    # only the spike flags: its own value is excluded from the baseline,
    # and min_baseline=3 suppresses the flimsy 2-point-baseline flags
    assert got == {5: want}
    assert want > 100  # tight baseline -> enormous z


def test_salted_join_equals_plain_join(spark):
    import random
    from sopspark.operators.saltjoin import salted_join

    rng = random.Random(11)
    # hot key 0 owns half the fact rows
    big = spark.createDataFrame(
        [(0 if rng.random() < 0.5 else rng.randint(1, 20), i) for i in range(400)],
        ["k", "payload"],
    )
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 15)], ["k", "name"]
    )
    for how in ("inner", "left"):
        want = sorted(
            tuple(r) for r in big.join(small, "k", how).select("k", "payload", "name").collect()
        )
        got = sorted(
            tuple(r)
            for r in salted_join(big, small, on="k", salt_buckets=8, how=how)
            .select("k", "payload", "name").collect()
        )
        assert got == want, how


def test_salted_join_rejects_bad_how(spark):
    import pytest
    from sopspark.operators.saltjoin import salted_join

    df = spark.createDataFrame([(1, 1)], ["k", "v"])
    with pytest.raises(ValueError):
        salted_join(df, df, on="k", how="full")
