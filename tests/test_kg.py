"""Transcript→KG pipeline: P/R vs closed-form expected triples, the
order-stability invariant, sameAs connected components, and resumability."""

import os

import pytest
from pyspark.sql import functions as F

from sopspark.kg.canon import materialize_graph, sameas_closure, skolemize
from sopspark.kg.extract import assemble_turns, extract_triples
from sopspark.kg.link import entity_histogram, link_entities
from sopspark.kg.synth import alias_df, sameas_df, synth_corpus
from sopspark.plans.graph import connected_components
from sopspark.terms import BNODE


def _spo_set(quads_df):
    rows = quads_df.select("s", "p", "o").collect()
    return {(r.s.value, r.p.value, r.o.value) for r in rows}


@pytest.fixture(scope="module")
def corpus(spark):
    transcripts, expected = synth_corpus(spark, n_convs=200, seed=42)
    return transcripts.cache(), expected.cache()


def test_extraction_precision_recall(spark, corpus):
    transcripts, expected = corpus
    mentions = extract_triples(assemble_turns(transcripts))
    linked = link_entities(mentions, alias_df(spark))
    got = {
        (r.s, r.p, r.o_iri if r.o_iri is not None else r.o_lit)
        for r in linked.select("s", "p", "o_iri", "o_lit").collect()
    }
    exp = {(r.s, r.p, r.o) for r in expected.collect()}
    tp = len(got & exp)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(exp) if exp else 0.0
    assert precision >= 0.95, f"precision {precision:.4f}; sample fp: {list(got - exp)[:5]}"
    assert recall >= 0.95, f"recall {recall:.4f}; sample fn: {list(exp - got)[:5]}"


def test_order_invariance(spark, corpus):
    """input_hint invariant: per-turn results identical under shuffled input
    row order — the window ordering, not arrival order, decides."""
    transcripts, _ = corpus
    shuffled = transcripts.orderBy(F.rand(seed=7)).repartition(7)
    a = link_entities(extract_triples(assemble_turns(transcripts)), alias_df(spark))
    b = link_entities(extract_triples(assemble_turns(shuffled)), alias_df(spark))
    sa = {tuple(r) for r in a.select("conv_id", "turn_idx", "s", "p", "o_iri", "o_lit").collect()}
    sb = {tuple(r) for r in b.select("conv_id", "turn_idx", "s", "p", "o_iri", "o_lit").collect()}
    assert sa == sb


def test_hot_entity_present(spark, corpus):
    """the skew fixture is real: one entity owns ≥10% of subject mentions."""
    transcripts, _ = corpus
    linked = link_entities(extract_triples(assemble_turns(transcripts)), alias_df(spark))
    hist = entity_histogram(linked).collect()
    total = sum(r.n for r in hist)
    top = max(hist, key=lambda r: r.n)
    assert top.entity.endswith("/robert")
    assert top.n / total >= 0.10


def test_connected_components_chains_and_cycles(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"),  # chain a-b-c-d
         ("x", "y"), ("y", "z"), ("z", "x"),  # cycle
         ("solo1", "solo2")],
        "u string, v string",
    )
    cc = {r.node: r.rep for r in connected_components(edges).collect()}
    assert cc["a"] == cc["b"] == cc["c"] == cc["d"] == "a"
    assert cc["x"] == cc["y"] == cc["z"] == "x"
    assert cc["solo1"] == cc["solo2"] == "solo1"


def test_sameas_merge(spark, corpus):
    transcripts, expected = corpus
    linked = link_entities(extract_triples(assemble_turns(transcripts)), alias_df(spark))
    mapping = sameas_closure(sameas_df(spark))
    quads = materialize_graph(linked, mapping)
    got = _spo_set(quads)
    # robert chains to legacy IRIs; rep is lexicographic min of the class
    m = {r.iri: r.rep for r in mapping.collect()}
    rep_robert = m["http://example.org/person/robert"]
    assert rep_robert == "http://example.org/person/legacy/bob42"
    assert not any("person/robert" == s.rsplit("/", 1)[-1] and "person/robert" in s for s, _, _ in got)
    # every expected robert triple appears under the representative
    exp = {(r.s, r.p, r.o) for r in expected.collect()}
    exp_mapped = {(m.get(s, s), p, m.get(o, o)) for s, p, o in exp}
    tp = len(got & exp_mapped)
    assert tp / len(exp_mapped) >= 0.95
    assert tp / len(got) >= 0.95


def test_skolemize(spark):
    from sopspark.sources.ntriples import parse_lines_df

    df = parse_lines_df(
        spark.createDataFrame(
            [("_:x <http://e/p> _:y .",), ("_:x <http://e/q> <http://e/o> .",)], ["value"]
        )
    )
    sk = skolemize(df)
    rows = sk.collect()
    assert all(r.s.kind != BNODE and (r.o is None or r.o.kind != BNODE) for r in rows)
    xs = {r.s.value for r in rows}
    assert len(xs) == 1  # same label → same skolem IRI
    assert next(iter(xs)).startswith("http://example.org/.well-known/genid/")


def test_pipeline_resume(spark, tmp_path):
    from sopspark.kg.pipeline import run_kg_pipeline
    from sopspark.kg.synth import write_corpus

    corpus_dir = str(tmp_path / "corpus")
    workdir = str(tmp_path / "work")
    write_corpus(spark, corpus_dir, n_convs=50)
    r1 = run_kg_pipeline(spark, corpus_dir, workdir)
    n1 = r1["graph"].count()
    assert n1 > 0
    # manifests exist with per-file lineage
    import json

    man = json.load(open(os.path.join(workdir, "link", "_lineage.json")))
    assert man["rows"] > 0 and man["files"]

    # resume: delete one downstream stage; rerun recomputes only it
    import shutil

    shutil.rmtree(os.path.join(workdir, "graph"))
    r2 = run_kg_pipeline(spark, corpus_dir, workdir)
    assert r2["graph"].count() == n1
    # untouched upstream manifest unchanged (stage skipped, not recomputed)
    man2 = json.load(open(os.path.join(workdir, "link", "_lineage.json")))
    assert man2["written_at"] == man["written_at"]


def test_submit_entrypoint_runs_and_resumes(spark, tmp_path):
    """python -m sopspark.kg.submit (the spark-submit deploy twin): runs the
    full pipeline, prints a stage summary, and a re-submit resumes from the
    checkpoints (all stage wall times unchanged = skipped)."""
    import io
    import json
    from contextlib import redirect_stdout

    from sopspark.kg.submit import main

    corpus, work = str(tmp_path / "corpus"), str(tmp_path / "work")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["--synth", "300", "--corpus", corpus, "--workdir", work], spark=spark)
    assert rc == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["stages"]["canonical"]["rows"] > 0
    assert set(out["stages"]) == {"assemble", "extract", "link", "sameas_cc", "graph", "canonical"}
    first = out["stages"]
    # resume: same manifests → every stage skipped, identical summary
    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        rc2 = main(["--synth", "300", "--corpus", corpus, "--workdir", work], spark=spark)
    assert rc2 == 0
    again = json.loads(buf2.getvalue().strip().splitlines()[-1])["stages"]
    assert again == first


def test_snapshot_time_travel_and_expire(spark, tmp_path):
    """Every re-materialization appends a snapshot: time travel reads old
    versions, handles from earlier runs stay valid, and expire_snapshots
    drops all but the newest."""
    from pyspark.sql import functions as F

    from sopspark.kg.pipeline import (
        Stage,
        expire_snapshots,
        read_snapshot,
        run_pipeline,
        snapshots,
    )

    wd = str(tmp_path / "wd")
    src = spark.range(10).withColumnRenamed("id", "x")

    def double(spark_, inputs, factor=2):
        return inputs["src"].select((F.col("x") * factor).alias("y"))

    stages = [Stage("double", double, deps=["src"], params={"factor": 2})]
    run_pipeline(spark, wd, stages, {"src": src})
    v1 = read_snapshot(spark, wd, "double")
    assert sorted(r.y for r in v1.collect())[:3] == [0, 2, 4]
    assert [s["version"] for s in snapshots(wd, "double")] == [1]

    # unchanged config+inputs → resume skips, no new snapshot
    run_pipeline(spark, wd, stages, {"src": src})
    assert [s["version"] for s in snapshots(wd, "double")] == [1]

    # changed params → new snapshot; v1 still readable (no overwrite)
    stages2 = [Stage("double", double, deps=["src"], params={"factor": 3})]
    run_pipeline(spark, wd, stages2, {"src": src})
    log = snapshots(wd, "double")
    assert [s["version"] for s in log] == [1, 2]
    assert sorted(r.y for r in read_snapshot(spark, wd, "double", version=1).collect())[:3] == [0, 2, 4]
    assert sorted(r.y for r in read_snapshot(spark, wd, "double", version=2).collect())[:3] == [0, 3, 6]
    # default = current
    assert sorted(r.y for r in read_snapshot(spark, wd, "double").collect())[:3] == [0, 3, 6]

    # retention drops v1; reading it now fails with the available list
    assert expire_snapshots(wd, "double", keep=1) == [1]
    import pytest

    with pytest.raises(FileNotFoundError, match="available"):
        read_snapshot(spark, wd, "double", version=1)
    assert sorted(r.y for r in read_snapshot(spark, wd, "double").collect())[:3] == [0, 3, 6]


def test_write_graph_table_subject_pruning_layout(spark, tmp_path):
    """write_graph_table produces non-overlapping per-file subject ranges
    (parquet footer min/max → file-level pruning for subject lookups)."""
    import glob

    import pyarrow.parquet as pq

    from sopspark.kg.canon import materialize_graph, sameas_closure
    from sopspark.kg.extract import assemble_turns, extract_triples
    from sopspark.kg.link import link_entities
    from sopspark.kg.synth import alias_df, sameas_df, synth_corpus
    from sopspark.kg.canon import write_graph_table

    transcripts, _ = synth_corpus(spark, n_convs=60, seed=42)
    quads = materialize_graph(
        link_entities(extract_triples(assemble_turns(transcripts)), alias_df(spark)),
        sameas_closure(sameas_df(spark)),
    )
    out = str(tmp_path / "graph")
    write_graph_table(quads, out, partitions=4)

    ranges = []
    for f in sorted(glob.glob(out + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        si = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "s.value"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(si).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 2
    # consecutive files' subject ranges must not interleave
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)


def test_adamic_adar_closed_form_and_hot_center_cap(spark):
    """Hand-computed scores on a 4-node path + square, and the center
    degree cap: a hub center above the cap contributes NO wedges (the
    B²/2 blowup guard), mirroring the dup-span skew-guard contract."""
    import math

    from sopspark.kg.graphalgo import adamic_adar

    # square 1-2-3-4-1: every non-adjacent pair (the two diagonals) shares
    # exactly two degree-2 neighbors -> score = 2/ln(2)
    sq = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src bigint, dst bigint"
    )
    got = {(r.a, r.b): (r.common, r.score) for r in adamic_adar(sq).collect()}
    want = round(2 / math.log(2), 6)
    assert got == {(1, 3): (2, want), (2, 4): (2, want)}

    # star: center 0 with 5 leaves; cap below the center degree kills
    # every candidate pair instead of emitting 5*4/2 = 10
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src bigint, dst bigint"
    )
    assert adamic_adar(star, max_center_degree=4).count() == 0
    assert adamic_adar(star).count() == 10


def test_hits_fixed_point_two_hubs_one_authority(spark):
    """Two sources pointing at one sink is a HITS fixed point: the sink
    is the unit authority, the sources split hub mass 1/sqrt(2) each, and
    cross scores are zero (no in-edges at sources / out-edges at sink)."""
    from sopspark.kg.graphalgo import hits

    e = spark.createDataFrame([("a", "c"), ("b", "c")], "src string, dst string")
    got = {r.node: (round(r.hub, 9), round(r.auth, 9)) for r in hits(e, iters=4).collect()}
    s = round(1 / 2**0.5, 9)
    assert got == {"a": (s, 0.0), "b": (s, 0.0), "c": (0.0, 1.0)}


def test_scc_closed_forms(spark):
    """Coloring-SCC closed forms: two cycles joined by a bridge, a
    figure-eight (shared node merges both cycles into one SCC), a
    reversed-id path (the trim-absorbed worst case), and a self-loop
    singleton."""
    from sopspark.kg.graphalgo import strongly_connected_components as scc

    def run(edges):
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        return {(r.node, r.scc) for r in scc(df).collect()}

    assert run([(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (6, 7)]) == {
        (1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4), (7, 7)
    }
    assert run([(1, 2), (2, 1), (2, 3), (3, 2)]) == {(1, 1), (2, 1), (3, 1)}
    assert run([(5, 4), (4, 3), (3, 2), (2, 1)]) == {
        (1, 1), (2, 2), (3, 3), (4, 4), (5, 5)
    }
    assert run([(8, 8), (8, 9)]) == {(8, 8), (9, 9)}
