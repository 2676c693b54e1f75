"""filter / map / merge / absolutize / relativize / dedup vs reference semantics.

Each test reproduces a command documented in the reference README and asserts
the documented outcome.
"""

import os

from sopspark.operators.filter_map import filter_quads, map_quads
from sopspark.operators.serialize import collect_nq_lines
from sopspark.operators.transforms import absolutize, dedup, merge, relativize, validate
from sopspark.sources.ntriples import parse_lines_df, parse_ntriples
from sopspark.sources.turtle import parse_turtle


def _lines(spark, *nt_lines):
    return parse_lines_df(spark.createDataFrame([(l,) for l in nt_lines], ["value"]))


def test_filter_sample(spark, fixtures_dir):
    # sop parse examples/sample.nt ! filter "?p = <http://example.org/p>"
    df = parse_ntriples(spark, os.path.join(fixtures_dir, "sample.nt"))
    out = filter_quads(df, "?p = <http://example.org/p>")
    assert collect_nq_lines(out) == [
        "<http://example.org/s> <http://example.org/p> <http://example.org/o> ."
    ]


def test_filter_langmatches(spark, fixtures_dir):
    # README.md:59-63 — keep only English or untagged
    df = parse_turtle(spark, os.path.join(fixtures_dir, "lang.ttl"))
    out = filter_quads(df, 'coalesce(langMatches(lang(?o), "en"), true)')
    names = sorted(r.o.value for r in out.collect())
    assert names == ["Alice", "Bob", "Charlie"]


def test_filter_subject(spark, fixtures_dir):
    # sop parse examples/social.ttl ! filter "?s = <http://example.org/bob>"
    df = parse_turtle(spark, os.path.join(fixtures_dir, "social.ttl"))
    out = filter_quads(df, "?s = <http://example.org/bob>")
    assert out.count() == 4


def test_map_swap_then_filter(spark, fixtures_dir):
    # sop parse sample.nt ! map -s "?o" -o "?s" ! filter "?p = <http://example.org/p>"
    df = parse_ntriples(spark, os.path.join(fixtures_dir, "sample.nt"))
    out = filter_quads(map_quads(df, s="?o", o="?s"), "?p = <http://example.org/p>")
    assert collect_nq_lines(out) == [
        "<http://example.org/o> <http://example.org/p> <http://example.org/s> ."
    ]


def test_map_graph_injection(spark, fixtures_dir):
    # sop parse sample.nt ! map -g "<http://example.org/graph>"
    df = parse_ntriples(spark, os.path.join(fixtures_dir, "sample.nt"))
    out = map_quads(df, g="<http://example.org/graph>")
    assert all(r.g.value == "http://example.org/graph" for r in out.collect())
    # map -g "?s": graph named after subject
    out2 = map_quads(df, g="?s")
    assert all(r.g.value == r.s.value for r in out2.collect())


def test_map_lowercase_predicates(spark, fixtures_dir):
    # sop parse social.ttl ! map -p "iri(lcase(str(?p)))"  (README.md:224)
    df = parse_turtle(spark, os.path.join(fixtures_dir, "social.ttl"))
    out = map_quads(df, p="iri(lcase(str(?p)))")
    preds = {r.p.value for r in out.collect()}
    assert "http://xmlns.com/foaf/0.1/knows" in preds
    assert all(p == p.lower() for p in preds)
    # bob now knows both alice and charlie via lowercase foaf:knows
    knows = [r for r in out.collect() if r.p.value.endswith("/knows") and r.s.value.endswith("/bob")]
    assert len(knows) == 2


def test_map_error_drops_row(spark):
    df = _lines(
        spark,
        '<http://e/a> <http://e/p> "12"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://e/b> <http://e/p> "not a number" .',
    )
    # iri(?o + 1) errors on the non-numeric row → dropped (filter_map semantics)
    out = map_quads(df, o='iri(concat("http://e/n", str(?o + 1)))')
    rows = out.collect()
    assert len(rows) == 1 and rows[0].o.value == "http://e/n13"


def test_merge(spark):
    df = _lines(
        spark,
        "<http://e/a> <http://e/p> <http://e/o> <http://e/g1> .",
        "<http://e/b> <http://e/p> <http://e/o> .",
    )
    out = merge(df)
    lines = collect_nq_lines(out)
    assert len(lines) == 3  # original named + its default-graph copy + default
    assert "<http://e/a> <http://e/p> <http://e/o> ." in lines
    assert "<http://e/a> <http://e/p> <http://e/o> <http://e/g1> ." in lines

    dropped = merge(df, drop=True)
    lines2 = collect_nq_lines(dropped)
    assert lines2 == [
        "<http://e/a> <http://e/p> <http://e/o> .",
        "<http://e/b> <http://e/p> <http://e/o> .",
    ]


def test_dedup(spark):
    df = _lines(
        spark,
        "<http://e/a> <http://e/p> <http://e/o> .",
        "<http://e/a> <http://e/p> <http://e/o> .",
        "<http://e/a> <http://e/p> <http://e/o> <http://e/g> .",
    )
    assert dedup(df).count() == 2


def test_absolutize_relativize(spark):
    df = _lines(spark, "<a/b> <http://e/p> <c> .")
    ab = absolutize(df, "http://base.org/dir/x")
    rows = {r.s.value: r for r in ab.collect()}
    assert "http://base.org/dir/a/b" in rows
    r0 = ab.collect()[0]
    assert r0.o.value == "http://base.org/dir/c"
    assert r0.p.value == "http://e/p"  # already absolute → untouched

    rel = relativize(ab, "http://base.org/dir/x")
    vals = {(r.s.value, r.o.value) for r in rel.collect()}
    assert ("a/b", "c") in vals

    # parents bound: IRIs above base stay absolute with parents=0
    df2 = _lines(spark, "<http://base.org/up> <http://e/p> <http://base.org/dir/y> .")
    rel2 = relativize(df2, "http://base.org/dir/x", parents=0)
    r2 = rel2.collect()[0]
    assert r2.s.value == "http://base.org/up"
    assert r2.o.value == "y"
    rel3 = relativize(df2, "http://base.org/dir/x", parents=1)
    assert rel3.collect()[0].s.value == "../up"


def test_validate_null_sink(spark):
    df = _lines(
        spark,
        "<http://e/a> <http://e/p> <http://e/o> .",
        "garbage line here",
    )
    errs = validate(df).collect()
    assert len(errs) == 1 and "parse error" in errs[0].err


def test_expr_numeric_comparison(spark):
    df = _lines(
        spark,
        '<http://e/a> <http://e/p> "042"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://e/b> <http://e/p> "7"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    )
    # value-space: 042 = 42 (src/query.rs:50-51 with -d)
    out = filter_quads(df, "?o = 42")
    assert [r.s.value for r in out.collect()] == ["http://e/a"]
    out2 = filter_quads(df, "?o > 5 && ?o < 50")
    assert {r.s.value for r in out2.collect()} == {"http://e/a", "http://e/b"}
