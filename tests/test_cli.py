"""Pipeline CLI parity with the reference's documented commands."""

import os

from sopspark.cli import run_pipeline_cli


def run(spark, capsys, *argv):
    rc = run_pipeline_cli(list(argv), spark=spark)
    out = capsys.readouterr().out.strip().splitlines()
    return rc, out


def test_cli_swap_filter(spark, capsys, fixtures_dir):
    rc, out = run(
        spark, capsys,
        "parse", f"{fixtures_dir}/sample.nt", "!",
        "map", "-s", "?o", "-o", "?s", "!",
        "filter", "?p = <http://example.org/p>",
    )
    assert rc == 0
    assert out == ["<http://example.org/o> <http://example.org/p> <http://example.org/s> ."]


def test_cli_aliases(spark, capsys, fixtures_dir):
    # sop p examples/sample.nt ! f "?p = <...>" ! s -f nt   (README.md:258)
    rc, out = run(
        spark, capsys,
        "p", f"{fixtures_dir}/sample.nt", "!",
        "f", "?p = <http://example.org/p>", "!",
        "s", "-f", "nt",
    )
    assert rc == 0
    assert out == ["<http://example.org/s> <http://example.org/p> <http://example.org/o> ."]


def test_cli_query_select(spark, capsys, fixtures_dir):
    rc, out = run(
        spark, capsys,
        "parse", f"{fixtures_dir}/social.ttl", "-f", "ttl", "!",
        "query", "-q", f"{fixtures_dir}/persons.rq",
    )
    assert rc == 0
    assert out[0] == "?name"
    assert sorted(out[1:]) == ['"Alice"', '"Bob"']


def test_cli_query_select_pretty_prints_numeric_literals(spark, capsys, fixtures_dir):
    """Reference pretty_print (query.rs:182-195): boolean/decimal/double/
    integer bindings print their bare lexical form; strings keep quotes;
    other datatypes keep full term syntax."""
    rc, out = run(
        spark, capsys,
        "parse", f"{fixtures_dir}/social.ttl", "-f", "ttl", "!",
        "query",
        "PREFIX foaf: <http://xmlns.com/foaf/0.1/> "
        "SELECT ?n ?b ?s ?d WHERE { ?p foaf:name ?name . "
        'BIND(STRLEN(?name) AS ?n) BIND(ISIRI(?p) AS ?b) BIND("x" AS ?s) '
        'BIND(STRDT("2020-01-01", <http://www.w3.org/2001/XMLSchema#date>) AS ?d) '
        "} ORDER BY ?n LIMIT 1",
    )
    assert rc == 0
    assert out[0] == "?n\t?b\t?s\t?d"
    assert out[1] == '3\ttrue\t"x"\t"2020-01-01"^^<http://www.w3.org/2001/XMLSchema#date>'


def test_cli_ask_status(spark, capsys, fixtures_dir):
    rc, _ = run(
        spark, capsys,
        "parse", f"{fixtures_dir}/social.ttl", "-f", "ttl", "!",
        "query", "-s", "ASK WHERE { ?s a <http://xmlns.com/foaf/0.1/Person> }",
    )
    assert rc == 0
    rc2, _ = run(
        spark, capsys,
        "parse", f"{fixtures_dir}/social.ttl", "-f", "ttl", "!",
        "query", "-s", "ASK WHERE { ?s a <http://example.org/Robot> }",
    )
    assert rc2 == 1


def test_cli_construct_pipes_on(spark, capsys, fixtures_dir):
    rc, out = run(
        spark, capsys,
        "parse", f"{fixtures_dir}/social.ttl", "-f", "ttl", "!",
        "query",
        "PREFIX foaf: <http://xmlns.com/foaf/0.1/> "
        "CONSTRUCT { ?p foaf:name ?n } WHERE { ?p foaf:name ?n }", "!",
        "merge",
    )
    assert rc == 0
    assert len(out) == 2 and all("foaf/0.1/name" in l for l in out)


def test_cli_merge_drop_graph(spark, capsys, fixtures_dir):
    # sop parse msg-1.nt ! map -g "<http://example.org/g1>" ! merge --drop
    rc, out = run(
        spark, capsys,
        "parse", f"{fixtures_dir}/msg-1.nt", "!",
        "map", "-g", "<http://example.org/g1>", "!",
        "merge", "--drop",
    )
    assert rc == 0
    assert out == ['<http://example.org/msg/1> <http://example.org/prop> "Message 1" .']


def test_cli_multiple_glob(spark, capsys, fixtures_dir):
    rc, out = run(
        spark, capsys,
        "parse", "-m", f"{fixtures_dir}/msg-*.nt", "m-",
    )
    assert rc == 0
    assert len(out) == 2


def test_cli_null_reports_errors(spark, capsys, tmp_path):
    bad = tmp_path / "bad.nt"
    bad.write_text("not rdf at all\n<http://e/s> <http://e/p> <http://e/o> .\n")
    rc = run_pipeline_cli(["parse", str(bad), "!", "null"], spark=spark)
    err = capsys.readouterr().err
    assert rc == 1
    assert "parse error" in err


def test_cli_dispatch(spark, capsys, tmp_path, fixtures_dir):
    dest = tmp_path / "out"
    rc, out = run(
        spark, capsys,
        "parse", f"{fixtures_dir}/sample.nt", "!",
        "map", "-g", 'iri(concat("http://example.org/graphs/", "g1.nt"))', "!",
        "dispatch", "http://example.org/graphs/", "-d", str(dest),
    )
    assert rc == 0
    assert (dest / "g1.nt").exists()
    assert len((dest / "g1.nt").read_text().strip().splitlines()) == 2
    assert out == []  # everything dispatched; remainder empty


def test_c14n_function_flag_parity():
    """Flag grammar parity with src/canonicalize/c14n_function.rs tests."""
    import pytest

    from sopspark.operators.canonicalize import parse_c14n_function

    for s in ("RDFC", "RDFC1", "RDFC10", "RDFC1.0", "RDFC-1", "RDFC-10", "RDFC-1.0", "rdfc10"):
        assert parse_c14n_function(s) == "rdfc10"
    for s in ("Sophia", "sophia", "Sophia-C14N", "sophia-c14n"):
        assert parse_c14n_function(s) == "sophia"
    with pytest.raises(ValueError, match="Unrecognized c14n function"):
        parse_c14n_function("md5-c14n")


def test_cli_canonicalize_sophia_flag(spark, tmp_path, fixtures_dir):
    import os

    from sopspark.cli import run_pipeline_cli

    out = str(tmp_path / "c14n.nq")
    rc = run_pipeline_cli(
        ["parse", os.path.join(fixtures_dir, "sample.nt"), "!",
         "canonicalize", "-f", "sophia", "-o", out],
        spark=spark,
    )
    assert rc == 0 and open(out).read().strip() != ""
    rc2 = run_pipeline_cli(
        ["parse", os.path.join(fixtures_dir, "sample.nt"), "!",
         "canonicalize", "-f", "bogus", "-o", out],
        spark=spark,
    )
    assert rc2 == 2


def test_cli_parse_named_graph_and_relativize(spark, capsys, tmp_path):
    """parse -g (bare: graph named after the source, parse.rs:79-80) and
    parse -r [N] (relativize against the source IRI, parse.rs:86-91)."""
    f = tmp_path / "one.nt"
    f.write_text("<http://e/s> <http://e/p> <http://e/o> .\n")
    rc, out = run(spark, capsys, "parse", str(f), "-g")
    assert rc == 0
    assert out == [
        f"<http://e/s> <http://e/p> <http://e/o> <file://{f}> ."
    ]
    # explicit-name variant moved to -G (flag-only -g matches parse.rs and
    # keeps `parse -g file.nt` from swallowing the filename)
    rc2, out2 = run(spark, capsys, "parse", str(f), "-G", "http://e/G")
    assert out2 == ["<http://e/s> <http://e/p> <http://e/o> <http://e/G> ."]
    # the former ambiguity: -g before the positional file now parses as
    # flag + file instead of binding the filename as a graph IRI
    rc2b, out2b = run(spark, capsys, "parse", "-g", str(f))
    assert rc2b == 0
    assert out2b == [f"<http://e/s> <http://e/p> <http://e/o> <file://{f}> ."]
    # -m with bare -g: each source's default graph gets its own source IRI
    g = tmp_path / "two.nt"
    g.write_text("<http://e/s2> <http://e/p> <http://e/o> .\n")
    rc3, out3 = run(spark, capsys, "parse", "-g", "-m", str(f), str(g), "m-")
    assert rc3 == 0
    assert sorted(out3) == sorted([
        f"<http://e/s> <http://e/p> <http://e/o> <file://{f}> .",
        f"<http://e/s2> <http://e/p> <http://e/o> <file://{g}> .",
    ])
    # -r: IRIs under the source location become relative references
    h = tmp_path / "rel.nt"
    h.write_text(f"<file://{tmp_path}/rel.nt#it> <http://e/p> <file://{tmp_path}/other> .\n")
    rc4, out4 = run(spark, capsys, "parse", str(h), "-r")
    assert rc4 == 0
    # the operator emits name-relative references (`rel.nt#it`), not the
    # same-document `#it` shortening — both are correct relative refs
    assert out4 == ["<rel.nt#it> <http://e/p> <other> ."]


def test_cli_serialize_prefix_map_and_no_pretty(spark, capsys, tmp_path):
    """serialize -p PREFIX:URI,... (src/serialize.rs:63-67) and -P
    (--no-pretty: one triple per line, no ;/, grouping)."""
    f = tmp_path / "pm.nt"
    f.write_text(
        "<http://z.example/v/a> <http://z.example/v/p> <http://z.example/v/b> .\n"
        '<http://z.example/v/a> <http://z.example/v/p> "x" .\n'
    )
    rc, out = run(
        spark, capsys,
        "parse", str(f), "!",
        "serialize", "-f", "ttl", "-p", "zv:http://z.example/v/",
    )
    assert rc == 0
    assert out[0] == "@prefix zv: <http://z.example/v/> ."
    assert out[1] == 'zv:a zv:p "x", zv:b .'
    rc2, out2 = run(
        spark, capsys,
        "parse", str(f), "!",
        "serialize", "-f", "ttl", "-p", "zv:http://z.example/v/", "-P",
    )
    assert rc2 == 0
    assert sorted(out2[1:]) == ['zv:a zv:p "x" .', "zv:a zv:p zv:b ."]
    # -P must apply to the file sink too (the reference's serializer
    # options are sink-independent)
    outf = tmp_path / "plain.ttl"
    rc3, _ = run(
        spark, capsys,
        "parse", str(f), "!",
        "serialize", "-f", "ttl", "-p", "zv:http://z.example/v/", "-P",
        "-o", str(outf),
    )
    assert rc3 == 0
    import glob as _glob

    part = _glob.glob(str(outf / "part-*"))[0]  # Spark text sink directory
    lines = open(part).read().strip().splitlines()
    assert sorted(lines[1:]) == ['zv:a zv:p "x" .', "zv:a zv:p zv:b ."]


def test_cli_dispatch_overwrite_and_relativize(spark, capsys, tmp_path, fixtures_dir):
    """dispatch -o (overwrite gate, dispatch.rs:52-54) and -r (relativize
    against the graph IRI, dispatch.rs:60-61)."""
    dest = tmp_path / "out"
    argv = [
        "parse", f"{fixtures_dir}/sample.nt", "!",
        "map", "-g", 'iri(concat("http://example.org/graphs/", "g1.nt"))', "!",
        "dispatch", "http://example.org/graphs/", "-d", str(dest), "-r",
    ]
    rc, out = run(spark, capsys, *argv)
    assert rc == 0
    body = (dest / "g1.nt").read_text()
    # IRIs under the graph IRI's location relativize; others stay absolute
    assert "<http://example.org/s>" in body  # sibling of graphs/: not under g1.nt
    first = body
    # without -o, a re-run must NOT overwrite the existing file
    (dest / "g1.nt").write_text("sentinel\n")
    rc2, _ = run(spark, capsys, *argv)
    assert rc2 == 0 and (dest / "g1.nt").read_text() == "sentinel\n"
    # with -o it does
    rc3, _ = run(spark, capsys, *argv[:-1] + ["-o", "-r"])
    assert rc3 == 0 and (dest / "g1.nt").read_text() == first


def test_cli_dispatch_relativize_nested_parents(spark, capsys, tmp_path, fixtures_dir):
    """Nested dispatched graphs relativize with parents = '/'-count of the
    relpath (dispatch.rs:134): an IRI one level up from a/b.nt may climb
    via ../ instead of staying absolute."""
    dest = tmp_path / "out"
    rc, _ = run(
        spark, capsys,
        "parse", f"{fixtures_dir}/sample.nt", "!",
        "map", "-s", 'iri("http://example.org/graphs/other.nt")', "-g",
        'iri(concat("http://example.org/graphs/", "a/b.nt"))', "!",
        "dispatch", "http://example.org/graphs/", "-d", str(dest), "-r",
    )
    assert rc == 0
    body = (dest / "a" / "b.nt").read_text()
    assert "<../other.nt>" in body


def test_cli_serialize_trig_no_pretty(spark, capsys, tmp_path):
    """-P applies to TriG too (stdout AND -o): one statement per line,
    named-graph statements as single-line g { s p o . } blocks."""
    f = tmp_path / "t.nq"
    f.write_text(
        "<http://e/s> <http://e/p> <http://e/o> <http://e/g> .\n"
        "<http://e/s> <http://e/p> <http://e/o2> .\n"
    )
    rc, out = run(spark, capsys, "parse", str(f), "!", "serialize", "-f", "trig", "-P")
    assert rc == 0
    body = [l for l in out if not l.startswith("@prefix")]
    assert "<http://e/s> <http://e/p> <http://e/o2> ." in body
    assert "<http://e/g> { <http://e/s> <http://e/p> <http://e/o> . }" in body
    outf = tmp_path / "out.trig"
    rc2, _ = run(
        spark, capsys, "parse", str(f), "!",
        "serialize", "-f", "trig", "-P", "-o", str(outf),
    )
    assert rc2 == 0
    import glob as _glob

    lines = open(_glob.glob(str(outf / "part-*"))[0]).read().strip().splitlines()
    assert "<http://e/g> { <http://e/s> <http://e/p> <http://e/o> . }" in lines


def test_cli_map_g_variable(spark, capsys, fixtures_dir):
    # README.md:219 — sop parse sample.nt ! map -g "?s": each triple lands
    # in the named graph of its own subject
    rc, out = run(
        spark, capsys,
        "parse", f"{fixtures_dir}/sample.nt", "!",
        "map", "-g", "?s", "!",
        "serialize", "-f", "nq",
    )
    assert rc == 0
    assert any(
        l.endswith("<http://example.org/s> .") and l.count("<http://example.org/s>") == 2
        for l in out
    )


def test_cli_double_tee_two_files(spark, capsys, fixtures_dir, tmp_path):
    # README.md:34 — sop parse X ! serialize -o A ! serialize -o B writes
    # the same stream to BOTH sinks (tee keeps quads flowing)
    a, b = str(tmp_path / "a.nt"), str(tmp_path / "b.nq")
    rc = run_pipeline_cli(
        [
            "parse", f"{fixtures_dir}/sample.nt", "!",
            "serialize", "-f", "nt", "-o", a, "!",
            "serialize", "-f", "nq", "-o", b,
        ],
        spark=spark,
    )
    assert rc == 0

    def lines(path):
        import glob

        got = []
        for f in sorted(glob.glob(path + "/part-*") or [path]):
            if os.path.isfile(f):
                got.extend(x for x in open(f).read().splitlines() if x)
        return sorted(got)

    assert lines(a) == lines(b) != []
