"""SPARQL subset + RDFS entailment vs the reference README's query examples."""

import os

from sopspark.functions.entailment import materialize_rdfs
from sopspark.functions.sparql import bindings_to_quads, sparql_query
from sopspark.operators.serialize import collect_nq_lines
from sopspark.sources.ntriples import parse_lines_df
from sopspark.sources.turtle import parse_turtle

PERSONS_RQ = """
PREFIX foaf: <http://xmlns.com/foaf/0.1/>
SELECT ?name WHERE {
    ?p a foaf:Person ;
       foaf:name ?name .
}
"""


def _social(spark, fixtures_dir):
    return parse_turtle(spark, os.path.join(fixtures_dir, "social.ttl"))


def test_select_persons(spark, fixtures_dir):
    # sop parse examples/social.ttl ! query -q examples/persons.rq
    res = sparql_query(_social(spark, fixtures_dir), PERSONS_RQ)
    assert res.kind == "bindings" and res.variables == ["name"]
    names = sorted(r.name.value for r in res.df.collect())
    assert names == ["Alice", "Bob"]


def test_ask(spark, fixtures_dir):
    df = _social(spark, fixtures_dir)
    yes = sparql_query(df, "ASK WHERE { ?s a <http://xmlns.com/foaf/0.1/Person> }")
    no = sparql_query(df, "ASK WHERE { ?s a <http://example.org/Robot> }")
    assert yes.value is True and no.value is False


def test_construct_reenters_pipeline(spark, fixtures_dir):
    q = """
    PREFIX foaf: <http://xmlns.com/foaf/0.1/>
    CONSTRUCT { ?p foaf:name ?n } WHERE { ?p foaf:name ?n }
    """
    res = sparql_query(_social(spark, fixtures_dir), q)
    assert res.kind == "quads"
    lines = collect_nq_lines(res.df)
    assert len(lines) == 2
    assert '<http://example.org/alice> <http://xmlns.com/foaf/0.1/name> "Alice" .' in lines


def test_blank_node_pattern(spark, fixtures_dir):
    # README.md:39: SELECT ?t { [] a ?t }
    res = sparql_query(_social(spark, fixtures_dir), "SELECT ?t { [] a ?t }")
    types = {r.t.value for r in res.df.collect()}
    assert types == {"http://xmlns.com/foaf/0.1/Person"}


def test_spo_select_reenters(spark, fixtures_dir):
    res = sparql_query(
        _social(spark, fixtures_dir),
        "SELECT ?s ?p ?o WHERE { ?s ?p ?o FILTER (?p = <http://xmlns.com/foaf/0.1/knows>) }",
    )
    quads = bindings_to_quads(res)
    assert quads is not None and quads.count() == 2
    # non-spog projection doesn't re-enter
    res2 = sparql_query(_social(spark, fixtures_dir), PERSONS_RQ)
    assert bindings_to_quads(res2) is None


def test_join_shared_vars(spark, fixtures_dir):
    q = """
    PREFIX foaf: <http://xmlns.com/foaf/0.1/>
    SELECT ?a ?b WHERE { ?a foaf:knows ?b . ?b foaf:knows ?a . }
    """
    res = sparql_query(_social(spark, fixtures_dir), q)
    pairs = {(r.a.value, r.b.value) for r in res.df.collect()}
    assert pairs == {
        ("http://example.org/alice", "http://example.org/bob"),
        ("http://example.org/bob", "http://example.org/alice"),
    }


def test_union_optional_orderby_limit(spark):
    rows = [
        '<http://e/a> <http://e/score> "3"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://e/b> <http://e/score> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://e/c> <http://e/score> "2"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://e/a> <http://e/tag> "x" .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    q = """
    SELECT ?s ?v ?t WHERE {
      ?s <http://e/score> ?v .
      OPTIONAL { ?s <http://e/tag> ?t }
    } ORDER BY DESC(?v) LIMIT 2
    """
    res = sparql_query(df, q)
    got = [(r.s.value, r.v.value, r.t.value if r.t else None) for r in res.df.collect()]
    assert got == [("http://e/a", "3", "x"), ("http://e/c", "2", None)]

    q2 = """
    SELECT ?s WHERE {
      { ?s <http://e/tag> ?x } UNION { ?s <http://e/score> ?v FILTER(?v = 1) }
    }
    """
    res2 = sparql_query(df, q2)
    assert {r.s.value for r in res2.df.collect()} == {"http://e/a", "http://e/b"}


def test_graph_pattern(spark):
    rows = [
        "<http://e/a> <http://e/p> <http://e/o> <http://e/g1> .",
        "<http://e/b> <http://e/p> <http://e/o> .",
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    res = sparql_query(df, "SELECT ?s ?g WHERE { GRAPH ?g { ?s <http://e/p> ?o } }")
    got = [(r.s.value, r.g.value) for r in res.df.collect()]
    assert got == [("http://e/a", "http://e/g1")]
    # default-graph pattern sees only the default graph
    res2 = sparql_query(df, "SELECT ?s WHERE { ?s <http://e/p> ?o }")
    assert [r.s.value for r in res2.df.collect()] == ["http://e/b"]


def test_trailing_semicolon_in_triples_block(spark, fixtures_dir):
    # legal per the SPARQL grammar's (';' (verb objectList)?)*
    res = sparql_query(
        _social(spark, fixtures_dir),
        "SELECT ?s WHERE { ?s <http://xmlns.com/foaf/0.1/name> ?o ; }",
    )
    assert res.df.count() == 2
    res2 = sparql_query(
        _social(spark, fixtures_dir),
        "SELECT ?s WHERE { ?s <http://xmlns.com/foaf/0.1/name> ?o ; . }",
    )
    assert res2.df.count() == 2


def test_graph_scopes_exists_and_minus(spark):
    rows = [
        "<http://e/a> <http://e/p> <http://e/o> <http://e/g1> .",
        '<http://e/a> <http://e/tag> "t" <http://e/g1> .',
        "<http://e/b> <http://e/p> <http://e/o> <http://e/g1> .",
        '<http://e/b> <http://e/tag> "t" .',  # default graph only
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    # EXISTS inside GRAPH must match against the named graph, not the default
    res = sparql_query(
        df,
        "SELECT ?s WHERE { GRAPH <http://e/g1> { ?s <http://e/p> ?o . "
        "FILTER EXISTS { ?s <http://e/tag> ?t } } }",
    )
    assert {r.s.value for r in res.df.collect()} == {"http://e/a"}
    # MINUS inside GRAPH likewise
    res2 = sparql_query(
        df,
        "SELECT ?s WHERE { GRAPH <http://e/g1> { ?s <http://e/p> ?o . "
        "MINUS { ?s <http://e/tag> ?t } } }",
    )
    assert {r.s.value for r in res2.df.collect()} == {"http://e/b"}


def test_property_path_inside_graph_var(spark):
    rows = [
        "<http://e/a> <http://e/next> <http://e/b> <http://e/g1> .",
        "<http://e/b> <http://e/next> <http://e/c> <http://e/g1> .",
        "<http://e/a> <http://e/next> <http://e/c> <http://e/g2> .",
        "<http://e/x> <http://e/next> <http://e/y> .",  # default graph: not visible
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    res = sparql_query(
        df, "SELECT ?g ?a ?b WHERE { GRAPH ?g { ?a <http://e/next>+ ?b } }"
    )
    got = {(r.g.value, r.a.value, r.b.value) for r in res.df.collect()}
    # closures are PER GRAPH: g1's two-hop chain closes within g1 only;
    # g2 has the single direct edge; the default-graph edge is invisible
    assert got == {
        ("http://e/g1", "http://e/a", "http://e/b"),
        ("http://e/g1", "http://e/b", "http://e/c"),
        ("http://e/g1", "http://e/a", "http://e/c"),
        ("http://e/g2", "http://e/a", "http://e/c"),
    }
    # sequence path under GRAPH ?var: two hops must stay inside one graph
    res2 = sparql_query(
        df,
        "SELECT ?g ?a ?b WHERE { GRAPH ?g { ?a <http://e/next>/<http://e/next> ?b } }",
    )
    got2 = {(r.g.value, r.a.value, r.b.value) for r in res2.df.collect()}
    assert got2 == {("http://e/g1", "http://e/a", "http://e/c")}


def test_computed_projection_and_distinct(spark, fixtures_dir):
    q = """
    PREFIX foaf: <http://xmlns.com/foaf/0.1/>
    SELECT DISTINCT (lcase(str(?p)) AS ?lp) WHERE { ?s ?p ?o }
    """
    res = sparql_query(_social(spark, fixtures_dir), q)
    vals = {r.lp.value for r in res.df.collect()}
    assert "http://xmlns.com/foaf/0.1/knows" in vals
    assert all(v == v.lower() for v in vals)


def test_rdfs_entailment(spark):
    rows = [
        "<http://e/Dog> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <http://e/Animal> .",
        "<http://e/Animal> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <http://e/Thing> .",
        "<http://e/hasPet> <http://www.w3.org/2000/01/rdf-schema#domain> <http://e/Person> .",
        "<http://e/hasPet> <http://www.w3.org/2000/01/rdf-schema#range> <http://e/Animal> .",
        "<http://e/hasDog> <http://www.w3.org/2000/01/rdf-schema#subPropertyOf> <http://e/hasPet> .",
        "<http://e/rex> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/Dog> .",
        "<http://e/ann> <http://e/hasDog> <http://e/rex> .",
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    closed = materialize_rdfs(df, "rdfs")
    spo = {
        (r.s.value, r.p.value, r.o.value)
        for r in closed.collect()
    }
    T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert ("http://e/rex", T, "http://e/Animal") in spo  # rdfs9
    assert ("http://e/rex", T, "http://e/Thing") in spo  # rdfs11+9
    assert ("http://e/ann", "http://e/hasPet", "http://e/rex") in spo  # rdfs7
    assert ("http://e/ann", T, "http://e/Person") in spo  # rdfs2 via subProp
    assert ("http://e/rex", T, "http://e/Animal") in spo  # rdfs3 via subProp
    assert (
        "http://e/Dog",
        "http://www.w3.org/2000/01/rdf-schema#subClassOf",
        "http://e/Thing",
    ) in spo  # rdfs11
    # simple regime is identity
    assert materialize_rdfs(df, "simple").count() == df.count()


def test_aggregates(spark):
    from sopspark.sources.ntriples import parse_lines_df

    rows = [
        '<http://e/a> <http://e/score> "3"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://e/a> <http://e/score> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://e/b> <http://e/score> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://e/b> <http://e/tag> "x" .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    q = """
    SELECT ?s (COUNT(?v) AS ?n) (SUM(?v) AS ?total) (AVG(?v) AS ?mean)
    WHERE { ?s <http://e/score> ?v } GROUP BY ?s ORDER BY ?s
    """
    res = sparql_query(df, q)
    got = [(r.s.value, r.n.value, float(r.total.value), float(r.mean.value)) for r in res.df.collect()]
    assert got == [("http://e/a", "2", 8.0, 4.0), ("http://e/b", "1", 1.0, 1.0)]
    # SUM over integer-only groups stays xsd:integer (value "8", not "8.0")
    r0 = res.df.collect()[0]
    assert r0.total.value == "8" and r0.total.dt.endswith("#integer")

    # HAVING over an aggregate
    q2 = """
    SELECT ?s (COUNT(?v) AS ?n) WHERE { ?s <http://e/score> ?v }
    GROUP BY ?s HAVING (COUNT(?v) > 1)
    """
    res2 = sparql_query(df, q2)
    assert [(r.s.value, r.n.value) for r in res2.df.collect()] == [("http://e/a", "2")]

    # global aggregate without GROUP BY + COUNT(*)
    res3 = sparql_query(df, "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }")
    assert res3.df.collect()[0].n.value == "4"

    # MIN/MAX over numeric terms
    res4 = sparql_query(
        df,
        "SELECT (MIN(?v) AS ?lo) (MAX(?v) AS ?hi) WHERE { ?s <http://e/score> ?v }",
    )
    r4 = res4.df.collect()[0]
    assert (r4.lo.value, r4.hi.value) == ("1", "5")

    # DISTINCT aggregates: duplicate score 3 for ?s=a collapses
    rows5 = rows + [
        '<http://e/a> <http://e/score> "3"^^<http://www.w3.org/2001/XMLSchema#integer> .'
    ]
    df5 = parse_lines_df(spark.createDataFrame([(r,) for r in rows5], ["value"]))
    res5 = sparql_query(
        df5,
        "SELECT (COUNT(DISTINCT ?v) AS ?n) (SUM(DISTINCT ?v) AS ?t) "
        "(AVG(DISTINCT ?v) AS ?m) WHERE { <http://e/a> <http://e/score> ?v }",
    )
    r5 = res5.df.collect()[0]
    assert (r5.n.value, float(r5.t.value), float(r5.m.value)) == ("2", 8.0, 4.0)


def test_property_paths(spark):
    from sopspark.sources.ntriples import parse_lines_df

    E = "http://e/"
    rows = [
        f'<{E}a> <{E}knows> <{E}b> .',
        f'<{E}b> <{E}knows> <{E}c> .',
        f'<{E}c> <{E}knows> <{E}d> .',
        f'<{E}a> <{E}likes> <{E}x> .',
        f'<{E}x> <{E}name> "Xavier" .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))

    def vals(q, col):
        res = sparql_query(df, q)
        return sorted(r[col].value for r in res.df.collect())

    # sequence: a knows/knows ?x  → c
    assert vals(f"SELECT ?x WHERE {{ <{E}a> <{E}knows>/<{E}knows> ?x }}", "x") == [E + "c"]
    # inverse (X ^p Y ≡ Y p X): <b> ^knows ?x → who knows b → a
    assert vals(f"SELECT ?x WHERE {{ <{E}b> ^<{E}knows> ?x }}", "x") == [E + "a"]
    assert vals(f"SELECT ?x WHERE {{ ?x ^<{E}knows> <{E}b> }}", "x") == [E + "c"]
    # alternative: a (knows|likes) ?x → b, x
    assert vals(f"SELECT ?x WHERE {{ <{E}a> (<{E}knows>|<{E}likes>) ?x }}", "x") == [E + "b", E + "x"]
    # one-or-more: a knows+ ?x → b, c, d (transitive closure)
    assert vals(f"SELECT ?x WHERE {{ <{E}a> <{E}knows>+ ?x }}", "x") == [E + "b", E + "c", E + "d"]
    # zero-or-more includes the subject itself
    assert vals(f"SELECT ?x WHERE {{ <{E}a> <{E}knows>* ?x }}", "x") == [E + "a", E + "b", E + "c", E + "d"]
    # zero-or-one
    assert vals(f"SELECT ?x WHERE {{ <{E}a> <{E}knows>? ?x }}", "x") == [E + "a", E + "b"]
    # sequence ending in a literal hop: a likes/name ?n → "Xavier"
    assert vals(f"SELECT ?n WHERE {{ <{E}a> <{E}likes>/<{E}name> ?n }}", "n") == ["Xavier"]
    # fully ground path acts as an ASK-like guard
    res = sparql_query(df, f"ASK {{ <{E}a> <{E}knows>+ <{E}d> }}")
    assert res.value is True
    res2 = sparql_query(df, f"ASK {{ <{E}d> <{E}knows>+ <{E}a> }}")
    assert res2.value is False
    # combined with another pattern: who does a transitively know that knows d?
    got = vals(
        f"SELECT ?m WHERE {{ <{E}a> <{E}knows>+ ?m . ?m <{E}knows> <{E}d> }}", "m"
    )
    assert got == [E + "c"]


def test_bind_values_minus_exists(spark):
    from sopspark.sources.ntriples import parse_lines_df

    E = "http://e/"
    rows = [
        f'<{E}a> <{E}score> "3"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        f'<{E}b> <{E}score> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        f'<{E}c> <{E}score> "2"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        f'<{E}a> <{E}tag> "x" .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))

    # BIND: computed column usable in FILTER
    res = sparql_query(
        df,
        f"SELECT ?s ?d WHERE {{ ?s <{E}score> ?v . BIND(?v * 2 AS ?d) FILTER(?d > 3) }}",
    )
    got = sorted((r.s.value, r.d.value) for r in res.df.collect())
    assert got == [(E + "a", "6"), (E + "c", "4")]

    # VALUES single var: restrict subjects (broadcast join)
    res2 = sparql_query(
        df,
        f"SELECT ?s ?v WHERE {{ VALUES ?s {{ <{E}a> <{E}b> }} ?s <{E}score> ?v }}",
    )
    assert sorted(r.s.value for r in res2.df.collect()) == [E + "a", E + "b"]

    # VALUES multi-var with UNDEF joins only bound columns... UNDEF row keeps null
    res3 = sparql_query(
        df,
        f'SELECT ?s ?lbl WHERE {{ ?s <{E}score> ?v . '
        f'VALUES (?s ?lbl) {{ (<{E}a> "alpha") (<{E}b> UNDEF) }} }}',
    )
    got3 = sorted((r.s.value, r.lbl.value if r.lbl else None) for r in res3.df.collect())
    assert got3 == [(E + "a", "alpha"), (E + "b", None)]

    # FILTER EXISTS / NOT EXISTS: semi / anti join on shared vars
    res4 = sparql_query(
        df, f"SELECT ?s WHERE {{ ?s <{E}score> ?v . FILTER EXISTS {{ ?s <{E}tag> ?t }} }}"
    )
    assert [r.s.value for r in res4.df.collect()] == [E + "a"]
    res5 = sparql_query(
        df, f"SELECT ?s WHERE {{ ?s <{E}score> ?v . FILTER NOT EXISTS {{ ?s <{E}tag> ?t }} }}"
    )
    assert sorted(r.s.value for r in res5.df.collect()) == [E + "b", E + "c"]

    # MINUS: remove solutions sharing the domain
    res6 = sparql_query(
        df, f"SELECT ?s WHERE {{ ?s <{E}score> ?v . MINUS {{ ?s <{E}tag> ?t }} }}"
    )
    assert sorted(r.s.value for r in res6.df.collect()) == [E + "b", E + "c"]


def test_describe(spark, fixtures_dir):
    df = _social(spark, fixtures_dir)
    # constant resource: all outgoing triples of alice
    res = sparql_query(df, "DESCRIBE <http://example.org/alice>")
    assert res.kind == "quads"
    rows = res.df.collect()
    assert all(r.s.value == "http://example.org/alice" for r in rows)
    assert len(rows) >= 2  # name + knows at least

    # variable resources from a WHERE clause
    res2 = sparql_query(
        df,
        "DESCRIBE ?p WHERE { ?p <http://xmlns.com/foaf/0.1/name> ?n }",
    )
    subs = {r.s.value for r in res2.df.collect()}
    assert subs == {"http://example.org/alice", "http://example.org/bob"}


def test_subquery(spark):
    from sopspark.sources.ntriples import parse_lines_df

    E = "http://e/"
    rows = [
        f'<{E}a> <{E}score> "3"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        f'<{E}a> <{E}score> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        f'<{E}b> <{E}score> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        f'<{E}a> <{E}name> "Ann" .',
        f'<{E}b> <{E}name> "Bo" .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    # subquery computes per-subject totals; outer joins names and filters
    q = f"""
    SELECT ?n ?total WHERE {{
      ?s <{E}name> ?n .
      {{ SELECT ?s (SUM(?v) AS ?total) WHERE {{ ?s <{E}score> ?v }} GROUP BY ?s }}
      FILTER(?total > 2)
    }}
    """
    res = sparql_query(df, q)
    got = [(r.n.value, r.total.value) for r in res.df.collect()]
    assert got == [("Ann", "8")]


def test_negated_property_set(spark):
    from sopspark.sources.ntriples import parse_lines_df

    E = "http://e/"
    rows = [
        f'<{E}a> <{E}knows> <{E}b> .',
        f'<{E}a> <{E}likes> <{E}c> .',
        f'<{E}a> <{E}hates> <{E}d> .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))

    def vals(q):
        return sorted(r.x.value for r in sparql_query(df, q).df.collect())

    # single negated IRI
    assert vals(f"SELECT ?x WHERE {{ <{E}a> !<{E}knows> ?x }}") == [E + "c", E + "d"]
    # negated set
    assert vals(f"SELECT ?x WHERE {{ <{E}a> !(<{E}knows>|<{E}likes>) ?x }}") == [E + "d"]
    # inverse member: anything pointing at b via a predicate other than likes
    assert vals(f"SELECT ?x WHERE {{ <{E}b> !(^<{E}likes>) ?x }}") == [E + "a"]


def test_hash_datetime_uri_functions(spark):
    from sopspark.sources.ntriples import parse_lines_df

    rows = [
        '<http://e/a> <http://e/when> "2024-03-05T14:30:15Z"^^<http://www.w3.org/2001/XMLSchema#dateTime> .',
        '<http://e/a> <http://e/label> "hello world" .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    q = """
    SELECT (SHA256(?l) AS ?h) (ENCODE_FOR_URI(?l) AS ?u)
           (YEAR(?t) AS ?y) (MONTH(?t) AS ?mo) (DAY(?t) AS ?d)
           (HOURS(?t) AS ?hh) (MINUTES(?t) AS ?mi) (TZ(?t) AS ?tz)
    WHERE { ?s <http://e/label> ?l . ?s <http://e/when> ?t }
    """
    res = sparql_query(df, q)
    r = res.df.collect()[0]
    import hashlib

    assert r.h.value == hashlib.sha256(b"hello world").hexdigest()
    assert r.u.value == "hello%20world"
    assert (r.y.value, r.mo.value, r.d.value) == ("2024", "3", "5")
    assert (r.hh.value, r.mi.value) == ("14", "30")
    assert r.tz.value == "Z"

    # BNODE(str) is deterministic and bnode-kinded
    res2 = sparql_query(df, 'SELECT (BNODE(?l) AS ?b) WHERE { ?s <http://e/label> ?l }')
    b = res2.df.collect()[0].b
    assert b.kind == 1 and b.value.startswith("eb")


def test_now_uuid_rand_builtins(spark, monkeypatch):
    """NOW/UUID/STRUUID/RAND: deterministic variants of the reference's
    nondeterministic builtins (src/query.rs delegates to sophia's SPARQL
    engine, which implements SPARQL 17.4.5.1-2)."""
    from sopspark.sources.ntriples import parse_lines_df

    monkeypatch.setenv("SOPSPARK_NOW", "2026-01-02T03:04:05.000Z")
    rows = [
        '<http://e/a> <http://e/label> "x" .',
        '<http://e/b> <http://e/label> "y" .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    q = "SELECT (NOW() AS ?n) (UUID() AS ?u) (STRUUID() AS ?su) (RAND() AS ?r) WHERE { ?s <http://e/label> ?l }"
    got = sparql_query(df, q).df.collect()
    assert len(got) == 2
    import re as _re

    uuid_re = _re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}$")
    for r in got:
        # NOW() pinned, same instant for every row
        assert r.n.value == "2026-01-02T03:04:05.000Z"
        assert r.n.dt.endswith("dateTime")
        # UUID() is an IRI, STRUUID a plain literal, both RFC-4122 v4 shaped
        assert r.u.kind == 0 and r.u.value.startswith("urn:uuid:")
        assert uuid_re.match(r.u.value[len("urn:uuid:"):])
        assert r.su.kind == 2 and uuid_re.match(r.su.value)
        # RAND() is an xsd:double in [0,1)
        assert r.r.dt.endswith("double") and 0.0 <= float(r.r.value) < 1.0
    # fresh per row
    assert got[0].u.value != got[1].u.value
    assert got[0].su.value != got[1].su.value


def test_sparql_star_variable_quoted_pattern(spark):
    """<< ?s ?p ?o >> patterns destructure QUOTED terms and bind inner
    variables (sophia_sparql evaluates these; round-2 gap now closed).
    Covers: all-var inner, ground inner pin, repeated variable across the
    destructure, typed-literal inner object decode."""
    from sopspark.sources.ntriples import parse_lines_df

    rows = [
        '<< <http://e/alice> <http://e/age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> >> <http://e/saidBy> <http://e/bob> .',
        '<< <http://e/carol> <http://e/age> "41"^^<http://www.w3.org/2001/XMLSchema#integer> >> <http://e/saidBy> <http://e/dan> .',
        '<< <http://e/dan> <http://e/knows> <http://e/alice> >> <http://e/saidBy> <http://e/dan> .',
        '<http://e/x> <http://e/saidBy> <http://e/y> .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    got = sparql_query(
        df, "SELECT ?s ?v ?w WHERE { << ?s <http://e/age> ?v >> <http://e/saidBy> ?w }"
    ).df.collect()
    out = sorted((r.s.value, r.v.value, r.v.dt, r.w.value) for r in got)
    assert out == [
        ("http://e/alice", "30", "http://www.w3.org/2001/XMLSchema#integer", "http://e/bob"),
        ("http://e/carol", "41", "http://www.w3.org/2001/XMLSchema#integer", "http://e/dan"),
    ]
    # repeated variable across the destructure: only dan asserts about
    # themselves
    got2 = sparql_query(
        df, "SELECT ?x ?y WHERE { << ?x <http://e/knows> ?y >> <http://e/saidBy> ?x }"
    ).df.collect()
    assert [(r.x.value, r.y.value) for r in got2] == [("http://e/dan", "http://e/alice")]
    # ground inner subject, variable inner predicate/object
    got3 = sparql_query(
        df, "SELECT ?p ?o WHERE { << <http://e/carol> ?p ?o >> <http://e/saidBy> <http://e/dan> }"
    ).df.collect()
    assert [(r.p.value, r.o.value) for r in got3] == [("http://e/age", "41")]


def test_now_single_instant_per_query(spark):
    """Two NOW() occurrences in one query share ONE execution instant even
    without the SOPSPARK_NOW pin (SPARQL 17.4.5.1) — the compile scope
    samples the clock once, so occurrences can't straddle a millisecond."""
    from sopspark.functions.expr import now_scope, _now_pin
    from sopspark.sources.ntriples import parse_lines_df

    with now_scope():
        a = _now_pin()
        import time

        time.sleep(0.005)
        b = _now_pin()
    assert a == b
    # end-to-end: both projected NOW()s agree on every row
    df = parse_lines_df(
        spark.createDataFrame([('<http://e/a> <http://e/p> "x" .',)], ["value"])
    )
    q = "SELECT (NOW() AS ?n1) (NOW() AS ?n2) WHERE { ?s <http://e/p> ?l }"
    got = sparql_query(df, q).df.collect()
    assert got and all(r.n1.value == r.n2.value for r in got)


def test_group_concat_separator(spark):
    """GROUP_CONCAT with and without SEPARATOR=, plus DISTINCT — values are
    concatenated in sorted order (deterministic under shuffle; SPARQL leaves
    the order implementation-defined)."""
    from sopspark.sources.ntriples import parse_lines_df

    rows = [
        '<http://e/a> <http://e/tag> "x" .',
        '<http://e/a> <http://e/tag> "y" .',
        '<http://e/a> <http://e/tag> "x" .',
        '<http://e/b> <http://e/tag> "z" .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    q = """
    SELECT ?s (GROUP_CONCAT(?t; SEPARATOR=",") AS ?tags)
           (GROUP_CONCAT(DISTINCT ?t; SEPARATOR="|") AS ?utags)
           (GROUP_CONCAT(?t) AS ?dtags)
    WHERE { ?s <http://e/tag> ?t } GROUP BY ?s
    """
    got = {r.s.value: r for r in sparql_query(df, q).df.collect()}
    assert got["http://e/a"].tags.value == "x,x,y"
    assert got["http://e/a"].utags.value == "x|y"
    assert got["http://e/a"].dtags.value == "x x y"
    assert got["http://e/b"].tags.value == "z"


def test_sparql_star_ground_quoted_pattern(spark):
    """Ground quoted-triple terms in BGPs match data quads whose term is the
    identical quoted triple; quoted bindings project through as QUOTED."""
    from sopspark.terms import QUOTED

    rows = [
        '<< <http://e/s> <http://e/p> "v" >> <http://e/said> <http://e/alice> .',
        '<< <http://e/s2> <http://e/p> "w" >> <http://e/said> <http://e/bob> .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    res = sparql_query(
        df, 'SELECT ?w WHERE { << <http://e/s> <http://e/p> "v" >> <http://e/said> ?w }'
    )
    assert [r.w.value for r in res.df.collect()] == ["http://e/alice"]

    res2 = sparql_query(df, "SELECT ?q WHERE { ?q <http://e/said> <http://e/bob> }")
    got = res2.df.collect()
    assert len(got) == 1 and got[0].q.kind == QUOTED
    assert got[0].q.value == '<< <http://e/s2> <http://e/p> "w" >>'

    # variable quoted patterns are supported as of round 3 (they used to be
    # rejected) — the same fixture destructures
    res3 = sparql_query(
        df, "SELECT ?s ?o ?w WHERE { << ?s <http://e/p> ?o >> <http://e/said> ?w }"
    )
    got3 = sorted((r.s.value, r.o.value, r.w.value) for r in res3.df.collect())
    assert got3 and all(w in ("http://e/alice", "http://e/bob") for _s, _o, w in got3)


def test_lang_langdir_datatype_for_dirlangstring(spark):
    from sopspark.sources.ntriples import parse_lines_df

    rows = [
        '<http://e/a> <http://e/l> "x"@en--ltr .',
        '<http://e/b> <http://e/l> "y"@fr .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    q = """
    SELECT ?s (LANG(?o) AS ?lg) (LANGDIR(?o) AS ?d) (DATATYPE(?o) AS ?dt)
    WHERE { ?s <http://e/l> ?o }
    """
    got = {r.s.value: r for r in sparql_query(df, q).df.collect()}
    a, b = got["http://e/a"], got["http://e/b"]
    assert a.lg.value == "en" and a.d.value == "ltr"
    assert a.dt.value.endswith("dirLangString")
    assert b.lg.value == "fr" and b.d.value == ""
    assert b.dt.value.endswith("langString")

    # SPARQL 1.2 constructors/testers: STRLANGDIR, hasLANG, hasLANGDIR
    q2 = """
    SELECT ?s (STRLANGDIR(STR(?o), "de", "rtl") AS ?z)
           (hasLANG(?o) AS ?hl) (hasLANGDIR(?o) AS ?hd)
    WHERE { ?s <http://e/l> ?o }
    """
    got2 = {r.s.value: r for r in sparql_query(df, q2).df.collect()}
    a2, b2 = got2["http://e/a"], got2["http://e/b"]
    assert a2.z.lang == "de--rtl" and a2.z.value == "x"
    assert a2.hl.value == "true" and a2.hd.value == "true"
    assert b2.hl.value == "true" and b2.hd.value == "false"
    # tag case is preserved (STRLANG parity); only lowercase ltr/rtl are
    # valid directions — "RTL"/garbage are evaluation errors → unbound
    for bad in ("sideways", "RTL"):
        got3 = sparql_query(
            df,
            f'SELECT ?s (STRLANGDIR("v", "DE", "{bad}") AS ?z) WHERE {{ ?s <http://e/l> ?o }}',
        ).df.collect()
        assert all(r.z is None for r in got3)
    ok = sparql_query(
        df,
        'SELECT ?s (STRLANGDIR("v", "DE", "ltr") AS ?z) WHERE { ?s <http://e/l> ?o }',
    ).df.collect()
    assert all(r.z.lang == "DE--ltr" for r in ok)
    # hasLANG/hasLANGDIR propagate an unbound argument as an error (not
    # false): ?u is never bound
    gotu = sparql_query(
        df,
        "SELECT ?s (hasLANG(?u) AS ?hl) WHERE { ?s <http://e/l> ?o OPTIONAL { ?s <http://e/none> ?u } }",
    ).df.collect()
    assert all(r.hl is None for r in gotu)


def test_in_not_in_operators(spark):
    """IN / NOT IN (SPARQL 17.4.1.9-10), desugared per spec into =/|| and
    !=/&& chains."""
    from sopspark.sources.ntriples import parse_lines_df

    rows = [
        '<http://e/a> <http://e/v> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://e/b> <http://e/v> "2"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://e/c> <http://e/v> "3"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    got = sparql_query(df, "SELECT ?s WHERE { ?s <http://e/v> ?o FILTER(?o IN (1, 3)) }").df.collect()
    assert sorted(r.s.value for r in got) == ["http://e/a", "http://e/c"]
    got2 = sparql_query(df, "SELECT ?s WHERE { ?s <http://e/v> ?o FILTER(?o NOT IN (1, 3)) }").df.collect()
    assert [r.s.value for r in got2] == ["http://e/b"]
    # case-insensitive keywords; empty IN () is false
    got3 = sparql_query(df, "SELECT ?s WHERE { ?s <http://e/v> ?o FILTER(?o in ()) }").df.collect()
    assert got3 == []


def test_sparql_star_accessor_functions(spark):
    """TRIPLE/SUBJECT/PREDICATE/OBJECT/isTRIPLE (SPARQL-star 17.4.2.8-11)."""
    from sopspark.sources.ntriples import parse_lines_df

    rows = [
        '<< <http://e/s1> <http://e/p> "9"^^<http://www.w3.org/2001/XMLSchema#integer> >> <http://e/said> <http://e/w> .',
        '<http://e/plain> <http://e/said> <http://e/w> .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    q = """
    SELECT ?q (isTRIPLE(?q) AS ?it) (SUBJECT(?q) AS ?s) (PREDICATE(?q) AS ?p)
           (OBJECT(?q) AS ?o) WHERE { ?q <http://e/said> <http://e/w> }
    """
    got = {r.q.value: r for r in sparql_query(df, q).df.collect()}
    star = got['<< <http://e/s1> <http://e/p> "9"^^<http://www.w3.org/2001/XMLSchema#integer> >>']
    assert star.it.value == "true"
    assert star.s.value == "http://e/s1" and star.s.kind == 0
    assert star.p.value == "http://e/p"
    assert star.o.value == "9" and star.o.dt.endswith("integer")
    plain = got["http://e/plain"]
    assert plain.it.value == "false" and plain.s is None
    # TRIPLE() constructs a term equal to the parsed quoted form
    q2 = """
    SELECT ?w WHERE { ?q <http://e/said> ?w
      FILTER(isTRIPLE(?q) && sameTerm(?q, TRIPLE(SUBJECT(?q), PREDICATE(?q), OBJECT(?q)))) }
    """
    got2 = sparql_query(df, q2).df.collect()
    assert len(got2) == 1


def test_from_and_from_named_dataset_clauses(spark):
    """SPARQL 13.2 dataset clauses: FROM merges named graphs into the
    default graph; FROM NAMED restricts which graphs GRAPH patterns see;
    together they REPLACE the supplied dataset."""
    from sopspark.sources.ntriples import parse_lines_df

    rows = [
        '<http://e/a> <http://e/p> "default" .',
        '<http://e/a> <http://e/p> "one" <http://g/1> .',
        '<http://e/a> <http://e/p> "two" <http://g/2> .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))

    # FROM <g1>: default graph = g1 only (the real default graph is gone)
    got = sparql_query(
        df, "SELECT ?o FROM <http://g/1> WHERE { <http://e/a> <http://e/p> ?o }"
    ).df.collect()
    assert [r.o.value for r in got] == ["one"]

    # FROM g1 + g2: default graph = union of both
    got2 = sparql_query(
        df,
        "SELECT ?o FROM <http://g/1> FROM <http://g/2> "
        "WHERE { <http://e/a> <http://e/p> ?o }",
    ).df.collect()
    assert sorted(r.o.value for r in got2) == ["one", "two"]

    # FROM NAMED g2: GRAPH ?g sees only g2; the default graph is empty
    res3 = sparql_query(
        df,
        "SELECT ?g ?o FROM NAMED <http://g/2> "
        "WHERE { GRAPH ?g { <http://e/a> <http://e/p> ?o } }",
    ).df.collect()
    assert [(r.g.value, r.o.value) for r in res3] == [("http://g/2", "two")]
    res4 = sparql_query(
        df,
        "SELECT ?o FROM NAMED <http://g/2> WHERE { <http://e/a> <http://e/p> ?o }",
    ).df.collect()
    assert res4 == []

    # ASK honors the clauses too
    assert sparql_query(
        df, 'ASK FROM <http://g/1> WHERE { ?s ?p "default" }'
    ).value is False
    assert sparql_query(
        df, 'ASK FROM <http://g/1> WHERE { ?s ?p "one" }'
    ).value is True


def test_trailing_values_clause(spark):
    """ValuesClause at the end of the query (grammar rule [28]) joins the
    WHERE solutions like an inline VALUES."""
    from sopspark.sources.ntriples import parse_lines_df

    rows = [
        '<http://e/a> <http://e/v> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://e/b> <http://e/v> "2"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '<http://e/c> <http://e/v> "3"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    got = sparql_query(
        df,
        "SELECT ?s ?o WHERE { ?s <http://e/v> ?o } ORDER BY ?s VALUES ?s { <http://e/a> <http://e/c> }",
    ).df.collect()
    assert [r.s.value for r in got] == ["http://e/a", "http://e/c"]


def test_group_by_expression(spark):
    """GroupCondition '(' Expression AS Var ')' — grouping on a computed
    key (e.g. case-folded value), with and without AS."""
    from sopspark.sources.ntriples import parse_lines_df

    rows = [
        '<http://e/a> <http://e/tag> "Foo" .',
        '<http://e/b> <http://e/tag> "foo" .',
        '<http://e/c> <http://e/tag> "Bar" .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    res = sparql_query(
        df,
        "SELECT ?l (COUNT(?s) AS ?n) WHERE { ?s <http://e/tag> ?o } "
        "GROUP BY (LCASE(?o) AS ?l) ORDER BY ?l",
    )
    got = [(r.l.value, r.n.value) for r in res.df.collect()]
    assert got == [("bar", "1"), ("foo", "2")]

    # without AS: the key is still usable for grouping (anonymous)
    res2 = sparql_query(
        df,
        "SELECT (COUNT(?s) AS ?n) WHERE { ?s <http://e/tag> ?o } "
        "GROUP BY (LCASE(?o)) ORDER BY DESC(?n)",
    )
    assert sorted(r.n.value for r in res2.df.collect()) == ["1", "2"]


def test_from_merge_dedup_and_subquery_rejection(spark):
    """Review fixes: FROM over several graphs merges with SET semantics
    (no duplicated bindings), and FROM inside a subquery is a parse error
    (grammar forbids DatasetClause in SubSelect)."""
    import pytest

    from sopspark.functions.sparql import SparqlError
    from sopspark.sources.ntriples import parse_lines_df

    rows = [
        '<http://e/a> <http://e/p> "x" <http://g/1> .',
        '<http://e/a> <http://e/p> "x" <http://g/2> .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    got = sparql_query(
        df,
        "SELECT ?o FROM <http://g/1> FROM <http://g/2> "
        "WHERE { <http://e/a> <http://e/p> ?o }",
    ).df.collect()
    assert len(got) == 1 and got[0].o.value == "x"

    with pytest.raises(SparqlError, match="subquery"):
        sparql_query(
            df,
            "SELECT ?x WHERE { { SELECT ?x FROM <http://g/1> WHERE { ?x ?p ?o } } }",
        )


def test_group_by_as_shadows_in_scope_var_is_error(spark):
    import pytest

    from sopspark.functions.sparql import SparqlError
    from sopspark.sources.ntriples import parse_lines_df

    rows = ['<http://e/a> <http://e/tag> "Foo" .']
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    with pytest.raises(SparqlError, match="already in scope"):
        sparql_query(
            df,
            "SELECT ?o (COUNT(?s) AS ?n) WHERE { ?s <http://e/tag> ?o } "
            "GROUP BY (LCASE(?o) AS ?o)",
        )


def test_pname_local_escapes_in_query(spark):
    """SPARQL PN_LOCAL_ESC + PERCENT in prefixed names match the IRIs the
    Turtle parser produces for the same escaped local parts."""
    from sopspark.sources.ntriples import parse_lines_df

    rows = ['<http://e/s> <http://e/a,b> <http://e/c%2Fd> .']
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    got = sparql_query(
        df, "PREFIX ex: <http://e/> SELECT ?s WHERE { ?s ex:a\\,b ex:c%2Fd }"
    ).df.collect()
    assert [r.s.value for r in got] == ["http://e/s"]


def test_sparql_star_annotation_syntax(spark):
    """SPARQL-star annotation blocks: `?s :p ?o {| :q ?z |}` matches the
    base pattern AND the quoted-triple annotation (ground and variable
    subject forms)."""
    from sopspark.sources.ntriples import parse_lines_df

    rows = [
        "<http://e/a> <http://e/p> <http://e/b> .",
        '<< <http://e/a> <http://e/p> <http://e/b> >> <http://e/certainty> "0.9" .',
        "<http://e/x> <http://e/p> <http://e/y> .",
        '<< <http://e/x> <http://e/p> <http://e/y> >> <http://e/certainty> "0.4" .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    # ground annotation pattern
    got = sparql_query(
        df,
        "SELECT ?c WHERE { <http://e/a> <http://e/p> <http://e/b> "
        "{| <http://e/certainty> ?c |} }",
    ).df.collect()
    assert [r.c.value for r in got] == ["0.9"]
    # variable subject: base pattern + annotation join via the qpat spec
    got2 = sparql_query(
        df,
        "SELECT ?s ?c WHERE { ?s <http://e/p> ?o {| <http://e/certainty> ?c |} }",
    ).df.collect()
    assert sorted((r.s.value, r.c.value) for r in got2) == [
        ("http://e/a", "0.9"),
        ("http://e/x", "0.4"),
    ]


def test_optional_filter_sees_outer_vars(spark):
    """LeftJoin(P1, P2, F) — the classic OPTIONAL case (§8.2): a FILTER
    inside OPTIONAL referencing an outer variable joins the merged
    binding; rows with no F-satisfying extension keep unbound vars."""
    from sopspark.sources.ntriples import parse_lines_df

    X = '^^<http://www.w3.org/2001/XMLSchema#integer>'
    rows = [
        f'<http://e/a> <http://e/p> "5"{X} .',
        f'<http://e/a> <http://e/q> "9"{X} .',
        f'<http://e/b> <http://e/p> "5"{X} .',
        f'<http://e/b> <http://e/q> "3"{X} .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    res = sparql_query(
        df,
        "SELECT ?s ?v WHERE { ?s <http://e/p> ?o "
        "OPTIONAL { ?s <http://e/q> ?v FILTER(?v > ?o) } }",
    )
    got = sorted((r.s.value, r.v.value if r.v else None) for r in res.df.collect())
    assert got == [("http://e/a", "9"), ("http://e/b", None)]
    # inner-only filters still evaluate inside the group (old path)
    res2 = sparql_query(
        df,
        "SELECT ?s ?v WHERE { ?s <http://e/p> ?o "
        "OPTIONAL { ?s <http://e/q> ?v FILTER(?v > 4) } }",
    )
    got2 = sorted((r.s.value, r.v.value if r.v else None) for r in res2.df.collect())
    assert got2 == [("http://e/a", "9"), ("http://e/b", None)]


def test_exists_filter_sees_outer_vars(spark):
    """Correlated (NOT) EXISTS (§8.1.1 substitution): a filter inside the
    EXISTS pattern referencing an outer variable evaluates against the
    outer row's bindings; MINUS deliberately stays independent (§8.3)."""
    from sopspark.sources.ntriples import parse_lines_df

    X = '^^<http://www.w3.org/2001/XMLSchema#integer>'
    rows = [
        f'<http://e/a> <http://e/p> "5"{X} .',
        f'<http://e/a> <http://e/q> "9"{X} .',
        f'<http://e/b> <http://e/p> "5"{X} .',
        f'<http://e/b> <http://e/q> "3"{X} .',
    ]
    df = parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))
    q = "SELECT ?s WHERE { ?s <http://e/p> ?o FILTER %s { ?s <http://e/q> ?v FILTER(?v > ?o) } }"
    assert sorted(
        r.s.value for r in sparql_query(df, q % "EXISTS").df.collect()
    ) == ["http://e/a"]
    assert sorted(
        r.s.value for r in sparql_query(df, q % "NOT EXISTS").df.collect()
    ) == ["http://e/b"]


# ---------------------------------------------------------------------------
# round-4 SPARQL-semantics review fixes
# ---------------------------------------------------------------------------

def _quads(spark, rows):
    from sopspark.sources.ntriples import parse_lines_df

    return parse_lines_df(spark.createDataFrame([(r,) for r in rows], ["value"]))


_X = "http://www.w3.org/2001/XMLSchema#"


def test_order_by_non_projected_variable(spark):
    """§15.1: ORDER BY applies to solutions BEFORE projection — sorting by
    a WHERE variable that is not selected must still order the output."""
    rows = [
        f'<http://e/s{i}> <http://e/p> "{9 - i}"^^<{_X}integer> .' for i in range(10)
    ]
    res = sparql_query(
        _quads(spark, rows),
        "SELECT ?s WHERE { ?s <http://e/p> ?o } ORDER BY ?o LIMIT 3",
    )
    got = [r["s"]["value"] for r in res.df.collect()]
    assert got == ["http://e/s9", "http://e/s8", "http://e/s7"]


def test_zero_length_path_ground_endpoint_absent_from_graph(spark):
    """§18.4 ZeroLengthPath: a ground endpoint relates to itself even when
    the term never occurs in the data."""
    df = _quads(spark, ["<http://e/a> <http://e/p> <http://e/b> ."])
    assert sparql_query(df, "ASK { <http://e/zz> <http://e/p>* <http://e/zz> }").value is True
    assert sparql_query(df, "ASK { <http://e/zz> <http://e/p>+ <http://e/zz> }").value is False
    r = sparql_query(df, "SELECT ?x { <http://e/zz> <http://e/p>? ?x }")
    assert [x["x"]["value"] for x in r.df.collect()] == ["http://e/zz"]


def test_datetime_compare_equal_and_lexical_accessors(spark):
    rows = [
        f'<http://e/a> <http://e/d> "2011-01-10T14:45:13.815-05:00"^^<{_X}dateTime> .',
        f'<http://e/b> <http://e/d> "2020-06-01T00:00:00Z"^^<{_X}dateTime> .',
        f'<http://e/c> <http://e/d> "2020-01-01T05:00:00+05:00"^^<{_X}dateTime> .',
    ]
    df = _quads(spark, rows)
    # fn:*-from-dateTime read the literal's OWN timezone's wall clock
    res = sparql_query(
        df,
        "SELECT ?s ?y ?h ?sec WHERE { ?s <http://e/d> ?d "
        "BIND(YEAR(?d) AS ?y) BIND(HOURS(?d) AS ?h) BIND(SECONDS(?d) AS ?sec) }",
    )
    out = {r["s"]["value"]: (r["y"]["value"], r["h"]["value"], r["sec"]["value"]) for r in res.df.collect()}
    assert out["http://e/a"] == ("2011", "14", "13.815")
    assert out["http://e/b"][1] == "0"
    # op:dateTime ordering across zones
    got = sorted(
        r["s"]["value"]
        for r in sparql_query(
            df,
            f'SELECT ?s WHERE {{ ?s <http://e/d> ?d FILTER(?d >= "2020-01-01T00:00:00Z"^^<{_X}dateTime>) }}',
        ).df.collect()
    )
    assert got == ["http://e/b", "http://e/c"]
    # op:dateTime-equal is timepoint equality, not lexical
    assert sparql_query(
        df, f'ASK {{ <http://e/c> <http://e/d> ?d FILTER(?d = "2020-01-01T00:00:00Z"^^<{_X}dateTime>) }}'
    ).value is True


def test_sum_type_error_unbound_and_empty_group_zero(spark):
    rows = [
        f'<http://e/s> <http://e/v> "1"^^<{_X}integer> .',
        '<http://e/s> <http://e/v> "foo" .',
    ]
    df = _quads(spark, rows)
    r = sparql_query(df, "SELECT (SUM(?o) AS ?t) WHERE { ?s <http://e/v> ?o }")
    assert r.df.collect()[0]["t"] is None  # §18.5.1.2 type error → unbound
    r0 = sparql_query(
        df, "SELECT (SUM(?o) AS ?t) (AVG(?o) AS ?a) WHERE { ?s <http://e/no> ?o }"
    )
    row = r0.df.collect()[0]
    assert row["t"]["value"] == "0" and row["t"]["dt"].endswith("integer")
    assert row["a"]["value"] == "0"


def test_transitive_closure_beyond_32_hops(spark):
    rows = [f"<http://e/a{i}> <http://e/p> <http://e/a{i + 1}> ." for i in range(1, 40)]
    res = sparql_query(
        _quads(spark, rows), "SELECT ?o WHERE { <http://e/a1> <http://e/p>+ ?o }"
    )
    assert res.df.count() == 39  # the old 32-round cap silently dropped the tail


def test_values_undef_compatible_with_any_binding(spark):
    rows = [
        "<http://e/s1> <http://e/p> <http://e/o1> .",
        "<http://e/s2> <http://e/p> <http://e/o2> .",
    ]
    df = _quads(spark, rows)
    got = sorted(
        r["s"]["value"]
        for r in sparql_query(
            df, "SELECT ?s WHERE { VALUES ?o { UNDEF } ?s <http://e/p> ?o }"
        ).df.collect()
    )
    assert got == ["http://e/s1", "http://e/s2"]
    got = sorted(
        r["s"]["value"]
        for r in sparql_query(
            df,
            "SELECT ?s WHERE { VALUES ?o { UNDEF <http://e/o1> } ?s <http://e/p> ?o }",
        ).df.collect()
    )
    assert got == ["http://e/s1", "http://e/s1", "http://e/s2"]


def test_union_branch_var_asymmetry_then_join(spark):
    rows = [
        "<http://e/s1> <http://e/p> <http://e/o1> .",
        "<http://e/s2> <http://e/p> <http://e/o2> .",
        "<http://e/s1> <http://e/c> <http://e/o1> .",
        "<http://e/s2> <http://e/b> <http://e/o2> .",
    ]
    q = """SELECT ?s WHERE {
      { { ?s <http://e/c> ?x } UNION { ?s <http://e/b> ?y } }
      ?s <http://e/p> ?o }"""
    got = sorted(r["s"]["value"] for r in sparql_query(_quads(spark, rows), q).df.collect())
    assert got == ["http://e/s1", "http://e/s2"]  # branch-2 rows (no ?x) survive


def test_second_optional_fills_var_first_left_unbound(spark):
    rows = [
        "<http://e/s1> <http://e/p> <http://e/o1> .",
        "<http://e/s2> <http://e/p> <http://e/o2> .",
        "<http://e/s1> <http://e/c> <http://e/o1> .",
        "<http://e/s2> <http://e/b> <http://e/o2> .",
    ]
    q = """SELECT ?s ?v WHERE { ?s <http://e/p> ?o
      OPTIONAL { ?s <http://e/c> ?v } OPTIONAL { ?s <http://e/b> ?v } }"""
    got = sorted(
        (r["s"]["value"], r["v"]["value"])
        for r in sparql_query(_quads(spark, rows), q).df.collect()
    )
    assert got == [("http://e/s1", "http://e/o1"), ("http://e/s2", "http://e/o2")]


def test_minus_compatibility_and_domain_overlap(spark):
    rows = [
        "<http://e/s1> <http://e/p> <http://e/o1> .",
        "<http://e/s2> <http://e/p> <http://e/o2> .",
        "<http://e/s1> <http://e/c> <http://e/o1> .",
        "<http://e/s2> <http://e/b> <http://e/o2> .",
    ]
    df = _quads(spark, rows)
    # s2's ?v is unbound → compatible with the inner row, s-overlap nonempty → removed
    q = """SELECT ?s WHERE { ?s <http://e/p> ?o
      OPTIONAL { ?s <http://e/c> ?v } MINUS { ?s <http://e/b> ?v } }"""
    got = sorted(r["s"]["value"] for r in sparql_query(df, q).df.collect())
    assert got == ["http://e/s1"]
    # a row unbound on EVERY shared var has empty domain overlap → survives
    q2 = """SELECT ?s WHERE { ?s <http://e/c> ?o
      OPTIONAL { ?o <http://e/x> ?v } MINUS { <http://e/s2> <http://e/b> ?v } }"""
    got = sorted(r["s"]["value"] for r in sparql_query(df, q2).df.collect())
    assert got == ["http://e/s1"]


def test_bind_before_pattern_is_join_constraint(spark):
    """§10.1: BIND preceding a pattern that also binds the variable is
    Join(Extend(...), BGP) — an equality constraint, never an overwrite."""
    rows = [
        f'<http://e/s1> <http://e/p> "1"^^<{_X}integer> .',
        f'<http://e/s2> <http://e/p> "2"^^<{_X}integer> .',
    ]
    r = sparql_query(
        _quads(spark, rows),
        f'SELECT ?s WHERE {{ BIND("1"^^<{_X}integer> AS ?x) ?s <http://e/p> ?x }}',
    )
    assert [x["s"]["value"] for x in r.df.collect()] == ["http://e/s1"]


def test_bind_after_optional_sees_optional_bindings(spark):
    rows = [
        "<http://e/s1> <http://e/p> <http://e/o1> .",
        "<http://e/s2> <http://e/p> <http://e/o2> .",
        "<http://e/s1> <http://e/c> <http://e/o1> .",
    ]
    q = """SELECT ?s ?w WHERE { ?s <http://e/p> ?o
      OPTIONAL { ?s <http://e/c> ?v }
      BIND(COALESCE(?v, <http://e/none>) AS ?w) }"""
    got = sorted(
        (r["s"]["value"], r["w"]["value"])
        for r in sparql_query(_quads(spark, rows), q).df.collect()
    )
    assert got == [("http://e/s1", "http://e/o1"), ("http://e/s2", "http://e/none")]


def test_bind_onto_maybe_null_var_keeps_unbound_rows(spark):
    """BIND onto an already-projected variable that is UNBOUND in some rows
    (OPTIONAL maybe-null): under the Join(Extend(...)) reading the unbound
    row is compatible with the Extend binding and must survive CARRYING the
    BIND value — term_eq(val, NULL) → NULL → coalesced-false previously
    dropped it silently."""
    rows = [
        "<http://e/s1> <http://e/p> <http://e/o1> .",
        "<http://e/s2> <http://e/p> <http://e/o2> .",
        "<http://e/s1> <http://e/c> <http://e/d1> .",
    ]
    # ?v bound only for s1; BIND fills the s2 row with the default
    q = """SELECT ?s ?v WHERE { ?s <http://e/p> ?o
      OPTIONAL { ?s <http://e/c> ?v }
      BIND(COALESCE(?v, <http://e/default>) AS ?v) }"""
    got = sorted(
        (r["s"]["value"], r["v"]["value"])
        for r in sparql_query(_quads(spark, rows), q).df.collect()
    )
    assert got == [
        ("http://e/s1", "http://e/d1"),
        ("http://e/s2", "http://e/default"),
    ]


def test_correlated_filter_nested_in_braces_inside_exists(spark):
    """§8.1.1 substitution reaches filters inside nested plain subgroups of
    an EXISTS pattern, not only its top level."""
    rows = [
        f'<http://e/s1> <http://e/p> "1"^^<{_X}integer> .',
        f'<http://e/s2> <http://e/p> "2"^^<{_X}integer> .',
        f'<http://e/s1> <http://e/q> "1"^^<{_X}integer> .',
        f'<http://e/s2> <http://e/q> "9"^^<{_X}integer> .',
    ]
    q = """SELECT ?s WHERE { ?s <http://e/p> ?outer
      FILTER EXISTS { { ?s <http://e/q> ?v . FILTER(?v = ?outer) } } }"""
    got = [r["s"]["value"] for r in sparql_query(_quads(spark, rows), q).df.collect()]
    assert got == ["http://e/s1"]


def test_exists_with_only_filters_substitutes_outer_bindings(spark):
    rows = [f'<http://e/s{i}> <http://e/p> "{i}"^^<{_X}integer> .' for i in range(4)]
    df = _quads(spark, rows)
    got = sorted(
        r["s"]["value"]
        for r in sparql_query(
            df, "SELECT ?s WHERE { ?s <http://e/p> ?o FILTER EXISTS { FILTER(?o > 1) } }"
        ).df.collect()
    )
    assert got == ["http://e/s2", "http://e/s3"]
    got = sorted(
        r["s"]["value"]
        for r in sparql_query(
            df,
            "SELECT ?s WHERE { ?s <http://e/p> ?o FILTER NOT EXISTS { FILTER(?o > 1) } }",
        ).df.collect()
    )
    assert got == ["http://e/s0", "http://e/s1"]


def test_malformed_typed_literals_error_not_crash(spark):
    """ANSI-mode casts throw on malformed input; the engine must treat an
    invalid lexical form for the claimed datatype as a SPARQL type error
    (NULL / EBV false per §17.2.2), never a job-killing exception."""
    rows = [
        f'<http://e/d> <http://e/v> "1.5"^^<{_X}double> .',
        f'<http://e/x> <http://e/v> "notanum"^^<{_X}integer> .',
        f'<http://e/y> <http://e/v> "junk"^^<{_X}dateTime> .',
    ]
    df = _quads(spark, rows)
    # invalid numeric: EBV is false (rule 1), so !?o is true
    assert sparql_query(df, "ASK { <http://e/x> <http://e/v> ?o FILTER(!?o) }").value is True
    # invalid dateTime: comparison errors -> filter drops the row, no crash
    assert (
        sparql_query(
            df,
            f'ASK {{ <http://e/y> <http://e/v> ?o FILTER(?o >= "2020-01-01T00:00:00Z"^^<{_X}dateTime>) }}',
        ).value
        is False
    )
    # exponent numerals in queries are xsd:double (grammar) and compare in value space
    assert sparql_query(df, "ASK { <http://e/d> <http://e/v> ?o FILTER(?o = 1.5e0) }").value is True
    assert (
        sparql_query(
            df, f"ASK {{ ?s <http://e/v> ?o FILTER(DATATYPE(1.5e0) = <{_X}double>) }}"
        ).value
        is True
    )


def test_bind_filter_only_group_evaluates_over_unit_solution(spark):
    """§18.5 Group = Join(Z, ...): a group whose only members are
    BIND/FILTER evaluates over the unit solution — { BIND(42 AS ?x) }
    yields one row, filters-only groups gate the single empty mapping."""
    rows = ["<http://e/s> <http://e/p> <http://e/o> ."]
    df = _quads(spark, rows)
    got = sparql_query(df, "SELECT ?x WHERE { BIND(42 AS ?x) }").df.collect()
    assert len(got) == 1 and got[0]["x"]["value"] == "42"
    assert sparql_query(
        df, "SELECT ?x WHERE { BIND(1 AS ?x) FILTER(?x = 2) }"
    ).df.collect() == []
    assert sparql_query(df, "ASK WHERE { FILTER(1 = 1) }").value is True
    assert sparql_query(df, "ASK WHERE { FILTER(1 = 2) }").value is False
