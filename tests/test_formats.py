"""JSON-LD and RDF/XML subset parsers."""

from sopspark.operators.serialize import collect_nq_lines
from sopspark.sources.jsonld import parse_jsonld, parse_jsonld_text
from sopspark.sources.rdfxml import parse_rdfxml, parse_rdfxml_text
from sopspark.terms import BNODE, IRI, LITERAL

JSONLD_DOC = """
{
  "@context": {
    "foaf": "http://xmlns.com/foaf/0.1/",
    "name": "http://xmlns.com/foaf/0.1/name",
    "knows": {"@id": "http://xmlns.com/foaf/0.1/knows", "@type": "@id"}
  },
  "@id": "http://example.org/alice",
  "@type": "foaf:Person",
  "name": "Alice",
  "knows": "http://example.org/bob",
  "foaf:age": 30,
  "foaf:nick": {"@value": "Ally", "@language": "en"},
  "foaf:account": {"name": "alice_acct"}
}
"""

RDFXML_DOC = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:foaf="http://xmlns.com/foaf/0.1/">
  <foaf:Person rdf:about="http://example.org/alice" xml:lang="en">
    <foaf:name>Alice</foaf:name>
    <foaf:knows rdf:resource="http://example.org/bob"/>
    <foaf:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</foaf:age>
    <foaf:based_near>
      <rdf:Description rdf:about="http://example.org/paris"/>
    </foaf:based_near>
    <foaf:address rdf:parseType="Resource">
      <foaf:city>Paris</foaf:city>
    </foaf:address>
  </foaf:Person>
</rdf:RDF>
"""


def test_jsonld_text():
    quads = parse_jsonld_text(JSONLD_DOC)
    spo = {(s[1], p[1], (o[0], o[1], o[2], o[3])) for s, p, o, g in quads}
    F = "http://xmlns.com/foaf/0.1/"
    assert ("http://example.org/alice", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            (IRI, F + "Person", None, None)) in spo
    assert ("http://example.org/alice", F + "name", (LITERAL, "Alice", None, None)) in spo
    assert ("http://example.org/alice", F + "knows",
            (IRI, "http://example.org/bob", None, None)) in spo
    assert ("http://example.org/alice", F + "age",
            (LITERAL, "30", "http://www.w3.org/2001/XMLSchema#integer", None)) in spo
    assert ("http://example.org/alice", F + "nick", (LITERAL, "Ally", None, "en")) in spo
    # nested node object became a bnode with its own triple
    nested = [q for q in quads if q[0][0] == BNODE]
    assert any(p[1] == F + "name" and o[1] == "alice_acct" for _, p, o, _ in nested)


def test_rdfxml_text():
    quads = parse_rdfxml_text(RDFXML_DOC)
    spo = {(s[1] if s[0] == IRI else "_bn", p[1], o[1]) for s, p, o, g in quads}
    F = "http://xmlns.com/foaf/0.1/"
    assert ("http://example.org/alice", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", F + "Person") in spo
    assert ("http://example.org/alice", F + "knows", "http://example.org/bob") in spo
    assert ("http://example.org/alice", F + "based_near", "http://example.org/paris") in spo
    # xml:lang inherited onto the plain literal
    name = [o for s, p, o, g in quads if p[1] == F + "name"][0]
    assert (name[1], name[3]) == ("Alice", "en")
    # typed literal has no lang
    age = [o for s, p, o, g in quads if p[1] == F + "age"][0]
    assert age[2].endswith("#integer") and age[3] is None
    # parseType=Resource bnode carries the nested property
    assert ("_bn", F + "city", "Paris") in spo


def test_distributed_parsers(spark, tmp_path):
    j = tmp_path / "doc.jsonld"
    j.write_text(JSONLD_DOC)
    x = tmp_path / "doc.rdf"
    x.write_text(RDFXML_DOC)
    dj = parse_jsonld(spark, str(j))
    dx = parse_rdfxml(spark, str(x))
    assert dj.where("err is null").count() == 7
    assert dx.where("err is null").count() == 7
    # malformed docs land in the err channel, not as job failures
    bad = tmp_path / "bad.jsonld"
    bad.write_text("{ not json")
    db = parse_jsonld(spark, str(bad))
    errs = db.collect()
    assert len(errs) == 1 and "parse error" in errs[0].err


def test_trig_graph_blocks():
    from sopspark.sources.turtle import parse_turtle_text
    from sopspark.terms import IRI

    doc = """
    @prefix ex: <http://e/> .
    ex:s1 ex:p "default" .
    ex:g1 { ex:s2 ex:p "in-g1" . }
    GRAPH ex:g2 { ex:s3 ex:p "in-g2" ; ex:q ex:o . }
    { ex:s4 ex:p "braced-default" . }
    """
    quads = parse_turtle_text(doc)
    by_graph = {}
    for s, p, o, g in quads:
        by_graph.setdefault(g[1] if g else None, []).append((s[1], o[1]))
    assert ("http://e/s1", "default") in by_graph[None]
    assert ("http://e/s4", "braced-default") in by_graph[None]
    assert by_graph["http://e/g1"] == [("http://e/s2", "in-g1")]
    assert len(by_graph["http://e/g2"]) == 2


def test_gz_transparent_read(spark, tmp_path):
    import gzip

    from sopspark.sources.ntriples import parse_ntriples

    p = tmp_path / "data.nt.gz"
    with gzip.open(p, "wt") as f:
        f.write("<http://e/a> <http://e/p> <http://e/o> .\n")
        f.write('<http://e/b> <http://e/p> "lit" .\n')
    df = parse_ntriples(spark, str(p))
    assert df.count() == 2 and df.where("err is not null").count() == 0


def test_yamlld_text_and_distributed(spark, tmp_path):
    from sopspark.sources.jsonld import parse_yamlld, parse_yamlld_text
    from sopspark.terms import IRI, LITERAL

    doc = """
"@context":
  ex: "http://e/"
"@id": ex:a
"@type": ex:Person
ex:name: Alice
ex:age:
  "@value": 30
  "@type": "http://www.w3.org/2001/XMLSchema#integer"
"""
    quads = parse_yamlld_text(doc)
    spo = {(s[1], p[1], o[1]) for s, p, o, g in quads}
    assert ("http://e/a", "http://e/name", "Alice") in spo
    assert ("http://e/a", "http://e/age", "30") in spo

    p = tmp_path / "d.yamlld"
    p.write_text(doc)
    df = parse_yamlld(spark, str(p))
    assert df.count() == 3 and df.where("err is not null").count() == 0
    # malformed yaml lands in the err channel, not a crash
    bad = tmp_path / "bad.yamlld"
    bad.write_text("@id: [unclosed")
    df2 = parse_yamlld(spark, str(bad))
    assert df2.where("err is not null").count() == 1


def test_jsonld_vocab_base_list_reverse():
    """JSON-LD 1.1: @vocab (property/type expansion), @base (relative @id),
    @list (both value form and @container: @list), @reverse (node key and
    reverse term definitions)."""
    from sopspark.terms import RDF_NS

    doc = """
    {
      "@context": {
        "@vocab": "http://schema.example/",
        "@base": "http://base.example/dir/",
        "steps": {"@id": "http://schema.example/steps", "@container": "@list"},
        "childOf": {"@reverse": "http://schema.example/parentOf"}
      },
      "@id": "thing1",
      "name": "Widget",
      "inline": {"@list": ["a", "b"]},
      "steps": [1, 2],
      "childOf": {"@id": "thing2"},
      "@reverse": {"made": {"@id": "factory"}}
    }
    """
    quads = parse_jsonld_text(doc)
    spo = {(s[1], p[1], o[1]) for s, p, o, g in quads}
    S = "http://schema.example/"
    # @base resolves the relative @id; @vocab expands bare property names
    assert (f"http://base.example/dir/thing1", S + "name", "Widget") in spo
    # @reverse node key: (factory, made, thing1)
    assert ("http://base.example/dir/factory", S + "made",
            "http://base.example/dir/thing1") in spo
    # reverse term definition: childOf emits (thing2, parentOf, thing1)
    assert ("http://base.example/dir/thing2", S + "parentOf",
            "http://base.example/dir/thing1") in spo
    # both lists are rdf:first/rest chains terminated by rdf:nil
    firsts = sorted(o[1] for s, p, o, g in quads if p[1] == RDF_NS + "first")
    assert firsts == ["1", "2", "a", "b"]
    rests = [o for s, p, o, g in quads if p[1] == RDF_NS + "rest"]
    assert sum(1 for o in rests if o[1] == RDF_NS + "nil") == 2
    # list order: head cell of "steps" has first=1, and its rest's first=2
    by_subj = {}
    for s, p, o, g in quads:
        by_subj.setdefault(s[1], {})[p[1]] = o
    steps_head = next(o for s, p, o, g in quads if p[1] == S + "steps")
    cell = by_subj[steps_head[1]]
    assert cell[RDF_NS + "first"][1] == "1"
    assert by_subj[cell[RDF_NS + "rest"][1]][RDF_NS + "first"][1] == "2"


def test_rdfxml_collection_li_literal_base():
    """RDF/XML: parseType=Collection (rdf list), rdf:li (rdf:_N),
    parseType=Literal (rdf:XMLLiteral), xml:base on the root."""
    from sopspark.sources.rdfxml import parse_rdfxml_text
    from sopspark.terms import RDF_NS

    doc = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://ex.example/" xml:base="http://base.example/">
  <rdf:Description rdf:about="seq">
    <ex:items rdf:parseType="Collection">
      <rdf:Description rdf:about="a"/>
      <rdf:Description rdf:about="b"/>
    </ex:items>
    <rdf:li>one</rdf:li>
    <rdf:li>two</rdf:li>
    <ex:markup rdf:parseType="Literal">pre<b>bold</b></ex:markup>
  </rdf:Description>
</rdf:RDF>"""
    quads = parse_rdfxml_text(doc)
    spo = {(s[1], p[1], (o[1], o[2])) for s, p, o, g in quads}
    # xml:base resolves rdf:about
    assert any(s == "http://base.example/seq" for s, p, o in spo)
    # rdf:li numbering
    assert ("http://base.example/seq", RDF_NS + "_1", ("one", None)) in spo
    assert ("http://base.example/seq", RDF_NS + "_2", ("two", None)) in spo
    # XMLLiteral keeps the markup verbatim
    assert ("http://base.example/seq", "http://ex.example/markup",
            ("pre<b>bold</b>", RDF_NS + "XMLLiteral")) in spo
    # the collection is a well-formed ordered chain: a then b then nil
    by_subj = {}
    for s, p, o, g in quads:
        by_subj.setdefault(s[1], {})[p[1]] = o
    head = next(o for s, p, o, g in quads if p[1] == "http://ex.example/items")
    c1 = by_subj[head[1]]
    assert c1[RDF_NS + "first"][1] == "http://base.example/a"
    c2 = by_subj[c1[RDF_NS + "rest"][1]]
    assert c2[RDF_NS + "first"][1] == "http://base.example/b"
    assert c2[RDF_NS + "rest"][1] == RDF_NS + "nil"


def test_rdfxml_property_id_reification_and_entities():
    """rdf:ID on a PROPERTY element reifies the statement (RDF/XML spec
    §2.17 — the remaining wild-RDF/XML construct from round 2), and
    internal DTD entities expand (expat handles them natively)."""
    from sopspark.sources.rdfxml import parse_rdfxml_text
    from sopspark.terms import RDF_NS

    doc = """<?xml version="1.0"?>
<!DOCTYPE rdf:RDF [<!ENTITY v "http://v.example/">]>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://ex.example/" xml:base="http://base.example/doc">
  <rdf:Description rdf:about="&v;thing">
    <ex:weight rdf:ID="st1">7</ex:weight>
  </rdf:Description>
</rdf:RDF>"""
    quads = parse_rdfxml_text(doc)
    spo = {(s[1], p[1], o[1]) for s, p, o, g in quads}
    # entity expanded in the subject, base triple present
    assert ("http://v.example/thing", "http://ex.example/weight", "7") in spo
    # reification: #st1 resolves against xml:base
    st = "http://base.example/doc#st1"
    assert (st, RDF_NS + "type", RDF_NS + "Statement") in spo
    assert (st, RDF_NS + "subject", "http://v.example/thing") in spo
    assert (st, RDF_NS + "predicate", "http://ex.example/weight") in spo
    assert (st, RDF_NS + "object", "7") in spo
    assert len(quads) == 5


def test_jsonld11_container_maps_nest_scoped_contexts():
    """JSON-LD 1.1 tail (round-2 gap): @container @index/@id/@language/@type
    maps, @nest groups, and term-scoped contexts."""
    import json

    from sopspark.sources.jsonld import parse_jsonld_text

    doc = {
        "@context": {
            "@vocab": "http://v.example/",
            "ex": "http://ex.example/",
            "byidx": {"@container": "@index"},
            "byid": {"@container": "@id"},
            "label": {"@container": "@language"},
            "bytype": {"@container": "@type"},
            "meta": "@nest",
            "scopedp": {
                "@id": "http://ex.example/scopedp",
                "@context": {"inner": "http://inner.example/p"},
            },
        },
        "@id": "http://n.example/thing",
        "byidx": {"a": {"@value": "one"}, "b": [{"@value": "two"}]},
        "byid": {
            "http://n.example/kid": {"ex:name": {"@value": "Kid"}},
        },
        "label": {"en": "hello", "fr": ["bonjour"], "@none": "plain"},
        "bytype": {"ex:Widget": {"@id": "http://n.example/w1"}},
        "meta": {"ex:note": {"@value": "nested"}},
        "scopedp": {"inner": {"@value": "deep"}},
    }
    quads = parse_jsonld_text(json.dumps(doc))
    spo = {(s[1], p[1], o[1], o[3]) for s, p, o, g in quads}
    T = "http://n.example/thing"
    # @index map: keys are annotations, values flatten
    assert (T, "http://v.example/byidx", "one", None) in spo
    assert (T, "http://v.example/byidx", "two", None) in spo
    # @id map: key becomes the child's @id
    assert (T, "http://v.example/byid", "http://n.example/kid", None) in spo
    assert ("http://n.example/kid", "http://ex.example/name", "Kid", None) in spo
    # @language map incl. @none
    assert (T, "http://v.example/label", "hello", "en") in spo
    assert (T, "http://v.example/label", "bonjour", "fr") in spo
    assert (T, "http://v.example/label", "plain", None) in spo
    # @type map: key becomes rdf:type of the child node
    assert (T, "http://v.example/bytype", "http://n.example/w1", None) in spo
    assert (
        "http://n.example/w1",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://ex.example/Widget",
        None,
    ) in spo
    # @nest: nested entries attach to the SAME subject
    assert (T, "http://ex.example/note", "nested", None) in spo
    # term-scoped context maps the inner key only inside scopedp's value
    scoped_obj = next(o for s, p, o, g in quads if p[1] == "http://ex.example/scopedp")
    assert (scoped_obj[1], "http://inner.example/p", "deep", None) in spo


def test_jsonld11_propagate_false_scoped_context():
    """JSON-LD 1.1 §4.1.9 ``"@propagate": false``: a non-propagating
    term-scoped context applies to the term's immediate value node object
    (depth 1) and STOPS at nested node objects (depth 2), where the
    previous context is restored. The round-3 expansion boundary."""
    import json

    from sopspark.sources.jsonld import parse_jsonld_text

    doc = {
        "@context": {
            "@vocab": "http://v.example/",
            "bar": {
                "@id": "http://v.example/bar",
                "@context": {"@propagate": False, "baz": "http://scoped.example/baz"},
            },
        },
        "@id": "http://n.example/root",
        "bar": {
            "@id": "http://n.example/d1",
            "baz": {"@value": "at-depth-1"},
            "deeper": {
                "@id": "http://n.example/d2",
                "baz": {"@value": "at-depth-2"},
            },
        },
    }
    quads = parse_jsonld_text(json.dumps(doc))
    spo = {(s[1], p[1], o[1]) for s, p, o, g in quads}
    # depth 1: the scoped mapping applies
    assert ("http://n.example/d1", "http://scoped.example/baz", "at-depth-1") in spo
    # depth 2: the frame reverted — baz falls back to @vocab expansion
    assert ("http://n.example/d2", "http://v.example/baz", "at-depth-2") in spo
    assert not any(
        s == "http://n.example/d2" and p == "http://scoped.example/baz"
        for s, p, o in spo
    )

    # the 1.1 default (no @propagate) still propagates to any depth
    doc["@context"]["bar"]["@context"] = {"baz": "http://scoped.example/baz"}
    spo2 = {
        (s[1], p[1], o[1]) for s, p, o, g in parse_jsonld_text(json.dumps(doc))
    }
    assert ("http://n.example/d2", "http://scoped.example/baz", "at-depth-2") in spo2

    # inline node @context with @propagate:false reverts for child nodes too
    doc2 = {
        "@context": {"@vocab": "http://v.example/"},
        "@id": "http://n.example/a",
        "child": {
            "@context": {"@propagate": False, "q": "http://scoped.example/q"},
            "@id": "http://n.example/b",
            "q": {"@value": "own"},
            "kid": {"@id": "http://n.example/c", "q": {"@value": "reverted"}},
        },
    }
    spo3 = {
        (s[1], p[1], o[1]) for s, p, o, g in parse_jsonld_text(json.dumps(doc2))
    }
    assert ("http://n.example/b", "http://scoped.example/q", "own") in spo3
    assert ("http://n.example/c", "http://v.example/q", "reverted") in spo3

    # @propagate must be boolean
    import pytest as _pytest

    from sopspark.sources.jsonld import JsonLdError

    with _pytest.raises(JsonLdError):
        parse_jsonld_text(json.dumps({"@context": {"@propagate": "nope"}, "@id": "x"}))


def test_jsonld11_propagate_false_spark_roundtrip(spark, tmp_path):
    """The non-propagating fixture through the distributed parser and the
    quad schema: same triples as the in-process expansion."""
    import json

    from sopspark.sources.jsonld import parse_jsonld

    doc = {
        "@context": {
            "@vocab": "http://v.example/",
            "bar": {
                "@id": "http://v.example/bar",
                "@context": {"@propagate": False, "baz": "http://scoped.example/baz"},
            },
        },
        "@id": "http://n.example/root",
        "bar": {
            "@id": "http://n.example/d1",
            "baz": {"@value": "v1"},
            "deeper": {"@id": "http://n.example/d2", "baz": {"@value": "v2"}},
        },
    }
    f = tmp_path / "prop.jsonld"
    f.write_text(json.dumps(doc))
    rows = parse_jsonld(spark, str(f)).collect()
    assert not [r for r in rows if r["err"] is not None]
    spo = {(r["s"]["value"], r["p"]["value"], r["o"]["value"]) for r in rows if r["s"]}
    assert ("http://n.example/d1", "http://scoped.example/baz", "v1") in spo
    assert ("http://n.example/d2", "http://v.example/baz", "v2") in spo


def test_jsonld11_included_and_direction():
    """JSON-LD 1.1 @included blocks and @direction → dirLangString."""
    import json

    from sopspark.sources.jsonld import parse_jsonld_text

    doc = {
        "@context": {"@vocab": "http://v/"},
        "@id": "http://n/a",
        "title": {"@value": "مرحبا", "@language": "ar", "@direction": "rtl"},
        "@included": [
            {"@id": "http://n/b", "note": {"@value": "side"}},
        ],
    }
    quads = parse_jsonld_text(json.dumps(doc))
    spo = {(s[1], p[1], o[1], o[3]) for s, p, o, g in quads}
    assert ("http://n/a", "http://v/title", "مرحبا", "ar--rtl") in spo
    assert ("http://n/b", "http://v/note", "side", None) in spo


def test_jsonld11_json_literal():
    """@type: @json → rdf:JSON literal with canonical (sorted-key, compact)
    lexical form."""
    import json

    from sopspark.sources.jsonld import parse_jsonld_text
    from sopspark.terms import RDF_NS

    doc = {
        "@context": {"@vocab": "http://v/"},
        "@id": "http://n/a",
        "cfg": {"@value": {"b": 1, "a": [True, None]}, "@type": "@json"},
    }
    quads = parse_jsonld_text(json.dumps(doc))
    (s, p, o, g), = quads
    assert o[1] == '{"a":[true,null],"b":1}'
    assert o[2] == RDF_NS + "JSON"


def test_rdfxml_property_attributes_blank_node():
    """Empty property element carrying property ATTRIBUTES (RDF/XML spec
    §2.12 'Omitting Blank Nodes'): object is a blank node with the
    attributes as literal properties — was mis-parsed as an empty literal."""
    from sopspark.sources.rdfxml import parse_rdfxml_text
    from sopspark.terms import BNODE

    doc = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://ex.example/">
  <rdf:Description rdf:about="http://n/doc">
    <ex:editor ex:fullName="Dave Beckett" ex:homePage="http://purl.org/net/dajobe/"/>
  </rdf:Description>
</rdf:RDF>"""
    quads = parse_rdfxml_text(doc)
    ed = next(o for s, p, o, g in quads if p[1] == "http://ex.example/editor")
    assert ed[0] == BNODE
    spo = {(s[1], p[1], o[1]) for s, p, o, g in quads}
    assert (ed[1], "http://ex.example/fullName", "Dave Beckett") in spo
    assert (ed[1], "http://ex.example/homePage", "http://purl.org/net/dajobe/") in spo
    assert len(quads) == 3


def test_jsonld11_protected_and_null_context():
    """@protected (§4.1.11): redefining a protected term errors (identical
    redefinition allowed); @context:null resets the active context and is
    rejected while protected terms are in scope."""
    import json

    import pytest

    from sopspark.sources.jsonld import JsonLdError, parse_jsonld_text

    # identical redefinition of a protected term is fine
    ok = {
        "@context": [
            {"@protected": True, "name": "http://e/name"},
            {"name": "http://e/name"},
        ],
        "@id": "http://e/a",
        "name": "x",
    }
    preds = {q[1][1] for q in parse_jsonld_text(json.dumps(ok))}
    assert "http://e/name" in preds

    # conflicting redefinition errors
    bad = {
        "@context": [
            {"@protected": True, "name": "http://e/name"},
            {"name": "http://e/OTHER"},
        ],
        "@id": "http://e/a",
        "name": "x",
    }
    with pytest.raises(JsonLdError, match="protected term"):
        parse_jsonld_text(json.dumps(bad))

    # @context: null resets — allowed without protected terms, and the
    # pre-reset term no longer expands afterwards
    reset = {
        "@context": [{"name": "http://e/name"}, None, {"label": "http://e/label"}],
        "@id": "http://e/a",
        "label": "y",
        "name": "z",
    }
    preds2 = {q[1][1] for q in parse_jsonld_text(json.dumps(reset))}
    assert "http://e/label" in preds2 and "http://e/name" not in preds2

    # ...but rejected while protected terms are in scope
    with pytest.raises(JsonLdError, match="protected"):
        parse_jsonld_text(json.dumps({
            "@context": [{"@protected": True, "name": "http://e/name"}, None],
            "@id": "http://e/a",
        }))


def test_jsonld11_per_term_protected_false_override():
    """Review fix: a per-term "@protected": false exempts the term from a
    context-wide "@protected": true (§4.1.11)."""
    import json

    from sopspark.sources.jsonld import parse_jsonld_text

    doc = {
        "@context": [
            {"@protected": True,
             "name": {"@id": "http://e/name", "@protected": False}},
            {"name": "http://e/other"},
        ],
        "@id": "http://e/a",
        "name": "x",
    }
    preds = {q[1][1] for q in parse_jsonld_text(json.dumps(doc))}
    assert preds == {"http://e/other"}


def test_jsonld_user_bnode_label_cannot_collide_with_fresh(spark, tmp_path):
    """A user-supplied ``_:jb1`` label (the fresh-label shape) must stay a
    DIFFERENT blank node from an anonymous node's fresh label — the
    injective 'u'-escape keeps the namespaces disjoint while ordinary
    labels round-trip verbatim."""
    from sopspark.sources.jsonld import parse_jsonld_text
    from sopspark.terms import BNODE

    doc = (
        '{"@id": "_:jb1", "http://e/p": [{"http://e/q": [{"@value": "x"}]}],'
        ' "http://e/r": [{"@id": "_:ordinary"}]}'
    )
    quads = parse_jsonld_text(doc, {}, None)
    bnodes = {t[1] for q in quads for t in q if t and t[0] == BNODE}
    # user label escaped, fresh label jb1 distinct from it
    assert "ujb1" in bnodes and "jb1" in bnodes and "ordinary" in bnodes
    subj_labels = {q[0][1] for q in quads if q[0][0] == BNODE}
    assert "jb1" not in subj_labels or "ujb1" in subj_labels


def test_jsonld_propagate_false_outermost_and_reverse_paths(spark):
    """Two @propagate:false edges from the round-4 self-review: (a) a
    non-propagating OUTERMOST context must revert to the initial empty
    context inside nested node objects; (b) nested node objects reached
    through a literal @reverse key revert non-propagated frames too."""
    from sopspark.sources.jsonld import parse_jsonld_text
    from sopspark.terms import IRI

    # (a) outermost @propagate:false: 'baz' maps at the top node but must
    # NOT map inside the nested node object (term drops, key is ignored)
    doc = (
        '{"@id": "http://e/top", "baz": [{"@value": "t"}],'
        ' "http://e/child": [{"@id": "http://e/kid", "baz": [{"@value": "k"}]}]}'
    )
    ctx = {"@propagate": False, "baz": "http://scoped/baz"}
    quads = parse_jsonld_text(doc, ctx)
    preds = {q[1][1] for q in quads}
    assert "http://scoped/baz" in preds  # applies at the introducing node
    objs = {q[2][1] for q in quads if q[2][0] != IRI}
    assert "k" not in objs  # dropped inside the nested node (term reverted)

    # (b) @reverse values are nested node objects: the scoped
    # non-propagating frame must revert inside them
    ctx2 = {
        "bar": {
            "@id": "http://v/bar",
            "@context": {"@propagate": False, "baz": "http://scoped/baz"},
        }
    }
    doc2 = (
        '{"@id": "http://e/d1", "bar": [{"@id": "http://e/mid",'
        ' "@reverse": {"http://v/parent": [{"@id": "http://e/d2",'
        ' "baz": [{"@value": "x"}]}]}}]}'
    )
    quads2 = parse_jsonld_text(doc2, ctx2)
    preds2 = {q[1][1] for q in quads2}
    assert "http://scoped/baz" not in preds2  # reverted inside d2


def test_jsonld_reverse_scoped_context_and_bare_id_exemption(spark):
    """Third-review-pass regressions pinned: (a) a reverse key's
    term-scoped context applies to its values like a forward key's;
    (b) a bare {"@id": ...} node REFERENCE is exempt from the
    non-propagated-frame revert (expansion step 8), so a scoped @base
    still applies — same as the coerced-string spelling."""
    from sopspark.sources.jsonld import parse_jsonld_text
    from sopspark.terms import IRI

    ctx = {"parent": {"@id": "http://v/parent", "@context": {"baz": "http://scoped/baz"}}}
    doc = (
        '{"@id": "http://e/mid", "@reverse": {"parent": [{"@id": "http://e/d2",'
        ' "baz": [{"@value": "x"}]}]}}'
    )
    quads = parse_jsonld_text(doc, ctx)
    got = {(q[0][1], q[1][1], q[2][1]) for q in quads}
    assert ("http://e/d2", "http://v/parent", "http://e/mid") in got
    assert ("http://e/d2", "http://scoped/baz", "x") in got

    ctx2 = {
        "bar": {
            "@id": "http://v/bar",
            "@context": {"@propagate": False, "@base": "http://B/"},
        }
    }
    doc2 = (
        '{"@id": "http://e/top", "bar": [{"@id": "http://B/mid",'
        ' "http://e/q": [{"@id": "kid"}]}]}'
    )
    quads2 = parse_jsonld_text(doc2, ctx2)
    objs = {q[2][1] for q in quads2 if q[2][0] == IRI}
    assert "http://B/kid" in objs  # bare ref keeps the scoped @base
