"""Property-based tests (hypothesis) — SURVEY.md §5(c).

Driver-level properties use the pure-Python kernels (fast, no Spark jobs
per example); Spark-level spot checks run a handful of drawn examples in
one job.
"""

import string

from hypothesis import given, settings, strategies as st

from sopspark.functions.rdfc10 import canonicalize_quads
from sopspark.sources.ntriples import LINE_RE, unescape_literal
from sopspark.terms import BNODE, IRI, LITERAL, py_escape, py_nq_line

# --- strategies -----------------------------------------------------------

# include non-ASCII IRI code points: canonical NT writes raw UTF-8 IRIs
# and the parser must round-trip them (UCHAR escapes are the READ-side
# alternative form, covered separately)
iri_chars = st.text(
    alphabet=string.ascii_letters + string.digits + ":/._-#éλ中😀",
    min_size=1,
    max_size=30,
)
iris = st.builds(lambda s: (IRI, "http://e/" + s, None, None), iri_chars)
bnodes = st.builds(lambda s: (BNODE, "b" + s, None, None), st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=8))
lit_text = st.text(min_size=0, max_size=40).filter(lambda s: "\ud800" <= "" or all(not ("\ud800" <= c <= "\udfff") for c in s))
plain_literals = st.builds(lambda s: (LITERAL, s, None, None), lit_text)
lang_literals = st.builds(
    lambda s, l: (LITERAL, s, None, l),
    lit_text,
    st.sampled_from(["en", "fr", "de", "en-US"]),
)
typed_literals = st.builds(
    lambda n: (LITERAL, str(n), "http://www.w3.org/2001/XMLSchema#integer", None),
    st.integers(-10**9, 10**9),
)
literals = st.one_of(plain_literals, lang_literals, typed_literals)
subjects = st.one_of(iris, bnodes)
objects = st.one_of(iris, bnodes, literals)
graphs = st.one_of(st.none(), iris)

quads = st.builds(lambda s, p, o, g: (s, p, o, g), subjects, iris, objects, graphs)
quad_lists = st.lists(quads, min_size=1, max_size=12)


# --- N-Quads encode/parse round trip --------------------------------------

@given(quad_lists)
@settings(max_examples=200, deadline=None)
def test_nq_line_reparses(qs):
    """every encoded line matches the parser grammar and round-trips the
    term values (the lexical encode/decode inverse property)."""
    for q in qs:
        line = py_nq_line(q)
        m = LINE_RE.match(line)
        assert m, f"unparseable line: {line!r}"
        d = m.groupdict()
        s, p, o, g = q
        # subject
        if s[0] == IRI:
            assert d["s_iri"] == s[1]
        else:
            assert d["s_bn"] == s[1]
        assert d["p_iri"] == p[1]
        if o[0] == LITERAL:
            assert unescape_literal(d["o_lit"]) == o[1]
            assert d["o_lang"] == (o[3] or None)
            assert d["o_dt"] == (o[2] or None)
        elif o[0] == IRI:
            assert d["o_iri"] == o[1]
        if g is not None:
            assert d["g_iri"] == g[1]


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_escape_unescape_inverse(s):
    assert unescape_literal(py_escape(s)) == s


# --- RDFC-1.0 properties ---------------------------------------------------

@given(quad_lists, st.randoms())
@settings(max_examples=60, deadline=None)
def test_c14n_invariant_under_relabel_and_shuffle(qs, rng):
    base = canonicalize_quads(qs)

    labels = sorted({t[1] for q in qs for t in q if t is not None and t[0] == BNODE})
    mapping = {l: f"perm{idx}x" for idx, l in enumerate(rng.sample(labels, len(labels)))}

    def relab(q):
        return tuple(
            (BNODE, mapping[t[1]], None, None) if t is not None and t[0] == BNODE else t
            for t in q
        )

    shuffled = [relab(q) for q in qs]
    rng.shuffle(shuffled)
    assert canonicalize_quads(shuffled) == base


@given(quad_lists)
@settings(max_examples=60, deadline=None)
def test_c14n_idempotent_and_dedupes(qs):
    once = canonicalize_quads(qs)
    assert canonicalize_quads(qs + qs) == once  # set semantics
    assert once == sorted(once)  # sorted document


@given(st.lists(st.builds(lambda s, p, o: (s, p, o), subjects, iris, objects), min_size=1, max_size=8))
@settings(max_examples=25, deadline=None)
def test_quoted_term_regex_destructure_roundtrip(spark, triples):
    """The SPARQL-star qpat machinery: encoding random inner triples as a
    canonical QUOTED term, then destructuring via the depth-bounded regex +
    _decode_nt_term, reproduces the original terms (vs the reference
    Python parser parse_term_str)."""
    from pyspark.sql import functions as F

    from sopspark.functions.sparql import _decode_nt_term, _nt_term_re
    from sopspark.terms import py_nt_term

    encs = [
        "<< " + " ".join(py_nt_term(t) for t in (s, p, o)) + " >>"
        for s, p, o in triples
    ]
    df = spark.createDataFrame([(e,) for e in encs], ["enc"])
    tre = _nt_term_re()
    pat = f"^<< ({tre}) ({tre}) ({tre}) >>$"
    out = df.select(
        "enc",
        *[
            _decode_nt_term(F.regexp_extract(F.col("enc"), pat, i)).alias(f"t{i}")
            for i in (1, 2, 3)
        ],
    ).collect()
    got = {r.enc: [tuple(r[f"t{i}"]) for i in (1, 2, 3)] for r in out}
    for (s, p, o), enc in zip(triples, encs):
        want = [tuple(x) for x in (s, p, o)]
        # plain-literal dt normalization: parser stores None for xsd:string
        assert got[enc] == want, (enc, got[enc], want)
