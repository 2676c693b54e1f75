"""RDF/XML subset parser (``sop parse -f rdf``, ``src/parse.rs:289-349``).

Subset: ``rdf:RDF`` root (or a single description), ``rdf:Description`` and
typed node elements, ``rdf:about`` / ``rdf:ID`` / ``rdf:nodeID``, property
elements with ``rdf:resource`` / ``rdf:nodeID`` / literal content / nested
descriptions / ``rdf:parseType="Resource"/"Collection"/"Literal"``,
``rdf:li`` container membership (→ ``rdf:_N``), ``rdf:datatype``,
``xml:lang`` (inherited), ``xml:base`` on the root, property attributes on
node elements. Per-file parallelism
like the other document formats.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sopspark.sources.ntriples import FLAT_SCHEMA, _flat_to_quads
from sopspark.terms import BNODE, IRI, LITERAL, RDF_NS, XSD_STRING

RDF = "{" + RDF_NS + "}"
XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"
XML_BASE = "{http://www.w3.org/XML/1998/namespace}base"
RDF_TYPE = RDF_NS + "type"


class RdfXmlError(ValueError):
    pass


def _expand(tag: str) -> str:
    if tag.startswith("{"):
        ns, _, local = tag[1:].partition("}")
        return ns + local
    raise RdfXmlError(f"unqualified element {tag!r}")


class _Parser:
    def __init__(self, base: str | None):
        self.base = base
        self.quads: list[tuple] = []
        self._bn = 0

    def fresh(self) -> tuple:
        self._bn += 1
        return (BNODE, f"xb{self._bn}", None, None)

    def resolve(self, iri: str) -> str:
        if self.base and not iri.startswith(("http:", "https:", "urn:", "file:")):
            return urljoin(self.base, iri)
        return iri

    def node_subject(self, el: ET.Element) -> tuple:
        about = el.get(RDF + "about")
        rid = el.get(RDF + "ID")
        nid = el.get(RDF + "nodeID")
        if about is not None:
            return (IRI, self.resolve(about), None, None)
        if rid is not None:
            return (IRI, self.resolve("#" + rid), None, None)
        if nid is not None:
            return (BNODE, nid, None, None)
        return self.fresh()

    def parse_node(self, el: ET.Element, lang: str | None) -> tuple:
        lang = _lang_scope(el, lang)
        subj = self.node_subject(el)
        tag = _expand(el.tag)
        if tag != RDF_NS + "Description":
            self.quads.append((subj, (IRI, RDF_TYPE, None, None), (IRI, tag, None, None), None))
        # property attributes (non-rdf, non-xml attrs on the node element);
        # rdf:type as a property attribute is the one rdf:-namespace
        # attribute that EMITS (spec §2.13: object is an IRI, not a literal)
        for attr, val in el.attrib.items():
            if attr == RDF + "type":
                self.quads.append(
                    (subj, (IRI, RDF_TYPE, None, None), (IRI, self.resolve(val), None, None), None)
                )
                continue
            if attr.startswith(RDF) or attr == XML_LANG or not attr.startswith("{"):
                continue
            self.quads.append((subj, (IRI, _expand(attr), None, None), (LITERAL, val, None, lang), None))
        li_n = 0
        for prop in el:
            if _expand(prop.tag) == RDF_NS + "li":
                li_n += 1
                self.parse_property(subj, prop, lang, pred_iri=f"{RDF_NS}_{li_n}")
            else:
                self.parse_property(subj, prop, lang)
        return subj

    def parse_property(
        self, subj: tuple, prop: ET.Element, lang: str | None, pred_iri: str | None = None
    ):
        lang = _lang_scope(prop, lang)
        pred = (IRI, pred_iri or _expand(prop.tag), None, None)
        res = prop.get(RDF + "resource")
        nid = prop.get(RDF + "nodeID")
        dt = prop.get(RDF + "datatype")
        ptype = prop.get(RDF + "parseType")
        children = list(prop)
        obj: tuple
        if res is not None:
            obj = (IRI, self.resolve(res), None, None)
        elif nid is not None:
            obj = (BNODE, nid, None, None)
        elif ptype == "Resource":
            inner = self.fresh()
            for sub in children:
                self.parse_property(inner, sub, lang)
            obj = inner
        elif ptype == "Collection":
            # children are node elements forming an rdf:first/rest chain
            nodes = [self.parse_node(c, lang) for c in children]
            prev: tuple = (IRI, RDF_NS + "nil", None, None)
            cells = []
            for node in nodes:
                cells.append(self.fresh())
            for cell, node in zip(reversed(cells), reversed(nodes)):
                self.quads.append((cell, (IRI, RDF_NS + "first", None, None), node, None))
                self.quads.append((cell, (IRI, RDF_NS + "rest", None, None), prev, None))
                prev = cell
            obj = prev
        elif ptype == "Literal":
            # inner XML verbatim as rdf:XMLLiteral (exclusive c14n of the
            # fragment is out of scope; the lexical form is the raw markup)
            xml = (prop.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in children
            )
            obj = (LITERAL, xml, RDF_NS + "XMLLiteral", None)
        elif children:
            obj = self.parse_node(children[0], lang)
        else:
            prop_attrs = [
                (attr, val)
                for attr, val in prop.attrib.items()
                if attr.startswith("{")
                and not attr.startswith(RDF)
                and attr != XML_LANG
                and attr != XML_BASE
            ]
            if prop_attrs and not (prop.text or "").strip():
                # empty property element with property ATTRIBUTES (spec
                # §2.12 "Omitting Blank Nodes"): object is a fresh bnode
                # carrying the attributes as literal properties
                inner = self.fresh()
                for attr, val in prop_attrs:
                    self.quads.append(
                        (inner, (IRI, _expand(attr), None, None), (LITERAL, val, None, lang), None)
                    )
                obj = inner
            else:
                text = prop.text or ""
                d = None if dt == XSD_STRING else dt
                obj = (LITERAL, text, d, lang if d is None else None)
        self.quads.append((subj, pred, obj, None))
        # rdf:ID on a PROPERTY element reifies the statement (RDF/XML spec
        # §2.17; the sophia parser the reference wires emits the same four
        # quads): #id a rdf:Statement; rdf:subject/predicate/object.
        rid = prop.get(RDF + "ID")
        if rid is not None:
            st = (IRI, self.resolve("#" + rid), None, None)
            self.quads.append((st, (IRI, RDF_TYPE, None, None), (IRI, RDF_NS + "Statement", None, None), None))
            self.quads.append((st, (IRI, RDF_NS + "subject", None, None), subj, None))
            self.quads.append((st, (IRI, RDF_NS + "predicate", None, None), (IRI, pred[1], None, None), None))
            self.quads.append((st, (IRI, RDF_NS + "object", None, None), obj, None))


def _lang_scope(el, inherited: str | None) -> str | None:
    """xml:lang scoping: an explicit xml:lang=\"\" CLEARS the inherited
    language (XML spec §2.12) — the empty string is not a legal tag and
    must become None, matching the NULL other parsers emit."""
    v = el.get(XML_LANG, inherited)
    return v if v else None


def parse_rdfxml_text(text: str, base: str | None = None) -> list[tuple]:
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise RdfXmlError(str(e)) from e
    p = _Parser(root.get(XML_BASE, base))
    if _expand(root.tag) == RDF_NS + "RDF":
        for el in root:
            p.parse_node(el, root.get(XML_LANG))
    else:
        p.parse_node(root, None)
    return p.quads


def parse_rdfxml(
    spark: SparkSession,
    paths: str | list[str],
    base: str | None = None,
    scope_bnodes_per_file: bool = False,
) -> DataFrame:
    if isinstance(paths, str):
        paths = [paths]
    docs = spark.read.text(paths, wholetext=True).select(
        F.col("value"), F.input_file_name().alias("src")
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f"{t}_{f}" for t in ("s", "p", "o", "g") for f in ("kind", "value", "dt", "lang")]
        for pdf in pdfs:
            rows = []
            for _, row in pdf.iterrows():
                try:
                    for s, p_, o, g in parse_rdfxml_text(row["value"], base):
                        flat = list(s) + list(p_) + list(o) + (list(g) if g else [None] * 4)
                        rows.append(flat + [None, row["src"]])
                except RdfXmlError as e:
                    rows.append([None] * 16 + [f"parse error: {e}", row["src"]])
            yield pd.DataFrame(rows, columns=cols + ["err", "src"])

    quads = _flat_to_quads(docs.mapInPandas(run, schema=FLAT_SCHEMA))
    if scope_bnodes_per_file:
        # parser-generated labels (xb1, xb2, …) restart per document —
        # without a per-file suffix, anonymous nodes from different files
        # would silently merge (turtle/ntriples expose the same option)
        from sopspark.sources.ntriples import suffix_bnodes

        quads = suffix_bnodes(quads, F.substring(F.sha2(F.col("src"), 256), 1, 12))
    return quads.drop("src")
