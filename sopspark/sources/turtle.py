"""Turtle / TriG subset parser, parallel per file.

The reference parses Turtle/TriG via the sophia library
(``src/parse.rs:289-349``); its own fixtures (``examples/social.ttl``,
``examples/lang.ttl``) exercise prefixes, ``a``, ``;`` predicate lists,
``,`` object lists, language tags. Turtle is a *document* format (stateful
prefixes), so the unit of parallelism is the file — exactly the reference's
rayon-per-file model (``src/parse.rs:141-165``). At scale the line-oriented
formats (NT/NQ) are the fast path; Turtle exists for fixture/interop parity.

Grammar subset: @prefix/@base (+ SPARQL-style PREFIX/BASE), IRIs, prefixed
names, ``a``, literals (short/long quotes, @lang, ^^dt, numeric, boolean),
``;`` / ``,`` lists, ``_:label`` and ``[ ... ]`` blank nodes, ``( ... )``
collections, and TriG ``{ ... }`` graph blocks.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sopspark.sources.ntriples import FLAT_SCHEMA, _flat_to_quads, unescape_literal
from sopspark.terms import (
    BNODE,
    unescape_pn_local,
    IRI,
    LITERAL,
    QUOTED,
    RDF_NS,
    XSD,
    XSD_STRING,
    py_nt_term,
)

RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"

TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<longstr>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<string>\"(?:[^"\\\n]|\\.)*\"|'(?:[^'\\\n]|\\.)*')
  | (?P<iri><(?:[^<>"{}|^`\\\s]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*>)
  | (?P<bnode>_:[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?)
  | (?P<directive>@prefix|@base)
  | (?P<langtag>@[A-Za-z]+(?:-[A-Za-z0-9]+)*(?:--[A-Za-z]+)?)
  | (?P<double>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.?\d+[eE][+-]?\d+))
  | (?P<decimal>[+-]?\d*\.\d+)
  | (?P<integer>[+-]?\d+)
  | (?P<dtmark>\^\^)
  | (?P<tstar><<|>>)
  | (?P<annot>\{\||\|\})
  | (?P<punct>[;,.\[\]()={}])
  | (?P<pname>[A-Za-z_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?)?:(?:(?:%[0-9A-Fa-f]{2}|\\[_~.!$&'()*+,;=/?\#@%-]|[A-Za-z0-9_:-])(?:(?:%[0-9A-Fa-f]{2}|\\[_~.!$&'()*+,;=/?\#@%-]|[A-Za-z0-9_.:-])*(?:%[0-9A-Fa-f]{2}|\\[_~.!$&'()*+,;=/?\#@%-]|[A-Za-z0-9_:-]))?)?
  | (?P<kw>[A-Za-z]+)
    """,
    re.VERBOSE,
)



def _uchar(iri: str) -> str:
    """IRIREF UCHAR escapes (\\uXXXX / \\UXXXXXXXX) → code points
    (Turtle grammar [18]); IRIs without a backslash pass through as-is.
    Out-of-range code points raise TurtleError (a ValueError — surfaced
    through the parser's err channel, never an uncaught OverflowError)."""
    if "\\" not in iri:
        return iri

    def decode(m: re.Match) -> str:
        cp = int(m.group(1) or m.group(2), 16)
        if cp > 0x10FFFF:
            raise TurtleError(f"UCHAR code point out of range in IRI: {iri!r}")
        if 0xD800 <= cp <= 0xDFFF:
            # a lone surrogate would crash Arrow's UTF-8 encoder downstream
            raise TurtleError(f"surrogate code point in IRI escape: {iri!r}")
        return chr(cp)

    return re.sub(r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})", decode, iri)

class TurtleError(ValueError):
    pass


class _Parser:
    def __init__(self, text: str, base: str | None = None):
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = TOKEN_RE.match(text, pos)
            if not m or m.end() == pos:
                raise TurtleError(f"lex error at offset {pos}: {text[pos:pos+40]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind == "ws":
                continue
            tok = m.group(0)
            if kind is None:  # pname matched via the outer group
                kind = "pname"
            self.toks.append((kind, tok))
        self.i = 0
        self.base = base
        self.prefixes: dict[str, str] = {}
        self.quads: list[tuple] = []
        self._bn = 0
        self.graph: tuple | None = None

    # --- token helpers ---
    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, value: str):
        k, v = self.next()
        if v != value:
            raise TurtleError(f"expected {value!r}, got {v!r}")

    def fresh_bnode(self) -> tuple:
        self._bn += 1
        return (BNODE, f"tb{self._bn}", None, None)

    # --- grammar ---
    def parse(self) -> list[tuple]:
        while self.peek()[0] != "eof":
            self.statement()
        return self.quads

    def statement(self):
        k, v = self.peek()
        if k == "directive":
            self.next()
            if v == "@prefix":
                self.prefix_decl()
                self.expect(".")
            else:
                self.base_decl()
                self.expect(".")
            return
        if k == "kw" and v.upper() in ("PREFIX", "BASE"):
            self.next()
            if v.upper() == "PREFIX":
                self.prefix_decl()
            else:
                self.base_decl()
            return
        if k == "kw" and v.upper() == "GRAPH":  # TriG
            self.next()
            name = self.term()
            self.graph_block(name)
            return
        # TriG: `<g> { ... }`, `[] { ... }`, or bare `{ ... }`
        if v == "{":
            self.next()
            self.block_body(None)
            return
        subj = self.term_or_collection()
        if self.peek()[1] == "{":
            # TriG graph label: reuse the already-parsed term — re-lexing
            # through term() rejects the anonymous-bnode label `[] { … }`
            # (TriG labelOrSubject allows iri | BlankNode incl. ANON)
            if not (isinstance(subj, tuple) and subj[0] in (IRI, BNODE)):
                raise TurtleError("graph label must be an IRI or blank node")
            self.graph_block(subj)
            return
        self.predicate_object_list(subj)
        self.expect(".")

    def graph_block(self, name: tuple):
        self.expect("{")
        self.block_body(name)

    def block_body(self, name: tuple | None):
        prev = self.graph
        self.graph = name
        while self.peek()[1] != "}":
            subj = self.term_or_collection()
            self.predicate_object_list(subj)
            if self.peek()[1] == ".":
                self.next()
        self.expect("}")
        self.graph = prev

    def prefix_decl(self):
        k, v = self.next()
        if k != "pname" or not v.endswith(":"):
            raise TurtleError(f"bad prefix name {v!r}")
        pfx = v[:-1]
        k2, iri = self.next()
        if k2 != "iri":
            raise TurtleError("expected IRI in @prefix")
        self.prefixes[pfx] = self.resolve(_uchar(iri[1:-1]))

    def base_decl(self):
        k2, iri = self.next()
        if k2 != "iri":
            raise TurtleError("expected IRI in @base")
        self.base = self.resolve(_uchar(iri[1:-1]))

    def resolve(self, iri: str) -> str:
        if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
            return urljoin(self.base, iri)
        return iri

    def predicate_object_list(self, subj: tuple):
        while True:
            k, v = self.peek()
            if v == "a" and k == "kw":
                self.next()
                pred = (IRI, RDF_TYPE, None, None)
            else:
                pred = self.term()
            self.object_list(subj, pred)
            if self.peek()[1] == ";":
                # Grammar: (';' (verb objectList)?)* — consume runs of ';'
                # and stop (without erroring) on a terminator, so trailing
                # semicolons (`<s> <p> <o> ; .`, `[ <q> <o> ; ]`) are legal.
                while self.peek()[1] == ";":
                    self.next()
                if self.peek()[1] in (".", "]", "}", "|}") or self.peek()[0] == "eof":
                    break
                continue
            break

    def object_list(self, subj: tuple, pred: tuple):
        while True:
            obj = self.term_or_collection()
            self.emit(subj, pred, obj)
            if self.peek()[1] == "{|":
                # Turtle-star annotation syntax: the base triple stays
                # asserted (emitted above) and the annotation block's
                # subject is the quoted triple << s p o >>
                self.next()
                enc = " ".join(py_nt_term(t) for t in (subj, pred, obj))
                self.predicate_object_list((QUOTED, f"<< {enc} >>", None, None))
                self.expect("|}")
            if self.peek()[1] == ",":
                self.next()
                continue
            break

    def emit(self, s: tuple, p: tuple, o: tuple):
        self.quads.append((s, p, o, self.graph))

    def term_or_collection(self) -> tuple:
        k, v = self.peek()
        if v == "[":
            self.next()
            node = self.fresh_bnode()
            if self.peek()[1] != "]":
                self.predicate_object_list(node)
            self.expect("]")
            return node
        if v == "(":
            self.next()
            items = []
            while self.peek()[1] != ")":
                items.append(self.term_or_collection())
            self.expect(")")
            head: tuple = (IRI, RDF_NIL, None, None)
            for item in reversed(items):
                cell = self.fresh_bnode()
                self.emit(cell, (IRI, RDF_FIRST, None, None), item)
                self.emit(cell, (IRI, RDF_REST, None, None), head)
                head = cell
            return head
        return self.term()

    def term(self) -> tuple:
        k, v = self.next()
        if k == "tstar" and v == "<<":
            # Turtle-star quoted triple (sophia parses these via the same
            # recursive term handling as the line formats,
            # quad_handler.rs:68-73); encoded as kind=QUOTED with the
            # canonical NT `<< s p o >>` form, matching ntriples.py.
            s = self.term()
            p = self.term()
            o = self.term()
            kk, vv = self.next()
            if vv != ">>":
                raise TurtleError(f"expected '>>', got {vv!r}")
            enc = " ".join(py_nt_term(t) for t in (s, p, o))
            return (QUOTED, f"<< {enc} >>", None, None)
        if k == "iri":
            return (IRI, self.resolve(_uchar(v[1:-1])), None, None)
        if k == "bnode":
            return (BNODE, v[2:], None, None)
        if k == "pname":
            pfx, _, local = v.partition(":")
            if pfx not in self.prefixes:
                raise TurtleError(f"undefined prefix {pfx!r}:")
            # PN_LOCAL_ESC unescapes to the raw char in the IRI; PERCENT
            # passes through untouched (Turtle §6.5)
            return (IRI, self.prefixes[pfx] + unescape_pn_local(local), None, None)
        if k in ("string", "longstr"):
            raw = v[3:-3] if k == "longstr" else v[1:-1]
            lex = unescape_literal(raw)
            nk, nv = self.peek()
            if nk == "langtag":
                self.next()
                return (LITERAL, lex, None, nv[1:])
            if nk == "dtmark":
                self.next()
                dt = self.term()
                if dt[0] != IRI:
                    raise TurtleError("datatype must be an IRI")
                d = None if dt[1] == XSD_STRING else dt[1]
                return (LITERAL, lex, d, None)
            return (LITERAL, lex, None, None)
        if k == "integer":
            return (LITERAL, v, XSD + "integer", None)
        if k == "decimal":
            return (LITERAL, v, XSD + "decimal", None)
        if k == "double":
            return (LITERAL, v, XSD + "double", None)
        if k == "kw" and v in ("true", "false"):
            return (LITERAL, v, XSD + "boolean", None)
        raise TurtleError(f"unexpected token {v!r}")


def parse_turtle_text(text: str, base: str | None = None) -> list[tuple]:
    """Parse one Turtle/TriG document → list of ((s,p,o,g) term-tuples)."""
    return _Parser(text, base).parse()


def _docs_to_flat(pdfs: Iterator[pd.DataFrame], base: str | None) -> Iterator[pd.DataFrame]:
    cols = [f"{t}_{f}" for t in ("s", "p", "o", "g") for f in ("kind", "value", "dt", "lang")]
    for pdf in pdfs:
        rows = []
        for _, row in pdf.iterrows():
            src = row.get("src", "")
            try:
                quads = parse_turtle_text(row["value"], base)
            except (ValueError, RecursionError) as e:
                # ValueError covers TurtleError AND the NtStarError that
                # ntriples.unescape_literal raises on illegal escapes
                rows.append([None] * 16 + [f"parse error: {e}", src])
                continue
            for s, p, o, g in quads:
                flat = list(s) + list(p) + list(o) + (list(g) if g else [None] * 4)
                rows.append(flat + [None, src])
        yield pd.DataFrame(rows, columns=cols + ["err", "src"])


def parse_turtle(
    spark: SparkSession,
    paths: str | list[str],
    base: str | None = None,
    scope_bnodes_per_file: bool = False,
) -> DataFrame:
    """Read Turtle/TriG file(s) into a quad DataFrame (one parse task/file)."""
    if isinstance(paths, str):
        paths = [paths]
    docs = spark.read.text(paths, wholetext=True).select(
        F.col("value"), F.input_file_name().alias("src")
    )
    flat = docs.mapInPandas(lambda it: _docs_to_flat(it, base), schema=FLAT_SCHEMA)
    quads = _flat_to_quads(flat)
    if scope_bnodes_per_file:
        from sopspark.sources.ntriples import suffix_bnodes

        quads = suffix_bnodes(quads, F.substring(F.sha2(F.col("src"), 256), 1, 12))
    return quads.drop("src")
