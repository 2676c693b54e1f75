"""JSON-LD subset parser (``sop parse -f jsonld``, ``src/parse.rs:289-349``).

Subset: inline ``@context`` with prefix / term→IRI mappings (string values
and ``{"@id": ..., "@type": "@id"}`` definitions), ``@vocab`` / ``@base``,
node objects with ``@id``/``@type``, nested node objects (blank nodes when
unnamed), value objects (``@value``/``@language``/``@type``), arrays,
``@list`` (value form and ``"@container": "@list"`` terms → rdf:first/rest
chains), ``@reverse`` (both the node key and reverse term definitions),
top-level ``@graph``.

JSON-LD 1.1 additions: ``@container`` ``@index``/``@id``/``@language``/
``@type`` maps, ``@nest``, term-scoped ``@context`` (property-scoped;
``"@propagate": false`` honored — the frame applies to the node object
where introduced and reverts on descent into nested node objects,
§4.1.9), ``@included``, ``@direction``, ``@json`` literals,
``@protected`` terms, ``@context: null`` reset.

Remote contexts (string / list ``@context`` values) resolve through a
:class:`ContextLoader` — the reference's ``-l DIR`` FsLoader cache
(``src/parse.rs:412-448``: every file or subdirectory ``ITEM`` of DIR serves
the ``https://ITEM/`` namespace) and ``-u`` URL fetching
(``src/parse.rs:102-121``). The DIR cache is read ONCE on the driver into an
in-memory dict that ships to executors with the task closure (context files
are tiny); URL fetches are lazy and cached per executor.

Like Turtle, the document is the unit of parallelism: one file = one parse
task (``spark.read.text(wholetext=True)`` → ``mapInPandas``).
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sopspark.sources.ntriples import FLAT_SCHEMA, _flat_to_quads
from sopspark.terms import BNODE, IRI, LITERAL, RDF_NS, XSD

RDF_TYPE = RDF_NS + "type"
_ABS = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


class JsonLdError(ValueError):
    pass


class ContextLoader:
    """Resolves remote ``@context`` IRIs.

    ``local_dir``: reference FsLoader semantics (``src/parse.rs:412-448``) —
    each file or subdirectory ``ITEM`` of the directory is a cache for the
    ``https://ITEM/`` namespace (a subdirectory serves its whole subtree; a
    plain file serves exactly ``https://ITEM/``). Loaded eagerly driver-side.
    ``allow_urls``: fetch unknown context IRIs over HTTP(S) — opt-in like the
    reference's ``-u`` (``src/parse.rs:116-121``).
    """

    def __init__(self, local_dir: str | None = None, allow_urls: bool = False):
        self.allow_urls = allow_urls
        self.cache: dict[str, str] = {}  # context IRI -> raw document text
        if local_dir and os.path.isdir(local_dir):
            for item in sorted(os.listdir(local_dir)):
                path = os.path.join(local_dir, item)
                if os.path.isdir(path):
                    for root, _dirs, files in os.walk(path):
                        for fn in files:
                            fp = os.path.join(root, fn)
                            rel = os.path.relpath(fp, path).replace(os.sep, "/")
                            self.cache[f"https://{item}/{rel}"] = open(fp).read()
                else:
                    self.cache[f"https://{item}/"] = open(path).read()

    def load(self, iri: str):
        """context IRI → the document's ``@context`` value."""
        text = self.cache.get(iri) or self.cache.get(iri.split("#")[0].split("?")[0])
        if text is None:
            if not self.allow_urls:
                raise JsonLdError(f"unknown remote context {iri!r} (no -l cache entry; -u not set)")
            import urllib.request

            req = urllib.request.Request(iri, headers={"accept": "application/ld+json, application/json"})
            with urllib.request.urlopen(req) as resp:  # noqa: S310 — opt-in via -u
                text = resp.read().decode("utf-8")
            self.cache[iri] = text
        try:
            doc = json.loads(text)
        except json.JSONDecodeError as e:
            raise JsonLdError(f"remote context {iri!r} is not JSON: {e}") from e
        if isinstance(doc, dict) and "@context" in doc:
            return doc["@context"]
        return doc


# sentinel distinguishing "@context: null" (reset) from an absent context
_NULL_CTX: dict = {}


class _Ctx:
    def __init__(
        self,
        mapping,
        parent: "_Ctx | None" = None,
        loader: ContextLoader | None = None,
    ):
        self.terms: dict[str, dict] = dict(parent.terms) if parent else {}
        self.protected: set[str] = set(parent.protected) if parent else set()
        self.loader = loader if loader is not None else (parent.loader if parent else None)
        self.vocab: str | None = parent.vocab if parent else None
        self.base: str | None = parent.base if parent else None
        # @propagate (JSON-LD 1.1 §4.1.9 / api §4.1 step 3): a context with
        # "@propagate": false records the context active BEFORE it applied;
        # node-object descent reverts to it. A clone carries the parent's
        # previous forward (the spec's "does not already have a previous
        # context" rule keeps the oldest revert point).
        self.previous: _Ctx | None = parent.previous if parent else None
        for m in self._resolve(mapping, frozenset()):
            if m is not _NULL_CTX and "@propagate" in m:
                if not isinstance(m["@propagate"], bool):
                    raise JsonLdError("@propagate value must be a boolean")
                if m["@propagate"] is False and self.previous is None:
                    # outermost context: nested node objects revert to the
                    # INITIAL (empty) context (§4.1.9) — a parentless
                    # non-propagating frame must still record a revert point
                    self.previous = (
                        parent if parent is not None else _Ctx(None, loader=loader)
                    )
            if m is _NULL_CTX:
                # @context: null resets to the initial (empty) context
                # (§4.1) — invalid while protected term definitions are in
                # scope (§4.1.11)
                if self.protected:
                    raise JsonLdError(
                        "@context: null would clear protected terms: "
                        + ", ".join(sorted(self.protected))
                    )
                self.terms, self.vocab, self.base = {}, None, None
                continue
            ctx_protected = bool(m.get("@protected", False))
            for k, v in m.items():
                if k == "@vocab":
                    self.vocab = v  # None clears it (JSON-LD 1.1 §4.1.3)
                    continue
                if k == "@base":
                    self.base = v
                    continue
                if k.startswith("@"):
                    continue
                if isinstance(v, str):
                    tdef = {"@id": v}
                elif isinstance(v, dict) and ("@id" in v or "@reverse" in v):
                    if "@reverse" in v and "@id" not in v:
                        tdef = {**v, "@id": v["@reverse"], "@is_reverse": True}
                    else:
                        tdef = v
                elif isinstance(v, dict) and (
                    "@container" in v or "@context" in v or "@type" in v
                ):
                    # JSON-LD 1.1: a term may define only @container /
                    # scoped @context / type coercion — the IRI then comes
                    # from @vocab or prefix expansion of the term itself
                    tdef = v
                else:
                    continue
                # @protected (§4.1.11): redefining a protected term is an
                # error unless the new definition is identical
                if k in self.protected and self._strip(self.terms.get(k)) != self._strip(tdef):
                    raise JsonLdError(f"attempt to redefine protected term {k!r}")
                self.terms[k] = tdef
                # per-term @protected overrides the context-wide flag in
                # BOTH directions (§4.1.11: "@protected": false exempts
                # the term from a protected context)
                term_flag = tdef.get("@protected") if isinstance(tdef, dict) else None
                if term_flag is True or (term_flag is None and ctx_protected):
                    self.protected.add(k)
                elif term_flag is False:
                    self.protected.discard(k)

    @staticmethod
    def _strip(tdef):
        if not isinstance(tdef, dict):
            return tdef
        return {k: v for k, v in tdef.items() if k != "@protected"}

    def _resolve(self, mapping, seen: frozenset) -> list[dict]:
        """@context value (dict | IRI string | list | None) → mapping dicts
        in application order, resolving remote IRIs through the loader."""
        out: list[dict] = []
        for v in mapping if isinstance(mapping, list) else [mapping]:
            if v is None:
                out.append(_NULL_CTX)
                continue
            if isinstance(v, dict):
                out.append(v)
            elif isinstance(v, str):
                if v in seen:
                    raise JsonLdError(f"cyclic remote context {v!r}")
                if self.loader is None:
                    raise JsonLdError(f"remote context {v!r} but no context loader configured")
                out.extend(self._resolve(self.loader.load(v), seen | {v}))
            else:
                raise JsonLdError(f"invalid @context entry: {v!r}")
        return out

    def expand(self, term: str) -> str | None:
        """Vocab-mapped expansion (predicates / @type values)."""
        if term in self.terms and "@id" in self.terms[term]:
            return self.terms[term]["@id"]
        if ":" in term:
            pfx, _, local = term.partition(":")
            if pfx in self.terms and "@id" in self.terms[pfx]:
                return self.terms[pfx]["@id"] + local
            if _ABS.match(term):
                return term
        elif self.vocab:
            return self.vocab + term
        return None

    def expand_id(self, ref: str) -> str:
        """Base-resolved expansion (@id values): relative refs resolve
        against @base, NOT @vocab (JSON-LD 1.1 §4.1.2 vs §4.1.3)."""
        if ref in self.terms and "@id" in self.terms[ref]:
            return self.terms[ref]["@id"]
        if ":" in ref:
            pfx, _, local = ref.partition(":")
            if pfx in self.terms and "@id" in self.terms[pfx]:
                return self.terms[pfx]["@id"] + local
            if _ABS.match(ref):
                return ref
        if self.base:
            from urllib.parse import urljoin

            return urljoin(self.base, ref)
        return ref

    def is_id_term(self, term: str) -> bool:
        return self.terms.get(term, {}).get("@type") == "@id"

    def container(self, term: str) -> set[str]:
        """Normalized @container entries for the term ("@set" is semantic
        noise and dropped; a bare string and an array both normalize)."""
        c = self.terms.get(term, {}).get("@container")
        if c is None:
            return set()
        vals = c if isinstance(c, list) else [c]
        return {x for x in vals if x != "@set"}

    def scoped(self, term: str) -> "_Ctx":
        """Term-scoped context (JSON-LD 1.1 §4.1.8): a term definition may
        carry its own @context applied while processing that term's values."""
        tdef = self.terms.get(term, {})
        if "@context" in tdef:
            return _Ctx(tdef["@context"], self)
        return self

    def rollback(self) -> "_Ctx":
        """The context with non-propagated frames reverted — what a nested
        node object starts from (api §5.1.2 expansion step 8: "set active
        context to previous context ... as non-propagated contexts do not
        apply to subsequent node objects")."""
        return self.previous if self.previous is not None else self

    def scoped_for_node(self, term: str) -> "_Ctx":
        """Active context for a NESTED NODE OBJECT under ``term``: first
        revert non-propagating frames introduced at the current node, then
        apply the term's scoped context on top (the term definition itself
        is looked up in the CURRENT context — pyld/jsonld.js ordering)."""
        base = self.rollback()
        tdef = self.terms.get(term, {})
        if "@context" in tdef:
            return _Ctx(tdef["@context"], base)
        return base

    def is_nest_term(self, term: str) -> bool:
        return self.terms.get(term, {}).get("@id") == "@nest"

    def is_list_term(self, term: str) -> bool:
        return "@list" in self.container(term)

    def is_reverse_term(self, term: str) -> bool:
        return bool(self.terms.get(term, {}).get("@is_reverse"))


class _Parser:
    def __init__(self, fresh_prefix: str = "jb"):
        self.quads: list[tuple] = []
        self._bn = 0
        self._fresh_prefix = fresh_prefix
        self.graph: tuple | None = None  # active named graph (via @graph)

    # a user label that could collide with a fresh label (any parser
    # instance: doc-level "jb<n>" or NDJSON line-level
    # "l<md5hex>x<seq>b<n>"), or
    # that sits in the image of this escape map ("u…" of those shapes),
    # is escaped with a "u" prefix. The full-match closure keeps the map
    # injective and line-independent (dataset-scoped labels stay
    # consistent across NDJSON lines) while every ordinary label passes
    # through verbatim, preserving byte round-trips.
    _COLLIDING = re.compile(r"^u*(?:jb\d+|l[0-9a-f]{32}x\d+b\d+)$")

    def user_bnode(self, label: str) -> tuple:
        if self._COLLIDING.match(label):
            label = "u" + label
        return (BNODE, label, None, None)

    def fresh(self) -> tuple:
        self._bn += 1
        return (BNODE, f"{self._fresh_prefix}{self._bn}", None, None)

    def node_subject(self, node: dict, ctx: _Ctx) -> tuple:
        nid = node.get("@id")
        if nid is None:
            return self.fresh()
        if nid.startswith("_:"):
            return self.user_bnode(nid[2:])
        return (IRI, ctx.expand_id(nid), None, None)

    def build_list(self, items: list, ctx: "_Ctx", node_ctx: "_Ctx | None" = None) -> tuple:
        """``@list`` array → rdf:first/rest cons chain; returns the head
        (rdf:nil for an empty list)."""
        prev: tuple = (IRI, RDF_NS + "nil", None, None)
        objs = [self.value_object(it, ctx, node_ctx=node_ctx) for it in items]
        for obj in reversed([o for o in objs if o is not None]):
            cell = self.fresh()
            self.quads.append((cell, (IRI, RDF_NS + "first", None, None), obj, self.graph))
            self.quads.append((cell, (IRI, RDF_NS + "rest", None, None), prev, self.graph))
            prev = cell
        return prev

    def parse_node(self, node: dict, ctx: _Ctx) -> tuple:
        if "@context" in node:
            ctx = _Ctx(node["@context"], ctx)
        subj = self.node_subject(node, ctx)
        self._entries(subj, node, ctx)
        return subj

    def _entries(self, subj: tuple, node: dict, ctx: _Ctx) -> None:
        """Process a node object's entries against ``subj`` — factored out
        so ``@nest`` groups (JSON-LD 1.1 §9.9) recurse with the same
        subject."""
        for key, value in node.items():
            if key in ("@context", "@id"):
                continue
            if key == "@type":
                for t in value if isinstance(value, list) else [value]:
                    self.quads.append((subj, (IRI, RDF_TYPE, None, None), (IRI, ctx.expand(t) or t, None, None), self.graph))
                continue
            if key == "@graph":
                # @graph under a node with @id = a named graph; anonymous /
                # top-level @graph = the default graph (JSON-LD 1.1 §9.4)
                prev = self.graph
                if node.get("@id") is not None:
                    self.graph = subj
                for child in value if isinstance(value, list) else [value]:
                    self.parse_node(child, ctx.rollback())
                self.graph = prev
                continue
            if key == "@reverse":
                # {"@reverse": {pred: nodes}} — emitted (obj, pred, subj)
                for rkey, rval in value.items():
                    r_iri = ctx.expand(rkey)
                    if r_iri is None:
                        continue
                    rpred = (IRI, r_iri, None, None)
                    # a reverse key is processed like a forward key: its
                    # term-scoped context applies to the values, and nested
                    # node objects under it revert non-propagating frames
                    r_vctx = ctx.scoped(rkey)
                    r_nctx = (
                        r_vctx if ctx.previous is None else ctx.scoped_for_node(rkey)
                    )
                    for v in rval if isinstance(rval, list) else [rval]:
                        obj = self.value_object(
                            v, r_vctx, id_coercion=True, node_ctx=r_nctx
                        )
                        if obj is not None:
                            self.quads.append((obj, rpred, subj, self.graph))
                continue
            if key == "@included":
                # @included (JSON-LD 1.1 §9.13): secondary node objects
                # carried alongside — parsed as independent nodes
                for child in value if isinstance(value, list) else [value]:
                    if isinstance(child, dict):
                        self.parse_node(child, ctx.rollback())
                continue
            if key == "@nest" or ctx.is_nest_term(key):
                # nesting is purely syntactic: the nested dict's entries
                # belong to the SAME subject (§9.9)
                for v in value if isinstance(value, list) else [value]:
                    if isinstance(v, dict):
                        self._entries(subj, v, ctx)
                continue
            if key.startswith("@"):
                continue
            pred_iri = ctx.expand(key)
            if pred_iri is None:
                continue  # non-IRI-mapped keys are dropped (expansion rule)
            pred = (IRI, pred_iri, None, None)
            # term-scoped context applies to this term's VALUES (§4.1.8);
            # nested node objects start from the rolled-back context
            # (@propagate: false frames revert, §4.1.9) with the scoped
            # context re-applied on top
            vctx = ctx.scoped(key)
            # with no non-propagated frame to revert, scoped_for_node would
            # rebuild the identical context — reuse vctx (context processing
            # runs per key per node, so the duplicate build is measurable on
            # context-heavy corpora)
            nctx = vctx if ctx.previous is None else ctx.scoped_for_node(key)
            cont = ctx.container(key)
            if "@list" in cont:
                # "@container": "@list" — the whole array is ONE list value
                items = value if isinstance(value, list) else [value]
                self.quads.append(
                    (subj, pred, self.build_list(items, vctx, nctx), self.graph)
                )
                continue
            if "@language" in cont and isinstance(value, dict):
                # language map: key = tag ("@none" = untagged), values =
                # plain strings (§9.8)
                for lg, vs in value.items():
                    for s in vs if isinstance(vs, list) else [vs]:
                        lang = None if lg == "@none" else lg
                        self.quads.append((subj, pred, (LITERAL, s, None, lang), self.graph))
                continue
            if "@index" in cont and isinstance(value, dict):
                # index map: keys are annotations with NO RDF meaning —
                # values flatten (§9.7)
                value = [
                    x for vv in value.values() for x in (vv if isinstance(vv, list) else [vv])
                ]
            elif "@id" in cont and isinstance(value, dict):
                # id map: key supplies the node's @id when absent (§9.10)
                items = []
                for idk, vv in value.items():
                    for nodeobj in vv if isinstance(vv, list) else [vv]:
                        if isinstance(nodeobj, dict) and "@id" not in nodeobj and idk != "@none":
                            nodeobj = {**nodeobj, "@id": idk}
                        items.append(nodeobj)
                value = items
            elif "@type" in cont and isinstance(value, dict):
                # type map: key prepends to the node's @type (§9.11)
                items = []
                for tk, vv in value.items():
                    for nodeobj in vv if isinstance(vv, list) else [vv]:
                        if isinstance(nodeobj, dict) and tk != "@none":
                            prior = nodeobj.get("@type", [])
                            prior = prior if isinstance(prior, list) else [prior]
                            nodeobj = {**nodeobj, "@type": [tk, *prior]}
                        items.append(nodeobj)
                value = items
            reverse = ctx.is_reverse_term(key)
            for v in value if isinstance(value, list) else [value]:
                obj = self.value_object(
                    v, vctx, id_coercion=reverse or ctx.is_id_term(key), node_ctx=nctx
                )
                if obj is not None:
                    if reverse:
                        self.quads.append((obj, pred, subj, self.graph))
                    else:
                        self.quads.append((subj, pred, obj, self.graph))

    def value_object(
        self, v, ctx: _Ctx, id_coercion: bool = False, node_ctx: "_Ctx | None" = None
    ):
        if isinstance(v, dict):
            if "@list" in v:
                return self.build_list(
                    v["@list"] if isinstance(v["@list"], list) else [v["@list"]],
                    ctx,
                    node_ctx,
                )
            if "@value" in v:
                val = v["@value"]
                if v.get("@type") == "@json":
                    # JSON literal (JSON-LD 1.1 §8.3): canonical JSON per
                    # RFC 8785 basics — sorted keys, no whitespace, UTF-8
                    lex = json.dumps(
                        val, sort_keys=True, separators=(",", ":"), ensure_ascii=False
                    )
                    return (LITERAL, lex, RDF_NS + "JSON", None)
                if isinstance(val, bool):
                    return (LITERAL, "true" if val else "false", XSD + "boolean", None)
                lang = v.get("@language")
                # @direction (JSON-LD 1.1 §4.2.4) → the engine's RDF 1.2
                # dirLangString convention: lang field carries "tag--dir"
                if lang and v.get("@direction") in ("ltr", "rtl"):
                    lang = f"{lang}--{v['@direction']}"
                dt = v.get("@type")
                dt = ctx.expand(dt) or dt if dt else None
                if isinstance(val, (int, float)) and dt is None:
                    dt = XSD + ("integer" if isinstance(val, int) else "double")
                return (LITERAL, str(val), dt, lang)
            if set(v.keys()) <= {"@id"} and "@id" in v:
                nid = v["@id"]
                if nid.startswith("_:"):
                    return self.user_bnode(nid[2:])
                # expansion step 8 EXEMPTS a map with a single @id entry
                # from the non-propagated-frame revert: a bare node
                # reference expands against the value context (so a scoped
                # @base still applies), same as the coerced-string form
                return (IRI, ctx.expand_id(nid), None, None)
            # nested node object: non-propagating frames already reverted
            # (and the term-scoped context re-applied) in node_ctx
            return self.parse_node(v, node_ctx if node_ctx is not None else ctx)
        if isinstance(v, bool):
            return (LITERAL, "true" if v else "false", XSD + "boolean", None)
        if isinstance(v, int):
            return (LITERAL, str(v), XSD + "integer", None)
        if isinstance(v, float):
            return (LITERAL, str(v), XSD + "double", None)
        if isinstance(v, str):
            if id_coercion:
                if v.startswith("_:"):
                    return self.user_bnode(v[2:])
                return (IRI, ctx.expand_id(v), None, None)
            return (LITERAL, v, None, None)
        return None


def parse_jsonld_text(
    text: str,
    contexts: dict | None = None,
    loader: ContextLoader | None = None,
    fresh_prefix: str = "jb",
) -> list[tuple]:
    doc = json.loads(text)
    p = _Parser(fresh_prefix)
    ctx = _Ctx(contexts, loader=loader)
    nodes = doc if isinstance(doc, list) else [doc]
    for node in nodes:
        if not isinstance(node, dict):
            raise JsonLdError("top-level JSON-LD must be object(s)")
        p.parse_node(node, ctx)
    return p.quads


def parse_yamlld_text(
    text: str, contexts: dict | None = None, loader: ContextLoader | None = None
) -> list[tuple]:
    """YAML-LD = YAML→JSON bridge then JSON-LD expansion, mirroring the
    reference's serde_yaml→serde_json hop (``src/parse.rs:395-399``)."""
    try:
        import yaml
    except ImportError as e:  # pragma: no cover
        raise JsonLdError("pyyaml not available for YAML-LD") from e
    try:
        doc = yaml.safe_load(text)
    except yaml.YAMLError as e:
        raise JsonLdError(f"yaml: {e}") from e
    p = _Parser()
    ctx = _Ctx(contexts, loader=loader)
    nodes = doc if isinstance(doc, list) else [doc]
    for node in nodes:
        if not isinstance(node, dict):
            raise JsonLdError("top-level YAML-LD must be mapping(s)")
        p.parse_node(node, ctx)
    return p.quads


def _parse_docs(
    spark: SparkSession,
    paths: str | list[str],
    parse_text,
    contexts: dict | None,
    loader: ContextLoader | None = None,
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
                    for s, p_, o, g in parse_text(row["value"], contexts, loader):
                        flat = list(s) + list(p_) + list(o) + (list(g) if g else [None] * 4)
                        rows.append(flat + [None, row["src"]])
                except (JsonLdError, json.JSONDecodeError) as e:
                    rows.append([None] * 16 + [f"parse error: {e}", row["src"]])
            yield pd.DataFrame(rows, columns=cols + ["err", "src"])

    return _flat_to_quads(docs.mapInPandas(run, schema=FLAT_SCHEMA)).drop("src")


def parse_jsonld(
    spark: SparkSession,
    paths: str | list[str],
    contexts: dict | None = None,
    loader: ContextLoader | None = None,
) -> DataFrame:
    return _parse_docs(spark, paths, parse_jsonld_text, contexts, loader)


def parse_yamlld(
    spark: SparkSession,
    paths: str | list[str],
    contexts: dict | None = None,
    loader: ContextLoader | None = None,
) -> DataFrame:
    return _parse_docs(spark, paths, parse_yamlld_text, contexts, loader)


def parse_ndjsonld(
    spark: SparkSession,
    paths: str | list[str],
    contexts: dict | None = None,
    loader: ContextLoader | None = None,
) -> DataFrame:
    """NDJSON-LD: one JSON-LD node object (or compact document) per line.

    The distributed bulk twin of :func:`parse_jsonld` — no ``wholetext``,
    so a single huge file still splits into many scan partitions and lines
    parse in parallel. Labeled blank nodes (``_:x``) are DATASET-scoped so
    :func:`sopspark.operators.serialize.serialize_ndjsonld` output
    round-trips exactly; anonymous nested nodes get line-unique labels
    (two lines can't collide on the parser's fresh-bnode counter)."""
    if isinstance(paths, str):
        paths = [paths]
    from pyspark.sql import Window

    lines = (
        spark.read.text(paths)
        .where(F.length(F.trim(F.col("value"))) > 0)
        .select("value", F.input_file_name().alias("src"))
        # rid must be DETERMINISTIC across partition layouts (a
        # monotonically_increasing_id would relabel anonymous bnodes
        # whenever the split count changes, breaking golden/value-hash
        # comparisons of non-canonicalized output): content hash of
        # (file, line) + an ordinal that distinguishes byte-identical
        # duplicate lines. The ordinal pass shuffles only (hash, mono)
        # pairs — 48-byte rows, never the line text — and the resulting
        # duplicate-line table (usually empty) broadcasts back.
        .withColumn("_h", F.md5(F.concat_ws("\n", "src", "value")))
        .withColumn("_mono", F.monotonically_increasing_id())
    )
    wu = Window.partitionBy("_h")
    wo = Window.partitionBy("_h").orderBy("_mono")
    # PIN the ordinal inputs before the two window passes: the narrow
    # (_h, _mono) projection is checkpointed so every consumer of the
    # ordinal reads ONE materialized assignment — never the line text
    # (checkpointing `lines` itself would duplicate the whole corpus into
    # executor storage and make the parse eager). The join back onto
    # `lines` re-derives _mono from the file scan, which assigns
    # partition-stable ids (rows of a FileScan partition always arrive in
    # file order, so a task retry reproduces them bit-identically —
    # unlike post-shuffle mono ids).
    ids = lines.select("_h", "_mono").localCheckpoint(eager=False)
    dup_seq = (
        ids
        .withColumn("_cnt", F.count(F.lit(1)).over(wu))
        .where(F.col("_cnt") > 1)
        # which physical copy gets which ordinal is arbitrary, but
        # byte-identical lines are interchangeable: the RESULT multiset
        # (quads up to that choice) is identical either way
        .withColumn("_seq", F.row_number().over(wo))
        .select("_mono", "_seq")
    )
    # no broadcast HINT: dup_seq is usually empty (AQE broadcasts it), but
    # a boilerplate-heavy corpus can make it line-count-sized — a forced
    # broadcast would hit the driver limit where a shuffle join degrades
    # gracefully
    lines = lines.join(dup_seq, "_mono", "left").select(
        "value",
        "src",
        F.concat_ws(
            "x", "_h", F.coalesce(F.col("_seq"), F.lit(1)).cast("string")
        ).alias("rid"),
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f"{t}_{f}" for t in ("s", "p", "o", "g") for f in ("kind", "value", "dt", "lang")]
        for pdf in pdfs:
            rows = []
            for val, src, rid in zip(
                pdf["value"].values, pdf["src"].values, pdf["rid"].values
            ):
                try:
                    for s, p_, o, g in parse_jsonld_text(
                        val, contexts, loader, fresh_prefix=f"l{rid}b"
                    ):
                        flat = list(s) + list(p_) + list(o) + (list(g) if g else [None] * 4)
                        rows.append(flat + [None, src])
                except (JsonLdError, json.JSONDecodeError) as e:
                    rows.append([None] * 16 + [f"parse error: {e}", src])
            yield pd.DataFrame(rows, columns=cols + ["err", "src"])

    return _flat_to_quads(lines.mapInPandas(run, schema=FLAT_SCHEMA)).drop("src")
