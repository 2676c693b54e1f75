"""SPARQL expression → Catalyst ``Column`` compiler.

The reference's ``filter``/``map`` accept one SPARQL expression per quad
component and evaluate it by *running a one-quad SPARQL query per row*
(``src/filter.rs:26-42``, ``src/map.rs:37-57``) — a scalar expression
evaluator implemented expensively. The Spark-idiomatic equivalent compiles
the expression **once** into a Catalyst column tree that runs inside
whole-stage codegen; there is no per-row interpretation anywhere.

Value model: every subexpression compiles to a Column of the TERM struct
(:data:`sopspark.terms.TERM_TYPE`). Booleans are ``xsd:boolean`` literal
terms; evaluation *errors* are NULL terms — which makes SPARQL's
error-propagation semantics (and the reference's drop-on-error,
``src/filter.rs:36``, ``src/map.rs:47-52``) fall out of Spark's NULL
propagation for free, including the README's
``coalesce(langMatches(lang(?o), "en"), true)`` idiom (``README.md:59-63``).

Functions implemented = the surface the reference evidences
(``README.md:61,129,224``: coalesce, langMatches, lang, iri, lcase, str, =)
plus the standard SPARQL 1.1 builtins that compile 1:1 to Catalyst.

Datatype recognition (``query -d``, ``src/query.rs:46-60``): ``=`` compares
recognized numerics in value space (42 == 042); without ``-d`` equality is
term identity. ``compile_expr(..., recognize_datatypes=False)`` gives the
identity behavior.
"""

from __future__ import annotations

import datetime as _dt
import os
import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from sopspark.terms import (
    BNODE,
    IRI,
    LITERAL,
    RDF_DIRLANGSTRING,
    RDF_LANGSTRING,
    TERM_SQL_TYPE,
    XSD,
    XSD_STRING,
)

NUMERIC_DTS = [
    XSD + n
    for n in (
        "integer",
        "decimal",
        "float",
        "double",
        "long",
        "int",
        "short",
        "byte",
        "nonNegativeInteger",
        "nonPositiveInteger",
        "positiveInteger",
        "negativeInteger",
        "unsignedLong",
        "unsignedInt",
        "unsignedShort",
        "unsignedByte",
    )
]

# integer-family subset of the tower: SUM over only these stays xsd:integer
INTEGER_DTS = [d for d in NUMERIC_DTS if d.rsplit("#", 1)[-1] not in ("decimal", "float", "double")]


class ExprError(ValueError):
    pass


AGG_FUNCS = {"count", "sum", "avg", "min", "max", "sample", "group_concat"}


def contains_aggregate(n: "Node") -> bool:
    if n.op == "call":
        name = n.args[0].lower().removesuffix("_distinct")
        if name in AGG_FUNCS:
            return True
        return any(contains_aggregate(a) for a in n.args[1])
    return any(contains_aggregate(a) for a in n.args if isinstance(a, Node))


# ---------------------------------------------------------------------------
# term-column helpers
# ---------------------------------------------------------------------------

def _null_term() -> Column:
    return F.lit(None).cast(TERM_SQL_TYPE)


def _mk_literal(value: Column, dt: Column | None = None, lang: Column | None = None) -> Column:
    t = F.struct(
        F.lit(LITERAL).cast("tinyint").alias("kind"),
        value.alias("value"),
        (dt if dt is not None else F.lit(None).cast("string")).alias("dt"),
        (lang if lang is not None else F.lit(None).cast("string")).alias("lang"),
    )
    # NULL lexical value = upstream evaluation error → whole term is an error
    return F.when(value.isNotNull(), t).otherwise(_null_term())


def _mk_iri(value: Column) -> Column:
    t = F.struct(
        F.lit(IRI).cast("tinyint").alias("kind"),
        value.alias("value"),
        F.lit(None).cast("string").alias("dt"),
        F.lit(None).cast("string").alias("lang"),
    )
    return F.when(value.isNotNull(), t).otherwise(_null_term())


def bool_term(b: Column) -> Column:
    """boolean Column → xsd:boolean literal term (NULL passes through = error)."""
    return F.when(
        b.isNotNull(),
        _mk_literal(F.when(b, "true").otherwise("false"), F.lit(XSD + "boolean")),
    ).otherwise(_null_term())


def is_numeric_term(t: Column) -> Column:
    return t.isNotNull() & (t["kind"] == LITERAL) & t["dt"].isin(NUMERIC_DTS)


def num(t: Column) -> Column:
    """numeric value of a term, NULL when not a recognized numeric literal."""
    # try_cast: an invalid lexical form for the claimed numeric datatype is
    # a type ERROR (NULL), not a job-killing exception (ANSI cast throws)
    return F.when(is_numeric_term(t), t["value"].try_cast("double")).otherwise(F.lit(None).cast("double"))


def ebv(t: Column) -> Column:
    """SPARQL effective boolean value; NULL = type error. §17.2.2 rule 1:
    a boolean/numeric literal whose lexical form is INVALID for its
    datatype has EBV *false* (not error) — the NULL from a failed cast
    must therefore coalesce to false on the numeric/boolean branches."""
    is_bool = (t["kind"] == LITERAL) & (t["dt"] == XSD + "boolean")
    is_str = (t["kind"] == LITERAL) & t["dt"].isNull() & t["lang"].isNull()
    return (
        F.when(t.isNull(), F.lit(None).cast("boolean"))
        .when(is_bool, t["value"] == "true")
        .when(
            is_numeric_term(t),
            F.coalesce(t["value"].try_cast("double") != 0.0, F.lit(False)),
        )
        .when(is_str, F.length(t["value"]) > 0)
        .otherwise(F.lit(None).cast("boolean"))
    )


def _plain_string(t: Column) -> Column:
    """string value when term is a string literal (plain or lang-tagged)."""
    return F.when((t["kind"] == LITERAL) & t["dt"].isNull(), t["value"]).otherwise(
        F.lit(None).cast("string")
    )


def term_eq(a: Column, b: Column, recognize_datatypes: bool = True) -> Column:
    """SPARQL ``=``: numeric value-space comparison when both sides are
    recognized numerics (``src/query.rs:50-51`` semantics under ``-d``),
    term identity otherwise."""
    both_num = is_numeric_term(a) & is_numeric_term(b)
    ident = (
        (a["kind"] == b["kind"])
        & (a["value"] == b["value"])
        & (a["dt"].eqNullSafe(b["dt"]))
        & (a["lang"].eqNullSafe(b["lang"]))
    )
    base = F.when(a.isNull() | b.isNull(), F.lit(None).cast("boolean"))
    if recognize_datatypes:
        at, bt = _datetime_value(a), _datetime_value(b)
        return (
            base.when(both_num, num(a) == num(b))
            # op:dateTime-equal: value-space (timepoint) equality — two
            # lexically different zoned forms of one instant are equal
            .when(at.isNotNull() & bt.isNotNull(), at == bt)
            .otherwise(ident)
        )
    return base.otherwise(ident)


def _datetime_value(t: Column) -> Column:
    """timestamp value when the term is an xsd:dateTime literal (NULL
    otherwise, incl. malformed lexical forms)."""
    # try_to_timestamp: a malformed lexical form is a type error (NULL),
    # not an ANSI-mode parse exception
    return F.try_to_timestamp(
        F.when((t["kind"] == LITERAL) & (t["dt"] == XSD + "dateTime"), t["value"])
    )


def term_cmp(a: Column, b: Column, op: str) -> Column:
    """``< > <= >=``: numeric when both numeric, codepoint-string when both
    plain strings, op:dateTime-* timepoint comparison when both
    xsd:dateTime, else error (NULL)."""
    an, bn = num(a), num(b)
    as_, bs = _plain_string(a), _plain_string(b)
    at, bt = _datetime_value(a), _datetime_value(b)

    def apply(x: Column, y: Column) -> Column:
        return {"<": x < y, ">": x > y, "<=": x <= y, ">=": x >= y}[op]

    return (
        F.when(an.isNotNull() & bn.isNotNull(), apply(an, bn))
        .when(as_.isNotNull() & bs.isNotNull(), apply(as_, bs))
        .when(at.isNotNull() & bt.isNotNull(), apply(at, bt))
        .otherwise(F.lit(None).cast("boolean"))
    )


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

@dataclass
class Node:
    op: str
    args: tuple

    def col(self, env: dict[str, Column], rd: bool = True) -> Column:
        return _compile(self, env, rd)


def _num_term(c: Column, integer: bool = False, int_cond: Column | None = None) -> Column:
    """numeric Column → typed literal term. ``int_cond`` switches the
    datatype/format per row WITHOUT duplicating ``c``'s whole subtree on
    both branches (Column trees are trees, not DAGs — branching the term
    would double the codegen size; branching only dt/value keeps one copy)."""
    if int_cond is not None:
        dt = F.when(int_cond, F.lit(XSD + "integer")).otherwise(F.lit(XSD + "double"))
        v = F.when(int_cond, c.cast("long").cast("string")).otherwise(c.cast("string"))
        return F.when(c.isNotNull(), _mk_literal(v, dt)).otherwise(_null_term())
    dt_s = XSD + ("integer" if integer else "double")
    v = F.when(
        c.isNotNull(),
        c.cast("long").cast("string") if integer else c.cast("string"),
    )
    return F.when(c.isNotNull(), _mk_literal(v, F.lit(dt_s))).otherwise(_null_term())


# nodes whose value is always boolean — compiled natively to boolean Columns
# (avoids the exponential blowup of ebv(bool_term(...)) re-expansion: Column
# trees are trees, not DAGs, so every reference duplicates its subtree)
_BOOL_OPS = {"or", "and", "not", "=", "!=", "<", ">", "<=", ">=", "bool_const"}
_BOOL_CALLS = {
    "langmatches", "contains", "strstarts", "strends", "regex",
    "isiri", "isuri", "isblank", "isliteral", "isnumeric", "bound", "sameterm",
}


def _is_bool_node(n: Node) -> bool:
    if n.op in _BOOL_OPS:
        return True
    if n.op == "call":
        name = n.args[0].lower()
        if name in _BOOL_CALLS:
            return True
        if name in ("coalesce", "if"):
            args = n.args[1]
            check = args if name == "coalesce" else args[1:]
            return bool(check) and all(_is_bool_node(x) for x in check)
    return False


def _const_term(n: Node):
    """(kind, value, dt, lang) for constant nodes, else None."""
    if n.op == "iri_const":
        return (IRI, n.args[0], None, None)
    if n.op == "lit_const":
        v, dt, lang = n.args
        return (LITERAL, v, dt, lang)
    if n.op == "num_const":
        return (LITERAL, n.args[0], n.args[1], None)
    if n.op == "bool_const":
        return (LITERAL, "true" if n.args[0] else "false", XSD + "boolean", None)
    return None


def _compile_bool(n: Node, env: dict[str, Column], rd: bool) -> Column:
    """Compile a boolean-valued node straight to a boolean Column."""
    op = n.op
    a = n.args

    def b(i: int) -> Column:
        return _compile_bool(a[i], env, rd)

    if op == "or":
        # Spark SQL's Kleene logic IS SPARQL 17.4.1.5/6: T||err=T, F||err=err,
        # F&&err=F, T&&err=err, !err=err — plain &/|/~ keep the predicate a
        # bare conjunction (pushdown-translatable, small codegen tree)
        return b(0) | b(1)
    if op == "and":
        return b(0) & b(1)
    if op == "not":
        return ~b(0)
    if op == "bool_const":
        return F.lit(bool(a[0]))
    if op in ("=", "!="):
        # peephole: comparison against a constant → minimal column tree
        const = _const_term(a[1]) or _const_term(a[0])
        other = a[0] if _const_term(a[1]) else a[1]
        if const is not None and _const_term(other) is None:
            t = _compile(other, env, rd)
            kind, value, dt, lang = const
            # no explicit null guard: a NULL term gives NULL conjuncts →
            # NULL result, which is exactly SPARQL's error value AND keeps
            # the predicate a plain conjunction that parquet nested-field
            # pushdown can translate (row-group skipping on p.value etc.)
            if kind == IRI:
                eq = (t["kind"] == IRI) & (t["value"] == value)
            elif dt in NUMERIC_DTS and rd:
                eq = num(t) == float(value)
            elif dt == XSD + "dateTime" and rd:
                # op:dateTime-equal — timepoint equality, so a differently
                # zoned lexical form of the same instant still matches
                eq = _datetime_value(t) == F.try_to_timestamp(F.lit(value))
            else:
                d = None if dt == XSD_STRING else dt
                eq = (
                    (t["kind"] == LITERAL)
                    & (t["value"] == value)
                    & t["dt"].eqNullSafe(F.lit(d))
                    & t["lang"].eqNullSafe(F.lit(lang))
                )
            return eq if op == "=" else ~eq
        eq = term_eq(_compile(a[0], env, rd), _compile(a[1], env, rd), recognize_datatypes=rd)
        return eq if op == "=" else ~eq
    if op in ("<", ">", "<=", ">="):
        const = _const_term(a[1])
        if const is not None and const[2] in NUMERIC_DTS:
            x = num(_compile(a[0], env, rd))
            y = F.lit(float(const[1]))
            return {"<": x < y, ">": x > y, "<=": x <= y, ">=": x >= y}[op]
        return term_cmp(_compile(a[0], env, rd), _compile(a[1], env, rd), op)
    if op == "call":
        name = a[0].lower()
        if name == "coalesce" and _is_bool_node(n):
            return F.coalesce(*[_compile_bool(x, env, rd) for x in a[1]])
        if name == "if" and _is_bool_node(n):
            return F.when(_compile_bool(a[1][0], env, rd), _compile_bool(a[1][1], env, rd)).otherwise(
                _compile_bool(a[1][2], env, rd)
            )
        if name in _BOOL_CALLS:
            col = _call(a[0], [_compile(x, env, rd) for x in a[1]], rd)
            return ebv(col)
    return ebv(_compile(n, env, rd))


def _compile(n: Node, env: dict[str, Column], rd: bool) -> Column:
    op = n.op
    a = n.args

    def c(i: int) -> Column:
        return _compile(a[i], env, rd)

    # boolean-valued nodes: compile natively, wrap once
    if op in ("or", "and", "not") or (op in ("=", "!=", "<", ">", "<=", ">=")):
        return bool_term(_compile_bool(n, env, rd))

    if op == "var":
        name = a[0]
        if name not in env:
            return _null_term()  # unbound variable → error/unbound
        return env[name]
    if op == "iri_const":
        return _mk_iri(F.lit(a[0]))
    if op == "lit_const":
        value, dt, lang = a
        if dt == XSD_STRING:
            dt = None
        return _mk_literal(F.lit(value), F.lit(dt) if dt else None, F.lit(lang) if lang else None)
    if op == "num_const":
        text, dt = a
        return _mk_literal(F.lit(text), F.lit(dt))
    if op == "bool_const":
        return _mk_literal(F.lit("true" if a[0] else "false"), F.lit(XSD + "boolean"))

    if op == "neg":
        t = c(0)
        return _num_term(-num(t), int_cond=t["dt"].isin(INTEGER_DTS))
    if op in ("+", "-", "*", "/"):
        # integer op integer stays xsd:integer (SPARQL operator mapping);
        # division always promotes to double
        t0, t1 = c(0), c(1)
        x, y = num(t0), num(t1)
        r = {"+": x + y, "-": x - y, "*": x * y, "/": x / y}[op]
        if op == "/":
            return _num_term(r)
        both_int = t0["dt"].isin(INTEGER_DTS) & t1["dt"].isin(INTEGER_DTS)
        return _num_term(r, int_cond=both_int)
    if op == "call":
        return _call(a[0], [(_compile(x, env, rd)) for x in a[1]], rd)
    raise ExprError(f"unknown op {op}")


import threading as _threading

_NOW_TLS = _threading.local()  # per-thread pin stack: concurrent driver
# threads compiling different queries must not share an execution instant


def _now_stack() -> list[str]:
    if not hasattr(_NOW_TLS, "stack"):
        _NOW_TLS.stack = []
    return _NOW_TLS.stack


def _fresh_now() -> str:
    pin = os.environ.get("SOPSPARK_NOW")
    if pin is None:
        pin = _dt.datetime.now(_dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"
    return pin


def _now_pin() -> str:
    """The query-execution instant: the enclosing now_scope's pin, or a
    fresh instant for a bare expression compiled outside any scope."""
    stack = _now_stack()
    return stack[-1] if stack else _fresh_now()


class now_scope:
    """Context manager pinning ONE instant for every NOW() occurrence
    compiled inside it (SPARQL 17.4.5.1's single query-execution instant).
    Re-entrant: nested scopes inherit the outermost pin so a sub-expression
    compile inside a query never re-samples the clock. Thread-local."""

    def __enter__(self):
        stack = _now_stack()
        stack.append(stack[-1] if stack else _fresh_now())
        return self

    def __exit__(self, *exc):
        _now_stack().pop()
        return False


def _call(name: str, args: list[Column], rd: bool) -> Column:
    n = name.lower()
    if n == "coalesce":
        return F.coalesce(*args) if args else _null_term()
    if n == "bound":
        return bool_term(args[0].isNotNull())
    if n == "lang":
        # direction suffix ("en--ltr") is not part of LANG()'s answer
        t = args[0]
        tag = F.element_at(F.split(F.coalesce(t["lang"], F.lit("")), "--", 2), 1)
        return F.when(t["kind"] == LITERAL, _mk_literal(tag)).otherwise(_null_term())
    if n == "langdir":
        # SPARQL 1.2: base direction of a dirLangString, "" otherwise
        t = args[0]
        d = F.try_element_at(F.split(F.coalesce(t["lang"], F.lit("")), "--", 2), F.lit(2))
        return F.when(t["kind"] == LITERAL, _mk_literal(F.coalesce(d, F.lit("")))).otherwise(
            _null_term()
        )
    if n == "langmatches":
        # empty tag is not a valid RFC-4647 tag → evaluation *error*, which is
        # what makes the README's coalesce(langMatches(lang(?o),"en"), true)
        # keep untagged literals (README.md:59-63: untagged "Charlie" is kept)
        tag = _plain_string(args[0])
        rng = _plain_string(args[1])
        m = F.when(rng == "*", F.lit(True)).otherwise(
            (F.lower(tag) == F.lower(rng))
            | F.lower(tag).startswith(F.concat(F.lower(rng), F.lit("-")))
        )
        return bool_term(
            F.when(tag.isNull() | rng.isNull() | (tag == ""), F.lit(None).cast("boolean")).otherwise(m)
        )
    if n == "str":
        t = args[0]
        return F.when(
            t["kind"].isin(IRI, LITERAL), _mk_literal(t["value"])
        ).otherwise(_null_term())
    if n in ("iri", "uri"):
        t = args[0]
        ok = (t["kind"] == IRI) | ((t["kind"] == LITERAL) & t["dt"].isNull() & t["lang"].isNull())
        return F.when(ok, _mk_iri(t["value"])).otherwise(_null_term())
    if n == "datatype":
        t = args[0]
        lang_dt = F.when(
            t["lang"].contains("--"), F.lit(RDF_DIRLANGSTRING)
        ).otherwise(F.lit(RDF_LANGSTRING))
        return F.when(
            t["kind"] == LITERAL,
            _mk_iri(
                F.when(t["lang"].isNotNull(), lang_dt).otherwise(
                    F.coalesce(t["dt"], F.lit(XSD_STRING))
                )
            ),
        ).otherwise(_null_term())
    if n in ("isiri", "isuri"):
        return bool_term(args[0]["kind"] == IRI)
    if n == "istriple":
        from sopspark.terms import QUOTED

        return bool_term(args[0]["kind"] == QUOTED)
    if n == "triple":
        # TRIPLE(s, p, o) → a quoted-triple term (SPARQL-star 17.4.2.8):
        # canonical NT encoding, matching the parsers' QUOTED convention
        from sopspark.terms import QUOTED, nt_term

        enc = F.concat(
            F.lit("<< "), nt_term(args[0]), F.lit(" "), nt_term(args[1]),
            F.lit(" "), nt_term(args[2]), F.lit(" >>"),
        )
        return F.struct(
            F.lit(QUOTED).cast("tinyint").alias("kind"),
            enc.alias("value"),
            F.lit(None).cast("string").alias("dt"),
            F.lit(None).cast("string").alias("lang"),
        )
    if n in ("subject", "predicate", "object"):
        # SUBJECT/PREDICATE/OBJECT(t) destructure a quoted-triple term
        # (SPARQL-star 17.4.2.9-11) — same depth-bounded regex machinery as
        # << ?s ?p ?o >> patterns; non-triple input → error (NULL)
        from sopspark.functions.sparql import _decode_nt_term, _nt_term_re
        from sopspark.terms import QUOTED

        tre = _nt_term_re()
        pat = f"^<< ({tre}) ({tre}) ({tre}) >>$"
        grp = {"subject": 1, "predicate": 2, "object": 3}[n]
        part = F.regexp_extract(args[0]["value"], pat, grp)
        return F.when(
            (args[0]["kind"] == QUOTED) & (part != ""), _decode_nt_term(part)
        )
    if n == "isblank":
        return bool_term(args[0]["kind"] == BNODE)
    if n == "isliteral":
        return bool_term(args[0]["kind"] == LITERAL)
    if n == "isnumeric":
        return bool_term(is_numeric_term(args[0]))
    if n in ("lcase", "ucase"):
        t = args[0]
        fn = F.lower if n == "lcase" else F.upper
        return F.when(
            t["kind"] == LITERAL, _mk_literal(fn(t["value"]), t["dt"], t["lang"])
        ).otherwise(_null_term())
    if n == "strlen":
        return _num_term(F.length(_plain_string(args[0])).cast("double"), integer=True)
    if n == "contains":
        return bool_term(F.contains(_plain_string(args[0]), _plain_string(args[1])))
    if n == "strstarts":
        return bool_term(F.startswith(_plain_string(args[0]), _plain_string(args[1])))
    if n == "strends":
        return bool_term(F.endswith(_plain_string(args[0]), _plain_string(args[1])))
    if n == "substr":
        t = args[0]
        start = num(args[1]).cast("int")
        if len(args) > 2:
            length = num(args[2]).cast("int")
            v = F.substring(t["value"], start, length)
        else:
            v = F.substring(t["value"], start, F.lit(2147483647))
        return F.when(t["kind"] == LITERAL, _mk_literal(v, t["dt"], t["lang"])).otherwise(_null_term())
    if n == "concat":
        vals = [_plain_string(x) for x in args]
        return _mk_literal(F.concat(*vals))
    if n == "replace":
        v = _plain_string(args[0])
        pat = _plain_string(args[1])
        rep = _plain_string(args[2])
        # pattern must be a literal for regexp_replace's Column form pre-3.0;
        # Spark ≥3 accepts Columns.
        return _mk_literal(F.regexp_replace(v, pat, rep))
    if n == "regex":
        v = _plain_string(args[0])
        pat = _plain_string(args[1])
        if len(args) > 2:
            flags = _plain_string(args[2])
            pat = F.concat(F.lit("(?"), flags, F.lit(")"), pat)
        return bool_term(v.rlike(pat) if isinstance(pat, str) else F.regexp(v, pat))
    if n == "abs":
        return _num_term(F.abs(num(args[0])))
    if n == "round":
        return _num_term(F.round(num(args[0]), 0))
    if n == "ceil":
        return _num_term(F.ceil(num(args[0])).cast("double"))
    if n == "floor":
        return _num_term(F.floor(num(args[0])).cast("double"))
    if n == "strbefore":
        v, sep = _plain_string(args[0]), _plain_string(args[1])
        idx = F.instr(v, sep)
        return _mk_literal(F.when(idx > 0, F.substring(v, 1, idx - 1)).otherwise(F.lit("")))
    if n == "strafter":
        v, sep = _plain_string(args[0]), _plain_string(args[1])
        idx = F.instr(v, sep)
        return _mk_literal(
            F.when(idx > 0, F.substr(v, idx + F.length(sep), F.length(v))).otherwise(F.lit(""))
        )
    if n == "sameterm":
        a, b = args[0], args[1]
        ident = (
            (a["kind"] == b["kind"])
            & (a["value"] == b["value"])
            & a["dt"].eqNullSafe(b["dt"])
            & a["lang"].eqNullSafe(b["lang"])
        )
        return bool_term(ident)
    if n == "if":
        return F.when(ebv(args[0]), args[1]).otherwise(args[2])
    if n == "strdt":
        return _mk_literal(_plain_string(args[0]), args[1]["value"])
    if n == "strlang":
        return _mk_literal(_plain_string(args[0]), None, _plain_string(args[1]))
    if n == "strlangdir":
        # SPARQL 1.2: dirLangString constructor — tag preserved as given
        # (matching STRLANG), direction must be exactly lowercase
        # "ltr"/"rtl"; anything else is an evaluation error (NULL → row
        # dropped / unbound)
        d = _plain_string(args[2])
        tag = F.when(
            d.isin("ltr", "rtl"),
            F.concat(_plain_string(args[1]), F.lit("--"), d),
        )
        return F.when(tag.isNotNull(), _mk_literal(_plain_string(args[0]), None, tag)).otherwise(
            _null_term()
        )
    if n == "haslang":
        # SPARQL 1.2: literal with a (possibly directional) language tag;
        # an unbound/error argument propagates the error (NULL), it does
        # not evaluate to false
        t = args[0]
        return F.when(
            t.isNotNull(),
            bool_term((t["kind"] == LITERAL) & (F.coalesce(t["lang"], F.lit("")) != "")),
        ).otherwise(_null_term())
    if n == "haslangdir":
        # SPARQL 1.2: literal whose language tag carries a base direction
        t = args[0]
        return F.when(
            t.isNotNull(),
            bool_term(
                (t["kind"] == LITERAL)
                & F.coalesce(t["lang"], F.lit("")).contains("--")
            ),
        ).otherwise(_null_term())
    if n in ("md5", "sha1", "sha256", "sha384", "sha512"):
        s = _plain_string(args[0])
        if n == "md5":
            h = F.md5(s)
        elif n == "sha1":
            h = F.sha1(s)
        else:
            h = F.sha2(s, int(n[3:]))
        return _mk_literal(h)
    if n == "encode_for_uri":
        # url_encode is form-encoding (space → '+'); SPARQL wants RFC 3986
        return _mk_literal(F.regexp_replace(F.url_encode(_plain_string(args[0])), r"\+", "%20"))
    if n in ("year", "month", "day", "hours", "minutes", "seconds"):
        # fn:*-from-dateTime operate on the literal's OWN lexical
        # components (its own timezone's wall clock) — converting through
        # to_timestamp would re-express the instant in the SESSION zone
        # and shift every component (HOURS("...T14:45:13-05:00") must be
        # 14, not the session-zone hour; DAY can even cross midnight).
        # Extract from the lexical form directly; malformed / non-dateTime
        # input extracts "" → NULL → error term.
        is_dt = (args[0]["kind"] == LITERAL) & (args[0]["dt"] == XSD + "dateTime")
        lex = F.when(is_dt, args[0]["value"])
        pattern = {
            "year": r"^(-?\d{4,})-\d{2}-\d{2}T",
            "month": r"^-?\d{4,}-(\d{2})-\d{2}T",
            "day": r"^-?\d{4,}-\d{2}-(\d{2})T",
            "hours": r"T(\d{2}):\d{2}:\d{2}",
            "minutes": r"T\d{2}:(\d{2}):\d{2}",
            "seconds": r"T\d{2}:\d{2}:(\d{2}(?:\.\d+)?)",
        }[n]
        raw = F.regexp_extract(lex, pattern, 1)
        raw = F.when(raw != "", raw)
        if n == "seconds":
            # xsd:decimal seconds including the fraction
            return _num_term(raw.cast("double"))
        return _num_term(raw.cast("double"), integer=True)
    if n in ("tz", "timezone"):
        lex = F.when((args[0]["kind"] == LITERAL) & (args[0]["dt"] == XSD + "dateTime"), args[0]["value"])
        return _mk_literal(F.coalesce(F.regexp_extract(lex, r"(Z|[+-]\d{2}:\d{2})$", 1), F.lit("")))
    if n == "bnode":
        if args:  # BNODE(str): deterministic label from the string
            lbl = F.concat(F.lit("eb"), F.substring(F.sha2(_plain_string(args[0]), 256), 1, 16))
        else:  # BNODE(): fresh per row
            lbl = F.concat(F.lit("eb"), F.monotonically_increasing_id().cast("string"))
        return F.struct(
            F.lit(BNODE).cast("tinyint").alias("kind"),
            lbl.alias("value"),
            F.lit(None).cast("string").alias("dt"),
            F.lit(None).cast("string").alias("lang"),
        )
    if n == "now":
        # SPARQL 17.4.5.1: NOW() is one fixed instant for the whole query
        # execution — pinned once per compilation scope (now_scope), so two
        # NOW() occurrences in one query can't straddle a millisecond.
        # SOPSPARK_NOW (xsd:dateTime text) overrides it for reproducible
        # runs/tests.
        return _mk_literal(F.lit(_now_pin()), F.lit(XSD + "dateTime"))
    if n in ("uuid", "struuid"):
        # Fresh value per row, RFC-4122 v4 shape. Derived from a 128-bit hash
        # of the per-row monotonic id + a salt, so runs are reproducible under
        # a fixed partitioning (documented divergence from true randomness;
        # the reference's uuid4 is unreproducible by design). Two UUID()
        # occurrences in one query share the per-row value.
        salt = os.environ.get("SOPSPARK_UUID_SEED", "0")
        hx = F.sha2(
            F.concat_ws(":", F.lit(salt), F.monotonically_increasing_id().cast("string")), 256
        )
        u = F.concat(
            F.substring(hx, 1, 8), F.lit("-"),
            F.substring(hx, 9, 4), F.lit("-4"),
            F.substring(hx, 14, 3), F.lit("-8"),
            F.substring(hx, 18, 3), F.lit("-"),
            F.substring(hx, 21, 12),
        )
        if n == "uuid":
            return _mk_iri(F.concat(F.lit("urn:uuid:"), u))
        return _mk_literal(u)
    if n == "rand":
        # xsd:double in [0,1); seeded (SOPSPARK_RAND_SEED, default 42) so the
        # same job re-run over the same partitioning reproduces its output.
        return _num_term(F.rand(int(os.environ.get("SOPSPARK_RAND_SEED", "42"))))
    raise ExprError(f"unsupported function {name}()")


# ---------------------------------------------------------------------------
# tokenizer + recursive-descent parser
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<iri><[^<>\s]*>)
  | (?P<var>\?\w+)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<langtag>@[A-Za-z]+(?:-[A-Za-z0-9]+)*(?:--[A-Za-z]+)?)
  | (?P<dtmark>\^\^)
  | (?P<number>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<op>\|\||&&|!=|<=|>=|[=<>!()+\-*/,;])
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m:
            raise ExprError(f"lex error at {src[pos:pos+30]!r}")
        pos = m.end()
        if m.lastgroup != "ws":
            toks.append((m.lastgroup, m.group(0)))
    return toks


class _P:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, v: str):
        k, t = self.next()
        if t != v:
            raise ExprError(f"expected {v!r}, got {t!r}")

    def expr(self) -> Node:
        n = self.and_()
        while self.peek()[1] == "||":
            self.next()
            n = Node("or", (n, self.and_()))
        return n

    def and_(self) -> Node:
        n = self.rel()
        while self.peek()[1] == "&&":
            self.next()
            n = Node("and", (n, self.rel()))
        return n

    def rel(self) -> Node:
        n = self.add()
        k, t = self.peek()
        if t in ("=", "!=", "<", ">", "<=", ">="):
            self.next()
            return Node(t, (n, self.add()))
        # IN / NOT IN (SPARQL 17.4.1.9-10) desugar per spec into =/|| and
        # !=/&& chains — no new compile logic, same error semantics
        if k == "name" and t.lower() == "in":
            self.next()
            return self._in_chain(n, negated=False)
        if k == "name" and t.lower() == "not":
            save = self.i
            self.next()
            k2, t2 = self.peek()
            if k2 == "name" and t2.lower() == "in":
                self.next()
                return self._in_chain(n, negated=True)
            self.i = save
        return n

    def _in_chain(self, lhs: Node, negated: bool) -> Node:
        self.expect("(")
        items: list[Node] = []
        if self.peek()[1] != ")":
            items.append(self.expr())
            while self.peek()[1] == ",":
                self.next()
                items.append(self.expr())
        self.expect(")")
        if not items:
            return Node("bool_const", (negated,))  # IN () = false, NOT IN () = true
        op, join = ("!=", "and") if negated else ("=", "or")
        out = Node(op, (lhs, items[0]))
        for it in items[1:]:
            out = Node(join, (out, Node(op, (lhs, it))))
        return out

    def add(self) -> Node:
        n = self.mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            n = Node(op, (n, self.mul()))
        return n

    def mul(self) -> Node:
        n = self.unary()
        while self.peek()[1] in ("*", "/"):
            op = self.next()[1]
            n = Node(op, (n, self.unary()))
        return n

    def unary(self) -> Node:
        k, t = self.peek()
        if t == "!":
            self.next()
            return Node("not", (self.unary(),))
        if t == "-":
            self.next()
            return Node("neg", (self.unary(),))
        if t == "+":
            self.next()
            return self.unary()
        return self.primary()

    def primary(self) -> Node:
        k, t = self.next()
        if t == "(":
            n = self.expr()
            self.expect(")")
            return n
        if k == "iri":
            return Node("iri_const", (t[1:-1],))
        if k == "var":
            return Node("var", (t[1:],))
        if k == "number":
            if re.search(r"[.eE]", t):
                dt = XSD + ("double" if re.search(r"[eE]", t) else "decimal")
            else:
                dt = XSD + "integer"
            return Node("num_const", (t, dt))
        if k == "string":
            from sopspark.sources.ntriples import unescape_literal

            value = unescape_literal(t[1:-1])
            nk, nt_ = self.peek()
            if nk == "langtag":
                self.next()
                return Node("lit_const", (value, None, nt_[1:]))
            if nk == "dtmark":
                self.next()
                dk, dt_tok = self.next()
                if dk != "iri":
                    raise ExprError("datatype must be an IRI")
                return Node("lit_const", (value, dt_tok[1:-1], None))
            return Node("lit_const", (value, None, None))
        if k == "name":
            if t == "true":
                return Node("bool_const", (True,))
            if t == "false":
                return Node("bool_const", (False,))
            self.expect("(")
            if t.lower() == "count" and self.peek()[1] == "*":
                self.next()
                self.expect(")")
                return Node("call", (t, (Node("star", ()),)))
            distinct = False
            if t.lower() in AGG_FUNCS and self.peek()[0] == "name" and self.peek()[1].upper() == "DISTINCT":
                self.next()
                distinct = True
            args = []
            if self.peek()[1] not in (")", ";"):
                args.append(self.expr())
                while self.peek()[1] == ",":
                    self.next()
                    args.append(self.expr())
            if t.lower() == "group_concat" and self.peek()[1] == ";":
                # GROUP_CONCAT(expr; SEPARATOR="...") — the separator rides
                # along as a trailing lit_const argument
                self.next()
                k2, v2 = self.next()
                if k2 != "name" or v2.upper() != "SEPARATOR":
                    raise ExprError("expected SEPARATOR after ';'")
                self.expect("=")
                k3, v3 = self.next()
                if k3 != "string":
                    raise ExprError("SEPARATOR must be a string literal")
                args.append(Node("lit_const", (v3[1:-1], None, None)))
            self.expect(")")
            name = t + ("_distinct" if distinct else "")
            return Node("call", (name, tuple(args)))
        raise ExprError(f"unexpected token {t!r}")


def parse_expr(src: str) -> Node:
    p = _P(_tokenize(src))
    n = p.expr()
    if p.peek()[0] != "eof":
        raise ExprError(f"trailing tokens at {p.peek()[1]!r}")
    return n


def compile_expr(
    src: str,
    env: dict[str, Column] | None = None,
    recognize_datatypes: bool = True,
) -> Column:
    """Compile a SPARQL expression string to a TERM-struct Column.

    ``env`` maps variable names to term columns; default binds
    ``?s ?p ?o ?g`` to the like-named quad columns, matching the reference's
    binding rule (``README.md:199-201``).
    """
    if env is None:
        env = {v: F.col(v) for v in ("s", "p", "o", "g")}
    with now_scope():
        return parse_expr(src).col(env, recognize_datatypes)


def compile_filter(src: str, env: dict[str, Column] | None = None, recognize_datatypes: bool = True) -> Column:
    """Compile to a boolean Column with EBV + drop-on-error semantics
    (NULL → false, matching ``src/filter.rs:36``). Boolean-valued nodes
    compile natively (no TERM-struct round trip) — keeps the Catalyst tree
    small enough for whole-stage codegen."""
    if env is None:
        env = {v: F.col(v) for v in ("s", "p", "o", "g")}
    node = parse_expr(src)
    # no coalesce(..., false) wrapper: WHERE treats NULL (SPARQL error) as
    # false anyway, and a bare conjunction stays pushdown-translatable
    with now_scope():
        return _compile_bool(node, env, recognize_datatypes)
