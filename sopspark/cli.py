"""Pipeline CLI — the reference's ``sop`` command-line surface on Spark.

``python -m sopspark parse FILE ! filter EXPR ! serialize -f nq -o OUT``

Mirrors the reference's pipeline concept (``README.md:115-135``): stages
separated by ``!``, each stage a subcommand; the pipeline is built lazily
left-to-right as one Catalyst plan and executed by the terminal sink —
exactly the reference's pull-based chain (``src/main.rs:84-99``), with
Catalyst in place of the Rust iterator fusion.

Subcommands + aliases follow the reference (``README.md:252-263``):
parse/p, serialize/s, filter/f, map/ma, merge/me, query/q,
canonicalize/c14n/c, null/n/Z, absolutize, relativize, dispatch.

stdin ("-"; also the default with no FILE) is parsed as generalized
N-Quads like the reference's wire format (``src/main.rs:122-126``); a bare
``serialize`` with no ``-o`` prints N-Quads to stdout.
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import DataFrame


def _split_stages(argv: list[str]) -> list[list[str]]:
    stages: list[list[str]] = [[]]
    for a in argv:
        if a == "!":
            stages.append([])
        else:
            stages[-1].append(a)
    return [s for s in stages if s]


ALIASES = {
    "p": "parse",
    "s": "serialize",
    "f": "filter",
    "ma": "map",
    "me": "merge",
    "q": "query",
    "c14n": "canonicalize",
    "c": "canonicalize",
    "n": "null",
    "Z": "null",
}


def _stage_parser(name: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=name, add_help=False)
    if name == "parse":
        p.add_argument("file", nargs="?", default="-")
        p.add_argument("-f", "--format", default=None)
        p.add_argument("-b", "--base", default=None)
        # -g is flag-only like the reference (parse.rs:79-80): name the
        # default graph after the source IRI. A value-taking -g before the
        # positional file would swallow the filename (`parse -g f.nt` →
        # graph=f.nt, file=stdin, blocked read); the explicit-IRI
        # convenience lives on -G/--graph-iri instead.
        p.add_argument("-g", "--named-graph", dest="graph", action="store_true", default=False)
        p.add_argument("-G", "--graph-iri", dest="graph_iri", default=None)
        p.add_argument("-m", "--multiple", nargs="*", default=None)
        # relativize parsed IRIs against the source IRI (parse.rs:86-91);
        # bare -r means parents=0
        p.add_argument("-r", "--relativize", nargs="?", const=0, type=int, default=None)
        # JSON-LD/YAML-LD remote contexts (src/parse.rs:102-121)
        p.add_argument("-l", "--loader-local", default=None, metavar="DIR")
        p.add_argument("-u", "--loader-urls", action="store_true")
    elif name == "filter":
        p.add_argument("expr")
        # reference default: no -d → term-identity equality (42 != "042");
        # -d opts into datatype-aware comparison (README.md:176-183)
        p.add_argument("-d", "--recognize-datatypes", action="store_true", default=False)
    elif name == "map":
        p.add_argument("-s", default=None)
        p.add_argument("-p", default=None)
        p.add_argument("-o", default=None)
        p.add_argument("-g", default=None)
    elif name == "merge":
        p.add_argument("--drop", action="store_true")
    elif name == "absolutize":
        p.add_argument("base")
    elif name == "relativize":
        p.add_argument("base")
        p.add_argument("-p", "--parents", type=int, default=0)
    elif name == "serialize":
        p.add_argument("-f", "--format", default="nq")
        p.add_argument("-o", "--output", default=None)
        p.add_argument("-c", "--canonical", action="store_true", default=True)
        # PREFIX:URI,... map for Turtle/TriG (src/serialize.rs:63-67)
        p.add_argument(
            "-p", "--prefixes", default=os.environ.get("SOP_PREFIXES"), metavar="MAP"
        )
        p.add_argument("-P", "--no-pretty", action="store_true")
    elif name == "canonicalize":
        p.add_argument("-o", "--output", default=None)
        p.add_argument("-f", "--c14n-function", default="rdfc-1.0")
        p.add_argument("-H", "--hash-function", default="sha256")
        p.add_argument("-p", "--poison-resistance", type=float, default=1.0)
    elif name == "query":
        p.add_argument("query", nargs="?", default=None)
        p.add_argument("-q", "--query-file", default=None)
        p.add_argument("-r", "--regime", default="simple")
        p.add_argument("-d", "--recognize-datatypes", action="store_true")
        p.add_argument("-H", "--no-header", action="store_true")
        p.add_argument("-s", "--status", action="store_true")
    elif name == "dispatch":
        p.add_argument("root")
        p.add_argument("-d", "--dest", default=".")
        p.add_argument("-f", "--format", default="nt")
        # reference defaults: don't overwrite existing files (dispatch.rs:52-54),
        # no per-file relativization (dispatch.rs:60-61)
        p.add_argument("-o", "--overwrite", action="store_true")
        p.add_argument("-r", "--relativize", action="store_true")
    elif name == "null":
        pass
    return p


def run_pipeline_cli(argv: list[str], spark=None) -> int:
    from sopspark.session import get_spark

    spark = spark or get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    stages = _split_stages(argv)
    if not stages:
        print("usage: python -m sopspark SUBCOMMAND [ARGS] [! SUBCOMMAND [ARGS]]...", file=sys.stderr)
        return 2

    df: DataFrame | None = None
    terminal = False
    for i, stage in enumerate(stages):
        name = ALIASES.get(stage[0], stage[0])
        args = _stage_parser(name).parse_args(stage[1:])
        if name == "parse":
            from sopspark.sources.ntriples import parse_ntriples
            from sopspark.sources.turtle import parse_turtle
            from sopspark.terms import iri_col

            loader = None
            if args.loader_local or args.loader_urls:
                from sopspark.sources.jsonld import ContextLoader

                loader = ContextLoader(args.loader_local, allow_urls=args.loader_urls)
            if args.multiple is not None:
                from pyspark.sql import functions as F

                from sopspark.sources.http import is_url, parse_url
                from sopspark.sources.ntriples import suffix_bnodes

                srcs = [a for a in args.multiple if a != "m-"]
                paths = [a for a in srcs if not is_url(a)]
                urls = [a for a in srcs if is_url(a)]
                # bare -g: each source's default graph gets the source IRI
                per_src = iri_col(F.col("src")) if args.graph else None
                parts = []
                if paths:
                    parts.append(
                        parse_ntriples(
                            spark, paths, scope_bnodes_per_file=True, default_graph_name=per_src
                        )
                    )
                # URL arguments inside -m (files_or_url.rs:45-66): each URL
                # fetches driver-side, parses distributed, and gets the same
                # per-source bnode suffix convention (sha2 of the SOURCE —
                # here the URL itself, so the suffix is retry-stable even
                # though the fetch lands in a fresh temp file)
                for u in urls:
                    udf = parse_url(spark, u, fmt=args.format, loader=loader)
                    udf = suffix_bnodes(udf, F.substring(F.sha2(F.lit(u), 256), 1, 12))
                    if args.graph:
                        udf = udf.withColumn(
                            "g",
                            F.when(
                                F.col("g").isNull() & F.col("err").isNull(), iri_col(F.lit(u))
                            ).otherwise(F.col("g")),
                        )
                    parts.append(udf)
                if not parts:
                    print("parse -m: no sources given", file=sys.stderr)
                    return 2
                df = parts[0]
                for extra in parts[1:]:
                    df = df.unionByName(extra)
            elif args.file.startswith(("http://", "https://")):
                from sopspark.sources.http import parse_url

                df = parse_url(spark, args.file, fmt=args.format, base=args.base, loader=loader)
            else:
                path = args.file
                if path == "-":
                    import tempfile

                    tmp = tempfile.NamedTemporaryFile("w", suffix=".nq", delete=False)
                    tmp.write(sys.stdin.read())
                    tmp.close()
                    path = tmp.name
                ext_fmt = {
                    ".ttl": "ttl", ".trig": "ttl",
                    ".ndjsonld": "ndjsonld",
                    ".jsonld": "jsonld", ".json": "jsonld",
                    ".yamlld": "yamlld", ".yaml": "yamlld", ".yml": "yamlld",
                    ".rdf": "rdf", ".xml": "rdf", ".owl": "rdf",
                }
                fmt = args.format or next(
                    (f for e, f in ext_fmt.items() if path.endswith(e)), "nq"
                )
                if fmt in ("ttl", "turtle", "trig", "text/turtle", "application/trig"):
                    df = parse_turtle(spark, path, base=args.base)
                elif fmt in ("ndjsonld", "ndjson-ld", "application/x-ndjson"):
                    from sopspark.sources.jsonld import parse_ndjsonld

                    df = parse_ndjsonld(spark, path, loader=loader)
                elif fmt in ("jsonld", "json", "application/ld+json"):
                    from sopspark.sources.jsonld import parse_jsonld

                    df = parse_jsonld(spark, path, loader=loader)
                elif fmt in ("yamlld", "yaml", "yml", "application/ld+yaml"):
                    from sopspark.sources.jsonld import parse_yamlld

                    df = parse_yamlld(spark, path, loader=loader)
                elif fmt in ("rdf", "xml", "rdfxml", "application/rdf+xml"):
                    from sopspark.sources.rdfxml import parse_rdfxml

                    df = parse_rdfxml(spark, path, base=args.base)
                else:
                    df = parse_ntriples(spark, path)
                    if args.base:
                        from sopspark.operators.transforms import absolutize

                        df = absolutize(df, args.base)
            src_iri = None
            if args.multiple is None:
                if args.file.startswith(("http://", "https://")):
                    src_iri = args.file
                elif args.file != "-":
                    src_iri = "file://" + os.path.abspath(args.file)
            if (args.graph or args.graph_iri) and args.multiple is None:
                from pyspark.sql import functions as F

                name = args.graph_iri if args.graph_iri else src_iri
                df = df.withColumn(
                    "g", F.when(F.col("g").isNull(), iri_col(name)).otherwise(F.col("g"))
                )
            if args.relativize is not None and src_iri:
                from sopspark.operators.transforms import relativize

                df = relativize(df, src_iri, parents=args.relativize)
        elif name == "filter":
            from sopspark.operators.filter_map import filter_quads

            df = filter_quads(df, args.expr, recognize_datatypes=args.recognize_datatypes)
        elif name == "map":
            from sopspark.operators.filter_map import map_quads

            df = map_quads(df, s=args.s, p=args.p, o=args.o, g=args.g)
        elif name == "merge":
            from sopspark.operators.transforms import merge

            df = merge(df, drop=args.drop)
        elif name == "absolutize":
            from sopspark.operators.transforms import absolutize

            df = absolutize(df, args.base)
        elif name == "relativize":
            from sopspark.operators.transforms import relativize

            df = relativize(df, args.base, parents=args.parents)
        elif name == "serialize":
            from sopspark.operators.serialize import (
                collect_nq_lines,
                serialize_nquads,
                serialize_turtle,
                to_turtle_blocks,
            )

            if args.format in ("nq.gz", "nt.gz", "ttl.gz", "gz"):
                # src/serialize.rs:148-152
                print(
                    "Compressed formats only supported for parsing. "
                    "Use an external tool to compress sop's output instead",
                    file=sys.stderr,
                )
                return 2
            triples_only = args.format in ("nt", "ntriples", "ttl", "turtle", "rdf", "xml", "rdfxml")
            if args.format in ("ndjsonld", "ndjson-ld"):
                # the DISTRIBUTED bulk JSON-LD sink (one node object per
                # line, parallel write) — beyond the reference's format
                # matrix, which only has the in-memory document form
                from sopspark.operators.serialize import (
                    serialize_ndjsonld,
                    to_jsonld_nodes,
                )

                if args.output:
                    serialize_ndjsonld(df, args.output)
                else:
                    # orderBy: stdout must be run-deterministic like every
                    # other serializer's stdout path (diff/golden-friendly)
                    for row in (
                        to_jsonld_nodes(df)
                        .orderBy("sort_key")
                        .select("block")
                        .toLocalIterator()
                    ):
                        print(row["block"])
            elif args.format in ("jsonld", "json", "yamlld", "yaml"):
                from sopspark.operators.serialize import (
                    collect_jsonld_text,
                    serialize_jsonld,
                    serialize_yamlld,
                )

                if args.format in ("yamlld", "yaml"):
                    if args.output:
                        serialize_yamlld(df, args.output)
                    else:
                        import json as _json

                        import yaml as _yaml

                        print(_yaml.safe_dump(_json.loads(collect_jsonld_text(df)), sort_keys=False), end="")
                elif args.output:
                    serialize_jsonld(df, args.output)
                else:
                    print(collect_jsonld_text(df))
            elif args.format in ("rdf", "xml", "rdfxml"):
                from sopspark.operators.serialize import serialize_rdfxml, to_rdfxml_blocks

                if args.output:
                    serialize_rdfxml(df, args.output)
                else:
                    print('<?xml version="1.0" encoding="utf-8"?>')
                    print('<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">')
                    # toLocalIterator: one partition in driver memory at a
                    # time — the stdout path stays bounded on huge graphs
                    for r in to_rdfxml_blocks(df).orderBy("sort_key").toLocalIterator():
                        print(r.block)
                    print("</rdf:RDF>")
            elif args.format in ("ttl", "turtle", "trig"):
                from sopspark.operators.serialize import (
                    DEFAULT_PREFIXES,
                    serialize_trig,
                    to_trig_blocks,
                )

                from sopspark.operators.serialize import (
                    parse_prefix_map,
                    to_turtle_plain_blocks,
                )

                prefixes = (
                    parse_prefix_map(args.prefixes) if args.prefixes else DEFAULT_PREFIXES
                )
                from sopspark.operators.serialize import to_trig_plain_blocks

                if args.format != "trig":
                    blocks_fn = to_turtle_plain_blocks if args.no_pretty else to_turtle_blocks
                else:
                    blocks_fn = to_trig_plain_blocks if args.no_pretty else to_trig_blocks
                write_fn = serialize_turtle if args.format != "trig" else serialize_trig
                if args.output:
                    # CLI -o mirrors the reference's single output stream;
                    # -P/--no-pretty applies to file sinks too (the
                    # reference's serializer options are sink-independent)
                    write_fn(
                        df, args.output, prefixes=prefixes, single_file=True,
                        pretty=not args.no_pretty,
                    )
                else:
                    for p_, ns in sorted(prefixes.items()):
                        print(f"@prefix {p_}: <{ns}> .")
                    for r in blocks_fn(df, prefixes).orderBy("sort_key").toLocalIterator():
                        print(r.block)
            elif args.output:
                serialize_nquads(df, args.output, triples_only=triples_only, single_file=True)
            else:
                from sopspark.operators.serialize import iter_nq_lines

                for line in iter_nq_lines(df, triples_only=triples_only):
                    print(line)
            terminal = i == len(stages) - 1
            # tee semantics: with more stages, the same df flows on
        elif name == "canonicalize":
            from sopspark.operators.canonicalize import canonicalize, parse_c14n_function

            try:
                parse_c14n_function(args.c14n_function)
            except ValueError as e:
                print(str(e), file=sys.stderr)
                return 2
            lines = canonicalize(df, hash_name=args.hash_function.replace("-", ""))
            if args.output:
                lines.coalesce(1).write.mode("overwrite").text(args.output + ".dir")
                import glob
                import shutil

                part = glob.glob(args.output + ".dir/part-*")[0]
                shutil.move(part, args.output)
                shutil.rmtree(args.output + ".dir")
            else:
                for r in lines.toLocalIterator():
                    print(r.line)
            terminal = True
        elif name == "query":
            from sopspark.functions.entailment import materialize_rdfs
            from sopspark.functions.sparql import bindings_to_quads, sparql_query
            from sopspark.terms import nt_term

            qtext = args.query
            if args.query_file:
                qtext = open(args.query_file).read()
            if qtext is None:
                print("query: missing query text (-q FILE or inline)", file=sys.stderr)
                return 2
            data = materialize_rdfs(df, args.regime) if args.regime != "simple" else df
            try:
                res = sparql_query(data, qtext, recognize_datatypes=args.recognize_datatypes)
            except Exception as e:
                from sopspark.functions.sparql import SparqlError
                from sopspark.functions.expr import ExprError

                if isinstance(e, (SparqlError, ExprError)):
                    print(f"query error: {e}", file=sys.stderr)
                    return 2
                raise
            if res.kind == "boolean":
                if args.status:
                    return 0 if res.value else 1
                print("true" if res.value else "false")
                terminal = True
            elif res.kind == "quads":
                df = res.df
            else:
                reentry = bindings_to_quads(res)
                if reentry is not None and i < len(stages) - 1:
                    df = reentry
                else:
                    from pyspark.sql import functions as F

                    from sopspark.terms import LITERAL

                    # reference pretty_print (src/query.rs:182-195):
                    # boolean/decimal/double/integer literals print their
                    # BARE lexical form; xsd:string keeps quotes (nt_term
                    # already omits its datatype); everything else full
                    # term syntax
                    _XSD = "http://www.w3.org/2001/XMLSchema#"
                    _BARE = [_XSD + x for x in ("boolean", "decimal", "double", "integer")]

                    def _pretty(t):
                        return F.when(
                            (t["kind"] == LITERAL) & t["dt"].isin(_BARE),
                            t["value"],
                        ).otherwise(nt_term(t))

                    out = res.df.select(
                        *[_pretty(F.col(v)).alias(v) for v in res.variables]
                    )
                    if not args.no_header:
                        print("\t".join("?" + v for v in res.variables))
                    # toLocalIterator: bounded driver memory for big SELECTs
                    for row in out.toLocalIterator():
                        print("\t".join(row[v] if row[v] is not None else "" for v in res.variables))
                    terminal = True
        elif name == "dispatch":
            from sopspark.operators.dispatch import dispatch

            df = dispatch(
                df, args.root, args.dest,
                overwrite=args.overwrite, relativize=args.relativize,
            )
        elif name == "null":
            from sopspark.operators.transforms import validate

            # toLocalIterator: a fully-corrupt input yields one err row per
            # line — stream them instead of materializing all on the driver
            had_err = False
            for e in validate(df).toLocalIterator():
                print(f"error: {e.err}", file=sys.stderr)
                had_err = True
            terminal = True
            if had_err:
                return 1
        else:
            print(f"unknown subcommand: {name}", file=sys.stderr)
            return 2

    if not terminal and df is not None:
        # default sink: N-Quads on stdout (src/common/quad_handler.rs:32-36),
        # streamed partition-by-partition — driver memory stays flat
        from sopspark.operators.serialize import iter_nq_lines

        for line in iter_nq_lines(df):
            print(line)
    return 0


def main() -> None:
    sys.exit(run_pipeline_cli(sys.argv[1:]))


if __name__ == "__main__":
    main()
