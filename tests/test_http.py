"""HTTP/URL source + JSON-LD remote-context loader, against a local test
server (mirrors src/parse.rs:239-266 Accept/content-type behavior and
src/parse.rs:412-448 FsLoader DIR/ITEM -> https://ITEM/ mounting)."""

import http.server
import io
import json
import threading
from contextlib import redirect_stdout

import pytest

from sopspark.sources.http import HttpSourceError, fetch_url, parse_url
from sopspark.sources.jsonld import ContextLoader, JsonLdError, parse_jsonld_text

NT_BODY = b'<http://e/s> <http://e/p> <http://e/o> .\n'
TTL_BODY = b'@prefix ex: <http://ex/> .\n<#frag> ex:p ex:o .\n'
CTX_BODY = json.dumps({"@context": {"nm": "http://xmlns.com/foaf/0.1/name"}}).encode()

ROUTES = {
    "/data": ("application/n-triples", NT_BODY),
    "/data.bin": ("application/octet-stream", NT_BODY),
    "/graph.ttl": ("text/turtle; charset=utf-8", TTL_BODY),
    "/ctx.jsonld": ("application/ld+json", CTX_BODY),
}


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):
        route = ROUTES.get(self.path)
        if route is None:
            self.send_error(404)
            return
        ctype, body = route
        self.server.last_accept = self.headers.get("accept")
        self.send_response(200)
        self.send_header("content-type", ctype)
        self.send_header("content-length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", srv
    srv.shutdown()


def test_fetch_sniffs_content_type(server):
    url, srv = server
    path, fmt = fetch_url(f"{url}/data")
    assert fmt == "nt" and open(path, "rb").read() == NT_BODY
    assert "application/n-quads" in srv.last_accept  # RDF Accept header sent


def test_fetch_explicit_format_wins(server):
    url, _ = server
    _, fmt = fetch_url(f"{url}/data.bin", fmt="nq")
    assert fmt == "nq"


def test_fetch_unguessable_format_errors(server):
    url, _ = server
    with pytest.raises(HttpSourceError, match="cannot guess format"):
        fetch_url(f"{url}/data.bin")


def test_fetch_http_error(server):
    url, _ = server
    with pytest.raises(HttpSourceError):
        fetch_url(f"{url}/missing")


def test_parse_url_nt(spark, server):
    url, _ = server
    rows = parse_url(spark, f"{url}/data").collect()
    assert len(rows) == 1 and rows[0].s.value == "http://e/s"


def test_parse_url_turtle_base_is_url(spark, server):
    # base defaults to the URL itself (src/parse.rs:243-246): <#frag>
    # resolves against the fetched URL
    url, _ = server
    rows = parse_url(spark, f"{url}/graph.ttl").collect()
    assert rows[0].s.value == f"{url}/graph.ttl#frag"


def test_cli_parse_url(spark, server):
    from sopspark.cli import run_pipeline_cli

    url, _ = server
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = run_pipeline_cli(["parse", f"{url}/data", "!", "serialize"], spark=spark)
    assert rc == 0
    assert buf.getvalue().strip() == "<http://e/s> <http://e/p> <http://e/o> ."


# --- context loader ---------------------------------------------------------

DOC = json.dumps(
    {
        "@context": "https://ctx.example.org/person.jsonld",
        "@id": "http://e/alice",
        "nm": "Alice",
    }
)


def _cache_dir(tmp_path):
    d = tmp_path / "cache" / "ctx.example.org"
    d.mkdir(parents=True)
    (d / "person.jsonld").write_bytes(CTX_BODY)
    # plain-file mount: https://flat.example/ -> the file itself
    (tmp_path / "cache" / "flat.example").write_bytes(CTX_BODY)
    return str(tmp_path / "cache")


def test_context_loader_local_dir(tmp_path):
    loader = ContextLoader(_cache_dir(tmp_path))
    quads = parse_jsonld_text(DOC, loader=loader)
    assert quads == [
        (
            (0, "http://e/alice", None, None),
            (0, "http://xmlns.com/foaf/0.1/name", None, None),
            (2, "Alice", None, None),
            None,
        )
    ]


def test_context_loader_flat_file_mount(tmp_path):
    loader = ContextLoader(_cache_dir(tmp_path))
    doc = json.dumps(
        {"@context": "https://flat.example/", "@id": "http://e/b", "nm": "B"}
    )
    quads = parse_jsonld_text(doc, loader=loader)
    assert quads[0][1][1] == "http://xmlns.com/foaf/0.1/name"


def test_context_loader_unknown_without_u(tmp_path):
    loader = ContextLoader(_cache_dir(tmp_path))
    doc = json.dumps({"@context": "https://nowhere.example/x", "@id": "http://e/a", "nm": "A"})
    with pytest.raises(JsonLdError, match="unknown remote context"):
        parse_jsonld_text(doc, loader=loader)


def test_context_loader_url_fetch(server):
    url, _ = server
    loader = ContextLoader(None, allow_urls=True)
    doc = json.dumps({"@context": f"{url}/ctx.jsonld", "@id": "http://e/a", "nm": "A"})
    quads = parse_jsonld_text(doc, loader=loader)
    assert quads[0][1][1] == "http://xmlns.com/foaf/0.1/name"


def test_no_loader_rejects_remote_context():
    with pytest.raises(JsonLdError, match="no context loader"):
        parse_jsonld_text(DOC)


def test_cli_jsonld_with_loader(spark, tmp_path, server):
    from sopspark.cli import run_pipeline_cli

    cache = _cache_dir(tmp_path)
    doc_path = tmp_path / "doc.jsonld"
    doc_path.write_text(DOC)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = run_pipeline_cli(["parse", str(doc_path), "-l", cache, "!", "serialize"], spark=spark)
    assert rc == 0
    assert '"Alice"' in buf.getvalue()


def test_cli_parse_multiple_with_url(server, spark, capsys, tmp_path):
    """parse -m mixing a file glob and a URL (files_or_url.rs:45-66): the
    URL fetches driver-side, parses distributed, and both sources get the
    per-source bnode suffix."""
    from sopspark.cli import run_pipeline_cli

    url, _srv = server
    f = tmp_path / "local.nt"
    f.write_text("_:a <http://e/p> <http://e/from-file> .\n")
    rc = run_pipeline_cli(
        ["parse", "-m", str(f), f"{url}/data", "m-"], spark=spark
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    assert "<http://e/s> <http://e/p> <http://e/o> ." in out
    # file bnode got a per-source suffix
    bn = [l for l in out if l.startswith("_:a_")]
    assert len(bn) == 1 and "<http://e/from-file>" in bn[0]
    # bare -g names each source's graph: the URL's quads carry the URL IRI
    rc2 = run_pipeline_cli(
        ["parse", "-g", "-m", str(f), f"{url}/data", "m-"], spark=spark
    )
    out2 = capsys.readouterr().out.strip().splitlines()
    assert rc2 == 0
    assert any(l.endswith(f"<{url}/data> .") for l in out2)
