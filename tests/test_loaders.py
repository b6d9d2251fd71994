"""HTTP document loader + Link-header parsing (network-mocked).

parse_link_header goldens were produced by running the reference's
lib/util.js parseLinkHeader directly under node (2026-08-17); the
loader scenarios mirror lib/documentLoaders/node.js:34-189.
"""
from __future__ import annotations

import json

import pytest

from jsonld_js_spark.kernel import (
    ContextResolver, JsonLdError, as_context_loader, build_headers, expand,
    http_document_loader, jsonld_get, parse_link_header,
)

CTX_REL = "http://www.w3.org/ns/json-ld#context"


# --- parse_link_header (ref lib/util.js:122-146) --------------------------

def test_parse_link_header_single():
    h = ('<http://json-ld.org/contexts/person.jsonld>; '
         'rel="http://www.w3.org/ns/json-ld#context"; '
         'type="application/ld+json"')
    assert parse_link_header(h) == {CTX_REL: {
        "target": "http://json-ld.org/contexts/person.jsonld",
        "rel": CTX_REL, "type": "application/ld+json"}}


def test_parse_link_header_repeated_rel_becomes_list():
    h = ('<http://a/c1>; rel="http://www.w3.org/ns/json-ld#context", '
         '<http://a/c2>; rel="http://www.w3.org/ns/json-ld#context"')
    assert parse_link_header(h) == {CTX_REL: [
        {"target": "http://a/c1", "rel": CTX_REL},
        {"target": "http://a/c2", "rel": CTX_REL}]}


def test_parse_link_header_mixed_and_quoted_comma():
    h = ('<http://a/alt>; rel="alternate"; type="application/ld+json", '
         '<http://a/x>; rel="describedby"')
    assert parse_link_header(h) == {
        "alternate": {"target": "http://a/alt", "rel": "alternate",
                      "type": "application/ld+json"},
        "describedby": {"target": "http://a/x", "rel": "describedby"}}
    h2 = '<http://a/q>; rel="next"; title="has, comma"'
    assert parse_link_header(h2) == {"next": {
        "target": "http://a/q", "rel": "next", "title": "has, comma"}}


def test_parse_link_header_bare_and_unquoted():
    assert parse_link_header("<http://a/b>") == {"": {"target": "http://a/b"}}
    assert parse_link_header('<http://a/b>; rel=unquoted; type="t"') == {
        "unquoted": {"target": "http://a/b", "rel": "unquoted", "type": "t"}}


def test_build_headers_rejects_accept():
    assert build_headers()["Accept"].startswith("application/ld+json")
    with pytest.raises(ValueError):
        build_headers({"accept": "text/html"})


# --- loader (ref lib/documentLoaders/node.js:34-189) ----------------------

def _server(routes):
    """routes: url -> (status, headers, body). Unknown URL -> 404."""
    def fetch(url, headers):
        assert headers["Accept"].startswith("application/ld+json")
        return routes.get(url, (404, {}, None))
    return fetch


PERSON_CTX = {"@context": {"name": "http://xmlns.com/foaf/0.1/name"}}


def test_loader_plain_document():
    load = http_document_loader(fetch=_server({
        "http://e.com/doc": (200, {"content-type": "application/ld+json"},
                             json.dumps(PERSON_CTX))}))
    doc = load("http://e.com/doc")
    assert doc["documentUrl"] == "http://e.com/doc"
    assert doc["contextUrl"] is None
    assert json.loads(doc["document"]) == PERSON_CTX


def test_loader_context_link_header():
    link = f'<http://e.com/ctx>; rel="{CTX_REL}"'
    load = http_document_loader(fetch=_server({
        "http://e.com/data": (200, {"content-type": "application/json",
                                    "link": link},
                              json.dumps({"name": "Alice"}))}))
    doc = load("http://e.com/data")
    assert doc["contextUrl"] == "http://e.com/ctx"


def test_loader_link_header_ignored_for_ld_json():
    """A context Link header on an application/ld+json response is NOT
    honored (ref node.js:103)."""
    link = f'<http://e.com/ctx>; rel="{CTX_REL}"'
    load = http_document_loader(fetch=_server({
        "http://e.com/data": (200, {"content-type": "application/ld+json",
                                    "link": link}, "{}")}))
    assert load("http://e.com/data")["contextUrl"] is None


def test_loader_multiple_context_links_error():
    link = f'<http://e.com/c1>; rel="{CTX_REL}", <http://e.com/c2>; rel="{CTX_REL}"'
    load = http_document_loader(fetch=_server({
        "http://e.com/data": (200, {"content-type": "application/json",
                                    "link": link}, "{}")}))
    with pytest.raises(JsonLdError) as e:
        load("http://e.com/data")
    assert e.value.code == "multiple context link headers"


def test_loader_alternate_link_redirect():
    """text/html with an alternate application/ld+json link redirects
    (relative target resolved against the URL, ref node.js:117-124)."""
    link = '<alt.jsonld>; rel="alternate"; type="application/ld+json"'
    load = http_document_loader(fetch=_server({
        "http://e.com/page": (200, {"content-type": "text/html",
                                    "link": link}, "<html/>"),
        "http://e.com/alt.jsonld": (
            200, {"content-type": "application/ld+json"},
            json.dumps(PERSON_CTX))}))
    doc = load("http://e.com/page")
    assert doc["documentUrl"] == "http://e.com/alt.jsonld"
    assert json.loads(doc["document"]) == PERSON_CTX


def test_loader_redirect_and_loop_detection():
    load = http_document_loader(fetch=_server({
        "http://e.com/a": (301, {"location": "http://e.com/b"}, None),
        "http://e.com/b": (200, {"content-type": "application/ld+json"},
                           "{}")}))
    assert load("http://e.com/a")["documentUrl"] == "http://e.com/b"

    loop = http_document_loader(fetch=_server({
        "http://e.com/a": (302, {"location": "http://e.com/b"}, None),
        "http://e.com/b": (302, {"location": "http://e.com/a"}, None)}))
    with pytest.raises(JsonLdError) as e:
        loop("http://e.com/a")
    assert e.value.code == "recursive context inclusion"

    capped = http_document_loader(max_redirects=0, fetch=_server({
        "http://e.com/a": (301, {"location": "http://e.com/b"}, None)}))
    with pytest.raises(JsonLdError):
        capped("http://e.com/a")


def test_loader_secure_mode_and_bad_scheme():
    load = http_document_loader(secure=True, fetch=_server({}))
    with pytest.raises(JsonLdError):
        load("http://insecure.com/x")
    with pytest.raises(JsonLdError):
        load("ftp://e.com/x")


def test_loader_http_error_status():
    load = http_document_loader(fetch=_server({}))
    with pytest.raises(JsonLdError) as e:
        load("http://e.com/missing")
    assert e.value.code == "loading document failed"


def test_jsonld_get_parses_body():
    load = http_document_loader(fetch=_server({
        "http://e.com/doc": (200, {"content-type": "application/ld+json"},
                             json.dumps(PERSON_CTX))}))
    remote = jsonld_get("http://e.com/doc", {"documentLoader": load})
    assert remote["document"] == PERSON_CTX


def test_expand_through_http_loader():
    """End-to-end: remote @context fetched through the HTTP loader
    behind ContextResolver, including a context Link header hop."""
    link = f'<http://e.com/ctx.jsonld>; rel="{CTX_REL}"'
    load = http_document_loader(fetch=_server({
        "http://e.com/ctx.jsonld": (
            200, {"content-type": "application/ld+json"},
            json.dumps(PERSON_CTX)),
        "http://e.com/linked": (
            200, {"content-type": "application/json", "link": link},
            json.dumps({})),
    }))
    resolver = ContextResolver(loader=as_context_loader(load))
    doc = {"@context": "http://e.com/ctx.jsonld",
           "@id": "http://e.com/me", "name": "Alice"}
    out = expand(doc, {"contextResolver": resolver})
    assert out == [{"@id": "http://e.com/me",
                    "http://xmlns.com/foaf/0.1/name": [{"@value": "Alice"}]}]
    # Link-header context: the document's @context gains the linked URL
    # (ref lib/ContextResolver.js:195-206)
    doc2 = {"@context": "http://e.com/linked",
            "@id": "http://e.com/me", "name": "Bob"}
    out2 = expand(doc2, {"contextResolver": resolver})
    assert out2 == [{"@id": "http://e.com/me",
                     "http://xmlns.com/foaf/0.1/name": [{"@value": "Bob"}]}]


# --- RDF parser registry (ref lib/jsonld.js:988-1015) ---------------------

def test_rdf_parser_registry():
    from jsonld_js_spark.kernel import (
        from_rdf, register_rdf_parser, unregister_rdf_parser,
    )
    # string defaults to N-Quads
    doc = from_rdf('<http://e.com/s> <http://e.com/p> "v" .\n')
    assert doc == [{"@id": "http://e.com/s",
                    "http://e.com/p": [{"@value": "v"}]}]

    # custom content-type: a TSV parser producing quad tuples
    def tsv_parser(text):
        out = []
        for line in text.strip().split("\n"):
            s, p, v = line.split("\t")
            out.append((s, p, v, "Literal",
                        "http://www.w3.org/2001/XMLSchema#string",
                        None, ""))
        return out

    register_rdf_parser("text/tab-separated-values", tsv_parser)
    try:
        doc2 = from_rdf("http://e.com/s\thttp://e.com/p\tv",
                        {"format": "text/tab-separated-values"})
        assert doc2 == doc
    finally:
        unregister_rdf_parser("text/tab-separated-values")

    with pytest.raises(JsonLdError) as e:
        from_rdf("x", {"format": "text/unknown"})
    assert e.value.code == "unknown format"
