"""Driver-side HTTP document loader + Link-header parsing.

Behavioral reference: lib/documentLoaders/node.js:34-189 (loader:
secure mode, status handling, context/alternate Link headers, redirect
loop detection) and lib/util.js:88-146 (buildHeaders, parseLinkHeader).

This loader is DRIVER-ONLY by design (north_star "remote @context
documents are resolved once and broadcast as an immutable context
cache"): it plugs into ContextResolver's `loader=` contract via
`as_context_loader`, the processed active context is then frozen and
shipped to executors — executor code never touches the network. The
HTTP transport is injectable (`fetch=`) so tests run network-free.
"""
from __future__ import annotations

import json
import re
from typing import Callable, Optional

from .util import JsonLdError, prepend_base

LINK_HEADER_CONTEXT = "http://www.w3.org/ns/json-ld#context"
ACCEPT_HEADER = "application/ld+json, application/json"

# ref lib/util.js:13-16
_REGEX_LINK_HEADERS = re.compile(r'(?:<[^>]*?>|"[^"]*?"|[^,])+')
_REGEX_LINK_HEADER = re.compile(r'\s*<([^>]*?)>\s*(?:;\s*(.*))?')
_REGEX_LINK_HEADER_PARAMS = re.compile(
    r'(.*?)=(?:(?:"([^"]*?)")|([^"]*?))\s*(?:(?:;\s*)|$)')
_REGEX_JSON_CONTENT_TYPE = re.compile(r"^application/(\w*\+)?json$")


def build_headers(headers: Optional[dict] = None) -> dict:
    """Default request headers; a caller-supplied Accept is rejected
    (ref lib/util.js:88-102)."""
    headers = headers or {}
    if any(h.lower() == "accept" for h in headers):
        raise ValueError(
            'Accept header may not be specified; only "'
            + ACCEPT_HEADER + '" is supported.')
    return {"Accept": ACCEPT_HEADER, **headers}


def parse_link_header(header: str) -> dict:
    """Parse an HTTP Link header, keyed by "rel"; repeated rels become
    lists (ref lib/util.js:122-146)."""
    rval: dict = {}
    for entry in _REGEX_LINK_HEADERS.findall(header):
        m = _REGEX_LINK_HEADER.match(entry)
        if not m:
            continue
        result = {"target": m.group(1)}
        params = m.group(2) or ""
        for pm in _REGEX_LINK_HEADER_PARAMS.finditer(params):
            result[pm.group(1)] = pm.group(3) if pm.group(2) is None \
                else pm.group(2)
        rel = result.get("rel", "")
        if isinstance(rval.get(rel), list):
            rval[rel].append(result)
        elif rel in rval:
            rval[rel] = [rval[rel], result]
        else:
            rval[rel] = result
    return rval


def _urllib_fetch(url: str, headers: dict):
    """Default transport: stdlib urllib with MANUAL redirects (the
    loader implements redirect-loop/alternate-link logic itself, like
    the reference's `redirect: 'manual'`, lib/documentLoaders/
    node.js:166). Returns (status, lowercase-header dict, body|None)."""
    import urllib.error
    import urllib.request

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, *args, **kwargs):
            return None

    opener = urllib.request.build_opener(_NoRedirect)
    req = urllib.request.Request(url, headers=headers)
    try:
        with opener.open(req, timeout=30) as res:
            return (res.status,
                    {k.lower(): v for k, v in res.headers.items()},
                    res.read().decode("utf-8"))
    except urllib.error.HTTPError as e:
        hdrs = {k.lower(): v for k, v in (e.headers or {}).items()}
        body = None
        try:
            body = e.read().decode("utf-8")
        except Exception:
            pass
        return e.code, hdrs, body
    except Exception as e:
        raise JsonLdError(
            "URL could not be dereferenced, an error occurred.",
            "loading document failed") from e


def http_document_loader(*, secure: bool = False,
                         headers: Optional[dict] = None,
                         max_redirects: int = -1,
                         fetch: Optional[Callable] = None):
    """Build a document loader `load(url) -> remote doc dict`
    ({contextUrl, documentUrl, document}) with the reference's link
    header + redirect semantics (ref lib/documentLoaders/node.js:34-189).

    `fetch(url, headers) -> (status, headers_lower, body)` overrides
    the transport (tests inject an in-memory server)."""
    req_headers = build_headers(headers)
    do_fetch = fetch or _urllib_fetch

    def load_document(url: str, redirects: list) -> dict:
        is_http = url.startswith("http:")
        is_https = url.startswith("https:")
        if not is_http and not is_https:
            raise JsonLdError(
                'URL could not be dereferenced; only "http" and "https" '
                "URLs are supported.", "loading document failed")
        if secure and not is_https:
            raise JsonLdError(
                "URL could not be dereferenced; secure mode is enabled "
                'and the URL\'s scheme is not "https".',
                "loading document failed")

        status, res_headers, body = do_fetch(url, req_headers)
        doc = {"contextUrl": None, "documentUrl": url,
               "document": body or None}
        if status >= 400:
            raise JsonLdError(
                f'URL "{url}" could not be dereferenced: HTTP {status}',
                "loading document failed")

        link = res_headers.get("link")
        content_type = res_headers.get("content-type")
        location = res_headers.get("location")
        alternate = None
        if link and content_type != "application/ld+json":
            link_headers = parse_link_header(link)
            linked_context = link_headers.get(LINK_HEADER_CONTEXT)
            if isinstance(linked_context, list):
                raise JsonLdError(
                    "URL could not be dereferenced, it has more than one "
                    "associated HTTP Link Header.",
                    "multiple context link headers")
            if linked_context:
                doc["contextUrl"] = linked_context["target"]
            # "alternate" link header is a redirect
            # (ref lib/documentLoaders/node.js:117-124)
            alternate = link_headers.get("alternate")
            if (isinstance(alternate, dict) and
                    alternate.get("type") == "application/ld+json" and
                    not _REGEX_JSON_CONTENT_TYPE.match(content_type or "")):
                location = prepend_base(url, alternate["target"])

        if (alternate or 300 <= status < 400) and location:
            if len(redirects) == max_redirects:
                raise JsonLdError(
                    "URL could not be dereferenced; there were too many "
                    "redirects.", "loading document failed")
            if url in redirects:
                raise JsonLdError(
                    "URL could not be dereferenced; infinite redirection "
                    "was detected.", "recursive context inclusion")
            redirects.append(url)
            return load_document(location, redirects)
        return doc

    return lambda url: load_document(url, [])


def jsonld_get(url: str, options: Optional[dict] = None) -> dict:
    """jsonld.get analog (ref lib/jsonld.js:889-922): fetch a remote
    JSON-LD document, JSON-parsing a string body."""
    options = options or {}
    load = options.get("documentLoader") or http_document_loader()
    remote_doc = load(url)
    try:
        if not remote_doc.get("document"):
            raise JsonLdError("No remote document found at the given URL.",
                              "loading document failed")
        if isinstance(remote_doc["document"], str):
            remote_doc["document"] = json.loads(remote_doc["document"])
    except JsonLdError:
        raise
    except Exception as e:
        raise JsonLdError(
            "Could not retrieve a JSON-LD document from the URL.",
            "loading document failed") from e
    return remote_doc


def as_context_loader(load: Callable[[str], dict]) -> Callable[[str], dict]:
    """Adapt a remote-document loader to ContextResolver's
    `loader(url) -> parsed document` contract. When the response
    carried a context Link header, the linked context URL is appended
    to the document's @context (ref lib/ContextResolver.js:195-206)."""
    def loader(url: str):
        remote = jsonld_get(url, {"documentLoader": load})
        document = remote["document"]
        if remote.get("contextUrl"):
            if not isinstance(document, dict):
                document = {}
            ctx = document.get("@context", [])
            if not isinstance(ctx, list):
                ctx = [ctx]
            document = dict(document)
            document["@context"] = ctx + [remote["contextUrl"]]
        return document
    return loader
