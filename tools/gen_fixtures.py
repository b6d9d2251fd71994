"""Generate conformance fixtures by running the reference jsonld.js.

Runs each fixture input through the reference implementation at
/root/reference (via a dependency-shimmed node harness, see
tools/oracle_harness/) and commits the golden outputs under
tests/fixtures/. The committed fixtures are what tests consume — node
is only needed to (re)generate them.

Coverage follows FIXTURES.md §2: term/CURIE/relative-IRI expansion,
type coercion, @language/@direction, @list/@set, container maps,
@reverse, @nest, @json literals, @graph, literal canonicalization,
bnode relabeling, error cases.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARNESS = os.path.join(REPO, "tools", "oracle_harness")
FIXDIR = os.path.join(REPO, "tests", "fixtures")

XSD = "http://www.w3.org/2001/XMLSchema#"
EX = "http://example.com/"

# Each case: name, ops to capture, input doc, optional context (for
# flatten/compact), optional remote documents map, optional options.
CASES = [
    dict(
        name="term-basic",
        input={"@context": {"name": EX + "name", "age": EX + "age"},
               "@id": EX + "a", "name": "Alice", "age": 30},
    ),
    dict(
        name="vocab-and-curie",
        input={"@context": {"@vocab": EX, "foaf": "http://xmlns.com/foaf/0.1/",
                            "nick": "foaf:nick"},
               "@id": EX + "a", "plain": "v", "nick": "al",
               "foaf:knows": {"@id": EX + "b"}},
    ),
    dict(
        name="base-relative-iri",
        input={"@context": {"@base": "http://base.org/dir/", "@vocab": EX,
                            "link": {"@id": EX + "link", "@type": "@id"}},
               "@id": "doc1", "link": ["../up", "#frag", "sub/x", "//host.org/h"]},
    ),
    dict(
        name="type-coercion",
        input={"@context": {"@vocab": EX,
                            "d": {"@id": EX + "d", "@type": XSD + "date"},
                            "i": {"@id": EX + "i", "@type": XSD + "integer"},
                            "r": {"@id": EX + "r", "@type": "@id"},
                            "v": {"@id": EX + "v", "@type": "@vocab"}},
               "@id": EX + "a", "d": "2026-01-01", "i": "5", "r": "http://t.org/x",
               "v": "term"},
    ),
    dict(
        name="native-literals",
        input={"@context": {"@vocab": EX}, "@id": EX + "a",
               "int": 42, "neg": -7, "dbl": 1.1, "dbl2": 0.000125, "big": 1.0e21,
               "boolT": True, "boolF": False, "zero": 0, "half": 0.5},
    ),
    dict(
        name="language-tags",
        input={"@context": {"@vocab": EX, "@language": "en",
                            "fr": {"@id": EX + "fr", "@language": "FR"},
                            "nolang": {"@id": EX + "nolang", "@language": None}},
               "@id": EX + "a", "plain": "hello", "fr": "bonjour", "nolang": "raw",
               "tagged": {"@value": "hola", "@language": "ES"}},
    ),
    dict(
        name="lists-and-sets",
        input={"@context": {"@vocab": EX,
                            "lst": {"@id": EX + "lst", "@container": "@list"},
                            "st": {"@id": EX + "st", "@container": "@set"}},
               "@id": EX + "a", "lst": [1, "two", True], "st": ["x", "y"],
               "empty": {"@list": []},
               "nested": {"@list": [{"@list": [1]}, {"@list": []}]}},
    ),
    dict(
        name="container-language-map",
        input={"@context": {"@vocab": EX,
                            "label": {"@id": EX + "label", "@container": "@language"}},
               "@id": EX + "a", "label": {"en": "Queen", "de": ["Königin", "Frau"]}},
    ),
    dict(
        name="container-index-map",
        input={"@context": {"@vocab": EX,
                            "athletes": {"@id": EX + "athletes", "@container": "@index"}},
               "@id": EX + "a",
               "athletes": {"guard": {"name": "A"}, "center": [{"name": "B"}]}},
    ),
    dict(
        name="container-id-map",
        input={"@context": {"@vocab": EX,
                            "post": {"@id": EX + "post", "@container": "@id"}},
               "@id": EX + "a",
               "post": {EX + "p1": {"title": "T1"}, EX + "p2": {"title": "T2"}}},
    ),
    dict(
        name="container-type-map",
        input={"@context": {"@vocab": EX,
                            "contains": {"@id": EX + "contains", "@container": "@type"}},
               "@id": EX + "a",
               "contains": {EX + "TypeA": {"@id": EX + "x"}, EX + "TypeB": {"@id": EX + "y"}}},
    ),
    dict(
        name="container-graph",
        input={"@context": {"@vocab": EX,
                            "claims": {"@id": EX + "claims", "@container": "@graph"}},
               "@id": EX + "a", "claims": {"said": "something"}},
    ),
    dict(
        name="reverse-property",
        input={"@context": {"@vocab": EX,
                            "children": {"@reverse": EX + "parent"}},
               "@id": EX + "a",
               "children": [{"@id": EX + "kid1"}, {"@id": EX + "kid2", "name": "K"}]},
    ),
    dict(
        name="reverse-keyword",
        input={"@context": {"@vocab": EX}, "@id": EX + "a",
               "@reverse": {"knows": {"@id": EX + "b", "name": "Bob"}}},
    ),
    dict(
        name="nest",
        input={"@context": {"@vocab": EX, "meta": "@nest",
                            "inner": {"@id": EX + "inner", "@nest": "meta"}},
               "@id": EX + "a", "meta": {"inner": "v", "other": "w"}},
    ),
    dict(
        name="json-literal",
        input={"@context": {"@vocab": EX,
                            "cfg": {"@id": EX + "cfg", "@type": "@json"}},
               "@id": EX + "a",
               "cfg": {"z": 1, "a": [True, None, 2.5], "nested": {"k": "v"}}},
    ),
    dict(
        name="named-graphs",
        input={"@context": {"@vocab": EX}, "@id": EX + "g1",
               "@graph": [{"@id": EX + "a", "name": "A",
                           "knows": {"@id": EX + "b", "name": "B"}}],
               "label": "graph one"},
    ),
    dict(
        name="bnodes-nested",
        input={"@context": {"@vocab": EX}, "@id": EX + "root",
               "p": [{"q": {"r": "deep"}}, {"q": "shallow"}],
               "named": {"@id": "_:custom", "s": "t"}},
    ),
    dict(
        name="type-scoped-context",
        input={"@context": {"@vocab": EX,
                            "Person": {"@id": EX + "Person",
                                       "@context": {"name": EX + "fullName"}}},
               "@id": EX + "a", "@type": "Person", "name": "Alice"},
    ),
    dict(
        name="property-scoped-context",
        input={"@context": {"@vocab": EX,
                            "detail": {"@id": EX + "detail",
                                       "@context": {"x": EX + "scopedX"}}},
               "@id": EX + "a", "detail": {"x": "v"}, "x": "top"},
    ),
    dict(
        name="keyword-aliases",
        input={"@context": {"id": "@id", "type": "@type", "value": "@value",
                            "@vocab": EX},
               "id": EX + "a", "type": EX + "T",
               "prop": {"value": "v", "type": XSD + "token"}},
    ),
    dict(
        name="graph-at-top",
        input={"@context": {"@vocab": EX},
               "@graph": [{"@id": EX + "a", "name": "A"},
                          {"@id": EX + "b", "name": "B", "knows": {"@id": EX + "a"}}]},
    ),
    dict(
        name="index-annotation",
        input={"@context": {"@vocab": EX}, "@id": EX + "a",
               "prop": {"@value": "v", "@index": "idx0"}},
    ),
    dict(
        name="value-direction",
        input={"@context": {"@vocab": EX, "@direction": "rtl", "@language": "ar"},
               "@id": EX + "a", "t": "مرحبا"},
        options={"rdfDirection": "i18n-datatype"},
    ),
    dict(
        name="remote-context",
        input={"@context": "http://fixtures.test/ctx1.json",
               "@id": EX + "a", "rname": "Remote"},
        documents={"http://fixtures.test/ctx1.json":
                   {"@context": {"rname": EX + "remoteName"}}},
    ),
    dict(
        name="nested-remote-context",
        input={"@context": "http://fixtures.test/ctx2.json",
               "@id": EX + "a", "n2": "v"},
        documents={
            "http://fixtures.test/ctx2.json": {"@context": ["http://fixtures.test/ctx3.json", {"n2": EX + "nTwo"}]},
            "http://fixtures.test/ctx3.json": {"@context": {"n3": EX + "nThree"}}},
    ),
    dict(
        name="merge-docs",
        op_override=["merge"],
        input=[{"@context": {"@vocab": EX}, "@id": EX + "a", "name": "A",
                "p": {"q": "bnode-in-doc1"}},
               {"@context": {"@vocab": EX}, "@id": EX + "a", "name": "A2",
                "p": {"q": "bnode-in-doc2"}}],
    ),
    dict(
        name="free-floating-drop",
        input={"@context": {"@vocab": EX},
               "@graph": [{"@value": "dropped"}, {"@id": EX + "a", "name": "kept"},
                          {"@id": EX + "ref-only"}]},
    ),
    dict(
        name="relative-iri-skips",
        input={"@context": {"@vocab": EX, "rel": {"@id": EX + "rel", "@type": "@id"}},
               "@id": "relative-subject", "name": "has relative subject",
               "rel": "also-relative"},
    ),
    dict(
        name="expand-error-collision",
        op_override=["expand-error"],
        input={"@context": {"@vocab": EX}, "@id": EX + "a",
               "bad": {"@value": "v", "@list": ["x"]}},
    ),
    dict(
        name="compact-roundtrip",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX, "knows": {"@type": "@id"}},
               "@id": EX + "a", "name": "Alice", "knows": [EX + "b", EX + "c"],
               "@type": EX + "Person"},
        context={"@vocab": EX, "knows": {"@type": "@id"}},
    ),
    dict(
        name="protected-term-override-error",
        op_override=["expand-error"],
        input={"@context": [{"@protected": True, "name": EX + "name"},
                            {"name": EX + "other"}],
               "@id": EX + "a", "name": "x"},
    ),
    dict(
        name="protected-term-null-ctx-error",
        op_override=["expand-error"],
        input={"@context": [{"@protected": True, "name": EX + "name"},
                            None],
               "@id": EX + "a", "name": "x"},
    ),
    dict(
        name="propagate-false",
        input={"@context": [{"@vocab": EX},
                            {"@propagate": False, "scoped": EX + "scopedTop"}],
               "@id": EX + "a", "scoped": "top",
               "child": {"@id": EX + "b", "scoped": "inner"}},
    ),
    dict(
        name="import-context",
        input={"@context": {"@import": "http://fixtures.test/imported.json",
                            "extra": EX + "extra"},
               "@id": EX + "a", "imported": "v", "extra": "w"},
        documents={"http://fixtures.test/imported.json":
                   {"@context": {"imported": EX + "imported"}}},
    ),
    dict(
        name="version-1.0-mode",
        input={"@context": {"@vocab": EX,
                            "nested": {"@id": EX + "nested"}},
               "@id": EX + "a", "nested": {"@id": EX + "b", "p": "v"}},
        options={"processingMode": "json-ld-1.0"},
    ),
    dict(
        name="language-map-none",
        input={"@context": {"@vocab": EX,
                            "label": {"@id": EX + "label",
                                      "@container": "@language"}},
               "@id": EX + "a",
               "label": {"en": "hello", "@none": "untagged"}},
    ),
    dict(
        name="index-map-none",
        input={"@context": {"@vocab": EX,
                            "p": {"@id": EX + "p", "@container": "@index"}},
               "@id": EX + "a",
               "p": {"@none": "no-index", "i1": "indexed"}},
    ),
    dict(
        name="prefix-false-term",
        input={"@context": {"@vocab": EX,
                            "compactme": {"@id": EX + "sub/", "@prefix": True},
                            "noprefix": {"@id": EX + "npx-", "@prefix": False}},
               "@id": EX + "a", "compactme:x": "v1",
               "noprefix:y": "v2"},
    ),
    dict(
        name="reverse-container-set",
        input={"@context": {"@vocab": EX,
                            "isParentOf": {"@reverse": EX + "parent",
                                           "@container": "@set"}},
               "@id": EX + "a",
               "isParentOf": {"@id": EX + "kid", "name": "K"}},
    ),
    dict(
        name="graph-index-container",
        input={"@context": {"@vocab": EX,
                            "claims": {"@id": EX + "claims",
                                       "@container": ["@graph", "@index"]}},
               "@id": EX + "a",
               "claims": {"idx1": {"said": "one"}, "idx2": {"said": "two"}}},
    ),
    dict(
        name="graph-id-container",
        input={"@context": {"@vocab": EX,
                            "claims": {"@id": EX + "claims",
                                       "@container": ["@graph", "@id"]}},
               "@id": EX + "a",
               "claims": {EX + "g1": {"said": "one"}}},
    ),
    dict(
        name="included-block",
        input={"@context": {"@vocab": EX},
               "@id": EX + "a", "name": "A",
               "@included": [{"@id": EX + "b", "name": "B"}]},
    ),
    dict(
        name="null-values-drop",
        input={"@context": {"@vocab": EX, "dropped": None},
               "@id": EX + "a", "kept": "v", "gone": None,
               "dropped": "never"},
    ),
    dict(
        name="vocab-relative-resolution",
        input={"@context": {"@vocab": "rel/",
                            "@base": "http://base.org/dir/"},
               "@id": "doc", "p": "v"},
    ),
    dict(
        name="type-on-value-alias",
        input={"@context": {"@vocab": EX, "datum": {"@id": EX + "datum",
                                                    "@type": XSD + "decimal"}},
               "@id": EX + "a", "datum": "3.14"},
    ),
    dict(
        name="list-of-id-coercion",
        input={"@context": {"@vocab": EX,
                            "links": {"@id": EX + "links", "@type": "@id",
                                      "@container": "@list"}},
               "@id": EX + "a", "links": ["http://t.org/1", "http://t.org/2"]},
    ),
    dict(
        name="expand-error-invalid-typed-value",
        op_override=["expand-error"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "a",
               "p": {"@value": "v", "@type": "not an iri"}},
    ),
    dict(
        name="expand-error-language-nonstring",
        op_override=["expand-error"],
        input={"@context": {"@vocab": EX}, "@id": EX + "a",
               "p": {"@value": 5, "@language": "en"}},
    ),
    dict(
        name="expand-error-conflicting-index",
        op_override=["flatten-error"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "a",
               "p": [{"@id": EX + "n", "@index": "i1", "x": "1"}],
               "q": [{"@id": EX + "n", "@index": "i2", "x": "2"}]},
    ),
]



FRAME_DOC = {
    "@context": {"@vocab": EX},
    "@graph": [
        {"@id": EX + "lib", "@type": "Library", "name": "The Library",
         "contains": {"@id": EX + "book1"}},
        {"@id": EX + "book1", "@type": "Book", "title": "Book One",
         "creator": "Ann", "contains": {"@id": EX + "chapter1"}},
        {"@id": EX + "chapter1", "@type": "Chapter", "title": "Ch 1"},
        {"@id": EX + "book2", "@type": "Book", "title": "Book Two"},
    ],
}

CASES += [
    dict(
        name="frame-basic-type",
        op_override=["frame"],
        input=FRAME_DOC,
        frame={"@context": {"@vocab": EX}, "@type": "Library",
               "contains": {"@type": "Book",
                            "contains": {"@type": "Chapter"}}},
    ),
    dict(
        name="frame-wildcard",
        op_override=["frame"],
        input=FRAME_DOC,
        frame={"@context": {"@vocab": EX}, "@type": "Book"},
    ),
    dict(
        name="frame-explicit",
        op_override=["frame"],
        input=FRAME_DOC,
        frame={"@context": {"@vocab": EX}, "@type": "Book",
               "@explicit": True, "title": {}},
    ),
    dict(
        name="frame-default",
        op_override=["frame"],
        input=FRAME_DOC,
        frame={"@context": {"@vocab": EX}, "@type": "Book",
               "creator": {"@default": "unknown"}},
    ),
    dict(
        name="frame-embed-never",
        op_override=["frame"],
        input=FRAME_DOC,
        frame={"@context": {"@vocab": EX}, "@type": "Library",
               "contains": {"@embed": "@never"}},
    ),
    dict(
        name="frame-require-all",
        op_override=["frame"],
        input=FRAME_DOC,
        frame={"@context": {"@vocab": EX}, "@requireAll": True,
               "@type": "Book", "creator": {}},
    ),
    dict(
        name="frame-id-match",
        op_override=["frame"],
        input=FRAME_DOC,
        frame={"@context": {"@vocab": EX}, "@id": EX + "book1"},
    ),
    dict(
        name="frame-reverse",
        op_override=["frame"],
        input=FRAME_DOC,
        frame={"@context": {"@vocab": EX}, "@type": "Book",
               "@reverse": {"contains": {}}},
    ),
    dict(
        name="frame-value-pattern",
        op_override=["frame"],
        input=FRAME_DOC,
        frame={"@context": {"@vocab": EX}, "@type": "Book",
               "title": {"@value": "Book One"}},
    ),
    dict(
        name="frame-list",
        op_override=["frame"],
        input={"@context": {"@vocab": EX,
                            "items": {"@id": EX + "items",
                                      "@container": "@list"}},
               "@id": EX + "order", "@type": "Order",
               "items": [{"@id": EX + "i1", "@type": "Item", "sku": "a"},
                          {"@id": EX + "i2", "@type": "Item", "sku": "b"}]},
        frame={"@context": {"@vocab": EX,
                            "items": {"@id": EX + "items",
                                      "@container": "@list"}},
               "@type": "Order"},
    ),
    dict(
        name="frame-named-graph",
        op_override=["frame"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "g1",
               "@graph": [{"@id": EX + "a", "@type": "T", "name": "A"}],
               "label": "graph"},
        frame={"@context": {"@vocab": EX}, "@type": "T"},
    ),
    dict(
        name="frame-bnode-prune",
        op_override=["frame"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "a", "@type": "T",
               "p": {"q": "anonymous once"}},
        frame={"@context": {"@vocab": EX}, "@type": "T"},
    ),
]



COMPACT_CTX = {
    "@vocab": EX,
    "knows": {"@id": EX + "knows", "@type": "@id"},
    "label": {"@id": EX + "label", "@container": "@language"},
    "athletes": {"@id": EX + "athletes", "@container": "@index"},
    "post": {"@id": EX + "post", "@container": "@id"},
    "lst": {"@id": EX + "lst", "@container": "@list"},
    "children": {"@reverse": EX + "parent"},
    "foaf": "http://xmlns.com/foaf/0.1/",
}

CASES += [
    dict(
        name="compact-language-map",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "label": [
                    {"@value": "Queen", "@language": "en"},
                    {"@value": "Koenigin", "@language": "de"}]}],
        context=COMPACT_CTX,
        options={"skipExpansion": True},
    ),
    dict(
        name="compact-index-map",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "athletes": [
                    {"@id": EX + "p1", "@index": "guard",
                     EX + "name": [{"@value": "A"}]},
                    {"@id": EX + "p2", "@index": "center",
                     EX + "name": [{"@value": "B"}]}]}],
        context=COMPACT_CTX,
        options={"skipExpansion": True},
    ),
    dict(
        name="compact-id-map",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "post": [
                    {"@id": EX + "p1", EX + "title": [{"@value": "T1"}]},
                    {"@id": EX + "p2", EX + "title": [{"@value": "T2"}]}]}],
        context=COMPACT_CTX,
        options={"skipExpansion": True},
    ),
    dict(
        name="compact-list",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "lst": [{"@list": [{"@value": 1}, {"@value": 2}]}]}],
        context=COMPACT_CTX,
        options={"skipExpansion": True},
    ),
    dict(
        name="compact-reverse",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                "@reverse": {EX + "parent": [
                    {"@id": EX + "kid1"},
                    {"@id": EX + "kid2", EX + "name": [{"@value": "K"}]}]}}],
        context=COMPACT_CTX,
        options={"skipExpansion": True},
    ),
    dict(
        name="compact-curie-pick",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                "http://xmlns.com/foaf/0.1/nick": [{"@value": "al"}],
                EX + "plain": [{"@value": "v"}]}],
        context=COMPACT_CTX,
        options={"skipExpansion": True},
    ),
    dict(
        name="compact-type-coercion-value",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "knows": [{"@id": EX + "b"}],
                EX + "typed": [{"@value": "2026-01-01",
                                "@type": XSD + "date"}],
                EX + "tagged": [{"@value": "bonjour",
                                 "@language": "fr"}]}],
        context=COMPACT_CTX,
        options={"skipExpansion": True},
    ),
    dict(
        name="compact-graph-keyword",
        op_override=["compact"],
        input=[{"@id": EX + "g",
                "@graph": [{"@id": EX + "a",
                            EX + "name": [{"@value": "A"}]}]}],
        context=COMPACT_CTX,
        options={"skipExpansion": True},
    ),
    dict(
        name="compact-keyword-alias-ctx",
        op_override=["compact"],
        input=[{"@id": EX + "a", "@type": [EX + "T"],
                EX + "p": [{"@value": "v"}]}],
        context={"id": "@id", "type": "@type", "@vocab": EX},
        options={"skipExpansion": True},
    ),
    dict(
        name="compact-array-singleton",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "one": [{"@value": "single"}],
                EX + "many": [{"@value": "x"}, {"@value": "y"}]}],
        context={"@vocab": EX},
        options={"skipExpansion": True},
    ),
]



RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _term(value, datatype=None, language=None):
    """Build an rdf-canonize term dict from a simple spec."""
    if value.startswith("_:"):
        return {"termType": "BlankNode", "value": value}
    if datatype is None and language is None and (
            value.startswith("http") or ":" in value.split("/")[0]):
        return {"termType": "NamedNode", "value": value}
    t = {"termType": "Literal", "value": value,
         "datatype": {"termType": "NamedNode",
                      "value": datatype or XSD + "string"}}
    if language:
        t["language"] = language
        t["datatype"]["value"] = RDF_NS + "langString"
    return t


def _lit(value, datatype=None, language=None):
    t = {"termType": "Literal", "value": value,
         "datatype": {"termType": "NamedNode",
                      "value": datatype or XSD + "string"}}
    if language:
        t["language"] = language
        t["datatype"]["value"] = RDF_NS + "langString"
    return t


def quads(*specs):
    """specs: (s, p, o) where o is a term dict or IRI/bnode string."""
    out = []
    for s_, p_, o_ in specs:
        out.append({
            "subject": _term(s_), "predicate": _term(p_),
            "object": o_ if isinstance(o_, dict) else _term(o_),
            "graph": {"termType": "DefaultGraph", "value": ""},
        })
    return out


FROMRDF_LIST = quads(
    (EX + "a", EX + "items", "_:l1"),
    ("_:l1", RDF_NS + "first", _lit("one")),
    ("_:l1", RDF_NS + "rest", "_:l2"),
    ("_:l2", RDF_NS + "first", _lit("2", XSD + "integer")),
    ("_:l2", RDF_NS + "rest", RDF_NS + "nil"),
)

FROMRDF_SHARED_LIST = quads(
    (EX + "a", EX + "items", "_:s1"),
    (EX + "b", EX + "items", "_:s1"),  # shared head → not a list
    ("_:s1", RDF_NS + "first", _lit("x")),
    ("_:s1", RDF_NS + "rest", RDF_NS + "nil"),
)

FROMRDF_TYPES = quads(
    (EX + "a", RDF_NS + "type", EX + "T"),
    (EX + "a", EX + "count", _lit("42", XSD + "integer")),
    (EX + "a", EX + "score", _lit("1.1E0", XSD + "double")),
    (EX + "a", EX + "flag", _lit("true", XSD + "boolean")),
    (EX + "a", EX + "greeting", _lit("hola", language="es")),
    (EX + "a", EX + "date", _lit("2026-01-01", XSD + "date")),
)

# useNativeTypes numeric edge cases (round-3 ADVICE): JS
# parseInt(v).toFixed(0)===v round-trips exactly-representable ints
# >= 2^53; isFinite() ToNumber-coerces hex/binary/octal (but not
# signed-radix or underscore forms); toFixed falls to exponential
# notation at 1e21 so 21+-digit strings never convert.
_NT_EDGES = [
    "9007199254740992", "9007199254740993", "18014398509481984",
    "1180591620717411303424", "1000000000000000000000",
    "999999999999999999999", "0x10", "0b101", "0o17", "-0x10",
    "0x_10", "1_0", " 42", "+42", "-0", "inf", "Infinity", "nan",
]
FROMRDF_NUMERIC_EDGES = quads(*[
    (EX + "a", EX + f"p{i:02d}_{dt}", _lit(v, XSD + dt))
    for i, v in enumerate(_NT_EDGES) for dt in ("integer", "double")
])

CASES += [
    dict(name="fromrdf-native-numeric-edges", op_override=["fromRDF"],
         input=FROMRDF_NUMERIC_EDGES,
         options={"useNativeTypes": True}),
    dict(name="fromrdf-list", op_override=["fromRDF"],
         input=FROMRDF_LIST),
    dict(name="fromrdf-shared-list", op_override=["fromRDF"],
         input=FROMRDF_SHARED_LIST),
    dict(name="fromrdf-native-types", op_override=["fromRDF"],
         input=FROMRDF_TYPES,
         options={"useNativeTypes": True}),
    dict(name="fromrdf-typed-strings", op_override=["fromRDF"],
         input=FROMRDF_TYPES),
    dict(name="fromrdf-use-rdf-type", op_override=["fromRDF"],
         input=FROMRDF_TYPES,
         options={"useRdfType": True}),
]



# round-3: issued blank-node labels match the reference
# byte-for-byte ("labels-exact" in the name switches the conformance
# runner from P/R-mod-bijection to raw quad equality). The nested
# list exercises the interleaved link/item allocation order of
# lib/toRdf.js _listToRDF (head link, item conversion, next link).
CASES += [
    dict(
        name=f"tordf-labels-exact-{i}",
        op_override=["toRDF"],
        input=doc,
    )
    for i, doc in enumerate([
        {"@context": {"@vocab": EX}, "@id": EX + "s",
         "p": [{"a": 1}, {"b": 2}],
         "q": {"@list": [{"c": 3}, {"d": 4}]}},
        {"@context": {"@vocab": EX},
         "@graph": [{"x": {"y": {"z": 1}}}, {"@id": "_:user", "w": 2},
                    {"lst": {"@list": [[{"e": 5}], "s"]}}]},
        {"@context": {"@vocab": EX}, "@id": "_:outer",
         "rev": {"@reverse": {"r": [{"m": 1},
                                    {"@id": "_:user2", "n": 2}]}},
         "named": {"@id": "_:g1", "@graph": [{"gg": {"hh": 1}}]}},
        {"@context": {"@vocab": EX},
         "deep": {"@list": [{"@list": [{"@list": ["x"]}, {"i": 1}]},
                            {"j": 2}, {"@list": []}]}},
    ])
]

# round-4 fuzz finds (difftest seeds 9100027/9100075/9200020): the
# reference's isDouble is the ES String(v)-DOT rule (lib/types.js:35)
# — 1e-7 / -1e-7 / 5e-324 stringify dotless and ride toFixed(0) →
# "0"/"-0" + xsd:integer, while 2.5e-10 / 1e-6 carry a dot →
# xsd:double; 1e16 is dotless decimal form → integer digits.
CASES += [
    dict(
        name="tordf-js-number-dot-rule",
        op_override=["toRDF", "expand"],
        input={"@context": {"@vocab": EX}, "@id": EX + "n",
               "p": [1e-7, -1e-7, 5e-324, -5e-324, 2.5e-10, 1e-6,
                     1e16, -0.0, 0.0, 1e100, 42.0, 0.1,
                     123456789.123456789, 9007199254740991,
                     1e21, -1e21]},
    ),
    dict(
        name="tordf-json-numeric-edges",
        op_override=["toRDF"],
        input={"@context": {"@vocab": EX,
                            "j": {"@id": EX + "j", "@type": "@json"}},
               "@id": EX + "n",
               "j": [9007199254740991, 9007199254740992.0, 1e21, 1e-7,
                     -0.0, 0.1, 123456789.123456789, 5e-324,
                     1.7976931348623157e308, -2.5e-10, 1e100]},
    ),
]

CASES += [
    dict(
        name="tordf-generalized-rdf",
        op_override=["toRDF"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "a",
               "_:bnodeprop": "kept only when generalized",
               "normal": "v"},
        options={"produceGeneralizedRdf": True},
    ),
    dict(
        name="tordf-bnode-predicate-skip",
        op_override=["toRDF"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "a",
               "_:bnodeprop": "dropped by default",
               "normal": "v"},
    ),
    # term-mapped blank predicates: forward `_:p0` is relabeled by the
    # node-map issuer but a @reverse-mapped `_:p1` is NOT (the reverse
    # path bypasses the rename — verified vs node); labels-exact so
    # the asymmetry is locked byte-for-byte
    dict(
        name="tordf-labels-exact-generalized-reverse-bnp",
        op_override=["toRDF", "expand", "flatten"],
        input={"@context": {"bnp": {"@id": "_:p0"},
                            "rvp": {"@reverse": "_:p1"}},
               "@id": "http://x/s", "bnp": [{"@id": "_:bo1"}, "lit"],
               "rvp": {"@id": "http://x/o"}},
        options={"produceGeneralizedRdf": True},
    ),
    # processed-context caching is OBSERVABLE through the expansionMap
    # event stream: two array elements with the IDENTICAL inline
    # context fire the context-processing events (relative-@vocab
    # resolution against @base) exactly ONCE (ref ContextResolver.js:71
    # JSON-keyed resolve + context.js:147/417 getProcessed). Fuzz seed
    # 78000106.
    dict(
        name="fuzz-processed-ctx-cache-events",
        op_override=["expandEvents", "expand"],
        input=[{"@context": {"@base": "http://base.org/dir/",
                             "@vocab": "", "a": EX + "a"},
                "@id": EX + "one", "k": "v1"},
               {"@context": {"@base": "http://base.org/dir/",
                             "@vocab": "", "a": EX + "a"},
                "@id": EX + "two", "k": "v2"}],
    ),
    # a scalar-pruned (empty-after-expansion) @graph sub-frame must not
    # crash the graph-name recursion: JS frame['@graph'][0] is
    # undefined and falls back to {} (ref lib/frame.js:181-186). Fuzz
    # seed 65000854 (our port IndexError'd).
    dict(
        name="fuzz-empty-graph-subframe",
        op_override=["frame"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "top", "@type": "Type",
               "@graph": [{"@id": "_:bn1", "@index": "ix"}]},
        frame={"@context": {"@vocab": EX},
               "@embed": False, "@graph": ["bogus"]},
    ),
    # compactValue scalarizes subject references under @graph (ref
    # lib/compact.js:1080-1082 disjunction): a framed named-graph
    # member that is an id-only reference compacts to the bare id
    # STRING. Only reachable through framing/node-map outputs
    # (expansion drops free-floating id-only graph members). Fuzz seed
    # 60000747 — the engine's inverted day-one conditional survived
    # ~28k fuzz cases until the nested-graph-container grammar landed.
    dict(
        name="fuzz-graph-member-subject-ref-scalar",
        op_override=["frame"],
        input={"@context": {"@vocab": EX,
                            "epsi": {"@id": EX + "epsi",
                                     "@container": "@graph"}},
               "@id": EX + "top",
               "epsi": {"@graph": [{"@graph": [
                            {"@id": EX + "d",
                             "epsi": {"@direction": "rtl",
                                      "@value": "dv"},
                             "zeta": "v"}],
                        "nested": False}],
                        "@index": "gix"}},
        frame={"@context": {"@vocab": EX,
                            "epsi": {"@id": EX + "epsi",
                                     "@container": "@graph"}},
               "epsi": {}},
    ),
    # partial mappings (inserted before @id resolves) fall THROUGH the
    # vocab lookup in expandIri ('@id' in mapping, ref
    # lib/context.js:1005-1010) — so a compound term's own-definition
    # check recurses into the PREFIX definition, and in 1.0 mode the
    # prefix's '@prefix not allowed' error surfaces first (invalid term
    # definition, not invalid IRI mapping). Fuzz seed 41000422.
    dict(
        name="fuzz-prefix-term-error-order-1-0",
        op_override=["expand-error"],
        input={"@context": {"pref:suf": {"@id": EX + "other"},
                            "pref": {"@id": EX + "p#", "@prefix": True}},
               "pref:suf": "v"},
        options={"processingMode": "json-ld-1.0"},
    ),
    # same doc in 1.1: the prefix defines fine and the compound term's
    # expansion mismatch raises invalid IRI mapping
    dict(
        name="fuzz-prefix-term-mismatch-1-1",
        op_override=["expand-error"],
        input={"@context": {"pref:suf": {"@id": EX + "other"},
                            "pref": {"@id": EX + "p#", "@prefix": True}},
               "pref:suf": "v"},
    ),
    # the any-JSON-value allowance for @type:@json is gated on 1.1
    # (ref lib/expand.js:300-302): in 1.0 mode an object @value with
    # a @json-aliased @type raises invalid value object value instead.
    # Fuzz seed 29500175.
    dict(
        name="fuzz-json-type-value-object-1-0-error",
        op_override=["expand-error"],
        input={"@context": {"@vocab": EX, "ix": "@json"},
               "alpha": {"@type": "ix", "@value": {"j": [1, None]}}},
        options={"processingMode": "json-ld-1.0"},
    ),
    # a revert is a CLONE that does not copy processingMode
    # (lib/context.js:1364-1385 + :1391-1396): after a non-propagating
    # top context, expanding a node value reverts — and the 1.0-mode
    # gates stop firing, so a property-scoped context with 1.1-only
    # keywords (@propagate) is legal mid-document even under options
    # processingMode json-ld-1.0. Fuzz seed 25500111.
    dict(
        name="fuzz-revert-erases-processing-mode",
        op_override=["expand", "compact", "toRDF"],
        input={"@context": {"@propagate": False,
                            "PropType": {
                                "@id": EX + "PropType",
                                "@context": {"@propagate": True,
                                             "palpha": EX + "palpha"}},
                            "alpha": EX + "alpha"},
               "@id": EX + "top",
               "PropType": {"alpha": "v", "palpha": "pv"}},
        context={"@propagate": False,
                 "PropType": {"@id": EX + "PropType",
                              "@context": {"@propagate": True,
                                           "palpha": EX + "palpha"}},
                 "alpha": EX + "alpha"},
        options={"processingMode": "json-ld-1.0"},
    ),
    # simple @graph container wraps UNCONDITIONALLY — the reference's
    # comment ("and value is not, itself, a graph") lies; the code has
    # no _isGraph guard (lib/expand.js:844-848; the guard exists only
    # in the index-map path :1090). A graph-shaped value ({@graph,@id})
    # is double-wrapped. Fuzz seed 15600531.
    dict(
        name="fuzz-graph-container-double-wrap",
        op_override=["expand", "compact", "toRDF"],
        input={"@context": {"beta": {"@id": EX + "beta",
                                     "@container": "@graph"}},
               "@id": EX + "top",
               "beta": {"@graph": [{"@id": EX + "inner",
                                    "@type": EX + "Type"}],
                        "@id": EX + "named-g"}},
        context={"beta": {"@id": EX + "beta", "@container": "@graph"}},
    ),
    # contrast: the @graph+@id / @graph+@index map paths DO guard with
    # _isGraph (lib/expand.js:1090) — a graph-shaped map value is NOT
    # double-wrapped there
    dict(
        name="fuzz-graph-id-map-no-double-wrap",
        op_override=["expand", "toRDF"],
        input={"@context": {"beta": {"@id": EX + "beta",
                                     "@container": ["@graph", "@id"]}},
               "@id": EX + "top",
               "beta": {EX + "g1": {"@graph": [{"@id": EX + "inner",
                                                "@type": EX + "Type"}]}}},
    ),
    # skipExpansion: input is taken as already-expanded verbatim (ref
    # lib/jsonld.js:164-169 compact, :685-691 toRDF)
    dict(
        name="skip-expansion-expanded-input",
        op_override=["compact", "toRDF"],
        input=[{"@id": EX + "s",
                "http://example.com/p": [{"@value": 1}],
                "http://example.com/q": [{"@id": EX + "o"}]}],
        context={"@vocab": EX},
        options={"skipExpansion": True},
    ),
    # GIGO flavor: a non-expanded doc under skipExpansion goes through
    # compaction/toRDF untouched — both engines must agree on what the
    # downstream algorithms do with the un-expanded shape (non-array
    # values raise "expanded value must be an array" in both — unit
    # test in test_misc_parity.py; array-shaped GIGO flows through)
    dict(
        name="skip-expansion-gigo-compact-shape",
        op_override=["compact", "toRDF"],
        input=[{"@id": "rel-s", "p": ["bare"],
                EX + "q": [{"@value": 2}]}],
        context={"@vocab": EX},
        options={"skipExpansion": True,
                 "base": "http://base.org/dir/doc"},
    ),
    dict(
        name="fromrdf-i18n-direction",
        op_override=["fromRDF"],
        input=quads(
            (EX + "a", EX + "t",
             _lit("xyz", "https://www.w3.org/ns/i18n#ar_rtl"))),
        options={"rdfDirection": "i18n-datatype"},
    ),
    # i18n datatype EDGE forms (ref lib/fromRdf.js:333-341 split on
    # /[#_]/): empty direction survives as "@direction": "", empty
    # language omits @language, extra underscores truncate to the
    # second segment, no underscore leaves @direction unset. Fuzz seed
    # 49000245.
    dict(
        name="fromrdf-i18n-direction-edges",
        op_override=["fromRDF"],
        input=quads(
            (EX + "a", EX + "p0",
             _lit("d1", "https://www.w3.org/ns/i18n#en_")),
            (EX + "a", EX + "p1",
             _lit("d2", "https://www.w3.org/ns/i18n#_rtl")),
            (EX + "a", EX + "p2",
             _lit("d3", "https://www.w3.org/ns/i18n#a_b_c")),
            (EX + "a", EX + "p3",
             _lit("d4", "https://www.w3.org/ns/i18n#en")),
            (EX + "a", EX + "p4",
             _lit("d5", "https://www.w3.org/ns/i18n#EN-latn_ltr"))),
        options={"rdfDirection": "i18n-datatype"},
    ),
]



# cases modeled on the reference's own unit-test inputs
# (tests/graph-container.js:10-150, tests/misc.js) — inputs only,
# goldens captured from the running reference
CASES += [
    dict(
        name="graph-set-container",
        input={"@context": {"@vocab": EX,
                            "input": {"@id": EX + "input",
                                      "@container": ["@graph", "@set"]}},
               "@id": EX + "a", "input": {"value": "x"}},
    ),
    dict(
        name="graph-container-compact-roundtrip",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX,
                            "input": {"@id": EX + "input",
                                      "@container": "@graph"}},
               "@id": EX + "a", "input": {"value": "x"}},
        context={"@vocab": EX,
                 "input": {"@id": EX + "input", "@container": "@graph"}},
    ),
    dict(
        name="scoped-context-on-type-map",
        input={"@context": {"@vocab": EX,
                            "typemap": {"@id": EX + "typemap",
                                        "@container": "@type"},
                            "Alpha": {"@id": EX + "Alpha",
                                      "@context": {"v": EX + "alphaV"}}},
               "@id": EX + "a",
               "typemap": {"Alpha": {"v": "scoped"}}},
    ),
    dict(
        name="nested-node-reverse-roundtrip",
        input={"@context": {"@vocab": EX,
                            "claims": {"@reverse": EX + "claimedBy"}},
               "@id": EX + "a",
               "claims": {"@id": EX + "c1", "text": "t",
                          "sub": {"@id": EX + "c2"}}},
    ),
    dict(
        name="expand-error-invalid-reverse-id",
        op_override=["expand-error"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "a",
               "@reverse": {"p": {"@value": "not a node"}}},
    ),
    dict(
        name="expand-error-invalid-id-type",
        op_override=["expand-error"],
        input={"@context": {"@vocab": EX}, "@id": 42},
    ),
    dict(
        name="expand-error-keyword-redefine",
        op_override=["expand-error"],
        input={"@context": {"@id": EX + "notallowed"},
               "x": "y"},
    ),
]



CASES += [
    dict(
        name="merge-empty-context",
        op_override=["merge"],
        input=[{"@id": EX + "m1", EX + "afoo": [{"@value": 1}]},
               {"@id": EX + "m1", EX + "bfoo": [{"@value": 2}]}],
        context={},
    ),
    dict(
        name="js-keyword-terms",
        input={"@context": {"valueOf": EX + "valueOf",
                            "toString": EX + "toString",
                            "constructor": EX + "constructor"},
               "valueOf": "first", "toString": "second",
               "constructor": "third"},
    ),
]
# NOTE: jsonld.link output is intentionally circular (in-memory linked
# nodes) — not JSON-serializable, so no golden fixture; kernel.link is
# behavior-tested directly in tests/test_kernel_link.py.



CASES += [
    dict(
        name="compact-nest-routing",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX, "meta": "@nest",
                            "inner": {"@id": EX + "inner",
                                      "@nest": "meta"}},
               "@id": EX + "a", "meta": {"inner": "v"}, "outer": "w"},
        context={"@vocab": EX, "meta": "@nest",
                 "inner": {"@id": EX + "inner", "@nest": "meta"}},
    ),
    dict(
        name="compact-no-array-compaction",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "one": [{"@value": "single"}]}],
        context={"@vocab": EX},
        options={"skipExpansion": True, "compactArrays": False},
    ),
    dict(
        name="compact-index-preserved",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "p": [{"@value": "v", "@index": "idx7"}]}],
        context={"@vocab": EX},
        options={"skipExpansion": True},
    ),
    dict(
        name="compact-graph-id-container",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX,
                            "claims": {"@id": EX + "claims",
                                       "@container": ["@graph", "@id"]}},
               "@id": EX + "a",
               "claims": {EX + "g1": {"said": "one"},
                          EX + "g2": {"said": "two"}}},
        context={"@vocab": EX,
                 "claims": {"@id": EX + "claims",
                            "@container": ["@graph", "@id"]}},
    ),
    dict(
        name="compact-graph-index-container",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX,
                            "claims": {"@id": EX + "claims",
                                       "@container": ["@graph",
                                                      "@index"]}},
               "@id": EX + "a",
               "claims": {"i1": {"said": "one"}, "i2": {"said": "two"}}},
        context={"@vocab": EX,
                 "claims": {"@id": EX + "claims",
                            "@container": ["@graph", "@index"]}},
    ),
]



CASES += [
    dict(
        name="expand-context-option",
        op_override=["expand"],
        input={"@id": EX + "a", "name": "NoLocalContext"},
        options={"expandContext": {"@context": {"name": EX + "name"}}},
    ),
    dict(
        name="base-option",
        op_override=["expand"],
        input={"@context": {"@vocab": EX,
                            "link": {"@id": EX + "link", "@type": "@id"}},
               "@id": "relative-doc", "link": "other-doc"},
        options={"base": "http://base.example.org/dir/"},
    ),
    dict(
        name="frame-embed-always",
        op_override=["frame"],
        input=FRAME_DOC,
        frame={"@context": {"@vocab": EX}, "@type": "Library",
               "contains": {"@embed": "@always"}},
    ),
    dict(
        name="frame-omit-graph-false",
        op_override=["frame"],
        input=FRAME_DOC,
        frame={"@context": {"@vocab": EX}, "@type": "Book"},
        options={"omitGraph": False},
    ),
    dict(
        name="frame-graph-key",
        op_override=["frame"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "ng",
               "@graph": [{"@id": EX + "x", "@type": "T", "v": "inner"}],
               "label": "named"},
        frame={"@context": {"@vocab": EX},
               "@graph": {"@type": "T"}},
    ),
]



CASES += [
    dict(
        name="direction-compaction",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX, "@language": "ar",
                            "@direction": "rtl"},
               "@id": EX + "a", "t": "مرحبا"},
        context={"@vocab": EX, "@language": "ar", "@direction": "rtl"},
    ),
    dict(
        name="type-none-term",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX,
                            "anyval": {"@id": EX + "anyval",
                                       "@type": "@none"}},
               "@id": EX + "a",
               "anyval": [{"@value": "s"},
                          {"@value": 4},
                          {"@value": "typed",
                           "@type": EX + "T"}]},
        context={"@vocab": EX,
                 "anyval": {"@id": EX + "anyval", "@type": "@none"}},
        options={"skipExpansion": False},
    ),
    dict(
        name="language-direction-map",
        input={"@context": {"@vocab": EX,
                            "label": {"@id": EX + "label",
                                      "@container": "@language",
                                      "@direction": "rtl"}},
               "@id": EX + "a",
               "label": {"ar": "مرحبا", "he": "שלום"}},
    ),
    dict(
        name="set-container-type-coerce",
        input={"@context": {"@vocab": EX,
                            "refs": {"@id": EX + "refs", "@type": "@id",
                                     "@container": "@set"}},
               "@id": EX + "a", "refs": ["http://t.org/1", "http://t.org/2"]},
    ),
]



CASES += [
    dict(
        name="compact-language-map-none",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "label": [
                    {"@value": "tagged", "@language": "en"},
                    {"@value": "untagged"}]}],
        context={"@vocab": EX,
                 "label": {"@id": EX + "label",
                           "@container": "@language"}},
        options={"skipExpansion": True},
    ),
    dict(
        name="index-set-container",
        input={"@context": {"@vocab": EX,
                            "p": {"@id": EX + "p",
                                  "@container": ["@index", "@set"]}},
               "@id": EX + "a",
               "p": {"i1": "one", "i2": ["two", "three"]}},
    ),
    dict(
        name="id-set-container",
        input={"@context": {"@vocab": EX,
                            "p": {"@id": EX + "p",
                                  "@container": ["@id", "@set"]}},
               "@id": EX + "a",
               "p": {EX + "n1": {"v": "x"}}},
    ),
    dict(
        name="json-literal-in-list",
        input={"@context": {"@vocab": EX,
                            "cfgs": {"@id": EX + "cfgs",
                                     "@type": "@json",
                                     "@container": "@list"}},
               "@id": EX + "a",
               "cfgs": [{"b": 1}, [2, 3], "plain", 4.5, None, True]},
    ),
    dict(
        name="property-index-container",
        input={"@context": {"@vocab": EX,
                            "prop": {"@id": EX + "prop",
                                     "@container": "@index",
                                     "@index": EX + "indexProp"}},
               "@id": EX + "a",
               "prop": {"k1": {"@id": EX + "v1", "name": "one"}}},
    ),
    dict(
        name="value-object-index-only",
        input={"@context": {"@vocab": EX}, "@id": EX + "a",
               "p": {"@value": 5, "@index": "five"}},
    ),
]



CASES += [
    dict(
        name="vocab-relative-to-vocab",
        input={"@context": [{"@vocab": EX},
                            {"@vocab": "sub/"}],
               "@id": EX + "a", "p": "v"},
    ),
    dict(
        name="null-term-blocks-vocab",
        input={"@context": {"@vocab": EX, "hidden": None},
               "@id": EX + "a", "hidden": "dropped", "kept": "v"},
    ),
    dict(
        name="graph-set-container-multi",
        input={"@context": {"@vocab": EX,
                            "claims": {"@id": EX + "claims",
                                       "@container": ["@graph", "@set"]}},
               "@id": EX + "a",
               "claims": [{"said": "one"}, {"said": "two"}]},
    ),
    dict(
        name="term-direction-override",
        input={"@context": {"@vocab": EX, "@direction": "rtl",
                            "@language": "ar",
                            "ltr_term": {"@id": EX + "ltrTerm",
                                         "@direction": "ltr"},
                            "nodir": {"@id": EX + "noDir",
                                      "@direction": None}},
               "@id": EX + "a", "plain": "p", "ltr_term": "l",
               "nodir": "n"},
        options={"rdfDirection": "i18n-datatype"},
    ),
    dict(
        name="reverse-index-container",
        input={"@context": {"@vocab": EX,
                            "rkids": {"@reverse": EX + "parent",
                                      "@container": "@index"}},
               "@id": EX + "a",
               "rkids": {"i1": {"@id": EX + "k1"}}},
    ),
    dict(
        name="compact-list-of-lists",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "lst": [{"@list": [{"@list": [{"@value": 1}]},
                                         {"@list": []}]}]}],
        context={"@vocab": EX,
                 "lst": {"@id": EX + "lst", "@container": "@list"}},
        options={"skipExpansion": True},
    ),
]



CASES += [
    dict(
        name="compact-term-selection-by-type",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "p": [
                    {"@value": "2026-01-01", "@type": XSD + "date"},
                    {"@value": "plain"},
                    {"@id": EX + "ref"}]}],
        context={"@vocab": EX,
                 "pdate": {"@id": EX + "p", "@type": XSD + "date"},
                 "pref": {"@id": EX + "p", "@type": "@id"},
                 "pplain": {"@id": EX + "p"}},
        options={"skipExpansion": True},
    ),
    dict(
        name="compact-term-selection-by-language",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "q": [
                    {"@value": "hallo", "@language": "de"},
                    {"@value": "hello", "@language": "en"}]}],
        context={"@vocab": EX,
                 "qde": {"@id": EX + "q", "@language": "de"},
                 "qen": {"@id": EX + "q", "@language": "en"}},
        options={"skipExpansion": True},
    ),
    dict(
        name="graph-object-index",
        input={"@context": {"@vocab": EX},
               "@id": EX + "a",
               "p": {"@graph": [{"@id": EX + "x", "v": "1"}],
                     "@index": "gidx"}},
    ),
    dict(
        name="expand-error-colliding-id-alias",
        op_override=["expand-error"],
        input={"@context": {"id1": "@id", "id2": "@id", "@vocab": EX},
               "id1": EX + "a", "id2": EX + "b", "p": "v"},
    ),
    dict(
        name="frame-list-subframe",
        op_override=["frame"],
        input={"@context": {"@vocab": EX,
                            "items": {"@id": EX + "items",
                                      "@container": "@list"}},
               "@graph": [
                   {"@id": EX + "o1", "@type": "Order",
                    "items": [{"@id": EX + "i1", "@type": "Item",
                               "sku": "a"}]},
                   {"@id": EX + "o2", "@type": "Order",
                    "items": [{"@id": EX + "i2", "@type": "Widget",
                               "sku": "b"}]}]},
        frame={"@context": {"@vocab": EX,
                            "items": {"@id": EX + "items",
                                      "@container": "@list"}},
               "@type": "Order",
               "items": {"@list": [{"@type": "Item"}]}},
        options={"requireAll": True},
    ),
    dict(
        name="frame-language-value-pattern",
        op_override=["frame"],
        input={"@context": {"@vocab": EX},
               "@graph": [
                   {"@id": EX + "a", "@type": "T",
                    "label": {"@value": "hallo", "@language": "de"}},
                   {"@id": EX + "b", "@type": "T",
                    "label": {"@value": "hello", "@language": "en"}}]},
        frame={"@context": {"@vocab": EX}, "@type": "T",
               "label": {"@value": {}, "@language": "de"}},
        options={"requireAll": True},
    ),
]



CASES += [
    dict(
        name="frame-default-null-render",
        op_override=["frame"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "a", "@type": "T", "present": "v"},
        frame={"@context": {"@vocab": EX}, "@type": "T",
               "present": {}, "missing": {}},
    ),
    dict(
        name="type-alias-coercion",
        input={"@context": {"typ": "@type", "@vocab": EX},
               "@id": EX + "a", "typ": ["T1", "T2"], "p": "v"},
    ),
    dict(
        name="merge-named-graphs",
        op_override=["merge"],
        input=[{"@context": {"@vocab": EX}, "@id": EX + "g1",
                "@graph": [{"@id": EX + "x", "p": "in-g1"}]},
               {"@context": {"@vocab": EX}, "@id": EX + "x",
                "p": "in-default"}],
    ),
    dict(
        name="bnode-named-graph",
        input={"@context": {"@vocab": EX},
               "@graph": [{"@graph": [{"@id": EX + "in", "p": "v"}],
                           "label": "anon graph"}]},
    ),
    dict(
        name="reverse-term-compact-roundtrip",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX,
                            "children": {"@reverse": EX + "parent",
                                         "@type": "@id"}},
               "@id": EX + "a",
               "children": [EX + "k1", EX + "k2"]},
        context={"@vocab": EX,
                 "children": {"@reverse": EX + "parent", "@type": "@id"}},
    ),
]



CASES += [
    dict(
        name="compact-aliased-graph",
        op_override=["compact"],
        input=[{"@id": EX + "a", EX + "p": [{"@value": "v"}]},
               {"@id": EX + "b", EX + "p": [{"@value": "w"}]}],
        context={"data": "@graph", "ident": "@id", "@vocab": EX},
        options={"skipExpansion": True, "graph": True},
    ),
    dict(
        name="language-map-direction-keys",
        input={"@context": {"@vocab": EX,
                            "label": {"@id": EX + "label",
                                      "@container": "@language"}},
               "@id": EX + "a",
               "label": {"ar": "مرحبا"}},
        options={"rdfDirection": "i18n-datatype"},
    ),
    dict(
        name="compact-preserve-direction-value",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "t": [{"@value": "x", "@language": "ar",
                            "@direction": "rtl"}]}],
        context={"@vocab": EX},
        options={"skipExpansion": True},
    ),
    dict(
        name="expand-nested-nest",
        input={"@context": {"@vocab": EX, "outer": "@nest",
                            "inner": "@nest",
                            "deep": {"@id": EX + "deep",
                                     "@nest": "inner"}},
               "@id": EX + "a",
               "outer": {"inner": {"deep": "v"}}},
    ),
]



CASES += [
    dict(
        name="integral-float-literals",
        input={"@context": {"@vocab": EX}, "@id": EX + "a",
               "three": 3.0, "negzero": -0.0, "frac": 3.5,
               "bigint_float": 1.5e20},
    ),
]



CASES += [
    dict(
        name="compact-to-relative-base",
        op_override=["compact"],
        input=[{"@id": "http://base.org/dir/doc1",
                "http://base.org/dir/vocab#p": [
                    {"@id": "http://base.org/dir/sub/other"},
                    {"@id": "http://base.org/outside"}]}],
        context={"@base": "http://base.org/dir/",
                 "@vocab": "http://base.org/dir/vocab#",
                 "p": {"@id": "http://base.org/dir/vocab#p",
                       "@type": "@id"}},
        options={"skipExpansion": True},
    ),
    dict(
        name="relative-graph-name-skipped",
        op_override=["toRDF"],
        input={"@context": {"@vocab": EX},
               "@id": "relative-graph",
               "@graph": [{"@id": EX + "in", "p": "v"}]},
    ),
    dict(
        name="reverse-alias",
        input={"@context": {"rev": "@reverse", "@vocab": EX},
               "@id": EX + "a",
               "rev": {"knows": {"@id": EX + "b"}}},
    ),
    dict(
        name="empty-string-values",
        input={"@context": {"@vocab": EX}, "@id": EX + "a",
               "empty": "", "zero": 0, "falsy": False},
    ),
    dict(
        name="frame-embed-on-list-nodes",
        op_override=["frame"],
        input={"@context": {"@vocab": EX,
                            "items": {"@id": EX + "items",
                                      "@container": "@list"}},
               "@id": EX + "o", "@type": "Order",
               "items": [{"@id": EX + "i1", "@type": "Item",
                          "sku": "a"},
                         {"@id": EX + "i2", "@type": "Item",
                          "sku": "b"}]},
        frame={"@context": {"@vocab": EX,
                            "items": {"@id": EX + "items",
                                      "@container": "@list"}},
               "@type": "Order",
               "items": {"@list": [{"@embed": "@never"}]}},
    ),
]



CASES += [
    dict(
        name="scoped-context-null-reset",
        input={"@context": {"@vocab": EX,
                            "isolated": {"@id": EX + "isolated",
                                         "@context": None}},
               "@id": EX + "a",
               "isolated": {"unmapped": "dropped without vocab",
                            "@id": EX + "b"},
               "normal": "kept"},
    ),
    dict(
        name="iri-schemes",
        input={"@context": {"@vocab": EX,
                            "ref": {"@id": EX + "ref", "@type": "@id"}},
               "@id": "urn:uuid:1234-5678",
               "ref": ["did:example:123", "tag:ex.org,2026:x",
                       "mailto:a@b.org"]},
    ),
    dict(
        name="base-resolution-query-fragment",
        input={"@context": {"@base": "http://b.org/p/doc?q=1",
                            "@vocab": EX,
                            "r": {"@id": EX + "r", "@type": "@id"}},
               "@id": "?q=2", "r": ["#frag", "", "../x?y#z"]},
    ),
    dict(
        name="language-tag-case",
        input={"@context": {"@vocab": EX},
               "@id": EX + "a",
               "t": {"@value": "x", "@language": "EN-Latn-US"}},
    ),
    dict(
        name="string-with-double-type",
        input={"@context": {"@vocab": EX,
                            "d": {"@id": EX + "d",
                                  "@type": XSD + "double"}},
               "@id": EX + "a", "d": ["1.5", 2]},
    ),
]



CASES += [
    dict(
        name="type-scoped-propagation-stops",
        input={"@context": {"@vocab": EX,
                            "Widget": {"@id": EX + "Widget",
                                       "@context": {"part": EX + "wPart"}}},
               "@id": EX + "a", "@type": "Widget",
               "part": "scoped-here",
               "child": {"@id": EX + "b", "part": "not-scoped-here"}},
    ),
    dict(
        name="protected-scoped-override-ok",
        input={"@context": [{"@protected": True, "name": EX + "name"},
                            {"@vocab": EX,
                             "detail": {"@id": EX + "detail",
                                        "@context": {"name": EX + "altName"}}}],
               "@id": EX + "a", "name": "top",
               "detail": {"name": "overridden-in-scope"}},
    ),
    dict(
        name="container-language-set",
        input={"@context": {"@vocab": EX,
                            "label": {"@id": EX + "label",
                                      "@container": ["@language", "@set"]}},
               "@id": EX + "a",
               "label": {"en": ["one", "two"]}},
    ),
    dict(
        name="index-map-graph-combined",
        input={"@context": {"@vocab": EX,
                            "claims": {"@id": EX + "claims",
                                       "@container": ["@graph", "@index"],
                                       "@index": EX + "source"}},
               "@id": EX + "a",
               "claims": {"src1": {"said": "x"}}},
        op_override=["expand"],
    ),
]



CASES += [
    dict(
        name="compact-property-index-map",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX,
                            "prop": {"@id": EX + "prop",
                                     "@container": "@index",
                                     "@index": EX + "indexProp"}},
               "@id": EX + "a",
               "prop": {"k1": {"@id": EX + "v1", "name": "one"},
                        "k2": {"@id": EX + "v2", "name": "two"}}},
        context={"@vocab": EX,
                 "prop": {"@id": EX + "prop", "@container": "@index",
                          "@index": EX + "indexProp"}},
    ),
    dict(
        name="id-map-none-key",
        input={"@context": {"@vocab": EX,
                            "post": {"@id": EX + "post",
                                     "@container": "@id"}},
               "@id": EX + "a",
               "post": {"@none": {"title": "anon"},
                        EX + "p1": {"title": "T1"}}},
    ),
    dict(
        name="curie-longest-prefix",
        op_override=["compact"],
        input=[{"@id": "http://long.org/ns/sub/x",
                "http://long.org/ns/p": [{"@value": "v"}]}],
        context={"short": "http://long.org/",
                 "longer": "http://long.org/ns/",
                 "longest": "http://long.org/ns/sub/"},
        options={"skipExpansion": True},
    ),
    dict(
        name="fromrdf-malformed-list",
        op_override=["fromRDF"],
        input=quads(
            (EX + "a", EX + "items", "_:m1"),
            ("_:m1", RDF_NS + "first", _lit("x")),
            ("_:m1", RDF_NS + "rest", EX + "not-a-list-node")),
    ),
    dict(
        name="type-set-container",
        input={"@context": {"@vocab": EX,
                            "type": {"@id": "@type",
                                     "@container": "@set"}},
               "@id": EX + "a", "type": ["T1"], "p": "v"},
    ),
]



CASES += [
    dict(
        name="frame-requireall-with-default",
        op_override=["frame"],
        input=FRAME_DOC,
        frame={"@context": {"@vocab": EX}, "@requireAll": True,
               "@type": "Book", "title": {},
               "creator": {"@default": "anonymous"}},
    ),
    dict(
        name="direction-no-rdfdirection",
        op_override=["expand", "toRDF"],
        input={"@context": {"@vocab": EX, "@direction": "rtl",
                            "@language": "ar"},
               "@id": EX + "a", "t": "نص"},
    ),
    dict(
        name="double-reverse-unwraps",
        input={"@context": {"@vocab": EX,
                            "children": {"@reverse": EX + "parent"}},
               "@id": EX + "a",
               "@reverse": {"children": {"@id": EX + "b"}}},
    ),
    dict(
        name="compact-graph-option",
        op_override=["compact"],
        input=[{"@id": EX + "a", EX + "p": [{"@value": "v"}]}],
        context={"@vocab": EX},
        options={"skipExpansion": True, "graph": True},
    ),
]



CASES += [
    dict(
        name="expand-error-cyclic-terms",
        op_override=["expand-error"],
        input={"@context": {"a": "b:suffix", "b": "a:suffix"},
               "a:x": "v"},
    ),
    dict(
        name="expand-error-empty-term",
        op_override=["expand-error"],
        input={"@context": {"": EX + "empty"}, "x": "v"},
    ),
    dict(
        name="expand-error-invalid-container-1.0",
        op_override=["expand-error"],
        input={"@context": {"@vocab": EX,
                            "p": {"@id": EX + "p", "@container": "@id"}},
               "@id": EX + "a", "p": {EX + "k": {"v": "x"}}},
        options={"processingMode": "json-ld-1.0"},
    ),
    dict(
        name="graph-index-set-container",
        input={"@context": {"@vocab": EX,
                            "claims": {"@id": EX + "claims",
                                       "@container": ["@graph", "@index",
                                                       "@set"]}},
               "@id": EX + "a",
               "claims": {"i1": [{"said": "x"}, {"said": "y"}]}},
    ),
    dict(
        name="frame-json-values",
        op_override=["frame"],
        input={"@context": {"@vocab": EX,
                            "cfg": {"@id": EX + "cfg",
                                    "@type": "@json"}},
               "@id": EX + "a", "@type": "T",
               "cfg": {"x": [1, 2]}},
        frame={"@context": {"@vocab": EX,
                            "cfg": {"@id": EX + "cfg",
                                    "@type": "@json"}},
               "@type": "T"},
    ),
    dict(
        name="term-id-none-keyword",
        input={"@context": {"@vocab": EX,
                            "skipme": {"@id": None}},
               "@id": EX + "a", "skipme": "dropped", "kept": "v"},
    ),
]



CASES += [
    dict(
        name="nested-properties-deep",
        input={"@context": {"@vocab": EX, "knows": {"@type": "@id"}},
               "@id": EX + "a",
               "p": {"q": {"r": {"s": {"@id": EX + "deep",
                                        "t": "bottom"}}}}},
    ),
    dict(
        name="shared-bnode-subtree",
        input={"@context": {"@vocab": EX},
               "@graph": [
                   {"@id": EX + "x", "p": {"@id": "_:shared", "v": "s"}},
                   {"@id": EX + "y", "p": {"@id": "_:shared"}}]},
    ),
    dict(
        name="numeric-keys-ignored",
        input={"@context": {"@vocab": EX},
               "@id": EX + "a", "p": "kept",
               "not:a/valid iri": "dropped?"},
    ),
    dict(
        name="value-null-dropped",
        input={"@context": {"@vocab": EX}, "@id": EX + "a",
               "p": [None, "kept", None], "q": {"@value": None}},
    ),
    dict(
        name="compact-index-on-node",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "a",
               "p": {"@id": EX + "n", "@index": "i9", "v": "x"}},
        context={"@vocab": EX},
    ),
]



CASES += [
    dict(
        name="term-chain-resolution",
        input={"@context": {"b": EX + "target", "a": "b"},
               "@id": EX + "x", "a": "via-chain"},
    ),
    dict(
        name="compact-reverse-block-no-term",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                "@reverse": {EX + "parent": [{"@id": EX + "kid"}]}}],
        context={"@vocab": EX},
        options={"skipExpansion": True},
    ),
    dict(
        name="type-set-container-roundtrip",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX,
                            "contains": {"@id": EX + "contains",
                                         "@container": ["@type", "@set"]}},
               "@id": EX + "a",
               "contains": {EX + "TA": {"@id": EX + "x", "v": "1"}}},
        context={"@vocab": EX,
                 "contains": {"@id": EX + "contains",
                              "@container": ["@type", "@set"]}},
    ),
    dict(
        name="base-null-relative-ids",
        input={"@context": {"@base": None, "@vocab": EX,
                            "r": {"@id": EX + "r", "@type": "@id"}},
               "@id": "stays-relative", "r": "also-relative",
               "p": "v"},
    ),
]



CASES += [
    dict(
        name="language-set-term-selection",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "lab": [{"@value": "one", "@language": "en"},
                             {"@value": "two", "@language": "en"}]}],
        context={"@vocab": EX,
                 "laben": {"@id": EX + "lab", "@language": "en",
                           "@container": "@set"}},
        options={"skipExpansion": True},
    ),
    dict(
        name="list-term-selection",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "seq": [{"@list": [{"@value": 1}, {"@value": 2}]}]}],
        context={"@vocab": EX,
                 "seqlist": {"@id": EX + "seq", "@container": "@list"}},
        options={"skipExpansion": True},
    ),
    dict(
        name="index-container-strips-index",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX,
                            "vals": {"@id": EX + "vals",
                                     "@container": "@index"}},
               "@id": EX + "a",
               "vals": {"k": {"@value": 7, "@index": "k"}}},
        context={"@vocab": EX,
                 "vals": {"@id": EX + "vals", "@container": "@index"}},
    ),
    dict(
        name="graph-container-none-key",
        input={"@context": {"@vocab": EX,
                            "claims": {"@id": EX + "claims",
                                       "@container": ["@graph",
                                                       "@index"]}},
               "@id": EX + "a",
               "claims": {"@none": {"said": "unindexed"}}},
    ),
    # ----- expansionMap event-stream parity (ref lib/jsonld.js:109-117;
    # scenarios mined from ref tests/misc.js:482-1700) -----------------
    dict(
        name="emap-unmapped-term",
        op_override=["expandEvents"],
        input={"@context": {"definedTerm": "https://example.com#definedTerm"},
               "definedTerm": "is defined", "testUndefined": "is undefined"},
    ),
    dict(
        name="emap-unmapped-nested",
        op_override=["expandEvents"],
        input={"@context": {"definedTerm": "https://example.com#definedTerm"},
               "definedTerm": {"testUndefined": "is undefined"}},
    ),
    dict(
        name="emap-relative-id",
        op_override=["expandEvents"],
        input={"@context": {"definedTerm": "https://example.com#definedTerm"},
               "@id": "relativeiri", "definedTerm": "is defined"},
    ),
    dict(
        name="emap-relative-id-nested",
        op_override=["expandEvents"],
        input={"@context": {"definedTerm": "https://example.com#definedTerm"},
               "@id": "urn:absoluteIri",
               "definedTerm": {"@id": "relativeiri"}},
    ),
    dict(
        name="emap-relative-aliased-id",
        op_override=["expandEvents"],
        input={"@context": {"id": "@id",
                            "definedTerm": "https://example.com#definedTerm"},
               "id": "relativeiri", "definedTerm": "is defined"},
    ),
    dict(
        name="emap-relative-type",
        op_override=["expandEvents"],
        input={"@context": {"definedTerm": "https://example.com#definedTerm"},
               "id": "urn:absoluteiri", "@type": "relativeiri",
               "definedTerm": "is defined"},
    ),
    dict(
        name="emap-relative-type-scoped",
        op_override=["expandEvents"],
        input={"@context": {
                   "definedType": {
                       "@id": "https://example.com#definedType",
                       "@context": {
                           "definedTerm": "https://example.com#definedTerm"}}},
               "id": "urn:absoluteiri", "@type": "definedType",
               "definedTerm": {"@type": "relativeiri"}},
    ),
    dict(
        name="emap-relative-multi-types",
        op_override=["expandEvents"],
        input={"@context": {"definedTerm": "https://example.com#definedTerm"},
               "id": "urn:absoluteiri",
               "@type": ["relativeiri", "anotherRelativeiri"],
               "definedTerm": "is defined"},
    ),
    dict(
        name="emap-relative-aliased-type",
        op_override=["expandEvents"],
        input={"@context": {"type": "@type",
                            "definedTerm": "https://example.com#definedTerm"},
               "id": "urn:absoluteiri", "type": "relativeiri",
               "definedTerm": "is defined"},
    ),
    dict(
        name="emap-base-dot-slash",
        op_override=["expandEvents"],
        input={"@context": {"@base": "./"}, "@id": "relativeiri"},
    ),
    dict(
        name="emap-vocab-dot-slash",
        op_override=["expandEvents"],
        input={"@context": {"@vocab": "./"}, "@type": "relativeiri"},
    ),
    dict(
        name="emap-prepended-vocab",
        op_override=["expandEvents"],
        input={"@context": {"@vocab": "http://example.com/"},
               "term": "termValue"},
    ),
    dict(
        name="emap-prepended-vocab-type",
        op_override=["expandEvents"],
        input={"@context": {"@vocab": "http://example.com/"},
               "@type": "relativeIri"},
    ),
    dict(
        name="emap-prepended-base-id",
        op_override=["expandEvents"],
        input={"@context": {"@base": "http://example.com/"},
               "@id": "relativeIri"},
    ),
    dict(
        name="emap-free-floating-node",
        op_override=["expandEvents"],
        input={"@context": {"@vocab": EX}, "@id": EX + "only-id"},
    ),
    dict(
        name="emap-null-value-drop",
        op_override=["expandEvents"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "a", "dropped": None, "kept": "v"},
    ),
    dict(
        name="emap-lone-language",
        op_override=["expandEvents"],
        input={"@context": {"@vocab": EX}, "@id": EX + "a",
               "prop": {"@language": "en"}},
    ),
    dict(
        name="emap-empty-value",
        op_override=["expandEvents"],
        input={"@context": {"@vocab": EX}, "@id": EX + "a",
               "prop": {"@value": None}},
    ),
    dict(
        name="emap-dropped-array-element",
        op_override=["expandEvents"],
        input={"@context": {"@vocab": EX}, "@id": EX + "a",
               "prop": [{"@value": None}, "kept"]},
    ),
    dict(
        name="emap-json-literal-type",
        op_override=["expandEvents"],
        input={"@context": {"@vocab": EX, "jt": "@json"},
               "@id": EX + "a",
               "meta": {"@type": "jt", "@value": {"deep": [1, None]}}},
    ),
    # round-2 adversarial mining: spec corners not covered above -----
    dict(
        name="term-cycle-error",
        op_override=["expand-error"],
        input={"@context": {"a": "b:x", "b": "a:y"}, "a:p": "v"},
    ),
    dict(
        name="version-11-in-10-mode-error",
        op_override=["expand-error"],
        input={"@context": {"@version": 1.1, "t": EX + "t"}, "t": "v"},
        options={"processingMode": "json-ld-1.0"},
    ),
    dict(
        name="empty-vocab-resolves-base",
        input={"@context": {"@base": "http://base.org/doc", "@vocab": ""},
               "@id": "http://base.org/doc", "term": "v"},
    ),
    dict(
        name="null-id-term-dropped",
        input={"@context": {"dropped": None, "kept": EX + "kept"},
               "@id": EX + "a", "dropped": "gone", "kept": "v"},
    ),
    dict(
        name="nested-nest-alias",
        input={"@context": {"@vocab": EX, "meta": "@nest",
                            "inner": {"@nest": "meta"}},
               "@id": EX + "a",
               "meta": {"inner": "v", "direct": "w"}},
    ),
    dict(
        name="type-map-id-coercion-keys",
        input={"@context": {"@vocab": EX,
                            "byType": {"@id": EX + "byType",
                                       "@container": "@type"}},
               "@id": EX + "a",
               "byType": {"Alpha": {"p": "x"}, "ex:Beta": {"p": "y"}}},
    ),
    dict(
        name="json-in-list",
        input={"@context": {"@vocab": EX,
                            "jl": {"@id": EX + "jl", "@type": "@json",
                                   "@container": "@list"}},
               "@id": EX + "a", "jl": [{"k": 1}, [2, 3]]},
    ),
    dict(
        name="list-of-lists-11",
        input={"@context": {"@vocab": EX,
                            "ll": {"@id": EX + "ll",
                                   "@container": "@list"}},
               "@id": EX + "a", "ll": [["x", "y"], ["z"]]},
    ),
    dict(
        name="value-with-index",
        input={"@context": {"@vocab": EX},
               "@id": EX + "a",
               "p": {"@value": 5, "@index": "i0"}},
    ),
    dict(
        name="rdf-direction-i18n",
        op_override=["expand", "toRDF"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "a",
               "p": {"@value": "hello", "@language": "en",
                     "@direction": "rtl"}},
        options={"rdfDirection": "i18n-datatype"},
    ),
    dict(
        name="protected-same-redefinition-ok",
        input={"@context": [
                   {"@protected": True, "t": {"@id": EX + "t"}},
                   {"t": {"@id": EX + "t"}}],
               "@id": EX + "a", "t": "v"},
    ),
    dict(
        name="compact-to-relative-false",
        op_override=["compact"],
        input=[{"@id": "http://base.org/dir/doc1",
                EX + "link": [{"@id": "http://base.org/dir/other"}]}],
        context={"@base": "http://base.org/dir/",
                 "link": {"@id": EX + "link", "@type": "@id"}},
        options={"skipExpansion": True, "compactToRelative": False,
                 "base": "http://base.org/dir/"},
    ),
    dict(
        name="keyword-form-term-ignored",
        input={"@context": {"@ignoreMe": EX + "x", "t": EX + "t"},
               "@id": EX + "a", "t": "v", "@ignoreMe": "dropped"},
    ),
    dict(
        name="graph-reverse-combined",
        input={"@context": {"@vocab": EX,
                            "claimedBy": {"@reverse": EX + "claims"}},
               "@id": EX + "a",
               "claimedBy": {"@id": EX + "b", "p": "v"}},
    ),
    dict(
        name="frame-embed-last-legacy",
        op_override=["frame"],
        input={"@context": {"@vocab": EX},
               "@graph": [
                   {"@id": EX + "a", "knows": [{"@id": EX + "c"}]},
                   {"@id": EX + "b", "knows": [{"@id": EX + "c"}]},
                   {"@id": EX + "c", "name": "shared"}]},
        frame={"@context": {"@vocab": EX},
               "@type": [], "knows": {}},
        options={"processingMode": "json-ld-1.0", "embed": "@last"},
    ),
    dict(
        name="frame-embed-boolean-legacy",
        op_override=["frame"],
        input={"@context": {"@vocab": EX},
               "@graph": [
                   {"@id": EX + "a", "knows": [{"@id": EX + "c"}]},
                   {"@id": EX + "c", "name": "shared"}]},
        frame={"@context": {"@vocab": EX}, "knows": {}},
        options={"processingMode": "json-ld-1.0", "embed": False},
    ),
    dict(
        name="frame-default-null",
        op_override=["frame"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "a", "present": "v"},
        frame={"@context": {"@vocab": EX},
               "present": {}, "missing": {"@default": "@null"}},
    ),
    dict(
        name="fromrdf-use-rdf-type",
        op_override=["fromRDF"],
        input=[{"subject": {"termType": "NamedNode", "value": EX + "a"},
                "predicate": {"termType": "NamedNode",
                              "value": "http://www.w3.org/1999/02/"
                                       "22-rdf-syntax-ns#type"},
                "object": {"termType": "NamedNode", "value": EX + "T"},
                "graph": {"termType": "DefaultGraph", "value": ""}}],
        options={"useRdfType": True},
    ),
    dict(
        name="context-direction-language-map",
        input={"@context": {"@vocab": EX, "@direction": "rtl",
                            "lm": {"@id": EX + "lm",
                                   "@container": ["@language", "@set"]}},
               "@id": EX + "a",
               "lm": {"ar": ["x", "y"], "@none": "z"}},
    ),
    dict(
        name="compact-reverse-property",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX,
                            "claimedBy": {"@reverse": EX + "claims"}},
               "@id": EX + "a",
               "claimedBy": [{"@id": EX + "b"}, {"@id": EX + "c"}]},
        context={"@vocab": EX,
                 "claimedBy": {"@reverse": EX + "claims"}},
    ),
    dict(
        name="frame-included",
        op_override=["frame"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "a", "name": "root",
               "@included": [{"@id": EX + "x", "name": "inc"}]},
        frame={"@context": {"@vocab": EX}, "@included": {}},
    ),
    # cases minimized from tools/difftest.py fuzz findings ------------
    dict(
        name="fuzz-graph-singleton-array",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "a",
               "@graph": [{"p": "x"}]},
        context={"@vocab": EX},
    ),
    dict(
        name="fuzz-list-singleton-unwrap",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "p": [{"@list": [{"@value": 1}, {"@value": 2}]}],
                EX + "q": [{"@list": []}]}],
        context={"@vocab": EX},
        options={"skipExpansion": True},
    ),
    dict(
        name="fuzz-empty-graph-preserved",
        op_override=["compact"],
        input=[{"@id": EX + "a", "@graph": [],
                EX + "p": [{"@value": "v"}]}],
        context={"@vocab": EX},
        options={"skipExpansion": True},
    ),
    dict(
        name="fuzz-base-dot-slash-compact",
        op_override=["expand", "compact"],
        input={"@context": {"@base": "./", "@vocab": EX},
               "@id": "relative-x", "p": "v"},
        context={"@base": "./", "@vocab": EX},
    ),
    dict(
        name="fuzz-type-container-defaults-id",
        input={"@context": {"@base": "http://base.org/",
                            "epsi": {"@id": EX + "epsi",
                                     "@container": "@type"}},
               "@id": "http://base.org/a", "epsi": "plain"},
    ),
    dict(
        name="fuzz-type-container-bad-type-error",
        op_override=["expand-error"],
        input={"@context": {"zeta": {"@id": EX + "zeta",
                                     "@container": "@type",
                                     "@type": "@json"}},
               "zeta": {"T": {"@id": EX + "x"}}},
    ),
    dict(
        name="fuzz-type-container-term-not-selected-for-type",
        op_override=["compact"],
        input=[{"@id": EX + "a", "@type": [EX + "alpha"]}],
        context={"alpha": {"@container": "@type", "@id": EX + "alpha"}},
        options={"skipExpansion": True},
    ),
    dict(
        # seed 121042: @included values must expand to STRICT node
        # objects — a bare node reference under a non-null/@graph
        # active property survives expansion and must error
        name="fuzz-included-reference-error",
        op_override=["expand-error"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "a",
               "p": {"@id": EX + "b",
                     "@included": {"@id": EX + "c"}}},
    ),
    dict(
        # seed 121053/121158: @included expands with the PARENT's
        # activeProperty, so an @id-only node under a null/@graph
        # active property is dropped free-floating and the EMPTY
        # @included array survives both expansion and compaction
        name="fuzz-included-freefloating-drop-empty-preserved",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "d",
               "@included": [{"@context": None, "@id": EX + "a"}],
               "p": "v"},
        context={"@vocab": EX},
    ),
    dict(
        # seed 121171: the reference's active-context clone drops
        # @direction (lib/context.js:1364-1385 copies only
        # @base/@language/@vocab), so the default direction dies at
        # every scoped/inline context processing step
        name="fuzz-direction-lost-on-scoped-context",
        op_override=["expand", "compact"],
        input={"@context": {"@direction": "rtl", "@vocab": EX,
                            "TypedThing": {
                                "@id": EX + "TypedThing",
                                "@context": {"scoped": EX + "scoped"}}},
               "@id": EX + "a",
               "plain_p": "top-keeps-rtl",
               "child": {"@type": "TypedThing",
                         "scoped": "direction-lost",
                         "other": "also-lost"}},
        context={"@direction": "rtl", "@vocab": EX,
                 "TypedThing": {"@id": EX + "TypedThing",
                                "@context": {"scoped": EX + "scoped"}}},
    ),
    dict(
        # seed 121172: selection prefs for "lang_dir" also try the
        # bare "_dir" form (ref lib/compact.js:1131-1137), so a term
        # with @direction alone wins for language+direction values
        name="fuzz-direction-only-term-selection",
        op_override=["expand", "compact"],
        input={"@context": {"@language": "de",
                            "gamma": {"@id": EX + "gamma",
                                      "@direction": "rtl"}},
               "@id": EX + "a", "gamma": "plain"},
        context={"@language": "de",
                 "gamma": {"@id": EX + "gamma", "@direction": "rtl"}},
    ),
    dict(
        # seed 181323: graph-container candidates are computed
        # INDEPENDENTLY of the reverse/list/value selection chain, so
        # a @container:@graph term is selected for a REVERSE graph
        # value (and the graph unwraps into the container)
        name="fuzz-reverse-graph-container-selection",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX,
                            "gamma": {"@container": "@graph"}},
               "@reverse": {"gamma": {}}},
        context={"@vocab": EX, "gamma": {"@container": "@graph"}},
    ),
    dict(
        # seed 185008: a FIRST context carrying boolean @propagate
        # triggers the previousContext-recording clone, which drops
        # processingMode (the reference clone copies only
        # @base/@language/@vocab) — the 1.0 keyword checks (including
        # @propagate's own 1.0 error and the @json type ban) then stop
        # firing and the engine behaves as 1.1
        name="fuzz-propagate-erases-processing-mode",
        op_override=["expand"],
        input={"@context": {"@propagate": False, "@vocab": EX,
                            "json_t": {"@id": EX + "j",
                                       "@type": "@json"}},
               "json_t": {"a": 1}},
        options={"processingMode": "json-ld-1.0"},
    ),
    dict(
        # seed 171174 layer 1: an EXPLICIT empty @container array is
        # truthy in JS ([] || '@none' keeps []), landing the term's
        # inverse entry under the '' key — never selectable; only an
        # ABSENT @container means '@none'
        name="fuzz-explicit-empty-container-unselectable",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "delta": [{"@id": EX + "b"}]}],
        context={"delta": {"@id": EX + "delta", "@container": []}},
        options={"skipExpansion": True},
    ),
    dict(
        # seed 171174 layer 2: the language-map simplification tests
        # the COMPACTED item for a literal "@value" key — when @value
        # is term-aliased the compacted dict keeps its object form
        # inside the language map
        name="fuzz-language-map-aliased-value-object",
        op_override=["expand", "compact"],
        input={"@context": {"value": "@value",
                            "delta": {"@id": EX + "delta",
                                      "@container": ["@language",
                                                     "@set"]}},
               "@id": EX + "a",
               "delta": {"en": ["y", "z"]}},
        context={"value": "@value",
                 "delta": {"@id": EX + "delta",
                           "@container": ["@language", "@set"]}},
    ),
    dict(
        # seed 172041: JS === compares objects/arrays by REFERENCE in
        # compareValues, so two equal-but-separately-built value
        # objects whose @type is an ARRAY (type-map expansion) never
        # dedup in the node map
        name="fuzz-array-type-value-objects-not-deduped",
        op_override=["flatten"],
        input={"@context": {"@vocab": EX,
                            "gamma": {"@container": "@type"}},
               "gamma": {"graph_t": [[[[0.1]]], 0.1]}},
    ),
    dict(
        # seed 163115 layer 1: mixed index-map/array items — a graph
        # object demotes the map into an ARRAY via addValue, and the
        # next map item's string-keyed assignment onto that array
        # silently vanishes (JS array-property GIGO, node-verified)
        name="fuzz-index-map-demoted-to-array-gigo",
        op_override=["compact"],
        input=[{"http://example.com/idx_t": [{"http://example.com/beta": [
            {"@index": "@id",
             "@value": "http://example.com/px#deep/leaf"},
            {"@graph": [], "@index": "gamma"},
            {"@index": "idmap_t"}]}]}],
        context={"@vocab": EX, "beta": {"@container": "@index"}},
        options={"skipExpansion": True},
    ),
    dict(
        # seed 163115 layer 2: an EMPTY @type array adds nothing in
        # expansion (addValue with propertyIsArray=false skips empty
        # arrays; only framing materializes [])
        name="fuzz-empty-type-array-dropped",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX},
               "p": {"@type": [], "q": "v"}},
        context={"@vocab": EX},
    ),
    dict(
        # seed 163115 layer 3: the @index term-selection candidate
        # guard is the PRESENCE of an @graph key (ref
        # lib/compact.js:724), so a non-graph node that has @graph
        # gets no @index candidates and falls back to the IRI key
        name="fuzz-index-candidates-blocked-by-graph-key",
        op_override=["compact"],
        input=[{"http://example.com/idx_t": [{"http://example.com/beta": [
            {"@graph": [], "@index": "gamma",
             "http://example.com/delta": [{}]}]}]}],
        context={"@vocab": EX, "beta": {"@container": "@index"}},
        options={"skipExpansion": True},
    ),
    dict(
        # seed 154053: the scoped context on activeProperty is applied
        # BEFORE value compaction (ref lib/compact.js:103-112), and its
        # processing clone drops the default @direction (reference
        # quirk) — so a direction-tagged value under a scoped-ctx term
        # stays an expanded value object instead of a plain string
        name="fuzz-scoped-ctx-kills-direction-before-compact-value",
        op_override=["expand", "compact"],
        input={"@context": {"@direction": "ltr",
                            "nested": {"@id": EX + "nested",
                                       "@context": {
                                           "inner": EX + "inner"}}},
               "@id": EX + "a",
               "nested": {"@value": "dl", "@language": "en",
                          "@direction": "ltr"}},
        context={"@direction": "ltr",
                 "nested": {"@id": EX + "nested",
                            "@context": {"inner": EX + "inner"}}},
    ),
    dict(
        # seed 92121: under a @type:@vocab term, selection prefs
        # depend on value['@id'] (a node REF whose @id compacts back
        # to the term's IRI prefers @vocab over @id) — mixed values
        # must not share one selection: the @id-less node object goes
        # under the absolute-IRI key while the vocab ref keeps the term
        name="fuzz-vocab-type-id-dependent-selection",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX, "@language": "en",
                            "beta": {"@id": EX + "beta",
                                     "@type": "@vocab"}},
               "@id": EX + "d",
               "beta": [-7, [True, ""], {"lang_t": -7}]},
        context={"@vocab": EX, "@language": "en",
                 "beta": {"@id": EX + "beta", "@type": "@vocab"}},
    ),
    dict(
        # seed 51015: a malformed value object whose @type is a LIST
        # (produced by expanding {"@type": iri, "@value": n} under a
        # @container:@type term) must compact without crashing — the
        # list never matches a term-selection map entry (JS GIGO), so
        # selection falls through to the @vocab-suffix path
        name="fuzz-type-container-list-type-value-gigo",
        op_override=["compact"],
        input=[{"@id": EX + "b",
                EX + "delta": [
                    {"@id": "http://www.w3.org/2001/XMLSchema#integer",
                     "@type": ["@type"]},
                    {"@value": 3, "@type": ["@value"]}]}],
        context={"@vocab": EX,
                 "delta": {"@id": EX + "delta", "@container": "@type"}},
        options={"skipExpansion": True},
    ),
    dict(
        name="fuzz-id-map-value-object-error",
        op_override=["expand-error"],
        input={"@context": {"delta": {"@id": EX + "delta",
                                      "@container": "@id",
                                      "@type": XSD + "double"}},
               "@id": EX + "d",
               "delta": {EX + "k": 42}},
    ),
    dict(
        name="fuzz-double-datatype-string-value",
        op_override=["toRDF"],
        input=[{"@id": EX + "a",
                EX + "p": [{"@value": "", "@type": XSD + "double"},
                           {"@value": "junk", "@type": XSD + "double"},
                           {"@value": "2.5", "@type": XSD + "double"}]}],
        options={"skipExpansion": True},
    ),
    dict(
        name="fuzz-empty-list-selects-list-term",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "p": [{"@list": []}, {"@value": True}]}],
        context={"plist": {"@id": EX + "p", "@container": "@list"}},
        options={"skipExpansion": True},
    ),
    dict(
        name="fuzz-list-into-id-map-none",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "p": [{"@value": 1}, {"@list": [{"@value": 2}]}]}],
        context={"pid": {"@id": EX + "p", "@container": "@id",
                         "@language": None}},
        options={"skipExpansion": True},
    ),
    dict(
        name="fuzz-frame-drops-falsy-values",
        op_override=["frame"],
        input={"@context": {"@vocab": EX}, "@id": EX + "c",
               "p": [False, 0, "", 1, "x", True]},
        frame={"@context": {"@vocab": EX}},
    ),
    dict(
        name="fuzz-flatten-reembed-order",
        op_override=["flatten", "expand"],
        input={"@context": {"@vocab": EX},
               "@id": EX + "a",
               "p": {"@id": EX + "b",
                     "back": {"@id": EX + "a", "p": "tail-value"}}},
    ),
    dict(
        name="fuzz-flatten-empty-property",
        op_override=["flatten"],
        input=[{"@id": EX + "a", EX + "p": [], EX + "q": [{"@value": 1}]}],
        options={"skipExpansion": True},
    ),
    dict(
        name="fuzz-graph-object-id-raw",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "g": [{"@id": "http://base.org/dir/sub",
                            "@graph": [{"@id": EX + "n",
                                        EX + "p": [{"@value": 1}]}]}]}],
        context={"@base": "http://base.org/dir/"},
        options={"skipExpansion": True},
    ),
    dict(
        name="fuzz-ctx-base-relativizes-compact",
        op_override=["compact"],
        input=[{"@id": "http://base.org/dir/doc-x",
                EX + "p": [{"@value": 1}]}],
        context={"@base": "http://base.org/dir/other"},
        options={"skipExpansion": True},
    ),
    dict(
        name="fuzz-base-null-keeps-absolute",
        op_override=["compact"],
        input=[{"@id": "http://base.org/dir/doc-x",
                EX + "p": [{"@value": 1}]}],
        context=[{"@base": "http://base.org/dir/"}, {"@base": None}],
        options={"skipExpansion": True},
    ),
    dict(
        name="fuzz-bare-list-in-graph",
        op_override=["expand", "flatten"],
        input={"@context": {"g": {"@id": EX + "g",
                                  "@container": ["@graph", "@index"]}},
               "g": {"k0": {"@list": ["x", "y"]}}},
    ),
    dict(
        name="fuzz-propagate-false-type-compact",
        op_override=["expand", "compact"],
        input={"@context": {"@propagate": False, "@vocab": EX,
                            "TypedThing": {
                                "@id": EX + "TypedThing",
                                "@context": {"scoped": EX + "scoped"}}},
               "@id": EX + "a", "@type": "TypedThing", "scoped": "v"},
        context={"@propagate": False, "@vocab": EX,
                 "TypedThing": {
                     "@id": EX + "TypedThing",
                     "@context": {"scoped": EX + "scoped"}}},
    ),
    dict(
        name="fuzz-type-map-reverts-scoped-ctx",
        input={"@context": {"@propagate": False, "@vocab": EX,
                            "beta": {"@id": EX + "beta"},
                            "delta": {"@id": EX + "delta",
                                      "@container": "@type"}},
               "@id": EX + "d",
               "delta": {"@none": {"@id": EX + "c",
                                   "beta": "dropped-after-revert"}}},
    ),
    dict(
        name="fuzz-fromrdf-native-types",
        op_override=["fromRDF"],
        input=[
            {"subject": {"termType": "NamedNode", "value": EX + "a"},
             "predicate": {"termType": "NamedNode", "value": EX + "p"},
             "object": {"termType": "Literal", "value": v,
                        "datatype": {"termType": "NamedNode",
                                     "value": XSD + dt}},
             "graph": {"termType": "DefaultGraph", "value": ""}}
            for v, dt in [("true", "boolean"), ("yes", "boolean"),
                          ("42", "boolean"), ("7", "integer"),
                          ("007", "integer"), ("5.0", "integer"),
                          ("junk", "integer"), ("2.5", "double"),
                          ("abc", "double"), ("x", "dateTime")]],
        options={"useNativeTypes": True},
    ),
    dict(
        name="fuzz-fromrdf-json-literal-always-parsed",
        op_override=["fromRDF"],
        input=[
            {"subject": {"termType": "NamedNode", "value": EX + "a"},
             "predicate": {"termType": "NamedNode", "value": EX + "p"},
             "object": {"termType": "Literal", "value": "[1,2]",
                        "datatype": {"termType": "NamedNode",
                                     "value": "http://www.w3.org/1999/02/"
                                              "22-rdf-syntax-ns#JSON"}},
             "graph": {"termType": "DefaultGraph", "value": ""}}],
        options={},
    ),
    dict(
        name="fuzz-protected-false-cyclic-quirk",
        op_override=["expand-error"],
        input={"@context": {"@protected": False, "t": EX + "t"},
               "t": "v"},
    ),
    dict(
        name="fuzz-reverse-keyword-error",
        op_override=["expand-error"],
        input={"@context": {"t5": {"@reverse": "@id"}}, "t5": "v"},
    ),
    dict(
        name="fuzz-propagate-10-error",
        op_override=["expand-error"],
        input={"@context": {"@propagate": True, "t": EX + "t"}, "t": "v"},
        options={"processingMode": "json-ld-1.0"},
    ),
    dict(
        name="fuzz-container-pair-without-set-error",
        op_override=["expand-error"],
        input={"@context": {"t4": {"@id": EX + "t4",
                                   "@container": ["@index", "@id"]}},
               "t4": {"k": "v"}},
    ),
    dict(
        name="fuzz-iri-form-term-must-match",
        op_override=["expand-error"],
        input={"@context": {"pref": {"@id": EX + "p#", "@prefix": True},
                            "pref:suf": {"@id": EX + "other"},
                            "t2": {"@id": EX + "t2"}},
               "pref:x": "y"},
    ),
    dict(
        name="fuzz-array-type-value-object-coercion",
        op_override=["compact"],
        # degenerate value objects with ARRAY @type (producible via
        # @type-container prepending): JS coerces a single-element
        # array to its element on inverse-context lookup
        input=[{"@id": EX + "a",
                EX + "p": [
                    {"@type": [EX + "gamma"], "@value": False},
                    {"@type": [EX + "unknown"], "@value": 1},
                    {"@type": [EX + "gamma", EX + "T2"], "@value": 2}]}],
        context={"@vocab": EX, "gamma": EX + "gamma"},
        options={"skipExpansion": True},
    ),
    dict(
        name="fuzz-term-keys-mode10-error",
        op_override=["expand-error"],
        input={"@context": {"t6": {"@id": EX + "t6",
                                   "@direction": "ltr"}}, "t6": "v"},
        options={"processingMode": "json-ld-1.0"},
    ),
    # js-keyword terms (ref tests/misc.js:324-464): valueOf/toString are
    # Object.prototype properties in JS — the reference special-cases
    # them; in Python they are ordinary dict keys, but the OUTPUT must
    # match exactly
    dict(
        name="js-keywords-top",
        op_override=["expand", "compact"],
        input={"@context": {"valueOf": "http://example.org/valueOf",
                            "toString": "http://example.org/toString"},
               "valueOf": "first", "toString": "second"},
        context={"valueOf": "http://example.org/valueOf",
                 "toString": "http://example.org/toString"},
    ),
    dict(
        name="js-keywords-scoped",
        op_override=["expand"],
        input={"@context": {
                   "@version": 1.1,
                   "ex:thing": {
                       "@context": {
                           "valueOf": "http://example.org/valueOf",
                           "toString": "http://example.org/toString"}}},
               "ex:thing": {"valueOf": "first", "toString": "second"}},
    ),
    dict(
        name="js-keywords-frame",
        op_override=["frame"],
        input={"@context": {"@vocab": "http://example.org/"},
               "toString": {"valueOf": "thing"}},
        frame={"@context": {"@vocab": "http://example.org/"},
               "toString": {}},
    ),
    # _prefix flavor (ref lib/context.js:642-644 + :920 _deepCompare):
    # the stored `_prefix` is the raw JS expression value — false for
    # dict-form terms, null for simple string terms whose IRI does not
    # end in a gen-delim, the match array when it does. Protected
    # redefinition deep-compares these, so a dict→string redefinition
    # errors even with identical @id...
    dict(
        name="fuzz-protected-prefix-flavor-redef-error",
        op_override=["expand-error"],
        input={"@context": [{"@protected": True,
                             "alpha": {"@id": EX + "alpha"}},
                            {"alpha": EX + "alpha"}],
               "alpha": "v"},
    ),
    # ...while a string→string identical redefinition is a no-op
    dict(
        name="fuzz-protected-string-redef-ok",
        op_override=["expand"],
        input={"@context": [{"@protected": True, "alpha": EX + "alpha"},
                            {"alpha": EX + "alpha"}],
               "alpha": "v"},
    ),
    # ...and only gen-delims [:/?#\[\]@] make a simple term a usable
    # CURIE prefix: '&' (a sub-delim) and a blank-node @id do NOT, so
    # "p:suf" stays an absolute-IRI key instead of prefix-expanding
    dict(
        name="fuzz-subdelim-ending-term-not-prefix",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX, "p": EX + "amp&"},
               "p:suf": "v"},
        context={"@vocab": EX, "p": EX + "amp&"},
    ),
    dict(
        name="fuzz-bnode-id-term-not-prefix",
        op_override=["expand"],
        input={"@context": {"@vocab": EX, "b": "_:x"}, "b:suf": "v"},
    ),
    # 1.0 mode: the 1.1 gate on the @included branch (ref
    # lib/expand.js:550) fails, so @included falls through to the
    # GENERIC property path — expanded recursively and kept under
    # '@included' with no isSubject strictness (it is NOT dropped)
    dict(
        name="fuzz-included-mode10-generic-path",
        op_override=["expand"],
        input={"@context": {"@vocab": EX}, "@id": "relative-x",
               "@included": [{"@context": {"@vocab": "http://other.org/"},
                              "graph_t": 0.1, "set_t": ""}]},
        options={"processingMode": "json-ld-1.0"},
    ),
    # --- parity finds from the extended compact-option fuzz grammar ---
    # singleton @type unwraps to a string even under compactArrays=false
    # (ref lib/compact.js:253-255 has no option check)
    dict(
        name="fuzz-type-singleton-ignores-compactarrays",
        op_override=["compact"],
        input=[{"@id": EX + "a", "@type": [EX + "T1"],
                EX + "p": [{"@value": "v"}]}],
        context={"@vocab": EX},
        options={"skipExpansion": True, "compactArrays": False},
    ),
    # ...but a 1.1 @type alias with @container:@set forces the array
    # (typeAsSet, ref lib/compact.js:263-268)
    dict(
        name="fuzz-type-as-set-alias",
        op_override=["compact"],
        input=[{"@id": EX + "a", "@type": [EX + "T1"]}],
        context={"@version": 1.1, "@vocab": EX,
                 "type": {"@id": "@type", "@container": "@set"}},
        options={"skipExpansion": True},
    ),
    # container-map falsy keys route through compactIri('@none'): a term
    # ALIASING @none names the bucket (ref lib/compact.js:640-643), and
    # map values stay scalar under compactArrays=false — propertyIsArray
    # is @set-only in the map branch (ref :645-649)
    dict(
        name="fuzz-container-map-aliased-none-bucket",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "lbl": [{"@value": "tagged", "@language": "en"},
                             {"@value": "untagged"}]}],
        context={"@vocab": EX, "none": "@none",
                 "lbl": {"@id": EX + "lbl", "@container": "@language"}},
        options={"skipExpansion": True, "compactArrays": False},
    ),
    dict(
        name="fuzz-id-map-aliased-none-bucket",
        op_override=["compact"],
        input=[{"@id": EX + "a",
                EX + "post": [{EX + "t": [{"@value": "anon"}]},
                              {"@id": EX + "p1",
                               EX + "t": [{"@value": "named"}]}]}],
        context={"@version": 1.1, "@vocab": EX, "nada": "@none",
                 "post": {"@id": EX + "post", "@container": "@id"}},
        options={"skipExpansion": True, "compactArrays": False},
    ),
    # term-definition key order decides which error surfaces: @type is
    # validated BEFORE @container (ref lib/context.js:693-791), so
    # @type:@json in 1.0 mode beats an invalid container
    dict(
        name="fuzz-termdef-type-error-beats-container",
        op_override=["expand-error"],
        input={"@context": {"t": {"@id": EX + "t", "@type": "@json",
                                  "@container": "@graph"}},
               "t": "v"},
        options={"processingMode": "json-ld-1.0"},
    ),
    # @prefix guards: '/' in the term counts as compound (ref
    # lib/context.js:860 term.match(/:|\//))...
    dict(
        name="fuzz-prefix-on-slash-term-error",
        op_override=["expand-error"],
        input={"@context": {"a/b": {"@id": EX + "ab", "@prefix": True}},
               "a/b": "v"},
    ),
    # ...and a keyword @id may not be used as a prefix
    dict(
        name="fuzz-prefix-on-keyword-id-error",
        op_override=["expand-error"],
        input={"@context": {"kw": {"@id": "@type", "@prefix": True}},
               "kw": "v"},
    ),
    # expansion keeps a node-object @direction even in 1.0 mode — only
    # CONTEXT @direction is mode-gated (ref lib/expand.js:624-650 has no
    # processingMode check)
    dict(
        name="fuzz-value-direction-mode10-kept",
        op_override=["expand", "toRDF"],
        input={"@context": {"@vocab": EX},
               "p": {"@value": "x", "@direction": "ltr"}},
        options={"processingMode": "json-ld-1.0"},
    ),
    # compact with graph:true wraps the result in a top-level @graph
    dict(
        name="fuzz-compact-graph-option",
        op_override=["compact"],
        input=[{"@id": EX + "a", EX + "p": [{"@value": "v"}]}],
        context={"@vocab": EX},
        options={"skipExpansion": True, "graph": True,
                 "compactArrays": False},
    ),
    # list term selection: a node object in the list does NOT degrade
    # the common language (ref lib/compact.js:805 `&& _isValue(item)`),
    # so a @list+@language term still wins for [tagged-string, node];
    # item languages are lowercased for the inverse-ctx lookup
    dict(
        name="fuzz-list-common-language-node-item",
        op_override=["compact"],
        input=[{"@id": EX + "c",
                EX + "epsi": [{"@list": [
                    {"@value": "plain", "@language": "FR"},
                    {"@id": EX + "c",
                     EX + "beta": [{"@value": 1}]}]}]}],
        context={"@vocab": EX,
                 "epsi": {"@id": EX + "epsi", "@container": "@list",
                          "@language": "fr"}},
        options={"skipExpansion": True},
    ),
    # the compact revert-to-previous-context CLONES, and the clone
    # drops the default @direction (ref lib/context.js:1364-1385), so
    # a direction-tagged value inside a node under a type-scoped
    # context must NOT re-simplify after the revert (fuzz seed 952008)
    dict(
        name="fuzz-direction-dies-across-compact-revert",
        op_override=["compact"],
        input={"@context": {"@direction": "ltr", "@vocab": EX,
                            "TypedThing": {
                                "@id": EX + "TypedThing",
                                "@context": {"alpha": EX + "sa"}}},
               "@id": EX + "z", "@type": "TypedThing",
               "child": {"@id": EX + "c",
                         "nested": {"@value": "dl", "@language": "en",
                                    "@direction": "ltr"}}},
        context={"@direction": "ltr", "@vocab": EX,
                 "TypedThing": {"@id": EX + "TypedThing",
                                "@context": {"alpha": EX + "sa"}}},
    ),
    # frame @type validation (ref lib/util.js validateTypeValue via
    # expand isFrame): a lone @default object must hold ALL-string
    # values...
    dict(
        name="fuzz-frame-type-default-nonstring-error",
        op_override=["frame-error"],
        input={"@context": {"@vocab": EX}, "@id": EX + "a",
               "@type": "T1", "p": "v"},
        frame={"@context": {"@vocab": EX}, "@type": {"@default": 7}},
    ),
    # ...and a mixed ARRAY containing an object is invalid even in
    # frame mode — only a lone object passes validateTypeValue
    dict(
        name="fuzz-frame-type-array-object-error",
        op_override=["frame-error"],
        input={"@context": {"@vocab": EX}, "@id": EX + "a",
               "@type": "T1", "p": "v"},
        frame={"@context": {"@vocab": EX}, "@type": ["T1", {}]},
    ),
    # a valid @type default object: @default comes out of frame
    # expansion ARRAY-valued and fills unmatched nodes
    dict(
        name="fuzz-frame-type-default-fill",
        op_override=["frame"],
        input={"@context": {"@vocab": EX},
               "@graph": [{"@id": EX + "a", "@type": "T1", "p": "va"},
                          {"@id": EX + "b", "p": "vb"}]},
        frame={"@context": {"@vocab": EX}, "@type": {"@default": "T9"}},
    ),
    # legacy @embed flavors: the reference's 1.1 gate on @first/@last
    # (lib/frame.js:129-133) reads `state.is11`, which is never
    # assigned (only state.options.is11 is) — dead code, so legacy
    # flavors work in 1.1 mode (fuzz seed 960021)
    dict(
        name="fuzz-frame-embed-first-11-ok",
        op_override=["frame"],
        input={"@context": {"@vocab": EX},
               "@graph": [{"@id": EX + "a", "child": {"@id": EX + "c"}},
                          {"@id": EX + "c", "p": "leaf"}]},
        frame={"@context": {"@vocab": EX}, "@embed": "@first"},
    ),
    dict(
        name="fuzz-frame-embed-last-11-ok",
        op_override=["frame"],
        input={"@context": {"@vocab": EX},
               "@graph": [{"@id": EX + "a", "child": {"@id": EX + "c"}},
                          {"@id": EX + "b", "child": {"@id": EX + "c"}},
                          {"@id": EX + "c", "p": "leaf"}]},
        frame={"@context": {"@vocab": EX}, "@embed": "@last"},
    ),
    # an EXPLICIT null scoped context is PROCESSED, never skipped
    # (absent=undefined vs stored null, ref getContextValue): a null
    # TYPE-scoped context runs without overrideProtected and raises
    # 'invalid context nullification' over protected terms (fuzz seed
    # 962041)...
    dict(
        name="fuzz-null-type-scoped-ctx-protected-error",
        op_override=["expand-error"],
        input={"@context": {"@protected": True, "@vocab": EX,
                            "NType": {"@id": EX + "NType",
                                      "@context": None}},
               "@type": "NType", "p": "v"},
    ),
    # ...while a null PROPERTY-scoped context resets the context for
    # the subtree (overrideProtected allows it) — the inner term must
    # NOT resolve through the outer @vocab after the reset
    dict(
        name="fuzz-null-property-scoped-ctx-reset",
        op_override=["expand", "compact"],
        input={"@context": {"@vocab": EX,
                            "reset_t": {"@id": EX + "reset_t",
                                        "@context": None}},
               "@id": EX + "a",
               "reset_t": {"@id": EX + "inner", "plain": "dropped"}},
        context={"@vocab": EX,
                 "reset_t": {"@id": EX + "reset_t", "@context": None}},
    ),
    # @import is processed AFTER @version..@propagate, so a 1.0-mode
    # ctx with BOTH @direction and @import raises @direction's
    # 'invalid context member' first (fuzz seed 966082)
    dict(
        name="fuzz-direction-error-beats-import",
        op_override=["expand-error"],
        input={"@context": {"@vocab": EX, "@direction": "rtl",
                            "@import": 7},
               "p": "v"},
        options={"processingMode": "json-ld-1.0"},
    ),
    # @import's 1.0 gate fires FIRST in the @import branch — before
    # the string check and before any term-definition error (so it
    # wins over e.g. an invalid container elsewhere in the context);
    # it reads the ACTIVE ctx's mode (fuzz seeds 966121/966095)
    dict(
        name="fuzz-import-mode10-error",
        op_override=["expand-error"],
        input={"@context": {"@vocab": EX, "@import": 7,
                            "bad": {"@id": EX + "bad",
                                    "@container": ["@graph", "@set"]}},
               "bad": "v"},
        options={"processingMode": "json-ld-1.0"},
    ),
    # compact's keyword fallthrough (ref lib/compact.js:349-361) uses
    # addValue "as is" for EVERY keyword except @graph/@list/@included
    # — a GIGO @protected key surviving expansion (via a @graph@index
    # map whose key expands to a keyword) compacts back to a SCALAR
    # true, not [true] (fuzz seed 970175)
    dict(
        name="fuzz-compact-keyword-fallthrough-scalar",
        op_override=["expand", "compact", "toRDF"],
        input={"@context": {"@version": 1.1,
                            "beta": {"@container": ["@graph", "@index"],
                                     "@id": EX + "beta"}},
               "beta": {"@context": {"@protected": True, "newp": EX + "newp"},
                        "@id": "http://example.com/px#q",
                        "zeta": [2.5]}},
        context={"@version": 1.1,
                 "beta": {"@container": ["@graph", "@index"],
                          "@id": EX + "beta"}},
    ),
    # "@import"/"@propagate" are NOT in the reference's isKeyword
    # switch (lib/context.js:1473-1507): node-level properties named
    # "@import"/"@propagate" are keyword-FORM only and expand to null
    # (dropped), and a term with @id/@reverse "@import" is warned +
    # ignored, not a keyword-redefinition error
    dict(
        name="fuzz-import-propagate-not-keywords",
        input={"@context": {"ex": EX},
               "@import": "dropped", "@propagate": True,
               "ex:p": "kept"},
    ),
    dict(
        name="fuzz-term-id-import-ignored",
        input={"@context": {"t": {"@id": "@import"},
                            "r": {"@reverse": "@propagate"},
                            "ex": EX},
               "t": "dropped", "r": {"@id": EX + "x"}, "ex:p": 1},
    ),
    # the reference stores the context-@base chain WITHOUT options.base
    # (initial activeCtx has no @base; a relative @base resolves
    # against undefined → parse('') → "./" becomes "/") and prepends
    # options.base lazily at expandIri time — so @base:"./" under
    # options.base=http://base.org/dir/doc yields http://base.org/,
    # NOT http://base.org/dir/ (fuzz seeds 6000033/6000073)
    dict(
        name="fuzz-relative-base-chain-vs-options-base",
        input={"@context": {"@base": "./", "@vocab": "./rel#"},
               "@id": "relative-x", "p": "v",
               "nested": {"@id": "x/y", "q": 1}},
        options={"base": "http://base.org/dir/doc"},
    ),
    dict(
        name="fuzz-relative-base-chain-two-steps",
        input={"@context": [{"@base": "./"}, {"@base": "sub/"}],
               "@id": "leaf", "http://example.com/p": "v"},
        options={"base": "http://base.org/dir/doc"},
    ),
    # compactToRelative:false deletes the base BEFORE expansion (ref
    # lib/jsonld.js:158-160): relative @ids stay relative end-to-end
    dict(
        name="fuzz-compact-to-relative-false",
        op_override=["compact"],
        input={"@context": {"ex": EX},
               "@id": "relative-x", "ex:p": {"@id": "child/y"}},
        context={"ex": EX},
        options={"base": "http://base.org/dir/doc",
                 "compactToRelative": False},
    ),
    dict(
        name="emap-mixed-graph",
        op_override=["expandEvents"],
        input={"@context": {"@vocab": "http://example.com/",
                            "definedTerm": "https://example.com#definedTerm"},
               "@graph": [
                   {"@id": "rel-a", "definedTerm": "x",
                    "other": "vocab-mapped"},
                   {"@id": "urn:b", "@type": "relType",
                    "un mapped key": "dropped?"},
                   "free floating scalar"]},
    ),
]


# ----- adversarial unicode (round-5 fuzz dimension pinned as goldens):
# N-Quads escaping of control/astral/bidi chars, BCP47 case
# normalization, non-ASCII IRIs/CURIEs, JCS @json key ordering (JS
# sorts by UTF-16 code units — astral keys order differently than
# Python's default code-point sort), unicode index/language map keys.
CASES += [
    dict(
        name="unicode-iris",
        input={"@context": {"@vocab": EX, "px": {"@id": EX + "日本#",
                                                 "@prefix": True},
                            "link": {"@id": EX + "link", "@type": "@id"}},
               "@id": "http://例え.jp/パス",
               "link": [EX + "😀/astral", EX + "é/combining",
                        "urn:uni:✓", EX + "%C3%BC/pct"],
               "px:suffix✓": "curie-value"},
    ),
    dict(
        name="unicode-nquads-escaping",
        op_override=["expand", "toRDF"],
        input={"@context": {"@vocab": EX}, "@id": EX + "a",
               "ctrl": "belltab\tnl\nus",
               "quote": "q\"bs\\end",
               "astral": "\U0001f600\U0001f389",
               "bidi": "‮rtl‬ zw‍j",
               "combining": "é vs é"},
    ),
    dict(
        name="unicode-language-tags",
        input={"@context": {"@vocab": EX, "@language": "eN-LaTn-US",
                            "lmap": {"@id": EX + "lmap",
                                     "@container": "@language"}},
               "@id": EX + "a", "plain": "v",
               "lmap": {"EN": "upper-key", "de-419": "region",
                        "zh-HANT": ["a", "b"]},
               "tagged": {"@value": "x", "@language": "JA"}},
    ),
    dict(
        name="unicode-json-literal-jcs",
        op_override=["expand", "toRDF"],
        input={"@context": {"@vocab": EX,
                            "j": {"@id": EX + "j", "@type": "@json"}},
               "@id": EX + "a",
               "j": {"\U0001f600astral": 1, "zz": 2, "！full": 3,
                     "é": [True, ""], "Ω": {"nested": "µ"}}},
    ),
    dict(
        name="unicode-index-keys",
        input={"@context": {"@vocab": EX,
                            "vals": {"@id": EX + "vals",
                                     "@container": "@index"}},
               "@id": EX + "a",
               "vals": {"ключ": "cyrillic", "日本語": "cjk",
                        "k é": {"@value": 5}}},
    ),
]


def run_oracle(req: dict) -> dict:
    env = dict(os.environ, NODE_PATH=os.path.join(HARNESS, "node_modules"))
    out = subprocess.run(
        ["node", os.path.join(HARNESS, "oracle.js"), "/dev/stdin"],
        input=json.dumps(req), capture_output=True, text=True, env=env, timeout=60)
    if out.returncode != 0:
        raise RuntimeError(f"oracle failed: {out.stderr[-2000:]}")
    return json.loads(out.stdout)


def main() -> None:
    os.makedirs(FIXDIR, exist_ok=True)
    manifest = []
    for case in CASES:
        name = case["name"]
        ops = case.get("op_override", ["expand", "flatten", "toRDF"])
        entry = {"name": name, "ops": {}}
        with open(os.path.join(FIXDIR, f"{name}-in.json"), "w") as f:
            json.dump(case["input"], f, indent=1, sort_keys=True)
        if "context" in case:
            with open(os.path.join(FIXDIR, f"{name}-context.json"), "w") as f:
                json.dump(case["context"], f, indent=1, sort_keys=True)
            entry["context"] = f"{name}-context.json"
        if "documents" in case:
            with open(os.path.join(FIXDIR, f"{name}-documents.json"), "w") as f:
                json.dump(case["documents"], f, indent=1, sort_keys=True)
            entry["documents"] = f"{name}-documents.json"
        if "frame" in case:
            with open(os.path.join(FIXDIR, f"{name}-frame.json"), "w") as f:
                json.dump(case["frame"], f, indent=1, sort_keys=True)
            entry["frame"] = f"{name}-frame.json"
        if "options" in case:
            entry["options"] = case["options"]
        for op in ops:
            req_op = op.removesuffix("-error")
            req = {"op": req_op, "input": case["input"],
                   "options": case.get("options", {})}
            if "documents" in case:
                req["documents"] = case["documents"]
            if "frame" in case:
                req["frame"] = case["frame"]
            if req_op in ("flatten", "compact", "merge", "link") and \
                    "context" in case:
                req["context"] = case["context"]
            res = run_oracle(req)
            if op.endswith("-error"):
                assert not res["ok"], f"{name}: expected error, got {res}"
                entry["ops"][op] = {"error_code": res.get("code")}
                continue
            assert res["ok"], f"{name}/{op}: {res}"
            outfile = f"{name}-{op}-out.json"
            with open(os.path.join(FIXDIR, outfile), "w") as f:
                json.dump(res["result"], f, indent=1, sort_keys=True)
            entry["ops"][op] = {"expect": outfile}
        manifest.append(entry)
        print(f"generated {name}: {list(entry['ops'])}")
    with open(os.path.join(FIXDIR, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"{len(manifest)} fixtures → {FIXDIR}")


if __name__ == "__main__":
    sys.exit(main())
