"""Parity with the reference's tests/misc.js behaviors not expressible
as document fixtures: format dispatch, JSON-literal errors, URL
predicates (ref tests/misc.js:78-322, 465-480)."""
from __future__ import annotations

import pytest

from jsonld_js_spark.kernel import JsonLdError, from_rdf, to_rdf
from jsonld_js_spark.kernel.util import is_absolute_iri

DOC = {"@id": "https://example.com/", "https://example.com/test": "test"}
NQ = '<https://example.com/> <https://example.com/test> "test" .\n'


def test_tordf_nquads_formats():
    """Both the standard and deprecated content types serialize
    (ref tests/misc.js:128-163)."""
    assert to_rdf(DOC, {"format": "application/n-quads"}) == NQ
    assert to_rdf(DOC, {"format": "application/nquads"}) == NQ


def test_tordf_unknown_format():
    with pytest.raises(JsonLdError) as e:
        to_rdf(DOC, {"format": "bogus"})
    assert e.value.code == "unknown format"


def test_fromrdf_nquads_formats():
    expect = [{"@id": "https://example.com/",
               "https://example.com/test": [{"@value": "test"}]}]
    assert from_rdf(NQ, {"format": "application/n-quads"}) == expect
    assert from_rdf(NQ, {"format": "application/nquads"}) == expect
    assert from_rdf("") == []  # empty input -> empty output


def test_fromrdf_unknown_format():
    with pytest.raises(JsonLdError) as e:
        from_rdf(NQ, {"format": "bogus"})
    assert e.value.code == "unknown format"


def test_invalid_json_literal():
    """(ref tests/misc.js:465-480; lib/fromRdf.js:302-306)"""
    nq = ('_:b0 <ex:p> "bogus"^^'
          '<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .')
    with pytest.raises(JsonLdError) as e:
        from_rdf(nq)
    assert e.value.code == "invalid JSON literal"


def test_url_is_absolute():
    """Exact truth table from the reference (ref tests/misc.js:302-321:
    scheme-form strings and blank nodes are absolute)."""
    for v in ("a:", "a:b", "a:b:c", "_:", "_:a", "_:a:b"):
        assert is_absolute_iri(v), v
    for v in (":", "a", "/:", "/a:", "/a:b", "_"):
        assert not is_absolute_iri(v), v


def test_skip_expansion_nonarray_value_raises():
    """skipExpansion hands the input verbatim to compaction; a
    non-array property value then raises exactly as the reference does
    (ref lib/compact.js:363-368 — verified vs node)."""
    from jsonld_js_spark.kernel import compact
    doc = [{"@id": "rel-s", "p": "bare-string"}]
    with pytest.raises(JsonLdError) as e:
        compact(doc, {"@vocab": "http://example.com/"},
                {"skipExpansion": True})
    assert "must be an array" in e.value.message
