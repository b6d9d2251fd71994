"""Property-based kernel invariants (hypothesis): expansion
idempotence, flatten idempotence, toRDF↔fromRDF round-trip stability —
on randomly generated JSON-LD documents.
"""
from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from jsonld_js_spark.kernel import expand, flatten, from_rdf, to_rdf
from jsonld_js_spark.testing import compare_triple_sets, normalize_quads

EX = "http://example.com/"
CTX = {
    "@vocab": EX,
    "id_term": {"@id": EX + "idTerm", "@type": "@id"},
    "int_term": {"@id": EX + "intTerm",
                 "@type": "http://www.w3.org/2001/XMLSchema#integer"},
    "lang_term": {"@id": EX + "langTerm", "@language": "en"},
    "list_term": {"@id": EX + "listTerm", "@container": "@list"},
}

_scalars = st.one_of(
    st.text(alphabet="abc xyz", min_size=0, max_size=8),
    st.integers(min_value=-10**6, max_value=10**6),
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-1e6, max_value=1e6),
    st.booleans(),
)

_terms = st.sampled_from(
    ["p", "q", "name", "id_term", "int_term", "lang_term", "list_term"])


def _nodes(depth: int):
    value = _scalars if depth == 0 else st.one_of(
        _scalars,
        st.deferred(lambda: _node_obj(depth - 1)),
        st.lists(_scalars, max_size=3),
    )
    return st.dictionaries(_terms, value, min_size=0, max_size=4)


def _node_obj(depth: int):
    return _nodes(depth).map(lambda d: dict(d))


docs = _nodes(2).map(lambda d: {"@context": CTX, "@id": EX + "root", **d})


@settings(max_examples=60, deadline=None)
@given(docs)
def test_expand_idempotent(doc):
    # idempotent AFTER the first application: the reference's own
    # relative-IRI resolution against the default '' base is not a
    # single-step fixed point ('' -> './' -> '/', verified against
    # jsonld.js — ref lib/url.js:141 prependBase's empty-result rule),
    # so parity means expand∘expand is the fixed point, not expand
    once = expand(doc)
    twice = expand(once)
    thrice = expand(twice)
    assert thrice == twice


@settings(max_examples=60, deadline=None)
@given(docs)
def test_flatten_idempotent_modulo_bnodes(doc):
    """Re-flattening may renumber blank nodes (the issuer labels in
    encounter order, which changes once references replace embeds —
    reference behavior too), so idempotence holds modulo bijection."""
    once = flatten(doc)
    twice = flatten(once)
    res = compare_triple_sets(
        normalize_quads(to_rdf(twice, {"skipExpansion": False})),
        normalize_quads(to_rdf(once, {"skipExpansion": False})))
    assert res["precision"] == 1.0 and res["recall"] == 1.0, res


@settings(max_examples=60, deadline=None)
@given(docs)
def test_tordf_fromrdf_roundtrip(doc):
    """to_rdf(from_rdf(to_rdf(doc))) preserves the triple set modulo
    blank-node bijection (lists round-trip through rdf:first/rest)."""
    quads1 = to_rdf(doc)
    back = from_rdf(quads1, {"useNativeTypes": False})
    quads2 = to_rdf(back)
    res = compare_triple_sets(normalize_quads(quads2),
                              normalize_quads(quads1))
    assert res["precision"] == 1.0 and res["recall"] == 1.0, res


@settings(max_examples=100, deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False))
def test_canonical_double_parses_back(v):
    """Canonical double lexical form round-trips to the same binary
    double (except -0 which canonicalizes to 0, matching JS)."""
    from jsonld_js_spark.kernel.util import canonical_double
    s = canonical_double(v)
    # 16 significant digits (toExponential(15)) — exact for any double
    # that needs <= 16 digits; doubles needing 17 lose the last digit
    # in the reference too, so compare at 16-digit precision
    assert float(s.replace("E", "e")) == \
        (0.0 if v == 0 else float(f"{v:.15e}"))
    # reference shape: optional sign, digits '.' digits, 'E', exponent
    import re
    assert re.fullmatch(r"-?\d\.\d+E-?\d+", s), s


@settings(max_examples=60, deadline=None)
@given(docs)
def test_compact_active_ctx_option_equal(doc):
    """options['activeCompactCtx'] + skipCopy must be a pure
    optimization: byte-identical output to the plain call (the Spark
    batch loops rely on this — see kg_api.compact_conversations_df)."""
    import json

    from jsonld_js_spark.kernel import compact
    from jsonld_js_spark.kernel.context import (
        initial_context, process_context,
    )
    opts = {"processingMode": "json-ld-1.1", "base": None}
    cctx = process_context(initial_context(opts), dict(CTX), opts)
    plain = compact(expand(doc), dict(CTX))
    fast = compact(expand(doc), dict(CTX),
                   {"skipCopy": True, "activeCompactCtx": cctx})
    assert json.dumps(plain, sort_keys=True) == \
        json.dumps(fast, sort_keys=True)


@settings(max_examples=60, deadline=None)
@given(docs)
def test_prepared_frame_option_equal(doc):
    """options['preparedFrame'] must be a pure optimization: identical
    framing output, and no state leak between consecutive calls (the
    expanded frame is deep-copied per call)."""
    import json

    from jsonld_js_spark.kernel import frame
    from jsonld_js_spark.kernel.api import prepare_frame
    for fr in ({"@context": CTX},
               {"@context": CTX, "p": {}},
               {"@context": CTX, "@type": EX + "T", "@requireAll": True}):
        prepared = prepare_frame(fr)
        plain = frame(doc, fr)
        fast1 = frame(doc, fr, {"preparedFrame": prepared})
        fast2 = frame(doc, fr, {"preparedFrame": prepared})
        assert json.dumps(plain, sort_keys=True) == \
            json.dumps(fast1, sort_keys=True)
        assert json.dumps(fast1, sort_keys=True) == \
            json.dumps(fast2, sort_keys=True)


def test_processed_ctx_cache_purity_across_options():
    """The processed-context cache rides the active-ctx object, which
    perf options can carry across API calls — a changed options.base
    or a different contextResolver must MISS, never serve the first
    call's result (CLAUDE.md memo-purity invariant)."""
    from jsonld_js_spark.kernel import expand
    from jsonld_js_spark.kernel.context import (
        initial_context, process_context)

    # same ctx VALUE, different resolver identities for @import
    ctx_with_import = {"@import": "http://r/ctx", "a": "http://e/a"}
    r1 = lambda url: {"@context": {"imp": "http://e/imp-ONE"}}
    r2 = lambda url: {"@context": {"imp": "http://e/imp-TWO"}}
    base_ctx = initial_context({})
    p1 = process_context(base_ctx, ctx_with_import,
                         {"contextResolver": r1})
    p2 = process_context(base_ctx, ctx_with_import,
                         {"contextResolver": r2})
    assert p1["mappings"]["imp"]["@id"] == "http://e/imp-ONE"
    assert p2["mappings"]["imp"]["@id"] == "http://e/imp-TWO"

    # same ctx VALUE, different options.base: relative @vocab resolves
    # against the base captured in the INITIAL ctx, so pin the base
    # difference through the option the dict branch reads
    shared = initial_context({})
    ctxv = {"rel_t": "http://e/t"}
    q1 = process_context(shared, ctxv, {"base": "http://one/"})
    q2 = process_context(shared, ctxv, {"base": "http://two/"})
    assert q1 is not q2  # distinct cache entries, not a stale hit

    # and the cache DOES hit for identical (value, options): same
    # object back, and identical expansion output either way
    q3 = process_context(shared, ctxv, {"base": "http://one/"})
    assert q3 is q1
    doc = [{"@context": {"v": "http://e/v"}, "v": "x"},
           {"@context": {"v": "http://e/v"}, "v": "y"}]
    assert expand(doc, {}) == [
        {"http://e/v": [{"@value": "x"}]},
        {"http://e/v": [{"@value": "y"}]}]


def test_kernel_package_is_spark_free():
    """CLAUDE.md invariant, mechanically enforced: no module under
    kernel/ imports pyspark (directly or via its module-level
    imports), so the kernel stays usable as a plain-Python library
    and importable on executors without a SparkSession."""
    import importlib
    import pkgutil
    import sys

    import jsonld_js_spark.kernel as k
    for m in pkgutil.iter_modules(k.__path__):
        importlib.import_module(f"jsonld_js_spark.kernel.{m.name}")
    offenders = []
    for name, mod in sys.modules.items():
        if not name.startswith("jsonld_js_spark.kernel"):
            continue
        for attr in vars(mod).values():
            mn = getattr(attr, "__module__", None) or \
                getattr(attr, "__name__", "")
            if isinstance(mn, str) and mn.split(".")[0] == "pyspark":
                offenders.append((name, mn))
    src_hits = []
    import pathlib
    for p in pathlib.Path(k.__path__[0]).glob("*.py"):
        if "pyspark" in p.read_text():
            src_hits.append(p.name)
    assert not offenders and not src_hits, (offenders, src_hits)
