"""Single-node JSON-LD API — same entry points as the reference
(ref lib/jsonld.js:122 compact, :268 expand, :369 flatten, :425 frame,
:563 normalize [out of scope], :614 fromRDF, :670 toRDF, :766 merge).

This facade is the pure-Python oracle the Spark pipeline is tested
against, and the engine the generic-document Arrow UDF path calls.
"""

from __future__ import annotations

import copy

from .context import ContextResolver, initial_context, process_context
from .expand import expand as _expand
from .nodemap import (
    create_merged_node_map, create_node_map, flatten as _flatten,
    merge_node_maps, relabel_blank_nodes,
)
from .rdf import (
    from_rdf as _from_rdf, parse_nquads, serialize_nquads, to_rdf as _to_rdf,
)
from .compact import compact as _compact, compact_iri
from .util import IdentifierIssuer, JsonLdError


def _options_with_defaults(options):
    options = dict(options or {})
    options.setdefault("base", None)
    options.setdefault("processingMode", "json-ld-1.1")
    options.setdefault("compactArrays", True)
    return options


def expand(doc, options=None):
    """jsonld.expand (ref lib/jsonld.js:268-354). `doc` is a parsed JSON
    value (no URL fetching — this sandbox engine is network-free; remote
    contexts resolve through options['contextResolver']).

    Performance options (used by the Spark kernel path):
    - options['activeCtx']: a pre-processed active context (the
      resolve-once / broadcast-once pattern — executors skip context
      processing entirely when every document shares one context);
    - options['skipCopy']: skip the defensive deepcopy when the caller
      owns the document.
    """
    options = _options_with_defaults(options)
    active_ctx = options.get("activeCtx") or initial_context(options)
    if not options.get("skipCopy"):
        doc = copy.deepcopy(doc)

    expand_context = options.get("expandContext")
    if expand_context is not None:
        ec = copy.deepcopy(expand_context)
        if isinstance(ec, dict) and "@context" in ec:
            ec = ec["@context"]
        active_ctx = process_context(active_ctx, ec, options)

    expanded = _expand(active_ctx, doc, None, options)

    # post-processing (ref lib/jsonld.js:338-351)
    if isinstance(expanded, dict) and "@graph" in expanded and \
            len(expanded) == 1:
        expanded = expanded["@graph"]
    elif expanded is None:
        expanded = []
    if not isinstance(expanded, list):
        expanded = [expanded]
    return expanded


def compact(doc, ctx, options=None):
    """jsonld.compact (ref lib/jsonld.js:122-248).

    Performance option (Spark loop paths): options['activeCompactCtx']
    — a pre-processed compaction context (the result of
    process_context(initial, ctx)). The caller must guarantee it was
    processed from the SAME `ctx` value; loop-invariant context
    processing then runs once per worker instead of once per document
    (the reference's own processed-context cache plays this role,
    ref lib/context.js:22-36 + lib/jsonld.js:152)."""
    options = _options_with_defaults(options)
    if ctx is None:
        raise JsonLdError("The compaction context must not be null.",
                          "invalid local context")
    # compactToRelative:false deletes the base BEFORE expansion too
    # (ref lib/jsonld.js:158-160) — relative @id inputs then stay
    # relative instead of resolving against the document base
    if options.get("compactToRelative") is False:
        options["base"] = None
    if options.get("skipExpansion"):
        expanded = doc
    else:
        expanded = expand(doc, options)

    ctx_value = ctx
    if isinstance(ctx_value, dict) and "@context" in ctx_value:
        ctx_value = ctx_value["@context"]
    active_ctx = options.get("activeCompactCtx")
    if active_ctx is None:
        active_ctx = initial_context(options)
        active_ctx = process_context(active_ctx, ctx_value, options)

    if options.get("framing"):
        options = dict(options)
        options.setdefault("graph", True)

    compacted = _compact(active_ctx, None, expanded, options)

    # cleanup (ref lib/jsonld.js:186-245)
    graph_alias = compact_iri(active_ctx, "@graph", vocab=True)
    if options.get("compactArrays", True) and \
            not options.get("graph") and isinstance(compacted, list):
        if len(compacted) == 1:
            compacted = compacted[0]
        elif len(compacted) == 0:
            compacted = {}
    elif options.get("graph") and isinstance(compacted, dict):
        compacted = [compacted]

    if isinstance(compacted, list):
        compacted = {graph_alias: compacted}

    if isinstance(ctx, dict) and "@context" in ctx:
        ctx = ctx["@context"]
    has_context = ctx is not None and ctx != {} and ctx != [] and \
        not (isinstance(ctx, dict) and len(ctx) == 0)
    if has_context and isinstance(compacted, dict):
        ordered = {"@context": ctx}
        ordered.update(compacted)
        compacted = ordered
    return compacted


def flatten(doc, ctx=None, options=None):
    """jsonld.flatten (ref lib/jsonld.js:369-405, lib/flatten.js:24-38)."""
    options = _options_with_defaults(options)
    expanded = expand(doc, options)
    flattened = _flatten(expanded)
    if ctx is None:
        return flattened
    opts = dict(options)
    opts["graph"] = True
    opts["skipExpansion"] = True
    return compact(flattened, ctx, opts)


def to_rdf(doc, options=None):
    """jsonld.toRDF (ref lib/jsonld.js:670-708). Returns quad tuples; pass
    options['format']='application/n-quads' for the N-Quads string."""
    options = _options_with_defaults(options)
    if options.get("skipExpansion"):
        expanded = doc
    else:
        expanded = expand(doc, options)
    dataset = _to_rdf(expanded, options)
    fmt = options.get("format")
    if fmt:
        # deprecated 'application/nquads' alias supported, anything
        # else is an error (ref lib/jsonld.js:693-706)
        if fmt in ("application/n-quads", "application/nquads"):
            return serialize_nquads(dataset)
        raise JsonLdError(f"Unknown output format: {fmt}.",
                          "unknown format")
    return dataset


# RDF dataset parsers by content-type (ref lib/jsonld.js:988-1015
# registerRDFParser/unregisterRDFParser + :614-640 format dispatch)
_RDF_PARSERS = {
    "application/n-quads": parse_nquads,
    "application/nquads": parse_nquads,
}


def register_rdf_parser(content_type: str, parser) -> None:
    """Register `parser(input) -> quads` for a content-type
    (ref lib/jsonld.js:1000-1002)."""
    _RDF_PARSERS[content_type] = parser


def unregister_rdf_parser(content_type: str) -> None:
    """(ref lib/jsonld.js:1009-1011)"""
    _RDF_PARSERS.pop(content_type, None)


def from_rdf(dataset, options=None):
    """jsonld.fromRDF (ref lib/jsonld.js:614-662). `dataset` may be a
    list of quad tuples, or a string in any registered format —
    a string with no explicit format defaults to N-Quads."""
    options = _options_with_defaults(options)
    if "format" not in options and isinstance(dataset, str):
        options["format"] = "application/n-quads"
    fmt = options.get("format")
    if fmt:
        parser = _RDF_PARSERS.get(fmt)
        if parser is None:
            raise JsonLdError(f"Unknown input format: {fmt}.",
                              "unknown format")
        dataset = parser(dataset)
    return _from_rdf(dataset, options)


def prepare_frame(frame_doc, options=None):
    """Loop-invariant half of frame(): process the frame's context and
    expand the FRAME once, for reuse across many input documents via
    options['preparedFrame'] (the Spark per-conversation loop — the
    frame is a constant; re-expanding it per document is pure waste).
    Pass the SAME option values (processingMode, base) that the
    frame() calls will use."""
    from .context import expand_iri

    options = _options_with_defaults(options)
    frame_context = {}
    if isinstance(frame_doc, dict) and "@context" in frame_doc:
        frame_context = frame_doc["@context"]
    active_ctx = process_context(initial_context(options), frame_context,
                                 options) if frame_context else \
        initial_context(options)
    fopts = dict(options)
    fopts["isFrame"] = True
    fopts["keepFreeFloatingNodes"] = True
    # never skipCopy the frame itself: the caller's frame_doc outlives
    # this call and expansion may mutate its input
    fopts.pop("skipCopy", None)
    expanded_frame = expand(frame_doc, fopts)
    frame_keys = [expand_iri(active_ctx, k, vocab=True)
                  for k in (frame_doc or {})]
    return {
        "frameContext": frame_context,
        "activeCtx": active_ctx,
        "expandedFrame": expanded_frame,
        "merged": "@graph" not in frame_keys,
    }


def frame(doc, frame_doc, options=None):
    """jsonld.frame (ref lib/jsonld.js:425-511): expand input + frame
    (frame in frame mode with free-floating nodes kept), run the
    framing algorithm over the merged (or default) graph, compact with
    framing enabled, then replace @null with null.

    options['preparedFrame'] (from prepare_frame) skips the per-call
    frame-context processing and frame expansion; the expanded frame
    is deep-copied per call so framing can never leak state between
    documents."""
    from .framing import cleanup_null, frame_merged_or_default

    options = _options_with_defaults(options)
    options.setdefault("embed", "@once")
    options.setdefault("explicit", False)
    options.setdefault("requireAll", False)
    options.setdefault("omitDefault", False)
    options.setdefault("bnodesToClear", [])

    prepared = options.get("preparedFrame")
    if prepared is None:
        prepared = prepare_frame(frame_doc, options)
        expanded_frame = prepared["expandedFrame"]
    else:
        expanded_frame = copy.deepcopy(prepared["expandedFrame"])
    frame_context = prepared["frameContext"]
    active_ctx = prepared["activeCtx"]
    # ref api.processingMode(ctx, 1.1): an UNSET mode counts as 1.1
    is11 = active_ctx.get("processingMode") in (None, "json-ld-1.1")
    options.setdefault("omitGraph", is11)
    options.setdefault("pruneBlankNodeIdentifiers", is11)

    expanded = expand(doc, options)

    fopts = dict(options)
    fopts["isFrame"] = True
    fopts["keepFreeFloatingNodes"] = True

    # frame the default graph if the frame mentions @graph, else merged
    fopts["merged"] = prepared["merged"]
    fopts["is11"] = is11

    framed = frame_merged_or_default(expanded, expanded_frame, fopts)

    copts = dict(fopts)
    copts["graph"] = not options["omitGraph"]
    copts["skipExpansion"] = True
    copts["link"] = {}
    copts["framing"] = True
    # active_ctx IS process_context(initial, frame_context) — reuse it
    copts["activeCompactCtx"] = active_ctx
    compacted = compact(framed, frame_context or {}, copts)

    copts["link"] = {}
    return cleanup_null(compacted, copts)


def create_node_map_api(doc, options=None):
    """jsonld.createNodeMap (ref lib/jsonld.js:714-737 + misc.js:63-79):
    expand, build the node map, merge all graphs into the default
    graph, return {node_id: node}."""
    options = _options_with_defaults(options)
    expanded = expand(doc, options)
    return create_merged_node_map(expanded)


def process_context_api(active_ctx, local_ctx, options=None):
    """jsonld.processContext (ref lib/jsonld.js:860-887): fold a local
    context into an active context (None → initial context)."""
    options = _options_with_defaults(options)
    if active_ctx is None:
        active_ctx = initial_context(options)
    if isinstance(local_ctx, dict) and "@context" in local_ctx:
        local_ctx = local_ctx["@context"]
    return process_context(active_ctx, local_ctx, options)


def link(doc, ctx=None, options=None):
    """jsonld.link (ref lib/jsonld.js:528-537): connect all node
    references in-memory = frame with a wildcard @embed:@link frame."""
    frame_doc = {}
    if ctx:
        frame_doc["@context"] = ctx
    frame_doc["@embed"] = "@link"
    return frame(doc, frame_doc, options)


def merge(docs, ctx=None, options=None):
    """jsonld.merge (ref lib/jsonld.js:766-856): expand each doc, relabel
    bnodes per-doc with an `_:b{i}-` prefixed issuer, build one shared node
    map, flatten, optionally compact."""
    options = _options_with_defaults(options)
    if not isinstance(docs, list):
        raise JsonLdError("Could not merge, 'docs' must be an array.",
                          "invalid input")
    expanded_docs = [expand(d, options) for d in docs]

    graphs = {"@default": {}}
    issuer = options.get("issuer") or IdentifierIssuer("_:b")
    merge_nodes = options.get("mergeNodes", True)
    for i, expanded in enumerate(expanded_docs):
        # uniquely relabel each doc's bnodes, then re-issue through the
        # shared issuer inside createNodeMap (ref lib/jsonld.js:800-830)
        doc = relabel_blank_nodes(expanded, IdentifierIssuer(f"_:b{i}-"))
        _graphs = graphs if (merge_nodes or i == 0) else {"@default": {}}
        create_node_map(doc, _graphs, "@default", issuer)
        if _graphs is not graphs:
            # merge document graphs but don't merge existing nodes
            for graph_name, node_map in _graphs.items():
                if graph_name not in graphs:
                    graphs[graph_name] = node_map
                    continue
                target = graphs[graph_name]
                for node_id, node in node_map.items():
                    if node_id not in target:
                        target[node_id] = node

    default_graph = merge_node_maps(graphs)
    flattened = []
    for key in sorted(default_graph.keys()):
        node = default_graph[key]
        if not (len(node) == 1 and "@id" in node):
            flattened.append(node)
    if ctx is None:
        return flattened
    opts = dict(options)
    opts["graph"] = True
    opts["skipExpansion"] = True
    return compact(flattened, ctx, opts)


__all__ = [
    "expand", "compact", "flatten", "frame", "link", "to_rdf",
    "from_rdf", "merge", "create_node_map_api", "process_context_api",
    "ContextResolver", "parse_nquads", "serialize_nquads",
    "relabel_blank_nodes", "create_merged_node_map", "JsonLdError",
]
