"""Node Map Generation, merging, flattening — JSON-LD 1.1 API §7/§8.

Behavioral reference: lib/nodeMap.js:24-290, lib/flatten.js:24-38,
lib/util.js:365-369,440-464 (relabelBlankNodes). From-scratch Python.

Spark role (SURVEY.md §2.4): in the distributed pipeline this kernel runs
per-document inside Arrow UDFs to *emit* (graph, subject, predicate,
object) rows; the cross-document *merge* (this module's merge semantics:
set-union of property values, first-writer-wins @index/@type union) is a
Spark groupBy + dedup over those rows (operators/nodemap_merge.py).
"""

from __future__ import annotations

import copy

from .util import (
    JsonLdError, IdentifierIssuer, add_value, compare_values, has_value,
    is_keyword, is_value, is_list, is_subject_reference, is_blank_node_id,
)


def create_merged_node_map(expanded, issuer: IdentifierIssuer | None = None):
    """(ref lib/nodeMap.js:24-34)"""
    issuer = issuer or IdentifierIssuer("_:b")
    graphs = {"@default": {}}
    create_node_map(expanded, graphs, "@default", issuer)
    return merge_node_maps(graphs)


def _ref_ids(memo: dict, subject: dict, prop: str) -> set:
    """Per-(subject, prop) set of the @id values of elements currently
    in subject[prop] — a PURE optimization for the node-reference
    set-semantics insert. compare_values makes a subject reference
    {'@id': x} equal to an existing element IFF that element carries
    '@id' == x (the @value branch needs @value on BOTH sides), so the
    O(len) has_value scan per insert reduces exactly to set
    membership; without it a t-turn conversation pays O(t^2) dict
    compares on its hasTurn list (measured 2.7M element scans per 30k
    transcript rows). Built lazily from the live list (correct even if
    the subject predates this memo) and updated on every insert of an
    @id-bearing element; keyed by id(subject) — subjects stay alive in
    `graphs` for the memo's whole lifetime (one top-level
    create_node_map call), so keys cannot be recycled."""
    key = (id(subject), prop)
    s = memo.get(key)
    if s is None:
        existing = subject.get(prop)
        if existing is None:
            items = ()
        elif isinstance(existing, list):
            items = existing
        else:
            items = (existing,)
        s = {e["@id"] for e in items
             if isinstance(e, dict) and "@id" in e}
        memo[key] = s
    return s


def _add_ref(memo: dict, subject: dict, prop: str, id_) -> None:
    """add_value(subject, prop, {'@id': id_}, property_is_array=True,
    allow_duplicate=False) with the ref-memo replacing the list scan
    (identical semantics, see _ref_ids)."""
    s = _ref_ids(memo, subject, prop)
    if id_ in s:
        return
    s.add(id_)
    # no duplicate exists (the memo is exact), so skip the scan too
    add_value(subject, prop, {"@id": id_}, property_is_array=True)


def create_node_map(input_, graphs: dict, graph: str,
                    issuer: IdentifierIssuer, name: str | None = None,
                    list_: dict | None = None, _memo: dict | None = None):
    """Node Map Generation (ref lib/nodeMap.js:47-223)."""
    if _memo is None:
        _memo = {}
    if isinstance(input_, list):
        for node in input_:
            create_node_map(node, graphs, graph, issuer, None, list_, _memo)
        return

    if not isinstance(input_, dict):
        if list_ is not None:
            list_["@list"].append(input_)
        return

    # value objects (ref lib/nodeMap.js:62-82)
    if is_value(input_):
        if "@type" in input_:
            type_ = input_["@type"]
            if isinstance(type_, str) and type_.startswith("_:"):
                input_["@type"] = type_ = issuer.get_id(type_)
        if list_ is not None:
            list_["@list"].append(input_)
        return

    if list_ is not None and is_list(input_):
        result = {"@list": []}
        create_node_map(input_["@list"], graphs, graph, issuer, name, result,
                        _memo)
        list_["@list"].append(result)
        return
    # a bare list object OUTSIDE a list context falls through to the
    # subject path (ref lib/nodeMap.js:77: the isList branch is gated
    # on `list &&`): there isBlankNode() is false for it, so its name
    # is JS `undefined` — it lands under the literal 'undefined' key
    # with no @id in serialized output. Mirrored below.

    # node object ---------------------------------------------------------
    # relabel bnode @type values first (ref lib/nodeMap.js:87-94)
    if "@type" in input_:
        types = input_["@type"]
        new_types = []
        for t in (types if isinstance(types, list) else [types]):
            if isinstance(t, str) and t.startswith("_:"):
                t = issuer.get_id(t)
            new_types.append(t)
        input_["@type"] = new_types if isinstance(types, list) else new_types[0]

    if name is None:
        name = input_.get("@id")
        if is_list(input_):
            # JS-undefined name quirk (see gate above): keyed under
            # 'undefined', node carries no @id
            name = "undefined"
        elif "@id" in input_ and not isinstance(input_["@id"], str):
            # GIGO parity (verified vs node, fuzz seed 96000999): the
            # reference's isBlankNode() calls input['@id'].indexOf on
            # the PRESENT key — a null/non-string @id (e.g. a graph-id
            # map key that expanded to null) crashes with a TypeError,
            # not a JsonLdError
            raise TypeError(
                "Cannot read properties of null (reading 'indexOf')")
        elif name is None or is_blank_node_id(name):
            name = issuer.get_id(name)

    subjects = graphs.setdefault(graph, {})
    if name == "undefined" and is_list(input_):
        subject = subjects.setdefault(name, {})
    else:
        subject = subjects.setdefault(name, {"@id": name})

    if list_ is not None:
        list_["@list"].append({"@id": name})

    for property_ in sorted(input_.keys()):  # sorted (ref lib/nodeMap.js:111)
        objects = input_[property_]

        if property_ == "@id":
            continue

        # @reverse: invert onto the object node (ref lib/nodeMap.js:119-135)
        if property_ == "@reverse":
            referenced_node = {"@id": name}
            reverse_map = input_["@reverse"]
            for reverse_property, items in reverse_map.items():
                for item in items:
                    item_name = item.get("@id")
                    if "@id" in item and not isinstance(item_name, str):
                        # GIGO parity: the reference's isBlankNode(item)
                        # reads item['@id'].indexOf — present-but-null
                        # @id crashes (fuzz seed 96000999)
                        raise TypeError("Cannot read properties of null "
                                        "(reading 'indexOf')")
                    if item_name is None or is_blank_node_id(item_name):
                        item_name = issuer.get_id(item_name)
                    create_node_map(item, graphs, graph, issuer, item_name,
                                    None, _memo)
                    # ref-memo insert; keep the SAME referenced_node
                    # object across subjects (aliasing as in the ref)
                    tgt = subjects[item_name]
                    ids = _ref_ids(_memo, tgt, reverse_property)
                    if name not in ids:
                        ids.add(name)
                        add_value(tgt, reverse_property, referenced_node,
                                  property_is_array=True)
            continue

        # @graph: recurse with graph = name (ref lib/nodeMap.js:139-145)
        if property_ == "@graph":
            graphs.setdefault(name, {})
            g = graph if graph == "@merged" else name
            create_node_map(objects, graphs, g, issuer, None, None, _memo)
            continue

        # @included (ref lib/nodeMap.js:149-151)
        if property_ == "@included":
            create_node_map(objects, graphs, graph, issuer, None, None,
                            _memo)
            continue

        # other keywords copied (ref lib/nodeMap.js:154-166)
        if property_ != "@type" and is_keyword(property_):
            if property_ == "@index" and "@index" in subject and \
                    (input_["@index"] != subject["@index"] or
                     (isinstance(input_["@index"], dict) and
                      input_["@index"].get("@id") !=
                      subject["@index"].get("@id"))):
                raise JsonLdError("conflicting @index property detected.",
                                  "conflicting indexes")
            subject[property_] = input_[property_]
            continue

        # bnode property (generalized RDF); relabel (ref lib/nodeMap.js:170-178)
        # (dict keys are always str — startswith IS is_blank_node_id here)
        prop_out = property_
        if property_.startswith("_:"):
            prop_out = issuer.get_id(property_)

        # ensure property is added for empty arrays (ref :176-180)
        if isinstance(objects, list) and len(objects) == 0:
            add_value(subject, prop_out, [], property_is_array=True)
            continue

        if property_ == "@type":
            for type_ in (objects if isinstance(objects, list) else [objects]):
                add_value(subject, "@type", type_, property_is_array=True,
                          allow_duplicate=False)
            continue

        if not isinstance(objects, list):
            objects = [objects]

        for o in objects:
            # inlined is_value/is_list (one isinstance + key probes —
            # this loop dominates node-map CPU on flat corpora)
            _is_dict = isinstance(o, dict)
            if _is_dict and "@value" not in o and "@list" not in o:
                # node or subject reference (ref lib/nodeMap.js:182-205)
                if "@id" in o and not o["@id"]:
                    continue  # skip null/empty @id (JS falsy, ref :190-192)
                id_ = o.get("@id")
                if id_ is None or is_blank_node_id(id_):
                    id_ = issuer.get_id(id_)
                # add the reference BEFORE recursing — a re-embedded
                # subject's recursion may add more values to THIS
                # subject's property, and insertion order is observable
                # in flatten output (ref lib/nodeMap.js:197-201)
                _add_ref(_memo, subject, prop_out, id_)
                if len(o) == 1 and "@id" in o:
                    # pure subject reference: the recursion's only
                    # effect is registering the target subject (no
                    # properties to walk) — inline it (hot: mention /
                    # link refs dominate transcript node maps)
                    if id_ not in subjects:
                        subjects[id_] = {"@id": id_}
                    continue
                create_node_map(o, graphs, graph, issuer, id_, None, _memo)
            elif _is_dict and "@list" in o:
                result = {"@list": []}
                create_node_map(o["@list"], graphs, graph, issuer, name,
                                result, _memo)
                add_value(subject, prop_out, result, property_is_array=True,
                          allow_duplicate=False)
            else:
                # value object (or GIGO raw scalar): the recursion
                # with list_=None only relabels a bnode @type and
                # returns — inlined (value objects are the bulk of
                # create_node_map calls on flat corpora; ~1/3 of
                # node-map CPU)
                if _is_dict:
                    t = o.get("@type")
                    if t.__class__ is str and t.startswith("_:"):
                        o["@type"] = issuer.get_id(t)
                if _is_dict and "@id" in o:
                    # GIGO value object carrying @id: it participates
                    # in reference equality via the @id fallback, so
                    # keep the ref-memo coherent (add its id only when
                    # the element is genuinely inserted)
                    if not has_value(subject, prop_out, o):
                        _ref_ids(_memo, subject, prop_out).add(o["@id"])
                        add_value(subject, prop_out, o,
                                  property_is_array=True)
                else:
                    # inlined add_value(subject, prop_out, o,
                    # property_is_array=True, allow_duplicate=False):
                    # every non-keyword property on a subject is list-
                    # valued (all inserts above use property_is_array),
                    # so the set-semantics insert is a scan + append —
                    # value objects are the bulk of node-map inserts
                    ex = subject.get(prop_out)
                    if ex is None:
                        subject[prop_out] = [o]
                    elif isinstance(ex, list):
                        for e in ex:
                            if compare_values(o, e):
                                break
                        else:
                            ex.append(o)
                    else:
                        add_value(subject, prop_out, o,
                                  property_is_array=True,
                                  allow_duplicate=False)


def merge_node_maps(graphs: dict) -> dict:
    """Fold named graphs into the default graph (ref lib/nodeMap.js:262-290).
    Graph names and node ids iterated sorted — determinism contract."""
    default_graph = graphs.get("@default", {})
    for graph_name in sorted(graphs.keys()):
        if graph_name == "@default":
            continue
        node_map = graphs[graph_name]
        subject = default_graph.setdefault(graph_name, {"@id": graph_name})
        graph_entry = subject.setdefault("@graph", [])
        for id_ in sorted(node_map.keys()):
            node = node_map[id_]
            if not is_subject_reference(node):
                graph_entry.append(node)
    return default_graph


def merge_node_map_graphs(graphs: dict) -> dict:
    """Merge all graphs' nodes by id (for @merged framing;
    ref lib/nodeMap.js:233-260)."""
    merged = {}
    for name in sorted(graphs.keys()):
        for id_ in sorted(graphs[name].keys()):
            node = graphs[name][id_]
            merged_node = merged.setdefault(id_, {"@id": id_})
            for property_ in sorted(node.keys()):
                if is_keyword(property_) and property_ != "@type":
                    merged_node[property_] = copy.deepcopy(node[property_])
                else:
                    for value in node[property_] if \
                            isinstance(node[property_], list) \
                            else [node[property_]]:
                        add_value(merged_node, property_,
                                  copy.deepcopy(value),
                                  property_is_array=True,
                                  allow_duplicate=False)
    return merged


def flatten(expanded) -> list:
    """Flattening (ref lib/flatten.js:24-38): merged node map → sorted array
    of nodes that are not bare subject references."""
    default_graph = create_merged_node_map(expanded)
    flattened = []
    for key in sorted(default_graph.keys()):
        node = default_graph[key]
        if not is_subject_reference(node):
            flattened.append(node)
    return flattened


def relabel_blank_nodes(element, issuer: IdentifierIssuer | None = None):
    """Rewrite blank-node labels via the issuer — exact port of
    ref lib/util.js:365-369 + _labelBlankNodes:440-464: list objects
    recurse only into @list; a blank NODE (graphTypes.isBlankNode —
    bnode @id OR no @id at all on a non-value/set/list object) gets its
    @id (re)issued, so anonymous nodes GAIN labels; keys recurse in
    SORTED order (issuer sequence is observable in merge output)."""
    issuer = issuer or IdentifierIssuer("_:b")

    def _is_blank_node(v):
        if not isinstance(v, dict):
            return False
        if "@id" in v:
            return isinstance(v["@id"], str) and v["@id"].startswith("_:")
        return len(v) == 0 or not ("@value" in v or "@set" in v or
                                   "@list" in v)

    def _relabel(el):
        if isinstance(el, list):
            return [_relabel(e) for e in el]
        if isinstance(el, dict) and is_list(el):
            out = dict(el)
            out["@list"] = _relabel(out["@list"])
            return out
        if isinstance(el, dict):
            out = dict(el)
            if _is_blank_node(out):
                out["@id"] = issuer.get_id(out.get("@id"))
            for k in sorted(out.keys()):
                if k != "@id":
                    out[k] = _relabel(out[k])
            return out
        return el

    return _relabel(element)
