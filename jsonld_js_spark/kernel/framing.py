"""Framing Algorithm (W3C JSON-LD Framing 1.1), from scratch.

Behavioral reference: lib/frame.js:29-65 (frameMergedOrDefault),
:76-323 (embed engine), :488-636 (_filterSubject), :644-690
(_removeEmbed), :695-745 (_cleanupPreserve), :333-367 (cleanupNull),
:770-825 (_valueMatch/_nodeMatch). Spark role (SURVEY.md §2.8): the
filter core is compiled to semi-joins in frame_spark.py; this module
is the full per-document engine used by the kernel API and the
Arrow-UDF general path.
"""
from __future__ import annotations

import copy

from .nodemap import create_node_map, merge_node_map_graphs
from .util import (
    IdentifierIssuer, JsonLdError, add_value, compare_values, is_keyword,
    is_list, is_subject, is_subject_reference, is_value,
)

_EMBED_VALUES = ("@always", "@never", "@link", "@first", "@last", "@once")


def _as_array(v):
    return v if isinstance(v, list) else [v]


def get_values(subject, prop):
    return _as_array(subject.get(prop, []))


def remove_value(subject, prop, value, *, property_is_array=False):
    """ref lib/util.js removeValue."""
    values = [v for v in get_values(subject, prop)
              if not compare_values(v, value)]
    if len(values) == 0:
        subject.pop(prop, None)
    elif len(values) == 1 and not property_is_array:
        subject[prop] = values[0]
    else:
        subject[prop] = values


def frame_merged_or_default(input_, frame, options):
    """ref lib/frame.js:29-65."""
    state = {
        "options": options,
        "embedded": False,
        "graph": "@default",
        "graphMap": {"@default": {}},
        "subjectStack": [],
        "link": {},
        "bnodeMap": {},
    }
    issuer = IdentifierIssuer("_:b")
    create_node_map(input_, state["graphMap"], "@default", issuer)
    if options.get("merged"):
        state["graphMap"]["@merged"] = merge_node_map_graphs(
            state["graphMap"])
        state["graph"] = "@merged"
    state["subjects"] = state["graphMap"][state["graph"]]

    framed = []
    _frame(state, sorted(state["subjects"].keys()), frame, framed, None)

    if options.get("pruneBlankNodeIdentifiers"):
        options["bnodesToClear"] = [
            bid for bid, uses in state["bnodeMap"].items()
            if len(uses) == 1]

    options["link"] = {}
    return _cleanup_preserve(framed, options)


def _frame(state, subjects, frame, parent, property):  # noqa: C901
    """The embed engine (ref lib/frame.js:76-323)."""
    _validate_frame(frame)
    frame = frame[0]

    options = state["options"]
    flags = {
        "embed": _get_frame_flag(frame, options, "embed"),
        "explicit": _get_frame_flag(frame, options, "explicit"),
        "requireAll": _get_frame_flag(frame, options, "requireAll"),
    }

    link = state["link"].setdefault(state["graph"], {})
    matches = _filter_subjects(state, subjects, frame, flags)

    for id_ in sorted(matches.keys()):
        subject = matches[id_]

        # compartmentalize each top-level match (ref :103-110)
        if property is None:
            state["uniqueEmbeds"] = {state["graph"]: {}}
        else:
            state.setdefault("uniqueEmbeds", {}).setdefault(
                state["graph"], {})

        if flags["embed"] == "@link" and id_ in link:
            _add_frame_output(parent, property, link[id_])
            continue

        output = {"@id": id_}
        if id_.startswith("_:"):
            add_value(state["bnodeMap"], id_, output,
                      property_is_array=True)
        link[id_] = output

        # the reference's 1.1 gate on legacy @first/@last (ref
        # lib/frame.js:129-133) is DEAD CODE: it reads `state.is11`,
        # but only `state.options.is11` is ever assigned
        # (lib/jsonld.js:495), so the error can never fire — legacy
        # embed flavors work in every mode (verified against node,
        # fuzz seed 960021)

        if not state["embedded"] and \
                id_ in state["uniqueEmbeds"][state["graph"]]:
            continue  # already included in another node object

        if state["embedded"] and (
                flags["embed"] == "@never" or
                _creates_circular_reference(subject, state["graph"],
                                            state["subjectStack"])):
            _add_frame_output(parent, property, output)
            continue

        if state["embedded"] and flags["embed"] in ("@first", "@once") \
                and id_ in state["uniqueEmbeds"][state["graph"]]:
            _add_frame_output(parent, property, output)
            continue

        if flags["embed"] == "@last" and \
                id_ in state["uniqueEmbeds"][state["graph"]]:
            _remove_embed(state, id_)

        state["uniqueEmbeds"][state["graph"]][id_] = {
            "parent": parent, "property": property}

        state["subjectStack"].append(
            {"subject": subject, "graph": state["graph"]})

        # subject is also the name of a graph (ref :175-196)
        if id_ in state["graphMap"]:
            recurse = False
            subframe = None
            if "@graph" not in frame:
                recurse = state["graph"] != "@merged"
                subframe = {}
            else:
                # JS frame['@graph'][0] on an EMPTY array is undefined
                # (ref :181), then the isObject fallback applies — an
                # empty/scalar-pruned @graph sub-frame must not crash
                # (fuzz seed 65000854)
                fg = frame["@graph"]
                subframe = fg[0] if isinstance(fg, list) and fg else None
                recurse = id_ not in ("@merged", "@default")
                if not isinstance(subframe, dict):
                    subframe = {}
            if recurse:
                sub_state = dict(state, graph=id_, embedded=False)
                _frame(sub_state,
                       sorted(state["graphMap"][id_].keys()),
                       [subframe], output, "@graph")

        # @included (ref :198-202)
        if "@included" in frame:
            _frame(dict(state, embedded=False), subjects,
                   frame["@included"], output, "@included")

        # iterate over subject properties (ref :205-265)
        for prop in sorted(subject.keys()):
            if is_keyword(prop):
                output[prop] = copy.deepcopy(subject[prop])
                if prop == "@type":
                    for type_ in subject["@type"]:
                        if type_.startswith("_:"):
                            add_value(state["bnodeMap"], type_, output,
                                      property_is_array=True)
                continue

            if flags["explicit"] and prop not in frame:
                continue

            for o in subject[prop]:
                subframe = frame[prop] if prop in frame else \
                    _create_implicit_frame(flags)

                if is_list(o):
                    list_subframe = _create_implicit_frame(flags)
                    if frame.get(prop) and frame[prop][0] and \
                            isinstance(frame[prop][0], dict) and \
                            frame[prop][0].get("@list"):
                        list_subframe = frame[prop][0]["@list"]
                    lst = {"@list": []}
                    _add_frame_output(output, prop, lst)
                    for oo in o["@list"]:
                        if is_subject_reference(oo):
                            _frame(dict(state, embedded=True),
                                   [oo["@id"]], list_subframe, lst,
                                   "@list")
                        else:
                            _add_frame_output(lst, "@list",
                                              copy.deepcopy(oo))
                elif is_subject_reference(o):
                    _frame(dict(state, embedded=True), [o["@id"]],
                           subframe, output, prop)
                elif _value_match(subframe[0], o):
                    _add_frame_output(output, prop, copy.deepcopy(o))

        # defaults (ref :268-295)
        for prop in sorted(frame.keys()):
            if prop == "@type":
                # JS frame[prop][0] on [] is undefined → not an object
                # (ref lib/frame.js:271-275)
                first = frame[prop][0] if frame[prop] else None
                if not isinstance(first, dict) or "@default" not in first:
                    continue
            elif is_keyword(prop):
                continue
            nxt = frame[prop][0] if frame[prop] else {}
            if not isinstance(nxt, dict):
                nxt = {}
            omit_default = _get_frame_flag(nxt, options, "omitDefault")
            if not omit_default and prop not in output:
                preserve = "@null"
                if "@default" in nxt:
                    preserve = copy.deepcopy(nxt["@default"])
                preserve = _as_array(preserve)
                output[prop] = [{"@preserve": preserve}]

        # @reverse (ref :299-315)
        for reverse_prop in sorted((frame.get("@reverse") or {}).keys()):
            subframe = frame["@reverse"][reverse_prop]
            for subj_id in state["subjects"]:
                node_values = get_values(state["subjects"][subj_id],
                                         reverse_prop)
                if any(isinstance(v, dict) and v.get("@id") == id_
                       for v in node_values):
                    rev = output.setdefault("@reverse", {})
                    add_value(rev, reverse_prop, [],
                              property_is_array=True)
                    _frame(dict(state, embedded=True), [subj_id],
                           subframe, rev[reverse_prop], property)

        _add_frame_output(parent, property, output)
        state["subjectStack"].pop()


def _js_falsy(v) -> bool:
    """JS truthiness for the cleanupNull array filter: false, 0, '',
    null, NaN are dropped; empty dicts/lists are TRUTHY in JS."""
    if v is None or v is False:
        return True
    if isinstance(v, bool):
        return False
    if isinstance(v, (int, float)):
        return v == 0 or v != v  # 0, -0, NaN
    if isinstance(v, str):
        return v == ""
    return False


def cleanup_null(input_, options):
    """@null → null, removing from arrays (ref lib/frame.js:333-367).
    QUIRK MIRRORED: the reference filters with `v => v` (:338), which
    drops ALL JS-falsy values — false, 0, '' — from framed arrays, not
    just nulls (verified against node)."""
    if isinstance(input_, list):
        return [v for v in (cleanup_null(i, options) for i in input_)
                if not _js_falsy(v)]
    if input_ == "@null":
        return None
    if isinstance(input_, dict):
        if "@id" in input_:
            id_ = input_["@id"]
            # JS object keys coerce via String(): a degenerate array
            # @id becomes its ','.join (ref :347 hasOwnProperty(id))
            if isinstance(id_, list):
                id_ = ",".join(str(x) for x in id_)
            elif not isinstance(id_, str):
                id_ = str(id_)
            links = options.setdefault("link", {})
            if id_ in links:
                for seen in links[id_]:
                    if seen is input_:
                        return input_
                links[id_].append(input_)
            else:
                links[id_] = [input_]
        for key in list(input_.keys()):
            input_[key] = cleanup_null(input_[key], options)
    return input_


def _create_implicit_frame(flags):
    return [{"@" + k: [v] for k, v in flags.items() if v is not None}]


def _creates_circular_reference(subject, graph, subject_stack):
    for entry in reversed(subject_stack):
        if entry["graph"] == graph and \
                entry["subject"].get("@id") == subject.get("@id"):
            return True
    return False


def _get_frame_flag(frame, options, name):
    flag = "@" + name
    rval = frame[flag][0] if flag in frame and frame[flag] else \
        options.get(name)
    if name == "embed":
        if rval is True:
            rval = "@once"
        elif rval is False:
            rval = "@never"
        elif rval not in _EMBED_VALUES:
            raise JsonLdError("invalid value of @embed.",
                              "invalid @embed value")
    return rval


def _validate_frame(frame):
    from .util import is_absolute_iri
    if not isinstance(frame, list) or len(frame) != 1 or \
            not isinstance(frame[0], dict):
        raise JsonLdError("a JSON-LD frame must be a single object.",
                          "invalid frame")
    f = frame[0]
    for key in ("@id", "@type"):
        if key in f:
            for v in _as_array(f[key]):
                ok = isinstance(v, dict) or (
                    isinstance(v, str) and is_absolute_iri(v) and
                    not v.startswith("_:"))
                if not ok:
                    raise JsonLdError(f"invalid {key} in frame.",
                                      "invalid frame")


def _filter_subjects(state, subjects, frame, flags):
    rval = {}
    for id_ in subjects:
        subject = state["graphMap"][state["graph"]].get(id_)
        if subject is not None and \
                _filter_subject(state, subject, frame, flags):
            rval[id_] = subject
    return rval


def _filter_subject(state, subject, frame, flags):  # noqa: C901
    """Frame matching (ref lib/frame.js:488-636)."""
    wildcard = True
    matches_some = False

    for key in frame:
        match_this = False
        node_values = get_values(subject, key)
        is_empty = len(get_values(frame, key)) == 0

        if key == "@id":
            first = frame["@id"][0] if frame["@id"] else {}
            if isinstance(first, dict) and len(first) == 0:
                match_this = True
            else:
                match_this = bool(node_values) and \
                    node_values[0] in frame["@id"]
            if not flags["requireAll"]:
                return match_this
        elif key == "@type":
            wildcard = False
            if is_empty:
                if node_values:
                    return False
                match_this = True
            elif len(frame["@type"]) == 1 and \
                    isinstance(frame["@type"][0], dict) and \
                    len(frame["@type"][0]) == 0:
                match_this = len(node_values) > 0
            else:
                for type_ in frame["@type"]:
                    if isinstance(type_, dict) and "@default" in type_:
                        match_this = True
                    else:
                        match_this = match_this or \
                            any(tt == type_ for tt in node_values)
            if not flags["requireAll"]:
                return match_this
        elif is_keyword(key):
            continue
        else:
            this_frame = get_values(frame, key)[0] \
                if get_values(frame, key) else None
            has_default = False
            if this_frame is not None:
                _validate_frame([this_frame])
                has_default = "@default" in this_frame
            wildcard = False

            if len(node_values) == 0 and has_default:
                continue
            if len(node_values) > 0 and is_empty:
                return False

            if this_frame is None:
                if len(node_values) > 0:
                    return False
                match_this = True
            elif is_list(this_frame):
                list_value = this_frame["@list"][0] \
                    if this_frame["@list"] else None
                if node_values and is_list(node_values[0]):
                    node_list_values = node_values[0]["@list"]
                    if is_value(list_value):
                        match_this = any(_value_match(list_value, lv)
                                         for lv in node_list_values)
                    elif is_subject(list_value) or \
                            is_subject_reference(list_value):
                        match_this = any(
                            _node_match(state, list_value, lv, flags)
                            for lv in node_list_values)
            elif is_value(this_frame):
                match_this = any(_value_match(this_frame, nv)
                                 for nv in node_values)
            elif is_subject_reference(this_frame):
                match_this = any(_node_match(state, this_frame, nv, flags)
                                 for nv in node_values)
            elif isinstance(this_frame, dict):
                match_this = len(node_values) > 0
            else:
                match_this = False

        if not match_this and flags["requireAll"]:
            return False
        matches_some = matches_some or match_this

    return wildcard or matches_some


def _remove_embed(state, id_):
    """ref lib/frame.js:644-690."""
    embeds = state["uniqueEmbeds"][state["graph"]]
    embed = embeds[id_]
    parent, property = embed["parent"], embed["property"]
    subject = {"@id": id_}

    if isinstance(parent, list):
        for i, v in enumerate(parent):
            if compare_values(v, subject):
                parent[i] = subject
                break
    else:
        use_array = isinstance(parent.get(property), list)
        remove_value(parent, property, subject,
                     property_is_array=use_array)
        add_value(parent, property, subject, property_is_array=use_array)

    def remove_dependents(dep_id):
        for nxt in list(embeds.keys()):
            if nxt in embeds and isinstance(embeds[nxt]["parent"], dict) \
                    and embeds[nxt]["parent"].get("@id") == dep_id:
                del embeds[nxt]
                remove_dependents(nxt)
    remove_dependents(id_)


def _cleanup_preserve(input_, options):
    """ref lib/frame.js:695-745."""
    if isinstance(input_, list):
        return [_cleanup_preserve(v, options) for v in input_]
    if isinstance(input_, dict):
        if "@preserve" in input_:
            return input_["@preserve"][0]
        if is_value(input_):
            return input_
        if is_list(input_):
            input_["@list"] = _cleanup_preserve(input_["@list"], options)
            return input_
        if "@id" in input_:
            id_ = input_["@id"]
            # JS object-key String() coercion for degenerate array ids
            if isinstance(id_, list):
                id_ = ",".join(str(x) for x in id_)
            elif not isinstance(id_, str):
                id_ = str(id_)
            links = options.setdefault("link", {})
            if id_ in links:
                for seen in links[id_]:
                    if seen is input_:
                        return input_
                links[id_].append(input_)
            else:
                links[id_] = [input_]
        for prop in list(input_.keys()):
            if prop == "@id" and isinstance(input_[prop], str) and \
                    input_[prop] in options.get("bnodesToClear", []):
                del input_["@id"]
                continue
            input_[prop] = _cleanup_preserve(input_[prop], options)
    return input_


def _add_frame_output(parent, property, output):
    if isinstance(parent, dict):
        add_value(parent, property, output, property_is_array=True)
    else:
        parent.append(output)


def _node_match(state, pattern, value, flags):
    if "@id" not in value:
        return False
    node_object = state["subjects"].get(value["@id"])
    return bool(node_object) and \
        _filter_subject(state, node_object, pattern, flags)


def _value_match(pattern, value):
    """ref lib/frame.js:785-825."""
    if not isinstance(pattern, dict):
        return False
    def _js_falsy(v):  # JS truthiness: {} and [] are truthy, 0/''/null
        return v is None or v is False or v == "" or (
            isinstance(v, (int, float)) and not isinstance(v, bool)
            and v == 0)

    v1 = value.get("@value")
    t1 = value.get("@type")
    l1 = value.get("@language")
    v2 = _as_array(pattern["@value"]) \
        if not _js_falsy(pattern.get("@value")) else []
    t2 = _as_array(pattern["@type"]) \
        if not _js_falsy(pattern.get("@type")) else []
    l2 = _as_array(pattern["@language"]) \
        if not _js_falsy(pattern.get("@language")) else []

    if not v2 and not t2 and not l2:
        return True
    if not (v1 in v2 or (v2 and isinstance(v2[0], dict) and
                         len(v2[0]) == 0)):
        return False
    if not ((not t1 and not t2) or (t1 in t2) or
            (t1 and t2 and isinstance(t2[0], dict) and len(t2[0]) == 0)):
        return False
    if not ((not l1 and not l2) or (l1 in l2) or
            (l1 and l2 and isinstance(l2[0], dict) and len(l2[0]) == 0)):
        return False
    return True
