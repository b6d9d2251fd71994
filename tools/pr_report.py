"""Compute the north-rule triple P/R metric across every reference-
golden toRDF fixture (modulo blank-node bijection, the W3C comparator
semantics) and write PR_REPORT.json.

    python tools/pr_report.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jsonld_js_spark.kernel import ContextResolver, to_rdf  # noqa: E402
from jsonld_js_spark.testing import (  # noqa: E402
    compare_triple_sets, normalize_quads, quad_from_reference_json,
)

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")


def main() -> int:
    with open(os.path.join(FIXDIR, "manifest.json")) as f:
        manifest = json.load(f)
    per_fixture = {}
    tp = mine_n = theirs_n = 0
    for entry in manifest:
        spec = entry["ops"].get("toRDF")
        if not spec:
            continue
        with open(os.path.join(FIXDIR, f"{entry['name']}-in.json")) as f:
            doc = json.load(f)
        with open(os.path.join(FIXDIR, spec["expect"])) as f:
            golden = [quad_from_reference_json(q) for q in json.load(f)]
        options = dict(entry.get("options", {}))
        if "documents" in entry:
            with open(os.path.join(FIXDIR, entry["documents"])) as f:
                options["contextResolver"] = ContextResolver(
                    documents=json.load(f))
        res = compare_triple_sets(normalize_quads(to_rdf(doc, options)),
                                  normalize_quads(golden))
        per_fixture[entry["name"]] = {
            "precision": res["precision"], "recall": res["recall"],
            "triples": res["theirs"],
        }
        tp += res["matched"]
        mine_n += res["mine"]
        theirs_n += res["theirs"]
    report = {
        "comparator": "triple-set equality modulo blank-node bijection "
                      "(ref tests/test-common.js:777-795 semantics)",
        "fixtures": len(per_fixture),
        "total_reference_triples": theirs_n,
        "total_emitted_triples": mine_n,
        "matched": tp,
        "precision": tp / mine_n if mine_n else 1.0,
        "recall": tp / theirs_n if theirs_n else 1.0,
        "target": ">= 0.95 (BASELINE.json north_rule)",
        "per_fixture": per_fixture,
    }
    out = os.path.join(os.path.dirname(FIXDIR), "..", "PR_REPORT.json")
    with open(os.path.abspath(out), "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "per_fixture"}, indent=1))
    return 0 if report["precision"] >= 0.95 and \
        report["recall"] >= 0.95 else 1


if __name__ == "__main__":
    sys.exit(main())
