"""End-to-end north-rule evidence: run the SAME transcript
conversations through (a) the reference jsonld.js toRDF (node oracle)
and (b) the Spark vectorized pipeline, and compare the emitted triple
sets modulo blank-node bijection.

    python tools/pipeline_pr_vs_reference.py [n_conv]

Appends the result to PR_REPORT.json under "pipeline_vs_reference".
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from jsonld_js_spark.pipeline.kernel_path import (  # noqa: E402
    build_conversation_doc,
)
from jsonld_js_spark.testing import (  # noqa: E402
    compare_triple_sets, normalize_quads, quad_from_reference_json,
)
from jsonld_js_spark.vocab import ENT_NS, MENTION_RE  # noqa: E402

HARNESS = os.path.join(REPO, "tools", "oracle_harness")


def reference_quads(doc: dict) -> list:
    env = dict(os.environ, NODE_PATH=os.path.join(HARNESS, "node_modules"))
    out = subprocess.run(
        ["node", os.path.join(HARNESS, "oracle.js"), "/dev/stdin"],
        input=json.dumps({"op": "toRDF", "input": doc, "options": {}}),
        capture_output=True, text=True, env=env, timeout=120)
    res = json.loads(out.stdout)
    assert res["ok"], res
    return [quad_from_reference_json(q) for q in res["result"]]


def main() -> int:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 30

    from pyspark.sql import SparkSession

    from jsonld_js_spark.pipeline import transcript_triples
    from jsonld_js_spark.transcripts import transcripts_df

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    t = transcripts_df(spark, n_conv=n_conv)
    rows = t.orderBy("conv_id", "turn_idx").collect()
    spark_quads = [tuple(r) for r in transcript_triples(t).collect()]
    spark.stop()

    # build the identical JSON-LD documents and run the REFERENCE
    pat = re.compile(MENTION_RE)
    by_conv: dict[str, list] = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append({
            "turn_idx": r.turn_idx, "role": r.role, "text": r.text,
            "tool": r.tool,
            "ts_lex": r.ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
            "mention_iris": [ENT_NS + "Entity" +
                             "".join(c for c in m if c.isdigit())
                             for m in pat.findall(r.text)],
        })
    ref_quads: list = []
    for conv_id, turns in sorted(by_conv.items()):
        ref_quads.extend(reference_quads(
            build_conversation_doc(conv_id, turns)))
    # the reference emits duplicate mention triples per-document only
    # when addValue dedup misses; set semantics for comparison
    res = compare_triple_sets(normalize_quads(spark_quads),
                              normalize_quads(ref_quads))
    summary = {
        "n_conversations": len(by_conv),
        "n_turns": len(rows),
        "reference_triples": res["theirs"],
        "spark_triples": res["mine"],
        "matched": res["matched"],
        "precision": res["precision"],
        "recall": res["recall"],
        "comparator": "set equality modulo bnode bijection; reference "
                      "run via tools/oracle_harness on the identical "
                      "per-conversation JSON-LD documents",
    }
    report_path = os.path.join(REPO, "PR_REPORT.json")
    report = json.load(open(report_path)) if os.path.exists(report_path) \
        else {}
    report["pipeline_vs_reference"] = summary
    with open(report_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(summary, indent=1))
    return 0 if summary["precision"] >= 0.95 and \
        summary["recall"] >= 0.95 else 1


if __name__ == "__main__":
    sys.exit(main())
