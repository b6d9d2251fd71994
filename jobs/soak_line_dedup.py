"""Line-dedup scrub soak: planted-truth boilerplate excision at N and
4N docs (round-5: the corpus_line_dedup scale claims).

The equality oracle proves Spark == DuckDB on the same algorithm; it
cannot prove the algorithm REMOVES what it should and ONLY that (the
MinHash lesson, BENCH/SOAK_DEDUP_r3.md). This job builds a corpus of
globally-unique lines (64-bit-hash tokens: a duplicated line would
need 5 consecutive collisions) and plants:

  - a HEADER line on every doc (corpus-ubiquitous boilerplate);
  - a FOOTER line on every 3rd doc (frequent but not ubiquitous);
  - a RARE line on exactly LINE_MIN_DOCS - 1 docs (below threshold —
    must SURVIVE, the false-positive guard);

then asserts exact accounting:

  - every doc loses the header (n_removed >= 1 everywhere);
  - exactly n/3 docs lose the footer; rare-line docs keep it;
  - tokens_removed matches the closed form to the token;
  - kept_hash of an untouched-body doc equals the hash of its body
    lines alone (byte-exact reconstruction);
  - duplicated-line table size is CONSTANT (2 rows: header + footer;
    the rare line stays below threshold) while the corpus grows 4x —
    the "boilerplate set is tiny" scale claim.

Usage: python jobs/soak_line_dedup.py [n_small=100000] [factor=4]
Writes one JSON line per size + a summary line. Run 2>/dev/null.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

BODY_LINES = 6       # unique 5-token lines per doc
LINE_W = 5           # tokens per unique body line
HEADER = "subscribe to our newsletter today"
FOOTER = "all rights reserved example site"
RARE = "rare line below the dedup threshold"
FOOTER_EVERY = 3


def synth_corpus(spark, n_docs: int, rare_docs: int):
    """(doc_id, text): globally-unique body lines; planted header on
    every doc, footer on every FOOTER_EVERY-th, RARE on doc_ids
    [1, 1 + rare_docs) (chosen off the footer residue so the two
    plants never collide on a doc). Deterministic,
    partition-count independent."""
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    uniq = lambda i: F.concat(  # noqa: E731
        F.lit("u"),
        F.xxhash64(F.col("doc_id") * 1000003 + i.cast("long"))
        .cast("string"))
    body = F.transform(
        F.sequence(F.lit(1), F.lit(BODY_LINES)),
        lambda li: F.concat_ws(" ", F.transform(
            F.sequence(li * LINE_W, (li + 1) * LINE_W - 1), uniq)))
    lines = F.concat(
        F.array(F.lit(HEADER)),
        body,
        F.when(F.col("doc_id") % FOOTER_EVERY == 0,
               F.array(F.lit(FOOTER))).otherwise(F.array()),
        F.when((F.col("doc_id") >= 1) & (F.col("doc_id") < 1 + rare_docs)
               & (F.col("doc_id") % FOOTER_EVERY != 0),
               F.array(F.lit(RARE))).otherwise(F.array()))
    return ids.select("doc_id", F.concat_ws("\n", lines).alias("text"))


def run_one(spark, n_docs: int) -> dict:
    from jsonld_js_spark.operators.dedup import (
        LINE_MIN_DOCS, hash60, line_dedup_stats)
    rare_docs = LINE_MIN_DOCS - 1
    corpus = synth_corpus(spark, n_docs, rare_docs).cache()
    # sanity on the plant itself: rare docs exist and carry the line
    n_rare = corpus.filter(F.col("text").contains(RARE)).count()
    assert n_rare == rare_docs, (n_rare, rare_docs)

    t0 = time.time()
    out = line_dedup_stats(corpus).cache()
    n_out = out.count()
    wall = time.time() - t0

    n_footer = (n_docs + FOOTER_EVERY - 1) // FOOTER_EVERY
    hdr_tok = len(HEADER.split())
    ftr_tok = len(FOOTER.split())
    agg = out.agg(
        F.sum("n_removed").alias("removed"),
        F.sum("tokens_removed").alias("tok_removed"),
        F.sum(F.when(F.col("n_removed") == 0, 1).otherwise(0))
        .alias("untouched")).collect()[0]
    expected_removed = n_docs + n_footer      # header everywhere + footers
    expected_tokens = n_docs * hdr_tok + n_footer * ftr_tok
    # rare-line docs: header removed, rare line KEPT
    rare_rows = (out.join(corpus.filter(F.col("text").contains(RARE))
                          .select("doc_id"), "doc_id")
                 .agg(F.sum("n_removed").alias("r"),
                      F.count(F.lit(1)).alias("n")).collect()[0])
    # byte-exact reconstruction check on one non-footer, non-rare doc:
    # kept text must equal its body lines alone
    probe = 1 + rare_docs
    while probe % FOOTER_EVERY == 0:
        probe += 1
    body_txt = corpus.filter(F.col("doc_id") == probe).select(
        F.expr(f"substring(text, {len(HEADER) + 2})").alias("b"))
    want_hash = body_txt.select(hash60(F.col("b")).alias("h")) \
        .collect()[0]["h"]
    got_hash = out.filter(F.col("doc_id") == probe) \
        .collect()[0]["kept_hash"]
    dup_lines = (corpus.select(
        "doc_id", F.explode(F.split("text", "\n")).alias("line"))
        .groupBy("line")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= LINE_MIN_DOCS).count())
    rec = {
        "n_docs": n_docs,
        "rows_out": n_out,
        "removed": int(agg["removed"]),
        "expected_removed": expected_removed,
        "tokens_removed": int(agg["tok_removed"]),
        "expected_tokens_removed": expected_tokens,
        "untouched_docs": int(agg["untouched"]),
        "rare_docs_removed_lines": int(rare_rows["r"]),
        "rare_docs": int(rare_rows["n"]),
        "reconstruction_exact": bool(want_hash == got_hash),
        "dup_line_table_rows": dup_lines,
        "wall_sec": round(wall, 1),
    }
    ok = (rec["removed"] == expected_removed
          and rec["tokens_removed"] == expected_tokens
          and rec["untouched_docs"] == 0
          # rare docs lose ONLY the header (1 line each)
          and rec["rare_docs_removed_lines"] == rare_docs
          and rec["reconstruction_exact"]
          and rec["dup_line_table_rows"] == 2)
    rec["ok"] = ok
    out.unpersist()
    corpus.unpersist()
    print(json.dumps(rec), flush=True)
    return rec


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "20g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    recs = [run_one(spark, n_small), run_one(spark, n_small * factor)]
    a, b = recs
    print(json.dumps({
        "summary": "line_dedup_soak",
        "all_ok": all(r["ok"] for r in recs),
        "wall_ratio_at_4x": round(b["wall_sec"] / max(a["wall_sec"], 1e-9), 2),
        "dup_table_constant": (a["dup_line_table_rows"]
                               == b["dup_line_table_rows"] == 2),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
