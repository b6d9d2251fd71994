"""Substring-dedup soak: maximal duplicated-span removal at 10-100x
the bench corpus with planted ground truth + candidate-growth
linearity evidence (round-4: the dedup_substring scale claims).

The equality oracle proves Spark == DuckDB on the same algorithm; it
cannot prove the algorithm FINDS what it should (the MinHash lesson,
BENCH/SOAK_DEDUP_r3.md). This job plants a fixed 200-token span
verbatim into every 10th document of an otherwise globally-unique
corpus (64-bit-hash tokens: a duplicated 8-gram would need 8
consecutive collisions) at a per-doc offset, then asserts:

  - EXACT recall: every planted doc reports exactly the planted
    extent (offset, offset+199, 200 tokens) and the shared cluster id;
  - zero spurious spans (unique filler can't duplicate);
  - linear candidate growth: duplicated gram positions scale ~4x at
    4x corpus (positions inside true spans only — never all-pairs).

Usage: python jobs/soak_substring.py [n_small=50000] [factor=4]
Writes one JSON line per size + a summary line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

DOC_LEN = 120        # unique filler tokens per doc
SPAN_LEN = 200       # planted duplicated span, in tokens
PLANT_EVERY = 10     # every 10th doc carries the span
OFF_MOD = 50         # insertion offset = (doc_id % OFF_MOD) + 10


def synth_corpus(spark, n_docs: int):
    """(doc_id, text): globally-unique filler; every PLANT_EVERY-th
    doc gets the same SPAN_LEN-token span inserted at a varying
    offset. Deterministic, partition-count independent."""
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    is_dup = F.col("doc_id") % PLANT_EVERY == 0
    off = (F.col("doc_id") % OFF_MOD + 10).cast("int")
    uniq = lambda i: F.concat(  # noqa: E731
        F.lit("u"),
        F.xxhash64(F.col("doc_id") * 1000003 + i.cast("long"))
        .cast("string"))
    prefix = F.transform(F.sequence(F.lit(1), off), uniq)
    suffix = F.transform(F.sequence(off + 1, F.lit(DOC_LEN)), uniq)
    planted = F.array(*[F.lit(f"p{i}") for i in range(SPAN_LEN)])
    body = F.when(is_dup, F.concat(prefix, planted, suffix)) \
        .otherwise(F.concat(prefix, suffix))
    return ids.select("doc_id", F.concat_ws(" ", body).alias("text"))


def _jvm_peak_rss_gib():
    best = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as f:
                if "java" not in f.read():
                    continue
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM:"):
                        best = max(best, int(line.split()[1]))
        except OSError:
            continue
    return round(best / (1024 * 1024), 2)


def run_one(spark, n_docs: int) -> dict:
    from jsonld_js_spark.operators.dedup import (
        SUBSTR_K, duplicated_spans, scrub_duplicated_spans)
    corpus = synth_corpus(spark, n_docs)
    t0 = time.time()
    spans = duplicated_spans(corpus).cache()
    n_spans = spans.count()
    wall = time.time() - t0
    planted_ids = [d for d in range(0, n_docs, PLANT_EVERY)]
    agg = spans.agg(
        F.sum(F.col("span_tokens") - SUBSTR_K + 1).alias("dup_positions"),
        F.countDistinct("cluster").alias("clusters")).collect()[0]
    exact = (spans
             .filter((F.col("doc_id") % PLANT_EVERY == 0) &
                     (F.col("span_start")
                      == F.col("doc_id") % OFF_MOD + 10) &
                     (F.col("span_tokens") == SPAN_LEN))
             .count())
    rec = {
        "n_docs": n_docs,
        "planted": len(planted_ids),
        "spans": n_spans,
        "exact_extent_hits": exact,
        "exact_recall": round(exact / len(planted_ids), 4),
        "spurious_spans": n_spans - exact,
        "dup_positions": int(agg["dup_positions"] or 0),
        "clusters": int(agg["clusters"]),
        "wall_sec": round(wall, 1),
        "peak_jvm_rss_gib": _jvm_peak_rss_gib(),
    }
    spans.unpersist()

    # scrub ground truth: identical extents everywhere -> ONE cluster,
    # so exactly one doc (the smallest planted id = 0) keeps the span;
    # every other planted doc loses exactly SPAN_LEN tokens; filler
    # docs pass through untouched.
    t0 = time.time()
    scrub = scrub_duplicated_spans(corpus).cache()
    marker = " ".join(f"p{i}" for i in range(SPAN_LEN))
    holders = scrub.filter(F.col("text").contains(marker)).count()
    a = scrub.agg(
        F.sum("n_tokens_removed").alias("removed"),
        F.sum(F.when(F.col("n_spans_scrubbed") == 1, 1)
              .otherwise(0)).alias("scrubbed_docs"),
        F.sum(F.when(F.col("n_tokens_removed") == 0, 1)
              .otherwise(0)).alias("untouched_docs")).collect()[0]
    rec.update({
        "scrub_wall_sec": round(time.time() - t0, 1),
        "scrub_span_holders": holders,           # expect exactly 1
        "scrub_docs_scrubbed": int(a["scrubbed_docs"]),
        "scrub_tokens_removed": int(a["removed"] or 0),
        "scrub_expected_removed": (len(planted_ids) - 1) * SPAN_LEN,
        "scrub_untouched_docs": int(a["untouched_docs"]),
    })
    scrub.unpersist()
    print(json.dumps(rec), flush=True)
    return rec


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "20g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("soak-substring").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    small = run_one(spark, n_small)
    big = run_one(spark, n_small * factor)
    summary = {
        "metric": "substring_soak",
        "exact_recall_small": small["exact_recall"],
        "exact_recall_big": big["exact_recall"],
        "candidate_growth_vs_size_growth": round(
            big["dup_positions"] / max(1, small["dup_positions"])
            / factor, 3),
        "spurious_small": small["spurious_spans"],
        "spurious_big": big["spurious_spans"],
        "scrub_holders_small": small["scrub_span_holders"],
        "scrub_holders_big": big["scrub_span_holders"],
        "scrub_exact_small": small["scrub_tokens_removed"]
        == small["scrub_expected_removed"],
        "scrub_exact_big": big["scrub_tokens_removed"]
        == big["scrub_expected_removed"],
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
