"""Text-ops soak: the quality/PII/boilerplate/TF-IDF family at 10-40x
the bench corpus with PLANTED ground truth (round-3 verdict item 8 —
dedup, embeddings, streaming and the flagship have at-scale evidence;
this closes the text family).

Corpus (deterministic in-engine synthesis, written once as parquet so
the GATED operators run end-to-end on their real input path):
  - good docs: 120 tokens alternating EN stopwords and unique 5k-vocab
    words (quality score ~680k ppm, langid 'en');
  - every 7th seed doc: 10 content-only tokens (score ~140k — far
    below the 350k threshold; the filter must drop it);
  - every 13th == 12 doc: byte-identical copy of the block head
    (doc_id-12; the canonical election must drop the copy);
  - every 5th seed: a fixed 10-token boilerplate prefix line (the
    CCNet-style line-frequency pass must flag it);
  - every 11th seed: a planted email appended (the PII scrub must
    count it ON TOP of its own %3/%5/%7 injections).

Planted-truth assertions (computed from the closed-form formulas, not
from the engine): exact kept-set equality for corpus_quality_filter,
exact per-class per-doc PII counts, exact flagged-set equality for
corpus_boilerplate_stats. TF-IDF/langid/tokens run for wall+RSS.

Usage: python jobs/soak_text.py [n_small=25000] [factor=4]
(factor*n_small must stay <= 100000: the boilerplate corpus injects
+100000/+200000 copy ids). Writes one JSON line per size + summary.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

VOCAB = 5000
GOOD_PAIRS = 60      # good doc = 60 (stopword, word) pairs = 120 tokens
BAD_TOKENS = 10
STOPS = ["the", "and", "of", "to", "a"]
BOILER = ("copyright notice w9000001 w9000002 w9000003 w9000004 "
          "w9000005 w9000006 w9000007 w9000008")  # exactly 10 tokens


def synth_corpus(spark, n_docs: int):
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    is_copy = F.col("doc_id") % 13 == 12
    seed = F.when(is_copy, F.col("doc_id") - 12).otherwise(F.col("doc_id"))
    is_bad = seed % 7 == 0
    word = lambda i: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.xxhash64(seed * 1000003 + i.cast("long")),
                           F.lit(VOCAB)).cast("string"))
    stop = lambda i: F.element_at(  # noqa: E731
        F.array(*[F.lit(s) for s in STOPS]),
        (i % len(STOPS) + 1).cast("int"))
    good = F.concat_ws(" ", F.flatten(F.transform(
        F.sequence(F.lit(1), F.lit(GOOD_PAIRS)),
        lambda i: F.array(stop(i), word(i)))))
    bad = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(BAD_TOKENS)), word))
    body = F.when(is_bad, bad).otherwise(good)
    text = F.concat(
        F.when(seed % 5 == 0, F.lit(BOILER + " ")).otherwise(F.lit("")),
        body,
        F.when(seed % 11 == 0,
               F.concat(F.lit(" reach me at soak"), seed.cast("string"),
                        F.lit("@test.org"))).otherwise(F.lit("")))
    return ids.select("doc_id", text.alias("text"),
                      seed.alias("_seed"))


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
        BOILERPLATE_MIN_DOCS, q_corpus_boilerplate_stats)
    from jsonld_js_spark.operators.textstats import (
        q_corpus_quality_filter, q_text_langid, q_text_pii_scrub,
        q_text_tfidf_topk, q_text_tokens)

    sf_dir = f"/root/repo/.local/soak_text/n{n_docs}"
    shutil.rmtree(sf_dir, ignore_errors=True)
    # full documents schema (langid passes the lang column through)
    synth_corpus(spark, n_docs).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("soak").alias("source"),
        F.length("text").alias("n_chars")) \
        .write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    rec = {"n_docs": n_docs}
    walls = {}

    # 1. quality filter: exact kept-set equality
    t0 = time.time()
    kept = {r["doc_id"] for r in
            q_corpus_quality_filter(spark, sf_dir).collect()}
    walls["quality_filter"] = round(time.time() - t0, 1)
    expected = {d for d in range(n_docs)
                if d % 13 != 12 and d % 7 != 0}
    rec["qf_kept"] = len(kept)
    rec["qf_expected"] = len(expected)
    rec["qf_exact_match"] = kept == expected

    # 2. PII scrub: per-doc per-class counts vs the closed forms
    #    (operator injects %3 email / %5 phone / %7 id on doc_id;
    #    corpus plants one extra email on seed %11)
    t0 = time.time()
    pii = q_text_pii_scrub(spark, sf_dir)
    seed_expr = F.when(F.col("doc_id") % 13 == 12,
                       F.col("doc_id") - 12).otherwise(F.col("doc_id"))
    mism = (pii.withColumn("_seed", seed_expr)
            .filter(~(
                (F.col("n_emails") ==
                 (F.col("doc_id") % 3 == 0).cast("int") +
                 (F.col("_seed") % 11 == 0).cast("int")) &
                (F.col("n_phones") ==
                 (F.col("doc_id") % 5 == 0).cast("int")) &
                (F.col("n_ids") ==
                 (F.col("doc_id") % 7 == 0).cast("int"))))
            .count())
    walls["pii_scrub"] = round(time.time() - t0, 1)
    rec["pii_count_mismatches"] = mism

    # 3. boilerplate: exact flagged-set equality. Flagged docs are
    #    exactly (a) every boiler-carrying doc — base seed%5 plus ALL
    #    +1e5/+2e5 copies (their sources %10/%25 ⊆ %5) — and (b) base
    #    docs whose whole-doc identity chain reaches 3 members: head s
    #    == base copy s+12, plus a near/exact copy of s+12 (a chain's
    #    members share every 10-aligned full line; trailing partial
    #    lines carry unique seed tokens, and unique 5k-vocab bodies
    #    collide nowhere else).
    t0 = time.time()
    bp = q_corpus_boilerplate_stats(spark, sf_dir)
    base = F.col("doc_id") < 100000
    seed_of = F.when(base & (F.col("doc_id") % 13 == 12),
                     F.col("doc_id") - 12) \
        .otherwise(F.col("doc_id"))
    chain3 = ((seed_of % 13 == 0) & (seed_of + 12 < n_docs) &
              (((seed_of + 12) % 10 == 0) | ((seed_of + 12) % 25 == 0)))
    expected_flag = F.when(~base, F.lit(True)) \
        .otherwise((seed_of % 5 == 0) | chain3)
    bp_mism = (bp.filter((F.col("n_boilerplate") > 0) != expected_flag)
               .count())
    walls["boilerplate"] = round(time.time() - t0, 1)
    rec["boilerplate_flag_mismatches"] = bp_mism
    assert BOILERPLATE_MIN_DOCS <= max(3, n_docs // 5)

    # 4. throughput-only passes (correctness is the sf0.01 gate's job)
    for name, q in [("tfidf", q_text_tfidf_topk),
                    ("langid", q_text_langid),
                    ("tokens", q_text_tokens)]:
        t0 = time.time()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls[name] = round(time.time() - t0, 1)

    rec["walls_sec"] = walls
    rec["peak_jvm_rss_gib"] = _jvm_peak_rss_gib()
    print(json.dumps(rec), flush=True)
    return rec


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    assert n_small * factor <= 100_000, "copy-id space collision"
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "20g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("soak-text").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    small = run_one(spark, n_small)
    big = run_one(spark, n_small * factor)
    ok = (small["qf_exact_match"] and big["qf_exact_match"] and
          small["pii_count_mismatches"] == 0 and
          big["pii_count_mismatches"] == 0 and
          small["boilerplate_flag_mismatches"] == 0 and
          big["boilerplate_flag_mismatches"] == 0)
    print(json.dumps({
        "metric": "text_soak", "all_planted_truth_exact": ok,
        "wall_growth_vs_size_growth": {
            k: round(big["walls_sec"][k] /
                     max(0.1, small["walls_sec"][k]) / factor, 2)
            for k in small["walls_sec"]},
    }), flush=True)


if __name__ == "__main__":
    main()
