"""Sketch-family soak: HLL / Count-Min / quantile histogram at 4x
corpus growth with CLOSED-FORM planted truth — no engine pass in the
truth loop at all (the lesson of BENCH/SOAK_DEDUP_r3.md: an equality
oracle proves the table, only planted ground truth grades the
ESTIMATES the table exists to serve).

Corpus (deterministic in-engine synthesis, written as parquet so the
gated queries run on their real input path): doc i has exactly
L_i = 20 + (i % 200) tokens — token 1 is the planted heavy hitter
"hotzz" (true frequency = n_docs), token 2 is "midzz" on every 10th
doc (true frequency = n_docs/10), the rest are per-doc-unique fillers
"u{i}x{k}". Every token within a doc is distinct, so

  exact distinct postings = sum_i L_i = 119.5 * n_docs
  (n_docs a multiple of 400: 20N + (N/200)*(0+..+199)),
  exact doc-length distribution = the L_i pattern in closed form.

Claims measured:
  1. HLL estimate within 4 sigma (13%) of the closed-form posting
     count at BOTH sizes; 4-shard register tables merge BIT-EXACTLY
     into the whole-corpus table (the no-rescan merge contract).
  2. CM: est(hotzz) / est(midzz) one-sided-exact within the (e/w)*N
     overshoot bound; shard counter tables merge bit-exactly.
  3. Quantile: p10/p50/p90/p99 estimates obey the provable one-sided
     bound (est <= v, v - est <= v/16) vs closed-form exact
     percentiles at both sizes.
  4. Wall growth at 4x corpus for all three gated queries (the
     fixed-group-count aggs should scale ~linearly in scan cost, far
     below 4x once overheads amortize).

Usage: python jobs/soak_sketch.py [n_small=100000] [factor=4]
Writes one JSON line per size + a summary line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def synth_corpus(spark, n_docs: int):
    assert n_docs % 400 == 0
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    n_fill = (F.lit(20) + F.col("doc_id") % 200 -
              F.lit(1) - (F.col("doc_id") % 10 == 0).cast("int"))
    fillers = F.transform(
        F.sequence(F.lit(1), n_fill.cast("int")),
        lambda k: F.concat(F.lit("u"), F.col("doc_id").cast("string"),
                           F.lit("x"), k.cast("string")))
    text = F.concat_ws(
        " ", F.lit("hotzz"),
        F.when(F.col("doc_id") % 10 == 0, F.lit("midzz")),
        F.concat_ws(" ", fillers))
    return ids.select("doc_id", text.alias("text"))


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
    from jsonld_js_spark.operators.sketches import (
        countmin_estimate, countmin_merge, countmin_table, hll_estimate,
        hll_merge, hll_registers, q_sketch_countmin_tokens,
        q_sketch_hll_postings, q_sketch_quantile_doclen, qhist_quantile,
        CM_W)

    sf_dir = f"/root/repo/.local/soak_sketch/n{n_docs}"
    shutil.rmtree(sf_dir, ignore_errors=True)
    synth_corpus(spark, n_docs) \
        .write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    rec = {"n_docs": n_docs}
    walls = {}

    # closed-form truths
    exact_postings = n_docs * 20 + (n_docs // 200) * (199 * 200 // 2)
    lengths = sorted(20 + (i % 200) for i in range(n_docs))
    n_tokens_total = exact_postings  # every posting is one token

    # 1. HLL: gated query wall + estimate vs closed form
    t0 = time.time()
    hll_rows = q_sketch_hll_postings(spark, sf_dir).collect()
    walls["hll_postings"] = round(time.time() - t0, 1)
    est = hll_estimate(hll_rows)
    rec["hll_exact"] = exact_postings
    rec["hll_est"] = est
    rec["hll_rel_err"] = round(abs(est - exact_postings)
                               / exact_postings, 4)
    rec["hll_within_4sigma"] = rec["hll_rel_err"] < 0.13

    # shard merge bit-exactness (4 shards by doc_id % 4)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    items = (docs.select("doc_id",
                         F.explode(F.split(norm, " ")).alias("tok"))
             .select(F.concat_ws(":", "doc_id", "tok").alias("item"),
                     F.col("doc_id")))
    shard_sketches = [hll_registers(items.filter(F.col("doc_id") % 4
                                                 == s))
                      for s in range(4)]
    merged = sorted((r["bucket"], r["max_rho"]) for r in
                    hll_merge(*shard_sketches).collect())
    whole = sorted((r["bucket"], r["max_rho"]) for r in hll_rows)
    rec["hll_merge_bit_exact"] = merged == whole

    # 2. Count-Min: gated query wall + planted heavy hitters + merge
    t0 = time.time()
    cm_rows = q_sketch_countmin_tokens(spark, sf_dir).collect()
    walls["countmin_tokens"] = round(time.time() - t0, 1)
    bound = int(2.72 * n_tokens_total / CM_W) + 1
    est_hot = countmin_estimate(cm_rows, "hotzz")
    est_mid = countmin_estimate(cm_rows, "midzz")
    rec["cm_hot"] = {"true": n_docs, "est": est_hot, "bound": bound}
    rec["cm_mid"] = {"true": n_docs // 10, "est": est_mid}
    rec["cm_one_sided_ok"] = (
        n_docs <= est_hot <= n_docs + bound and
        n_docs // 10 <= est_mid <= n_docs // 10 + bound)
    # shard split on the token stream by doc parity
    tok_by_doc = (docs.select("doc_id",
                              F.explode(F.split(norm, " "))
                              .alias("item")))
    cm_a = countmin_table(tok_by_doc.filter(F.col("doc_id") % 2 == 0)
                          .select("item"))
    cm_b = countmin_table(tok_by_doc.filter(F.col("doc_id") % 2 == 1)
                          .select("item"))
    cm_merged = sorted((r["r"], r["cell"], r["cnt"]) for r in
                       countmin_merge(cm_a, cm_b).collect())
    rec["cm_merge_bit_exact"] = cm_merged == sorted(
        (r["r"], r["cell"], r["cnt"]) for r in cm_rows)

    # 3. quantile histogram: closed-form percentiles
    t0 = time.time()
    qh_rows = q_sketch_quantile_doclen(spark, sf_dir).collect()
    walls["quantile_doclen"] = round(time.time() - t0, 1)
    q_ok = True
    q_detail = {}
    for pct in (10, 50, 90, 99):
        rank = (n_docs * pct + 99) // 100
        v = lengths[rank - 1]
        est = qhist_quantile(qh_rows, pct)
        q_detail[f"p{pct}"] = {"exact": v, "est": est}
        q_ok = q_ok and est <= v and v - est <= max(1, v // 16)
    rec["quantile_detail"] = q_detail
    rec["quantile_bound_ok"] = q_ok

    rec["walls_sec"] = walls
    rec["peak_jvm_rss_gib"] = _jvm_peak_rss_gib()
    print(json.dumps(rec), flush=True)
    return rec


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "20g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("soak-sketch").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    small = run_one(spark, n_small)
    big = run_one(spark, n_small * factor)
    ok = all(r[k] for r in (small, big)
             for k in ("hll_within_4sigma", "hll_merge_bit_exact",
                       "cm_one_sided_ok", "cm_merge_bit_exact",
                       "quantile_bound_ok"))
    print(json.dumps({
        "metric": "sketch_soak", "all_claims_ok": ok,
        "wall_growth_vs_size_growth": {
            k: round(big["walls_sec"][k] /
                     max(0.1, small["walls_sec"][k]) / factor, 2)
            for k in small["walls_sec"]},
    }), flush=True)


if __name__ == "__main__":
    main()
