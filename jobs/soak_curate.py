"""Composed curation-pipeline soak (round 5): the full quality →
exact dedup → near dedup → decontaminate → mix → pack chain at N and
4N over a synthetic corpus, via BOTH execution paths.

Checks (all hard assertions):
  1. DUAL-PATH EQUALITY: the gated lazy composition
     (q_corpus_curate_pipeline) and the stage-commit Ledger runner
     (run_curation_checkpointed) produce identical final packed
     tables (count + commutative checksum) — the resumable production
     path is byte-equivalent to the one-query path.
  2. STAGE INVARIANTS on the runner's committed parquet:
     - quality: every survivor's quality_score_ppm >= threshold, and
       survivor count == corpus count above threshold (exact
       accounting);
     - exact dedup: survivors' normalized texts are pairwise distinct
       AND each survivor is the min doc_id of its fingerprint group;
     - near dedup idempotence: re-running MinHash/LSH pair generation
       on the survivors yields ZERO verified pairs;
     - decontaminate: zero survivors overlap the eval set at or above
       the contamination threshold;
     - pack: perfect tiling of the token axis — min offset 0, offsets
       strictly increasing by n_tokens (sum == max extent end),
       pure-arithmetic check independent of the engine.
  3. N→4N SCALING: per-stage docs in/out grow ~4x (3.4-4.6x band) and
     walls are reported.

Usage: python jobs/soak_curate.py [n_docs=30000] [factor=4]
One JSON line per size + summary.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def synth_documents(spark, out_dir: str, n_docs: int):
    """Deterministic corpus with a realistic quality spread: word
    count, stopword share and repetition vary by doc so the quality
    filter bites a real fraction; langs split en/de/fr for the mix.
    Pure column exprs (no driver loop)."""
    words = ["the", "of", "and", "alpha", "beta", "gamma", "delta",
             "query", "spark", "graph", "token", "merge", "node",
             "edge", "corpus", "sample", "filter", "pack"]
    warr = F.array(*[F.lit(w) for w in words])
    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # 5-40 words, pseudo-random per (doc, slot); ~12% of docs are
    # low-content repeats of one word (quality pressure)
    nw = (F.pmod(F.xxhash64("doc_id"), F.lit(36)) + 5)
    body = F.expr(
        "array_join(transform(sequence(1, cast(nw as int)), "
        "i -> element_at(warr, cast(pmod(xxhash64(doc_id * 131 + i), "
        "18) as int) + 1)), ' ')")
    rep = F.expr("array_join(array_repeat('zz', cast(nw as int)), ' ')")
    text = F.when(F.pmod(F.xxhash64(F.col("doc_id") + 7), F.lit(100))
                  < 12, rep).otherwise(body)
    out = (d.withColumn("nw", nw)
           .withColumn("warr", warr)
           .select("doc_id",
                   text.alias("text"),
                   F.element_at(F.array(F.lit("en"), F.lit("de"),
                                        F.lit("fr")),
                                (F.pmod(F.xxhash64(F.col("doc_id") * 3),
                                        F.lit(3)) + 1).cast("int"))
                   .alias("lang"))
           .withColumn("source", F.lit("soak"))
           .withColumn("n_chars", F.length("text")))
    shutil.rmtree(out_dir, ignore_errors=True)
    out.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def _checksum(df):
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1 << 40)))
        .alias("h")).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def run_one(spark, n_docs: int) -> dict:
    from jsonld_js_spark.operators.dedup import (
        CONTAM_OVERLAP_PPM_MIN, contamination, eval_set_df, minhash_pairs)
    from jsonld_js_spark.operators.textstats import _norm, quality_frame
    from jsonld_js_spark.pipeline.curate import (
        QUALITY_MIN_PPM, curate_corpus_df, q_corpus_curate_pipeline,
        run_curation_checkpointed)

    work = tempfile.mkdtemp(prefix="soak_curate_")
    sf_dir = os.path.join(work, "sfsoak")
    synth_documents(spark, sf_dir, n_docs)
    rec = {"n_docs": n_docs}

    # path 1: gated lazy composition
    t0 = time.time()
    lazy_n, lazy_h = _checksum(q_corpus_curate_pipeline(spark, sf_dir))
    rec["wall_lazy_s"] = round(time.time() - t0, 1)

    # path 2: stage-commit runner
    docs = curate_corpus_df(spark, sf_dir)
    eval_docs = eval_set_df(spark, sf_dir)
    wh = os.path.join(work, "wh")
    t0 = time.time()
    stats = run_curation_checkpointed(spark, docs, eval_docs, wh)
    rec["wall_runner_s"] = round(time.time() - t0, 1)
    run_n, run_h = _checksum(
        spark.read.parquet(os.path.join(wh, "curate_pack"))
        .orderBy("doc_id"))
    rec["rows_final"] = lazy_n
    rec["paths_equal"] = (lazy_n, lazy_h) == (run_n, run_h)

    # stage invariants on committed parquet
    sq = spark.read.parquet(os.path.join(wh, "curate_quality"))
    qf = quality_frame(docs)
    above = qf.filter(
        F.col("quality_score_ppm") >= QUALITY_MIN_PPM).count()
    surv_min = (quality_frame(sq)
                .agg(F.min("quality_score_ppm")).collect()[0][0])
    rec["quality_exact_accounting"] = \
        (sq.count() == above) and (surv_min >= QUALITY_MIN_PPM)

    se = spark.read.parquet(os.path.join(wh, "curate_dedup_exact"))
    fps = se.select(F.md5(_norm(F.col("text"))).alias("f"), "doc_id")
    rec["exact_texts_distinct"] = \
        fps.select("f").distinct().count() == se.count()
    # each survivor is the min doc_id of its fingerprint group in its
    # INPUT (the quality-stage output)
    in_fp = sq.select(F.md5(_norm(F.col("text"))).alias("f"),
                      "doc_id")
    mins = in_fp.groupBy("f").agg(F.min("doc_id").alias("m"))
    rec["exact_min_id_canonical"] = \
        fps.join(mins, "f").filter(F.col("doc_id") != F.col("m")) \
           .count() == 0

    sn = spark.read.parquet(os.path.join(wh, "curate_dedup_near"))
    rec["near_idempotent"] = \
        minhash_pairs(sn.select("doc_id", "text")).count() == 0

    sd = spark.read.parquet(os.path.join(wh, "curate_decontam"))
    rec["decontam_clean"] = contamination(
        sd.select("doc_id", "text"), eval_docs,
        CONTAM_OVERLAP_PPM_MIN).count() == 0

    pk = spark.read.parquet(os.path.join(wh, "curate_pack"))
    agg = pk.agg(
        F.min("tok_offset").alias("mn"),
        F.sum("n_tokens").alias("tot"),
        F.max(F.col("tok_offset") + F.col("n_tokens")).alias("end"),
        F.count("*").alias("n"),
        F.countDistinct("tok_offset").alias("nd")).collect()[0]
    rec["pack_perfect_tiling"] = (
        int(agg["mn"]) == 0 and int(agg["tot"]) == int(agg["end"])
        and int(agg["n"]) == int(agg["nd"]))

    rec["stages"] = [
        {k: m[k] for k in ("stage", "docs_in", "docs_out", "wall_s")}
        for m in stats["metrics"]]
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = (SparkSession.builder.master("local[32]")
             .appName("soak_curate")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    try:
        rec_n = run_one(spark, n_docs)
        spark.catalog.clearCache()
        rec_4n = run_one(spark, n_docs * factor)
        flags = [k for k in ("paths_equal", "quality_exact_accounting",
                             "exact_texts_distinct",
                             "exact_min_id_canonical", "near_idempotent",
                             "decontam_clean", "pack_perfect_tiling")]
        ok = all(rec_n[f] and rec_4n[f] for f in flags)
        growth = {}
        for a, b in zip(rec_n["stages"], rec_4n["stages"]):
            g = b["docs_out"] / max(a["docs_out"], 1)
            growth[a["stage"]] = round(g, 2)
            if not (0.85 * factor <= g <= 1.15 * factor):
                ok = False
        print(json.dumps({"summary": "soak_curate", "all_ok": ok,
                          "docs_out_growth": growth}), flush=True)
        sys.exit(0 if ok else 1)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
