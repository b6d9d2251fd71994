"""Dedup-pipeline soak: MinHash+LSH near-dup pairs + connected
components at 10-100x the bench corpus, with candidate-growth and
peak-memory evidence.

The bench corpus (sf0.1) is ~6k docs; the scale claims for the dedup
family ("band keys uniform, no quadratic blow-up, CC rounds ~ log n")
rest on plan shape. This job MEASURES them: the same pipeline at two
corpus sizes 4x apart must show ~4x candidate pairs (linear, not
quadratic) and flat CC round counts, with no memory cliff.

Corpus: deterministic in-engine synthesis (pure column exprs, no
Python rows, nothing read from disk) — every 5th group of 4 docs is a
planted near-dup cluster (shared 40-token base text + per-member
suffix token, pairwise Jaccard ~0.9); all other docs are unique text
over a 5k vocabulary.

Usage: python jobs/soak_dedup.py [n_small=100000] [factor=4]
Writes one JSON line per size + a summary line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

DOC_LEN = 40
VOCAB = 5000
GROUP = 4           # docs per potential dup group
DUP_EVERY = 5       # every 5th group is a planted near-dup cluster


def synth_corpus(spark, n_docs: int):
    """(doc_id, text): deterministic, partition-count independent."""
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    gid = F.expr(f"doc_id div {GROUP}")
    member = F.col("doc_id") % GROUP
    is_dup = (gid % DUP_EVERY) == 0
    # dup groups share the group seed; singles seed on doc_id
    seed = F.when(is_dup, gid * 2654435761).otherwise(
        F.col("doc_id") * 40503 + 1_000_000_007)
    words = F.transform(
        F.sequence(F.lit(1), F.lit(DOC_LEN)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(seed + i.cast("long") * 1000003),
                   F.lit(VOCAB)).cast("string")))
    text = F.concat(
        F.concat_ws(" ", words),
        F.when(is_dup, F.concat(F.lit(" m"), member.cast("string")))
        .otherwise(F.lit("")))
    return ids.select("doc_id", text.alias("text"))


def _jvm_peak_rss_gib():
    """VmHWM of the largest java child (the local-mode JVM)."""
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
        connected_components, minhash_pairs)
    corpus = synth_corpus(spark, n_docs)
    t0 = time.time()
    pairs = minhash_pairs(corpus).cache()
    n_pairs = pairs.count()
    t1 = time.time()
    edges = (pairs.select(F.col("doc_a").alias("src"),
                          F.col("doc_b").alias("dst"))
             .unionAll(pairs.select(F.col("doc_b").alias("src"),
                                    F.col("doc_a").alias("dst"))))
    labels = connected_components(edges, algorithm="star")
    n_clustered = labels.count()
    n_clusters = labels.select("cluster_id").distinct().count()
    t2 = time.time()
    # every dup group contributes C(4,2)=6 true pairs (J~0.86);
    # found/expected is the end-to-end LSH recall (theory ~0.995
    # at 4 bands x 2 rows for J=0.86)
    n_groups = len([g for g in range(0, n_docs // GROUP + 1)
                    if g % DUP_EVERY == 0 and (g + 1) * GROUP <= n_docs])
    expected_pairs = n_groups * (GROUP * (GROUP - 1) // 2)
    rec = {
        "n_docs": n_docs,
        "pairs": n_pairs,
        "expected_pairs": expected_pairs,
        "pairs_per_kdoc": round(n_pairs / n_docs * 1000, 2),
        "clusters": n_clusters,
        "clustered_docs": n_clustered,
        "minhash_sec": round(t1 - t0, 1),
        "cc_sec": round(t2 - t1, 1),
        "peak_jvm_rss_gib": _jvm_peak_rss_gib(),
    }
    pairs.unpersist()
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
        .appName("soak-dedup").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    small = run_one(spark, n_small)
    big = run_one(spark, n_small * factor)
    growth = big["pairs"] / max(1, small["pairs"])
    summary = {
        "metric": "dedup_soak",
        "pair_growth_vs_size_growth": round(growth / factor, 3),
        "lsh_recall_small": round(
            small["pairs"] / max(1, small["expected_pairs"]), 4),
        "lsh_recall_big": round(
            big["pairs"] / max(1, big["expected_pairs"]), 4),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
