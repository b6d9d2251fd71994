"""Embedding near-dup soak: OR-blocked cosine dedup at 10-40x the
bench vector corpus, with recall-vs-planted-truth, candidate-growth,
and peak-memory evidence (the vector-side analog of soak_dedup.py).

Corpus: deterministic in-engine synthesis — unit-scale 64-dim vectors
from xxhash64 draws; every 10th base vector gets a +100000-id twin
perturbed by ~2% of its norm (cos ~ 0.9998, above the 0.999
threshold). Random 64-dim pairs sit near cos 0, so verified output =
planted twins exactly; the interesting measurements are the LSH
candidate count (blocking efficiency at fixed 2^16 buckets/band — the
documented add-planes-per-band knob kicks in when this grows
super-linearly) and recall.

Usage: python jobs/soak_embeddings.py [n_small=20000] [factor=4]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

DIM = 64
DUP_EVERY = 10
NOISE = 0.02  # relative perturbation; cos ~ 1 - NOISE^2/2


def synth_vectors(spark, n_base: int, noise: float = NOISE):
    """(vec_id, v): base vectors + perturbed twins (vec_id+10^7)."""
    ids = spark.range(n_base).select(F.col("id").alias("vec_id"))
    def draw(seed_col, j, scale):
        # deterministic float in [-scale, scale)
        return (F.xxhash64(seed_col + F.lit(j)) / F.lit(float(1 << 63))
                * F.lit(scale))
    base = ids.select(
        "vec_id",
        F.array(*[draw(F.col("vec_id") * 1000003, j, 1.0)
                  for j in range(DIM)]).alias("v"))
    twins = (ids.filter(F.col("vec_id") % DUP_EVERY == 0)
             .select((F.col("vec_id") + 10_000_000).alias("vec_id"),
                     F.array(*[
                         draw(F.col("vec_id") * 1000003, j, 1.0) +
                         draw(F.col("vec_id") * 7 + 13, j, noise)
                         for j in range(DIM)]).alias("v")))
    return base.unionAll(twins)


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


def run_one(spark, n_base: int, planes_per_band: int = 16) -> dict:
    from jsonld_js_spark.operators.similarity import (
        embedding_neardup_pairs, nd_band_sigs)
    corpus = synth_vectors(spark, n_base).cache()
    # candidate count alone (pre-verify) — blocking efficiency
    bands = corpus.select(
        "vec_id", F.posexplode(nd_band_sigs(F.col("v"),
                                            planes_per_band))
    ).select("vec_id", F.col("pos").alias("band"),
             F.col("col").alias("bsig"))
    n_cand = (bands.alias("a").join(
        bands.alias("b"),
        (F.col("a.band") == F.col("b.band")) &
        (F.col("a.bsig") == F.col("b.bsig")) &
        (F.col("a.vec_id") < F.col("b.vec_id")))
        .select("a.vec_id", "b.vec_id").distinct().count())
    t0 = time.time()
    pairs = embedding_neardup_pairs(corpus, planes_per_band)
    n_pairs = pairs.count()
    wall = time.time() - t0
    expected = len(range(0, n_base, DUP_EVERY))
    rec = {
        "planes_per_band": planes_per_band,
        "n_vectors": n_base + expected,
        "planted_twins": expected,
        "candidates": n_cand,
        "verified_pairs": n_pairs,
        "recall": round(n_pairs / expected, 4),
        "candidates_per_kvec": round(n_cand / (n_base + expected) * 1000, 2),
        "wall_sec": round(wall, 1),
        "peak_jvm_rss_gib": _jvm_peak_rss_gib(),
    }
    corpus.unpersist()
    print(json.dumps(rec), flush=True)
    return rec


def run_ivf(spark, n_base: int, k: int = 128, iters: int = 3) -> dict:
    """IVF quantizer at a scale-shaped K (round-3 verdict item 5):
    train k-means at K~sqrt(N) with the hash-sampled init, then
    measure (a) cell balance — max/mean assigned-cell population —
    and (b) twin-routing recall: for every planted near-twin pair,
    does the twin's assigned cell appear in the base vector's
    top-NPROBE probed cells? (The end-to-end property IVF must keep:
    a true near neighbor is reachable through the probe set.)"""
    from jsonld_js_spark.operators.similarity import (
        IVF_NPROBE, _quantize, ivf_probe_cells, ivf_train_cells)
    corpus = synth_vectors(spark, n_base).cache()
    vqs = corpus.select("vec_id", _quantize(F.col("v")).alias("vq")).cache()
    t0 = time.time()
    cents = ivf_train_cells(vqs, k=k, iters=iters)
    train_sec = time.time() - t0
    probed = vqs.select(
        "vec_id",
        ivf_probe_cells(F.col("vq"), cents, IVF_NPROBE).alias("pc")).cache()
    sizes = (probed.select(F.element_at("pc", 1).alias("cell"))
             .groupBy("cell").count().collect())
    counts = sorted((r["count"] for r in sizes), reverse=True)
    mean = sum(counts) / len(counts)
    bases = (probed.filter(F.col("vec_id") % DUP_EVERY == 0)
             .filter(F.col("vec_id") < 10_000_000))
    twins = (probed.filter(F.col("vec_id") >= 10_000_000)
             .select((F.col("vec_id") - 10_000_000).alias("base_id"),
                     F.element_at("pc", 1).alias("twin_cell")))
    routed = (bases.join(twins, bases["vec_id"] == twins["base_id"])
              .select(F.array_contains("pc", F.col("twin_cell"))
                      .cast("long").alias("hit"))
              .agg(F.sum("hit").alias("hits"),
                   F.count(F.lit(1)).alias("n")).collect()[0])
    rec = {
        "ivf_k": k, "lloyd_iters": iters,
        "n_vectors": vqs.count(),
        "cells_populated": len(counts),
        "cell_max_over_mean": round(counts[0] / mean, 2),
        "cell_p99_over_mean": round(
            counts[max(0, len(counts) // 100 - 1)] / mean, 2),
        "twin_routing_recall": round(routed["hits"] / routed["n"], 4),
        "train_sec": round(train_sec, 1),
        "peak_jvm_rss_gib": _jvm_peak_rss_gib(),
    }
    probed.unpersist(); vqs.unpersist(); corpus.unpersist()
    print(json.dumps(rec), flush=True)
    return rec


SEM_NOISE = 0.25  # cos ~ 1 - 0.25^2/2 ~ 0.969: semantic, not near-exact


def run_semantic(spark, n_base: int, k: int) -> dict:
    """SemDeDup at scale: twins perturbed to cos ~ 0.97 (well inside
    the 0.90 semantic threshold, far below the 0.999 near-dup band),
    k-means at a corpus-scaled K (K ~ N / target_cell_size — the knob
    that holds the within-cell quadratic flat as N grows). Measures
    planted drop-recall (requires twin and base to share a cell — the
    real SemDeDup recall), dup_of attribution exactness, natural
    false-drop count (must be 0: random 64-dim pairs sit at cos ~ 0),
    and the within-cell candidate-pair total (the quadratic that K
    must bound)."""
    from jsonld_js_spark.operators.similarity import semantic_dedup
    corpus = synth_vectors(spark, n_base, noise=SEM_NOISE).cache()
    n_all = corpus.count()
    t0 = time.time()
    out = semantic_dedup(corpus, k=k, iters=2).cache()
    n_out = out.count()
    wall = time.time() - t0
    assert n_out == n_all
    twins = out.filter(F.col("vec_id") >= 10_000_000)
    n_twins = twins.count()
    dropped_right = twins.filter(
        (F.col("keep") == 0) &
        (F.col("dup_of") == F.col("vec_id") - 10_000_000)).count()
    false_drops = (out.filter(F.col("vec_id") < 10_000_000)
                   .filter(F.col("keep") == 0).count())
    cell_sizes = out.groupBy("cell").count().collect()
    within_pairs = sum(r["count"] * (r["count"] - 1) // 2
                       for r in cell_sizes)
    rec = {
        "sem_k": k,
        "n_vectors": n_all,
        "planted_twins": n_twins,
        "dropped_with_exact_dup_of": dropped_right,
        "drop_recall": round(dropped_right / n_twins, 4),
        "false_drops": false_drops,
        "max_cell": max(r["count"] for r in cell_sizes),
        "within_cell_pairs": within_pairs,
        "wall_sec": round(wall, 1),
        "peak_jvm_rss_gib": _jvm_peak_rss_gib(),
    }
    out.unpersist(); corpus.unpersist()
    print(json.dumps(rec), flush=True)
    return rec


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "20g")
        .appName("soak-embeddings").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    small = run_one(spark, n_small)
    big = run_one(spark, n_small * factor)
    # the documented scale knob: +4 planes/band = 16x more buckets
    big_wide = run_one(spark, n_small * factor, planes_per_band=20)
    ivf_small = run_ivf(spark, n_small)
    ivf_big = run_ivf(spark, n_small * factor)
    # K scales with N (x4 corpus -> x4 cells) so cell size stays flat
    sem_small = run_semantic(spark, n_small, k=128)
    sem_big = run_semantic(spark, n_small * factor, k=512)
    print(json.dumps({
        "metric": "embedding_soak",
        "pair_growth_vs_size_growth": round(
            (big["verified_pairs"] / max(1, small["verified_pairs"]))
            / factor, 3),
        "candidate_growth_vs_size_growth": round(
            (big["candidates"] / max(1, small["candidates"])) / factor, 3),
        "recall_small": small["recall"],
        "recall_big": big["recall"],
        "candidates_big_16_planes": big["candidates"],
        "candidates_big_20_planes": big_wide["candidates"],
        "recall_big_20_planes": big_wide["recall"],
        "ivf_cell_max_over_mean_small": ivf_small["cell_max_over_mean"],
        "ivf_cell_max_over_mean_big": ivf_big["cell_max_over_mean"],
        "ivf_twin_recall_small": ivf_small["twin_routing_recall"],
        "ivf_twin_recall_big": ivf_big["twin_routing_recall"],
        "sem_drop_recall_small": sem_small["drop_recall"],
        "sem_drop_recall_big": sem_big["drop_recall"],
        "sem_false_drops": sem_small["false_drops"] + sem_big["false_drops"],
        "sem_within_pair_growth_vs_size_growth": round(
            (sem_big["within_cell_pairs"] /
             max(1, sem_small["within_cell_pairs"])) / factor, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
