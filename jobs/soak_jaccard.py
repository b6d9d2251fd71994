"""neighbor_jaccard hub-guard soak (round 5): a planted celebrity hub
whose wedge volume would grow QUADRATICALLY without the default-on
max_hub_degree cap, on a background graph that grows nodes+edges
together (constant degree distribution — the realistic corpus-growth
shape).

Planted structure on reserved ids (background cannot touch them):
- similar pair (P, Q) sharing 10 exclusive neighbors, deg(P)=deg(Q)=10
  -> EXACT Jaccard 1.0 (1,000,000 ppm, n_shared=10) — must survive the
  cap with exact values (its wedge centers are degree-2 nodes);
- hub H adjacent to `hub_deg` exclusive leaves; hub_deg scales WITH
  the corpus (20k at N, 80k at 4N) -> uncapped wedge volume C(hub,2)
  is 2.0e8 at N and 3.2e9 at 4N (16x at 4x edges: quadratic), while
  capped wedge volume is background-only and grows ~linearly.

Wedge volumes are computed EXACTLY from the degree table
(sum over kept centers of C(d,2)) — the same quantity the wedge join
materializes — so the quadratic/linear contrast is measured, not
asserted from theory; the capped operator also runs END-TO-END at
both sizes (wall recorded) and once uncapped at N for the wall
contrast.

Usage: python jobs/soak_jaccard.py [n_nodes=50000] [n_edges=250000]
       [factor=4] [hub_deg=20000]
One JSON line per size + a summary line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

P, Q = 1_000_000_000, 1_000_000_001
SHARED = [1_000_000_010 + i for i in range(10)]
HUB = 3_000_000_000


def synth_edges(spark, n_nodes: int, n_edges: int, hub_deg: int):
    """Undirected distinct pair set (a < b): uniform random background
    over [0, n_nodes) + planted pair + planted hub star."""
    e = spark.range(n_edges)
    h1 = F.abs(F.xxhash64(F.col("id") * 3 + 1)) % n_nodes
    h2 = F.abs(F.xxhash64(F.col("id") * 7 + 5)) % n_nodes
    bg = (e.select(F.least(h1, h2).alias("a"),
                   F.greatest(h1, h2).alias("b"))
          .filter(F.col("a") != F.col("b")))
    planted = [(min(P, m), max(P, m)) for m in SHARED] + \
              [(min(Q, m), max(Q, m)) for m in SHARED]
    pdf = spark.createDataFrame(planted, "a long, b long")
    star = spark.range(hub_deg).select(
        F.lit(HUB).alias("a"), (F.lit(HUB) + 1 + F.col("id")).alias("b"))
    return bg.unionAll(pdf).unionAll(star).distinct()


def run_one(spark, n_nodes, n_edges, hub_deg, cap, run_uncapped) -> dict:
    from jsonld_js_spark.kg_api import (neighbor_jaccard,
                                        neighbor_jaccard_guard_stats)
    und_half = synth_edges(spark, n_nodes, n_edges, hub_deg)
    edges = (und_half.unionAll(
        und_half.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .localCheckpoint())
    rec = {"n_nodes": n_nodes, "n_edges_half": int(und_half.count()),
           "hub_deg": hub_deg, "cap": cap}

    deg = edges.groupBy("a").agg(F.count("*").alias("d"))
    wedges = deg.select(
        (F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("w"),
        "d")
    rec["wedges_uncapped"] = int(
        wedges.agg(F.sum("w")).collect()[0][0])
    rec["wedges_capped"] = int(
        wedges.filter(F.col("d") <= cap)
        .agg(F.coalesce(F.sum("w"), F.lit(0))).collect()[0][0])

    t0 = time.time()
    res = neighbor_jaccard(edges, topk=5000, max_hub_degree=cap)
    rows = res.collect()
    rec["wall_capped_s"] = round(time.time() - t0, 1)
    got = {(r["x"], r["y"]): (r["n_shared"], r["jaccard_ppm"])
           for r in rows}
    rec["planted_pair_exact"] = got.get((P, Q)) == (10, 1000000)
    rec["hub_leaf_pairs_emitted"] = sum(
        1 for (x, y) in got if x > HUB and y > HUB)
    stats = neighbor_jaccard_guard_stats(res)
    rec["dropped_hubs"] = int(stats["dropped_hubs"])
    rec["total_nodes"] = int(stats["total_nodes"])

    if run_uncapped:
        t0 = time.time()
        neighbor_jaccard(edges, topk=5000,
                         max_hub_degree=None).collect()
        rec["wall_uncapped_s"] = round(time.time() - t0, 1)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 250000
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    hub_deg = int(sys.argv[4]) if len(sys.argv) > 4 else 20000
    cap = 1000
    spark = (SparkSession.builder.master("local[32]")
             .appName("soak_jaccard")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    try:
        rec_n = run_one(spark, n_nodes, n_edges, hub_deg, cap,
                        run_uncapped=True)
        rec_4n = run_one(spark, n_nodes * factor, n_edges * factor,
                         hub_deg * factor, cap, run_uncapped=False)
        capped_ratio = rec_4n["wedges_capped"] / \
            max(rec_n["wedges_capped"], 1)
        uncapped_ratio = rec_4n["wedges_uncapped"] / \
            max(rec_n["wedges_uncapped"], 1)
        ok = all([
            rec_n["planted_pair_exact"], rec_4n["planted_pair_exact"],
            rec_n["hub_leaf_pairs_emitted"] == 0,
            rec_4n["hub_leaf_pairs_emitted"] == 0,
            rec_n["dropped_hubs"] >= 1, rec_4n["dropped_hubs"] >= 1,
            capped_ratio <= 2 * factor,      # ~linear in edges
            uncapped_ratio >= factor ** 2 * 0.8,  # quadratic (hub)
        ])
        print(json.dumps({
            "summary": "soak_jaccard", "all_match": ok,
            "wedges_capped_ratio_4n": round(capped_ratio, 2),
            "wedges_uncapped_ratio_4n": round(uncapped_ratio, 2),
            "wall_capped_n": rec_n["wall_capped_s"],
            "wall_uncapped_n": rec_n.get("wall_uncapped_s"),
            "wall_capped_4n": rec_4n["wall_capped_s"]}), flush=True)
        sys.exit(0 if ok else 1)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
