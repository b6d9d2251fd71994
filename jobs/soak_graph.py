"""Graph-analytics soak: triangle counting, label propagation, k-hop,
and PageRank on a SYNTHETIC graph 10-50x the gate-scale co-mention
graph (which is vocabulary-sized at every sf), with skewed degrees and
EXACT planted structural truth on isolated reserved nodes:

- a K5 clique (ids 10^9..10^9+4): every corner in EXACTLY 6 triangles
- two K4 cliques joined by one bridge (ids 2*10^9..): label
  propagation must put the two cliques in DIFFERENT communities
- k-hop from a K5 corner: the other 4 corners at hop 1, nothing else
- PageRank: rank mass conservation within 5*N ppm rounding slack and
  a hub node ranking in the global top 10

Background: E random edges over N nodes with a quadratically-skewed
source distribution (hub nodes exist by construction — the
degree-ordered triangle orientation and partial-agg supersteps must
absorb them).

Usage: python jobs/soak_graph.py [n_nodes=50000] [n_edges=250000] [factor=4]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

K5 = [1_000_000_000 + i for i in range(5)]
Q_A = [2_000_000_000 + i for i in range(4)]
Q_B = [2_000_000_100 + i for i in range(4)]


def planted_pairs():
    pairs = [(a, b) for i, a in enumerate(K5) for b in K5[i + 1:]]
    for grp in (Q_A, Q_B):
        pairs += [(a, b) for i, a in enumerate(grp) for b in grp[i + 1:]]
    pairs.append((Q_A[0], Q_B[0]))  # the bridge
    return pairs


def synth_edges(spark, n_nodes: int, n_edges: int):
    """Undirected distinct pair set (a < b): skewed random background
    + planted structures."""
    e = spark.range(n_edges)
    h1 = F.abs(F.xxhash64(F.col("id") * 3 + 1))
    h2 = F.abs(F.xxhash64(F.col("id") * 7 + 5))
    # quadratic skew toward low ids: src = (h1 % n) * (h1 % n) / n
    src = ((h1 % n_nodes) * (h1 % n_nodes) / F.lit(n_nodes)) \
        .cast("long")
    dst = h2 % n_nodes
    bg = (e.select(F.least(src, dst).alias("a"),
                   F.greatest(src, dst).alias("b"))
          .filter(F.col("a") != F.col("b")))
    planted = spark.createDataFrame(planted_pairs(), "a long, b long")
    return bg.unionAll(planted).distinct()


def run_one(spark, n_nodes: int, n_edges: int) -> dict:
    from jsonld_js_spark.kg_api import (
        khop, label_propagation, pagerank, triangle_counts)
    pairs = synth_edges(spark, n_nodes, n_edges).cache()
    n_pairs = pairs.count()
    und = (pairs.select("a", "b")
           .unionAll(pairs.select(F.col("b").alias("a"),
                                  F.col("a").alias("b")))).cache()

    t0 = time.time()
    tri = {r["ent"]: r["n_triangles"] for r in triangle_counts(
        pairs.select(F.col("a").alias("ent_a"),
                     F.col("b").alias("ent_b"))).collect()}
    w_tri = time.time() - t0
    assert all(tri.get(v) == 6 for v in K5), [tri.get(v) for v in K5]

    t0 = time.time()
    labels = {r["node"]: r["label"]
              for r in label_propagation(und).collect()}
    w_lpa = time.time() - t0
    la = {labels[v] for v in Q_A}
    lb = {labels[v] for v in Q_B}
    assert len(la) == 1 and len(lb) == 1 and la != lb, (la, lb)

    seeds = spark.createDataFrame([(K5[0],)], "node long")
    t0 = time.time()
    hops = {r["node"]: r["hops"]
            for r in khop(und, seeds, k=2).collect()}
    w_khop = time.time() - t0
    assert all(hops.get(v) == 1 for v in K5[1:]), hops
    assert len(hops) == 5  # the K5 is isolated: nothing past hop 1

    directed = und.select(F.col("a").alias("subj"),
                          F.col("b").alias("dst")).distinct()
    t0 = time.time()
    ranks = pagerank(directed)
    top = ranks.orderBy(F.desc("rank"), "node").limit(10).collect()
    total = ranks.agg(F.sum("rank").alias("s"),
                      F.count("*").alias("n")).collect()[0]
    w_pr = time.time() - t0
    # exact-int64 PageRank floors once per edge contribution and once
    # per node per superstep, so mass can only LEAK (never inflate):
    # base*N <= sum <= 1e6*N, and a skewed hub must both exceed the
    # uniform mass and reach the global top 10
    assert total["n"] * 150_000 <= total["s"] <= total["n"] * 1_000_000
    assert top[0]["rank"] > 1_000_000
    assert any(r["node"] < n_nodes // 100 for r in top), \
        [r["node"] for r in top]  # a skew hub reaches the top 10

    rec = {"n_nodes": n_nodes, "n_pairs": n_pairs,
           "triangle_wall": round(w_tri, 1),
           "lpa_wall": round(w_lpa, 1),
           "khop_wall": round(w_khop, 1),
           "pagerank_wall": round(w_pr, 1),
           "planted_truth": "exact (asserted)"}
    und.unpersist(); pairs.unpersist()
    print(json.dumps(rec), flush=True)
    return rec


def main():
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "20g")
        .appName("soak-graph").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    small = run_one(spark, n_nodes, n_edges)
    big = run_one(spark, n_nodes * factor, n_edges * factor)
    print(json.dumps({
        "metric": "graph_soak",
        "wall_growth_vs_size_growth": {
            op: round(big[f"{op}_wall"] / max(small[f"{op}_wall"], .1)
                      / factor, 3)
            for op in ("triangle", "lpa", "khop", "pagerank")},
    }), flush=True)


if __name__ == "__main__":
    main()
