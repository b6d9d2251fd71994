"""Planted-truth soak for kcore_edges (kg_kcore's peel kernel).

Construction with a CLOSED-FORM k-core (k=3):
  - background: a random recursive forest over N nodes — forests have
    an EMPTY 3-core (every tree always has a vertex of degree <= 2),
    so the whole background must peel away;
  - planted: C disjoint 5-cliques on separate node ids, each wired to
    the background by a single bridge edge per clique (bridges give
    one background node +1 degree and one clique node +1 degree —
    after the background peels, clique nodes are back to degree 4).
  Exact truth: the 3-core is precisely the 5C clique nodes, each with
  within-core degree 4.

Run at N and 4N background nodes (C scales with N), assert exact
recovery, report wall at both scales. Usage:
  python tools/soak_kcore.py [N] [C]
"""
import random
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, ".")
from jsonld_js_spark.kg_api import kcore_edges  # noqa: E402


def build_edges(n_bg: int, n_cliques: int, seed: int):
    rng = random.Random(seed)
    edges = []
    # random recursive forest: node i attaches to a random earlier
    # node, with a 2% chance of starting a fresh tree (forest, not
    # tree, exercises multi-component peel)
    for i in range(1, n_bg):
        if rng.random() < 0.02:
            continue
        edges.append((i, rng.randrange(i)))
    clique_nodes = []
    base = n_bg
    for c in range(n_cliques):
        ids = [base + 5 * c + j for j in range(5)]
        clique_nodes.extend(ids)
        for x in range(5):
            for y in range(x + 1, 5):
                edges.append((ids[x], ids[y]))
        # one bridge into the background per clique
        edges.append((ids[0], rng.randrange(n_bg)))
    return edges, set(clique_nodes)


def run(spark, n_bg: int, n_cliques: int, seed: int):
    edges, truth = build_edges(n_bg, n_cliques, seed)
    sym = edges + [(b, a) for (a, b) in edges]
    df = spark.createDataFrame(sym, "a long, b long").repartition(32)
    t0 = time.time()
    core = kcore_edges(df, k=3)
    got = {(r["a"], r["b"]) for r in core.collect()}
    wall = time.time() - t0
    nodes = {a for a, _ in got}
    deg = {}
    for a, _ in got:
        deg[a] = deg.get(a, 0) + 1
    assert nodes == truth, (
        f"core nodes != planted cliques: extra={len(nodes - truth)} "
        f"missing={len(truth - nodes)}")
    bad = {n: d for n, d in deg.items() if d != 4}
    assert not bad, f"wrong within-core degrees: {list(bad.items())[:5]}"
    return wall, len(sym), len(truth)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else None
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .appName("soak_kcore").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for scale, nn in (("N", n), ("4N", 4 * n)):
        cc = c if c is not None else nn // 100
        if scale == "4N" and c is not None:
            cc = 4 * c
        wall, m, k = run(spark, nn, cc, seed=51015)
        print({"scale": scale, "bg_nodes": nn, "cliques": cc,
               "sym_edges": m, "core_nodes": k,
               "wall_s": round(wall, 2), "exact": True})
    spark.stop()


if __name__ == "__main__":
    main()
