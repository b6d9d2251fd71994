"""Planted-truth soak for personalized_pagerank (kg_ppr) and
link_prediction_ra (kg_link_prediction).

Both operators get the strongest available check at soak scale: EXACT
equality of the full distributed result against an independently
written pure-Python integer reference on the same planted graph
(int64 arithmetic means no tolerance band), plus a semantic planted
property:

  - PPR: background = random recursive forest over N nodes; planted =
    one dense 30-node community wired to the background by a single
    bridge. Seeds = 3 community members. Properties: full rank table
    equality vs the reference, AND the top-|community| nodes by rank
    are exactly the community (seed mass stays home: the bridge leaks
    <= 15% of one node's outflow per step).
  - Link prediction: planted = C disjoint 5-cliques each with ONE
    edge (x, y) removed and a single bridge to the background.
    Properties: full RA table equality vs a pure-Python wedge brute
    force, AND every planted missing pair is recovered in the top-C
    predictions (recall == 1.0 — inside an almost-clique the missing
    edge has three low-degree common neighbors, the strongest RA
    signal shape in a sparse background).

Run at N and 4N background nodes (planted count scales with N),
report wall at both. Usage:
  python tools/soak_ppr_linkpred.py [N]
"""
import random
import sys
import time
from collections import defaultdict

from pyspark.sql import SparkSession

sys.path.insert(0, ".")
from jsonld_js_spark.kg_api import (PPR_ITERS, PPR_TOTAL,  # noqa: E402
                                    PR_DAMP_DEN, PR_DAMP_NUM,
                                    link_prediction_ra,
                                    personalized_pagerank)

COMMUNITY = 30


def build_forest(n_bg: int, rng):
    edges = []
    for i in range(1, n_bg):
        if rng.random() < 0.02:
            continue
        edges.append((i, rng.randrange(i)))
    return edges


def ppr_reference(directed, seeds):
    """Independent integer PPR (same published formula, written
    against the docstring, not the Spark code)."""
    nodes = sorted({x for e in directed for x in e})
    outd = defaultdict(int)
    for a, _ in directed:
        outd[a] += 1
    k = len(seeds)
    teleport = (15 * PPR_TOTAL // 100) // k
    sset = set(seeds)
    rank = {u: (PPR_TOTAL // k if u in sset else 0) for u in nodes}
    for _ in range(PPR_ITERS):
        dshare = sum(rank[u] for u in nodes if outd[u] == 0) // k
        inflow = defaultdict(int)
        for a, b in directed:
            inflow[b] += rank[a] // outd[a]
        rank = {u: (teleport if u in sset else 0) +
                PR_DAMP_NUM * (inflow[u] + (dshare if u in sset else 0))
                // PR_DAMP_DEN
                for u in nodes}
    return rank


def soak_ppr(spark, n_bg: int, seed: int):
    rng = random.Random(seed)
    edges = build_forest(n_bg, rng)
    comm = list(range(n_bg, n_bg + COMMUNITY))
    for i in range(COMMUNITY):
        for j in range(i + 1, COMMUNITY):
            if rng.random() < 0.5:
                edges.append((comm[i], comm[j]))
    # spanning chain so the community is connected regardless of rng
    for i in range(COMMUNITY - 1):
        edges.append((comm[i], comm[i + 1]))
    edges.append((comm[0], rng.randrange(n_bg)))  # one bridge out
    directed = sorted(set(edges + [(b, a) for a, b in edges]))
    seeds = [comm[0], comm[10], comm[20]]
    df = spark.createDataFrame(directed, "subj long, dst long") \
        .repartition(32)
    t0 = time.time()
    got = {r["node"]: r["rank"]
           for r in personalized_pagerank(df, seeds).collect()}
    wall = time.time() - t0
    want = ppr_reference(directed, seeds)
    assert got == want, (
        f"rank table mismatch: {len(got)} vs {len(want)} rows, "
        f"first diffs "
        f"{[(u, got.get(u), want.get(u)) for u in list(want)[:3]]}")
    top = sorted(got, key=lambda u: (-got[u], u))[:COMMUNITY]
    assert set(top) == set(comm), (
        f"top-{COMMUNITY} by PPR != planted community "
        f"(intruders={len(set(top) - set(comm))})")
    return wall, len(directed)


def ra_reference(und_edges):
    g = defaultdict(set)
    for a, b in und_edges:
        g[a].add(b)
        g[b].add(a)
    score = defaultdict(lambda: [0, 0])  # (x,y) -> [n_shared, ra]
    for z, nb in g.items():
        w = 1000000 // len(nb)
        nb_sorted = sorted(nb)
        for i, x in enumerate(nb_sorted):
            for y in nb_sorted[i + 1:]:
                if y not in g[x]:
                    s = score[(x, y)]
                    s[0] += 1
                    s[1] += w
    return {k: tuple(v) for k, v in score.items()}


def soak_linkpred(spark, n_bg: int, n_planted: int, seed: int):
    rng = random.Random(seed)
    edges = build_forest(n_bg, rng)
    planted_pairs = []
    base = n_bg
    for c in range(n_planted):
        ids = [base + 5 * c + j for j in range(5)]
        drop = (ids[0], ids[1])
        planted_pairs.append(drop)
        for x in range(5):
            for y in range(x + 1, 5):
                e = (ids[x], ids[y])
                if e != drop:
                    edges.append(e)
        edges.append((ids[2], rng.randrange(n_bg)))
    und = sorted(set(edges))
    sym = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(sorted(sym), "a long, b long") \
        .repartition(32)
    t0 = time.time()
    got = {(r["x"], r["y"]): (r["n_shared"], r["ra_ppm"])
           for r in link_prediction_ra(df, topk=None).collect()}
    wall = time.time() - t0
    want = ra_reference(und)
    assert got == want, (
        f"RA table mismatch: {len(got)} vs {len(want)} pairs")
    ranked = sorted(got, key=lambda p: (-got[p][1], p))
    top = set(ranked[:n_planted])
    hits = sum(1 for p in planted_pairs if p in top)
    assert hits == n_planted, (
        f"planted-missing-edge recall {hits}/{n_planted} in top-"
        f"{n_planted}")
    return wall, len(sym), len(want)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .appName("soak_ppr_linkpred").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for scale, nn in (("N", n), ("4N", 4 * n)):
        w1, m1 = soak_ppr(spark, nn, seed=51015)
        print({"op": "ppr", "scale": scale, "bg_nodes": nn,
               "directed_edges": m1, "wall_s": round(w1, 2),
               "exact": True, "community_recovered": True})
        cc = nn // 100
        w2, m2, np_ = soak_linkpred(spark, nn, cc, seed=51015)
        print({"op": "link_prediction", "scale": scale, "bg_nodes": nn,
               "planted_pairs": cc, "sym_edges": m2,
               "scored_pairs": np_, "wall_s": round(w2, 2),
               "exact": True, "planted_recall": 1.0})
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
