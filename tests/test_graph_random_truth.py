"""Randomized-graph brute-force truths for the graph operators.

The DuckDB oracles share each operator's formula, and the hand truths
cover one fixed tiny graph each — these tests run the DISTRIBUTED
implementations against independently-written pure-Python references
on random Erdős–Rényi graphs plus adversarial shapes (star, clique,
chain), closing the shared-defect blind spot for the graph family the
same way the planted-truth soaks do for dedup/ANN (memory:
oracle-gate-blind-spots)."""
from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from jsonld_js_spark.kg_api import (KHOP_K, LPA_ITERS, PAGERANK_ITERS,
                                    PR_DAMP_DEN, PR_DAMP_NUM, khop,
                                    label_propagation, neighbor_jaccard,
                                    pagerank, triangle_counts)


def random_graphs():
    rng = random.Random(20260819)
    graphs = []
    for _ in range(4):
        n = rng.randint(8, 30)
        p = rng.choice([0.08, 0.2, 0.45])
        edges = {(f"n{i}", f"n{j}")
                 for i in range(n) for j in range(i + 1, n)
                 if rng.random() < p}
        graphs.append(edges)
    n = 12  # star: hub wedge pressure
    graphs.append({("hub", f"n{i}") for i in range(n)})
    n = 7   # clique: every pair closes every wedge
    graphs.append({(f"n{i}", f"n{j}")
                   for i in range(n) for j in range(i + 1, n)})
    graphs.append({(f"n{i}", f"n{i+1}") for i in range(10)})  # chain
    return [g for g in graphs if g]


def both_dirs(und):
    return [(a, b) for a, b in und] + [(b, a) for a, b in und]


def adj(und):
    d = defaultdict(set)
    for a, b in und:
        d[a].add(b)
        d[b].add(a)
    return d


def test_khop_matches_bfs(spark):
    for und in random_graphs():
        nodes = sorted({x for e in und for x in e})
        seeds = nodes[:2]
        g = adj(und)
        # reference: level-order BFS with exact min hop
        dist = {s: 0 for s in seeds}
        frontier = list(seeds)
        for h in range(1, KHOP_K + 1):
            nxt = []
            for u in frontier:
                for v in g[u]:
                    if v not in dist:
                        dist[v] = h
                        nxt.append(v)
            frontier = nxt
        edges = spark.createDataFrame(both_dirs(und), "a string, b string")
        seeds_df = spark.createDataFrame([(s,) for s in seeds],
                                         "node string")
        got = {(r["node"], r["hops"]) for r in
               khop(edges, seeds_df).collect()}
        assert got == {(k, v) for k, v in dist.items()}


def test_triangle_counts_match_bruteforce(spark):
    for und in random_graphs():
        g = adj(und)
        nodes = sorted(g)
        tri = Counter()
        for i, u in enumerate(nodes):
            for v in nodes[i + 1:]:
                if v not in g[u]:
                    continue
                for w in nodes:
                    if w > v and w in g[u] and w in g[v]:
                        tri[u] += 1
                        tri[v] += 1
                        tri[w] += 1
        # operator input: (ent_a, ent_b) any multiplicity — feed each
        # undirected edge once plus a duplicated/reversed sample
        rows = list(und) + [(b, a) for a, b in list(und)[::3]]
        edges = spark.createDataFrame(rows, "ent_a string, ent_b string")
        got = {(r["ent"], r["n_triangles"]) for r in
               triangle_counts(edges).collect()}
        assert got == {(k, v) for k, v in tri.items()}


def test_label_propagation_matches_sync_reference(spark):
    for und in random_graphs():
        g = adj(und)
        labels = {u: u for u in g}
        for _ in range(LPA_ITERS):
            new = {}
            for u in g:
                votes = Counter(labels[v] for v in g[u])
                # max count, tie -> lexicographic-min label
                new[u] = min(votes, key=lambda L: (-votes[L], L))
            labels = new
        edges = spark.createDataFrame(both_dirs(und), "a string, b string")
        got = {(r["node"], r["label"]) for r in
               label_propagation(edges).collect()}
        assert got == {(k, v) for k, v in labels.items()}


def test_neighbor_jaccard_matches_bruteforce(spark):
    for und in random_graphs():
        g = adj(und)
        deg = {u: len(g[u]) for u in g}
        scores = {}
        pairs = {(x, y) for n in g for x in g[n] for y in g[n] if x < y}
        for x, y in pairs:
            shared = len(g[x] & g[y])
            if shared == 0:
                continue
            # mirror the operator's float expression exactly
            ppm = math.floor(shared * 1000000.0 /
                             (deg[x] + deg[y] - shared))
            scores[(x, y)] = (shared, ppm)
        want = sorted(((x, y, s, p) for (x, y), (s, p) in scores.items()),
                      key=lambda t: (-t[3], t[0], t[1]))[:50]
        edges = spark.createDataFrame(both_dirs(und), "a string, b string")
        got = [(r["x"], r["y"], r["n_shared"], r["jaccard_ppm"])
               for r in neighbor_jaccard(edges).collect()]
        assert got == want


def test_pagerank_matches_integer_reference(spark):
    for und in random_graphs():
        # directed edges: orient each undirected edge BOTH ways for
        # some, one way for others (mixed out-degrees + dangling nodes)
        rng = random.Random(hash(frozenset(und)) & 0xFFFF)
        directed = set()
        for a, b in und:
            if rng.random() < 0.6:
                directed.add((a, b))
            if rng.random() < 0.6:
                directed.add((b, a))
        if not directed:
            directed = {next(iter(und))}
        nodes = sorted({x for e in directed for x in e})
        outd = Counter(a for a, _ in directed)
        n = len(nodes)
        rank = {u: 1000000 for u in nodes}
        for _ in range(PAGERANK_ITERS):
            dshare = sum(rank[u] for u in nodes if outd[u] == 0) // n
            inflow = defaultdict(int)
            for a, b in directed:
                inflow[b] += rank[a] // outd[a]
            rank = {u: 150000 +
                    PR_DAMP_NUM * (inflow[u] + dshare) // PR_DAMP_DEN
                    for u in nodes}
        edges = spark.createDataFrame(sorted(directed),
                                      "subj string, dst string")
        got = {(r["node"], r["rank"]) for r in pagerank(edges).collect()}
        assert got == {(k, v) for k, v in rank.items()}


def test_ppr_matches_integer_reference(spark):
    """Seed-personalized PageRank equals a pure-Python integer
    reference (teleport and dangling mass restricted to the seed set;
    unreachable nodes must stay EXACTLY 0) on mixed-orientation random
    graphs — closes the shared-formula blind spot between the Spark
    supersteps and the unrolled-CTE oracle."""
    from jsonld_js_spark.kg_api import (PPR_ITERS, PPR_TOTAL,
                                        personalized_pagerank)

    for und in random_graphs():
        rng = random.Random(hash(frozenset(und)) & 0xFFFF)
        directed = set()
        for a, b in und:
            if rng.random() < 0.6:
                directed.add((a, b))
            if rng.random() < 0.6:
                directed.add((b, a))
        if not directed:
            directed = {next(iter(und))}
        nodes = sorted({x for e in directed for x in e})
        outd = Counter(a for a, _ in directed)
        # seed rule mirrors q_kg_ppr: top out-degree, node asc
        seeds = sorted(nodes, key=lambda u: (-outd[u], u))[:3]
        k = len(seeds)
        teleport = (15 * PPR_TOTAL // 100) // k
        rank = {u: (PPR_TOTAL // k if u in seeds else 0) for u in nodes}
        for _ in range(PPR_ITERS):
            dshare = sum(rank[u] for u in nodes if outd[u] == 0) // k
            inflow = defaultdict(int)
            for a, b in directed:
                inflow[b] += rank[a] // outd[a]
            rank = {u: (teleport if u in seeds else 0) +
                    PR_DAMP_NUM *
                    (inflow[u] + (dshare if u in seeds else 0))
                    // PR_DAMP_DEN
                    for u in nodes}
        edges = spark.createDataFrame(sorted(directed),
                                      "subj string, dst string")
        got = {(r["node"], r["rank"])
               for r in personalized_pagerank(edges, seeds).collect()}
        assert got == {(u, v) for u, v in rank.items()}
        # PPR semantics: nodes the seeds can't reach hold zero mass
        reach = set(seeds)
        frontier = set(seeds)
        g = defaultdict(set)
        for a, b in directed:
            g[a].add(b)
        while frontier:
            frontier = {m for u in frontier for m in g[u]} - reach
            reach |= frontier
        assert all(v == 0 for u, v in rank.items() if u not in reach)


def test_link_prediction_ra_matches_bruteforce(spark):
    """Resource Allocation link prediction equals a pure-Python
    brute force (sum of 10^6 // deg(z) over common neighbors z,
    adjacent pairs excluded) on random + adversarial graphs."""
    from jsonld_js_spark.kg_api import link_prediction_ra

    for und in random_graphs():
        g = adj(und)
        want = {}
        nodes = sorted(g)
        for i, x in enumerate(nodes):
            for y in nodes[i + 1:]:
                if y in g[x]:
                    continue
                common = g[x] & g[y]
                if common:
                    want[(x, y)] = (len(common),
                                    sum(1000000 // len(g[z])
                                        for z in common))
        edges = spark.createDataFrame(
            sorted(both_dirs(und)), "a string, b string")
        got = {(r["x"], r["y"]): (r["n_shared"], r["ra_ppm"])
               for r in link_prediction_ra(edges, topk=10**6).collect()}
        assert got == want


def test_kcore_matches_bruteforce(spark):
    """Distributed iterative peel equals a pure-Python fixpoint peel
    on random + adversarial graphs (chain: the slow-peel worst case —
    endpoints only, one layer per round)."""
    from jsonld_js_spark.kg_api import KCORE_K, kcore_edges

    for und in random_graphs():
        g = adj(und)
        alive = {n for n in g if len(g[n]) > 0}
        while True:
            drop = {n for n in alive
                    if sum(1 for m in g[n] if m in alive) < KCORE_K}
            if not drop:
                break
            alive -= drop
        expected = {}
        for n in alive:
            d = sum(1 for m in g[n] if m in alive)
            if d > 0:
                expected[n] = d

        edges = spark.createDataFrame(both_dirs(und), "a string, b string")
        core = kcore_edges(edges)
        got = {r["a"]: r["cnt"] for r in
               core.groupBy("a").agg(F.count("*").alias("cnt")).collect()}
        assert got == expected


def test_neighborhood_growth_matches_bfs(spark):
    """Exact neighborhood function vs an all-sources BFS reference on
    random + adversarial graphs."""
    from jsonld_js_spark.kg_api import ANF_H, neighborhood_growth
    for und in random_graphs():
        g = adj(und)
        nodes = sorted(g)
        expect = []
        for h in range(ANF_H + 1):
            total = 0
            for s in nodes:
                seen = {s}
                frontier = [s]
                for _ in range(h):
                    frontier = [v for u in frontier for v in g[u]
                                if v not in seen and not seen.add(v)]
                total += len(seen)
            expect.append((h, total))
        edges = spark.createDataFrame(both_dirs(und), "a string, b string")
        got = sorted((h, n) for h, n in neighborhood_growth(edges))
        assert got == expect, (got, expect)


def test_anf_registers_match_ball_definition(spark):
    """HyperANF register propagation == HLL registers of the EXACT
    h-ball, node by node, bit for bit (the lossless-union property the
    oracle also checks, here against an independent python BFS +
    md5)."""
    import hashlib
    from jsonld_js_spark.kg_api import (ANF_H, _ANF_RHO_MAX, _ANF_W_MOD,
                                        anf_registers)
    for und in random_graphs()[:4]:
        g = adj(und)
        expect = set()
        for s in g:
            seen = {s}
            frontier = [s]
            for _ in range(ANF_H):
                frontier = [v for u in frontier for v in g[u]
                            if v not in seen and not seen.add(v)]
            regs = {}
            for v in seen:
                h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
                b, w = h // _ANF_W_MOD, h % _ANF_W_MOD
                rho = _ANF_RHO_MAX if w == 0 else \
                    _ANF_RHO_MAX - len(bin(w)) + 2
                regs[b] = max(regs.get(b, 0), rho)
            expect |= {(s, b, r) for b, r in regs.items()}
        edges = spark.createDataFrame(both_dirs(und), "a string, b string")
        got = {(r["node"], r["bucket"], r["rho"])
               for r in anf_registers(edges).collect()}
        assert got == expect


def test_anf_estimates_track_ball_sizes(spark):
    """The float estimator (what a 100 TB run reads off the registers)
    tracks exact ball sizes within the 64-register noise band on a
    sparse random graph."""
    import random as _random
    from jsonld_js_spark.kg_api import (ANF_H, anf_estimates,
                                        anf_registers)
    rng = _random.Random(20260820)
    n = 300
    und = {(f"v{i}", f"v{j}") for i in range(n) for j in range(i + 1, n)
           if rng.random() < 0.008}
    g = adj(und)
    exact = {}
    for s in g:
        seen = {s}
        frontier = [s]
        for _ in range(ANF_H):
            frontier = [v for u in frontier for v in g[u]
                        if v not in seen and not seen.add(v)]
        exact[s] = len(seen)
    edges = spark.createDataFrame(both_dirs(und), "a string, b string")
    est = anf_estimates(anf_registers(edges).collect())
    assert set(est) == set(exact)
    rel = [abs(est[v] - exact[v]) / exact[v] for v in exact]
    assert sum(rel) / len(rel) < 0.20, sum(rel) / len(rel)


def test_degree_distribution_matches_bruteforce(spark):
    for und in random_graphs():
        g = adj(und)
        buckets = defaultdict(list)
        for node, nbrs in g.items():
            d = len(nbrs)
            buckets[len(bin(d)) - 2].append(d)  # bit length = log2+1
        want = sorted((b, len(ds), min(ds), max(ds))
                      for b, ds in buckets.items())
        from jsonld_js_spark.kg_api import degree_distribution
        df = spark.createDataFrame(both_dirs(und), "a string, b string")
        got = [tuple(r) for r in degree_distribution(df).collect()]
        assert got == want, (got, want)
