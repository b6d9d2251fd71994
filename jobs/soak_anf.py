"""Planted-truth soak for the neighborhood-function family
(kg_neighborhood_growth's exact kernel + anf_registers' HyperANF
scale path).

Construction with a CLOSED-FORM neighborhood function (h <= ANF_H=3):
  - R rings (cycles) of length 64 (> 2*3+1, so no wraparound):
    every node's h-ball is exactly 2h+1 nodes -> rings contribute
    64*R*(2h+1) ordered pairs at distance <= h;
  - C disjoint 5-cliques: balls saturate at 5 for every h >= 1
    (25*C pairs; 5*C at h=0).
  Exact truth: N(h) = 64*R*(2h+1) + C*5*(5 if h else 1).

Checks, at N and 4N (R scales, C = R//2):
  1. `neighborhood_growth` == the closed form EXACTLY (the
     definitional path the DuckDB oracle also runs, here against
     independent arithmetic, at soak scale);
  2. `anf_estimates(anf_registers(...))` per-node mean relative error
     < 0.15 vs the known ball sizes (7 on rings at h=3, 5 on cliques)
     — the estimator the 100 TB run actually reads;
  3. register-path wall at N vs 4N (state is nodes x <= 64 rows —
     linear), reported as JSON lines.
  4. the scale divergence on a hub graph: a star of S leaves has
     N(2) = (S+1)^2 — the exact path must materialize every pair,
     the register path carries S x <= 64 rows. Exact runs at S only,
     registers at S and 4S; the report shows pair rows vs register
     rows.

Usage: python jobs/soak_anf.py [R] [S]   (defaults 150, 1500)
Always run with 2>/dev/null (CLAUDE.md soak-output rule).
"""
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from jsonld_js_spark.kg_api import (ANF_H, anf_estimates,  # noqa: E402
                                    anf_registers, neighborhood_growth)


def build_planted(n_rings: int, n_cliques: int):
    edges = []
    truth_ball = {}  # node -> exact |ball(node, ANF_H)|
    nid = 0
    for _ in range(n_rings):
        ids = list(range(nid, nid + 64))
        nid += 64
        for i in range(64):
            edges.append((ids[i], ids[(i + 1) % 64]))
        for v in ids:
            truth_ball[v] = 2 * ANF_H + 1
    for _ in range(n_cliques):
        ids = list(range(nid, nid + 5))
        nid += 5
        for x in range(5):
            for y in range(x + 1, 5):
                edges.append((ids[x], ids[y]))
        for v in ids:
            truth_ball[v] = 5
    return edges, truth_ball


def closed_form(n_rings: int, n_cliques: int, h: int) -> int:
    rings = 64 * n_rings * (2 * h + 1)
    cliques = n_cliques * 5 * (5 if h else 1)
    return rings + cliques


def run_planted(spark, n_rings: int, n_cliques: int) -> dict:
    edges, truth = build_planted(n_rings, n_cliques)
    sym = edges + [(b, a) for (a, b) in edges]
    df = (spark.createDataFrame(sym, "a long, b long")
          .select(F.col("a").cast("string").alias("a"),
                  F.col("b").cast("string").alias("b"))
          .repartition(32))
    t0 = time.time()
    growth = dict(neighborhood_growth(df))
    wall_exact = time.time() - t0
    for h in range(ANF_H + 1):
        want = closed_form(n_rings, n_cliques, h)
        assert growth[h] == want, (h, growth[h], want)
    t0 = time.time()
    est = anf_estimates(anf_registers(df).collect())
    wall_regs = time.time() - t0
    truth_s = {str(k): v for k, v in truth.items()}
    assert set(est) == set(truth_s)
    rel = [abs(est[v] - truth_s[v]) / truth_s[v] for v in truth_s]
    mre = sum(rel) / len(rel)
    assert mre < 0.15, mre
    return {"nodes": len(truth), "edges": len(sym),
            "growth_exact_ok": True, "mean_rel_err": round(mre, 4),
            "wall_exact_s": round(wall_exact, 2),
            "wall_registers_s": round(wall_regs, 2)}


def run_star(spark, n_leaves: int, exact: bool) -> dict:
    sym =[("hub", f"l{i}") for i in range(n_leaves)] + \
          [(f"l{i}", "hub") for i in range(n_leaves)]
    df = spark.createDataFrame(sym, "a string, b string").repartition(32)
    out = {"leaves": n_leaves}
    if exact:
        t0 = time.time()
        growth = dict(neighborhood_growth(df, h_max=2))
        out["exact_pairs_h2"] = growth[2]
        out["wall_exact_s"] = round(time.time() - t0, 2)
        assert growth[2] == (n_leaves + 1) ** 2, growth
    t0 = time.time()
    regs = anf_registers(df, h_max=2)
    n_reg_rows = regs.count()
    est = anf_estimates(regs.collect())
    out["register_rows"] = n_reg_rows
    out["wall_registers_s"] = round(time.time() - t0, 2)
    truth = n_leaves + 1  # every ball at h=2 is the whole star
    rel = [abs(e - truth) / truth for e in est.values()]
    mre = sum(rel) / len(rel)
    assert mre < 0.15, mre
    out["mean_rel_err"] = round(mre, 4)
    return out


def main():
    n_rings = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    n_star = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .appName("soak_anf").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for scale, r in (("N", n_rings), ("4N", 4 * n_rings)):
        rec = run_planted(spark, r, r // 2)
        rec.update({"part": "planted_rings_cliques", "scale": scale})
        print(json.dumps(rec), flush=True)
    for scale, s, exact in (("N", n_star, True), ("4N", 4 * n_star, False)):
        rec = run_star(spark, s, exact)
        rec.update({"part": "hub_star", "scale": scale,
                    "exact_ran": exact})
        print(json.dumps(rec), flush=True)
    spark.stop()
    print(json.dumps({"soak": "anf", "status": "PASS"}), flush=True)


if __name__ == "__main__":
    main()
