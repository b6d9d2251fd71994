"""Events-analytics soak: as-of attribution, funnel, and retention at
10-40x the bench event volume, with EXACT planted analytic truth (the
gate proves cross-engine equality at sf0.01; this proves the
operators' semantics and wall-clock linearity at scale).

Corpus: deterministic in-engine synthesis, one table serving all
three operators. Per user u (id-offset by u microseconds so no two
events collide):
- signup at BASE+u
- 10 weekly views (week k at BASE+u+k*WEEK+1000s)
- a click 10 s after view0 for EVEN users only
- purchase A 100 s after view2 (within the 3600 s tolerance ->
  must attribute to view2 exactly, lag 100 s)
- purchase B 5000 s after view9, the LAST view (beyond tolerance ->
  must be unattributed)

Planted truth, all exact:
- asof: n_users matched rows each (asof_event_id = view2's id,
  lag_us = 100e6), n_users unattributed rows
- funnel: even users stage 3, odd users stage 1 (purchase without a
  click does not count — order constraint)
- retention: ONE cohort, offsets 0..9 each with exactly n_users
  distinct users

Usage: python jobs/soak_events.py [n_small=100000] [factor=4]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

WEEK_US = 7 * 86400 * 1_000_000
BASE_US = 1_767_225_600_000_000  # 2026-01-01T00:00Z
N_WEEKS = 10
TOL_US = 3600 * 1_000_000


def synth_events(spark, n_users: int):
    u = spark.range(n_users).select(F.col("id").alias("u"))
    base = F.lit(BASE_US) + F.col("u")

    def ev(eid, us, typ):
        return F.struct(eid.cast("long").alias("event_id"),
                        F.timestamp_micros(us).alias("ts"),
                        F.lit(typ).alias("event_type"))

    view_us = lambda k: base + k * WEEK_US + 1000 * 1_000_000
    rows = [ev(F.col("u") * 100, base, "signup")]
    for k in range(N_WEEKS):
        rows.append(ev(F.col("u") * 100 + 1 + k, view_us(F.lit(k)),
                       "view"))
    click = ev(F.col("u") * 100 + 50, view_us(F.lit(0)) + 10_000_000,
               "click")
    rows.append(ev(F.col("u") * 100 + 60,
                   view_us(F.lit(2)) + 100_000_000, "purchase"))
    rows.append(ev(F.col("u") * 100 + 61,
                   view_us(F.lit(N_WEEKS - 1)) + 5000_000_000,
                   "purchase"))
    both = F.array(*rows)
    with_click = F.array_union(both, F.array(click))
    evs = u.select(
        F.col("u").alias("user_id"),
        F.explode(F.when(F.col("u") % 2 == 0, with_click)
                  .otherwise(both)).alias("e"))
    return evs.select("user_id", "e.event_id", "e.ts", "e.event_type")


def run_asof(spark, n_users: int) -> dict:
    from jsonld_js_spark.operators.asof import asof_attach
    evs = synth_events(spark, n_users)
    t0 = time.time()
    out = asof_attach(evs, tolerance_us=TOL_US).cache()
    n = out.count()
    wall = time.time() - t0
    matched = out.filter(
        (F.col("lag_us") == 100_000_000) &
        (F.col("asof_event_id") == (F.col("user_id") * 100 + 3))).count()
    nulls = out.filter(F.col("asof_event_id").isNull()).count()
    assert n == 2 * n_users, n
    assert matched == n_users, (matched, n_users)
    assert nulls == n_users, (nulls, n_users)
    out.unpersist()
    return {"op": "asof", "n_users": n_users, "rows": n,
            "wall_sec": round(wall, 1)}


def run_funnel(spark, n_users: int) -> dict:
    from jsonld_js_spark.operators.sessions import funnel_stages
    evs = synth_events(spark, n_users)
    t0 = time.time()
    hist = {r["stage"]: r["n"] for r in
            funnel_stages(evs).groupBy("stage")
            .agg(F.count("*").alias("n")).collect()}
    wall = time.time() - t0
    assert hist == {3: (n_users + 1) // 2, 1: n_users // 2}, hist
    return {"op": "funnel", "n_users": n_users,
            "wall_sec": round(wall, 1)}


def run_retention(spark, n_users: int) -> dict:
    from jsonld_js_spark.operators.sessions import retention_cohorts
    evs = synth_events(spark, n_users)
    t0 = time.time()
    cells = retention_cohorts(evs).collect()
    wall = time.time() - t0
    assert len({r["cohort"] for r in cells}) == 1
    got = {r["period_offset"]: r["n_users"] for r in cells}
    assert got == {k: n_users for k in range(N_WEEKS)}, got
    return {"op": "retention", "n_users": n_users,
            "wall_sec": round(wall, 1)}


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "20g")
        .appName("soak-events").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    recs = []
    for n in (n_small, n_small * factor):
        for fn in (run_asof, run_funnel, run_retention):
            rec = fn(spark, n)
            recs.append(rec)
            print(json.dumps(rec), flush=True)
    by_op = {}
    for r in recs:
        by_op.setdefault(r["op"], []).append(r["wall_sec"])
    print(json.dumps({
        "metric": "events_soak",
        "planted_truth": "exact (asserted)",
        "wall_growth_vs_size_growth": {
            op: round(w[1] / max(w[0], 0.1) / factor, 3)
            for op, w in by_op.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
