"""Fact-table analytics soak: rel_pricing_summary / rel_top_orders at
16x the bench lineitem (9.6M lines at sf0.1 base), with EXACT scale
truth — the 16 copies are key-shifted replicas, so every Q1 group sum
and count at 16x must equal EXACTLY 16x the 1x values (int64-cent
arithmetic makes this an equality, not a tolerance), and Q3's top-10
must be the replicas of the 1x top orders with identical revenues.

Usage: python jobs/soak_relational.py [factor=16]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHIFT = 10_000_000_000


def _replicate(df, key_cols, factor):
    copies = [df.select(*[
        (F.col(c) + i * SHIFT).alias(c) if c in key_cols else F.col(c)
        for c in df.columns]) for i in range(factor)]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionAll(c)
    return out


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "20g")
        .appName("soak-relational").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from jsonld_js_spark.operators.relational import (
        Q1_CUTOFF, Q3_DATE, TOP_ORDERS, _cents)

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li16 = _replicate(li, {"l_orderkey"}, factor)
    od16 = _replicate(od, {"o_orderkey"}, factor)

    def q1(frame):
        disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        charge = disc * (F.lit(1.0) + F.col("l_tax"))
        rows = (frame.filter(F.col("l_shipdate") <=
                             F.lit(Q1_CUTOFF).cast("timestamp"))
                .select("l_returnflag", "l_linestatus",
                        _cents(disc).alias("disc_c"),
                        _cents(charge).alias("charge_c")))
        return {(r["l_returnflag"], r["l_linestatus"]):
                (r["s1"], r["s2"], r["n"])
                for r in rows.groupBy("l_returnflag", "l_linestatus")
                .agg(F.sum("disc_c").alias("s1"),
                     F.sum("charge_c").alias("s2"),
                     F.count("*").alias("n")).collect()}

    def q3(lf, of):
        disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        date = F.lit(Q3_DATE).cast("timestamp")
        lines = (lf.filter(F.col("l_shipdate") > date)
                 .select(F.col("l_orderkey").alias("o_orderkey"),
                         _cents(disc).alias("rev_c")))
        opens = of.filter(F.col("o_orderdate") < date) \
            .select("o_orderkey")
        return (lines.join(opens, "o_orderkey")
                .groupBy("o_orderkey")
                .agg(F.sum("rev_c").alias("revenue_c"))
                .orderBy(F.desc("revenue_c"), "o_orderkey")
                .limit(TOP_ORDERS).collect())

    t0 = time.time(); base1 = q1(li); w_q1_1 = time.time() - t0
    t0 = time.time(); big1 = q1(li16); w_q1_16 = time.time() - t0
    for k, (s1, s2, n) in base1.items():
        assert big1[k] == (s1 * factor, s2 * factor, n * factor), k

    t0 = time.time(); base3 = q3(li, od); w_q3_1 = time.time() - t0
    t0 = time.time(); big3 = q3(li16, od16); w_q3_16 = time.time() - t0
    # 16 identical replicas: the big top-10 must be copies of the 1x
    # top orders (same revenue; key = orig + i*SHIFT, i ties broken
    # ascending so copy 0 of the best order leads)
    base_rev = [r["revenue_c"] for r in base3]
    big_rev = [r["revenue_c"] for r in big3]
    k = len(base_rev)
    assert big_rev == sorted(
        (base_rev * factor), reverse=True)[:k], (base_rev, big_rev)
    assert all((r["o_orderkey"] % SHIFT) == base3[0]["o_orderkey"] or
               r["revenue_c"] <= base_rev[0] for r in big3)

    print(json.dumps({
        "metric": "relational_soak", "factor": factor,
        "lines_base": li.count(), "lines_big": li16.count(),
        "q1_wall_1x": round(w_q1_1, 1), "q1_wall_16x": round(w_q1_16, 1),
        "q3_wall_1x": round(w_q3_1, 1), "q3_wall_16x": round(w_q3_16, 1),
        "q1_growth_vs_size": round(w_q1_16 / max(w_q1_1, .1) / factor, 3),
        "q3_growth_vs_size": round(w_q3_16 / max(w_q3_1, .1) / factor, 3),
        "scale_truth": "exact x16 equalities asserted",
    }), flush=True)


if __name__ == "__main__":
    main()
