"""Streaming as-of attribution soak: batch-equality + BOUNDED STATE
at growing stream length — the claim that matters at 10^12 events:
per-key state is O(watermark window + tolerance), independent of how
long the stream has been running.

Corpus: n_users users x n_weeks weekly (view, purchase) rounds written
as one parquet file per week (maxFilesPerTrigger=1 -> one micro-batch
per week, watermark advancing weekly). Purchases land 100 s after
their week's view -> every purchase attributes to that view exactly.
Growing n_weeks by 4x grows the STREAM LENGTH, not the window, so max
state rows must stay flat.

Usage: python jobs/soak_stream_asof.py [n_users=2000] [n_weeks=8] [factor=4]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

WEEK_US = 7 * 86400 * 1_000_000
BASE_US = 1_767_225_600_000_000
TOL_US = 3600 * 1_000_000


def write_week(spark, path, week, n_users):
    u = spark.range(n_users)
    view_us = (F.lit(BASE_US) + F.col("id") +
               week * WEEK_US + 1000 * 1_000_000)
    rows = u.select(F.explode(F.array(
        F.struct((F.col("id") * 1000 + week * 10).alias("event_id"),
                 F.timestamp_micros(view_us).alias("ts"),
                 F.col("id").alias("user_id"),
                 F.lit("view").alias("event_type")),
        F.struct((F.col("id") * 1000 + week * 10 + 1).alias("event_id"),
                 F.timestamp_micros(view_us + 100_000_000).alias("ts"),
                 F.col("id").alias("user_id"),
                 F.lit("purchase").alias("event_type")),
    )).alias("e")).select("e.event_id", "e.ts", "e.user_id",
                          "e.event_type")
    rows.coalesce(1).write.mode("append").parquet(path)


def run_one(spark, n_users, n_weeks):
    from jsonld_js_spark.streaming import stream_asof_attach
    d = tempfile.mkdtemp(prefix="asof_soak_")
    try:
        for wk in range(n_weeks):
            write_week(spark, d + "/in", wk, n_users)
        # flush file: one far-future dummy view
        spark.createDataFrame(
            [(999999999, None, 999999999, "view")],
            "event_id long, ts timestamp, user_id long, "
            "event_type string") \
            .withColumn("ts", F.timestamp_micros(
                F.lit(BASE_US + (n_weeks + 10) * WEEK_US))) \
            .coalesce(1).write.mode("append").parquet(d + "/in")
        t0 = time.time()
        q = stream_asof_attach(spark, d + "/in", d + "/ckpt",
                               tolerance_us=TOL_US,
                               watermark="1 hour",
                               query_name="asof_soak")
        q.awaitTermination(600)
        wall = time.time() - t0
        max_state = max((p["stateOperators"][0]["numRowsTotal"]
                         for p in q.recentProgress
                         if p["stateOperators"]), default=0)
        out = spark.sql(
            "SELECT count(*) AS n, "
            "sum(case when lag_us = 100000000 then 1 else 0 end) AS ok "
            "FROM asof_soak WHERE user_id < 999999999").collect()[0]
        expect = n_users * n_weeks
        assert out["n"] == expect, (out["n"], expect)
        assert out["ok"] == expect, (out["ok"], expect)
        return {"n_users": n_users, "n_weeks": n_weeks,
                "events": 2 * n_users * n_weeks,
                "attributed_exact": int(out["ok"]),
                "max_state_rows": int(max_state),
                "wall_sec": round(wall, 1)}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main():
    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_weeks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "12g")
        .appName("soak-stream-asof").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    small = run_one(spark, n_users, n_weeks)
    print(json.dumps(small), flush=True)
    big = run_one(spark, n_users, n_weeks * factor)
    print(json.dumps(big), flush=True)
    print(json.dumps({
        "metric": "stream_asof_soak",
        "state_growth_at_4x_stream_length": round(
            big["max_state_rows"] / max(small["max_state_rows"], 1), 3),
        "attribution": "exact at both lengths",
    }), flush=True)


if __name__ == "__main__":
    main()
