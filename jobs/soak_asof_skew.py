"""as-of join skew soak (round 5): a planted bot user owning ~33% of
all events — the pathological key that serializes the unsalted
window — run through the unsalted and time-bucket-salted plans.

Assertions:
  1. EXACT output equality (count + commutative xxhash64 checksum over
     every output column) between unsalted and salted at both sizes —
     the salting must be output-invisible;
  2. the measured per-partition bound drops from events-per-key
     (the bot's full event count) to events-per-(key, bucket) —
     reported from the data, not theory;
  3. walls at N and 4N for both plans — the salted plan's hot-task
     ceiling stays flat as the bot grows, the unsalted one grows with
     the bot.

Usage: python jobs/soak_asof_skew.py [n_users=50000] [per_user=20]
       [factor=4] [bucket_s=600]
One JSON line per size + a summary line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

BOT_USER = 999_999_999
SPAN_US = 86_400_000_000  # one day of events


def synth_events(spark, n_users: int, per_user: int):
    """Background: n_users x per_user events; bot: half that volume
    again on ONE key. Deterministic via xxhash64; ts spread over one
    day; ~45% views, ~45% purchases, 10% noise."""
    n_bg = n_users * per_user
    n_bot = n_bg // 2
    bg = spark.range(n_bg).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id"), F.lit(n_users)).alias("user_id"),
        F.pmod(F.xxhash64(F.col("id") * 3 + 1), F.lit(SPAN_US))
        .alias("us"))
    bot = spark.range(n_bot).select(
        (F.col("id") + n_bg).alias("event_id"),
        F.lit(BOT_USER).alias("user_id"),
        F.pmod(F.xxhash64(F.col("id") * 7 + 5), F.lit(SPAN_US))
        .alias("us"))
    e = bg.unionAll(bot)
    typ = (F.when(F.pmod(F.xxhash64(F.col("event_id") * 11 + 3),
                         F.lit(10)) < 4, "view")
           .when(F.pmod(F.xxhash64(F.col("event_id") * 11 + 3),
                        F.lit(10)) < 8, "purchase")
           .otherwise("error"))
    return e.select(
        "event_id", "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        typ.alias("event_type")).localCheckpoint()


def _checksum(df):
    # pmod keeps the commutative sum inside int64 under ANSI mode
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1 << 40)))
        .alias("h")).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def run_one(spark, n_users: int, per_user: int, bucket_us: int) -> dict:
    from jsonld_js_spark.operators.asof import asof_attach
    ev = synth_events(spark, n_users, per_user)
    rec = {"n_events": ev.count(), "n_users": n_users + 1,
           "bot_events": int(ev.filter(
               F.col("user_id") == BOT_USER).count())}
    # measured per-partition bounds (the quantity the window sorts)
    rec["max_rows_per_key"] = int(
        ev.groupBy("user_id").count().agg(F.max("count")).collect()[0][0])
    rec["max_rows_per_key_bucket"] = int(
        ev.withColumn("b", F.expr(
            f"unix_micros(cast(ts as timestamp)) div {bucket_us}"))
        .groupBy("user_id", "b").count()
        .agg(F.max("count")).collect()[0][0])

    t0 = time.time()
    n_u, h_u = _checksum(asof_attach(ev))
    rec["wall_unsalted_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    n_s, h_s = _checksum(asof_attach(ev, salt_bucket_us=bucket_us))
    rec["wall_salted_s"] = round(time.time() - t0, 1)
    rec["rows_out"] = n_u
    rec["outputs_equal"] = (n_u, h_u) == (n_s, h_s)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    per_user = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    bucket_us = (int(sys.argv[4]) if len(sys.argv) > 4 else 600) * 1_000_000
    spark = (SparkSession.builder.master("local[32]")
             .appName("soak_asof_skew")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    try:
        rec_n = run_one(spark, n_users, per_user, bucket_us)
        rec_4n = run_one(spark, n_users * factor, per_user, bucket_us)
        ok = all([
            rec_n["outputs_equal"], rec_4n["outputs_equal"],
            # the salted bound must be a small fraction of the bot's
            # event count at both sizes (one day / 10-min buckets =
            # 144 buckets -> ~1/144 with uniform spread; allow 4x)
            rec_n["max_rows_per_key_bucket"] * 36
            <= rec_n["max_rows_per_key"],
            rec_4n["max_rows_per_key_bucket"] * 36
            <= rec_4n["max_rows_per_key"],
        ])
        print(json.dumps({
            "summary": "soak_asof_skew", "all_match": ok,
            "bucket_s": bucket_us // 1_000_000,
            "skew_bound_ratio_n": round(
                rec_n["max_rows_per_key"] /
                rec_n["max_rows_per_key_bucket"], 1),
            "skew_bound_ratio_4n": round(
                rec_4n["max_rows_per_key"] /
                rec_4n["max_rows_per_key_bucket"], 1),
            "wall_unsalted_4n": rec_4n["wall_unsalted_s"],
            "wall_salted_4n": rec_4n["wall_salted_s"]}), flush=True)
        sys.exit(0 if ok else 1)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
