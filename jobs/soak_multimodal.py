"""Multimodal fuzzy-fingerprint soak: byte-gram MinHash near-dup over
binary payload hex at 10-40x the bench corpus, with planted truth in
TWO corruption modes — appended metadata tag (J ~ 0.9) and mid-byte
corruption (a flipped byte knocks out the 4 grams crossing it,
J ~ 0.83 on a 48-byte blob) — plus candidate-growth linearity at 4x.

Corpus: deterministic md5-chain payload hex (96 chars = 48 bytes) per
doc; every 10th doc gets an appended-tag twin (+10^7) and every 20th
a mid-corrupted twin (+2*10^7, bytes 21-22 overwritten).

Usage: python jobs/soak_multimodal.py [n_base=50000] [factor=4]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

J_PPM = 600000


def synth_media(spark, n_base: int):
    d = spark.range(n_base).select(F.col("id").alias("doc_id"))
    sid = F.col("doc_id").cast("string")
    hx = F.concat(F.md5(sid), F.md5(F.concat(sid, F.lit("2"))),
                  F.md5(F.concat(sid, F.lit("3"))))
    base = d.select("doc_id", hx.alias("payload_hex"))
    tagged = (base.filter(F.col("doc_id") % 10 == 0)
              .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                      F.concat("payload_hex", F.lit("DEADBEEF"))
                      .alias("payload_hex")))
    corrupted = (base.filter(F.col("doc_id") % 20 == 0)
                 .select((F.col("doc_id") + 20_000_000).alias("doc_id"),
                         F.concat(F.substring("payload_hex", 1, 40),
                                  F.lit("0000"),
                                  F.substring("payload_hex", 45, 52))
                         .alias("payload_hex")))
    return base.unionAll(tagged).unionAll(corrupted)


def run_one(spark, n_base: int) -> dict:
    from jsonld_js_spark.operators.dedup import minhash_band_rows
    from jsonld_js_spark.operators.multimodal import (
        _hex_shingles, payload_neardup_pairs)
    media = synth_media(spark, n_base).cache()
    docs = media.select(
        "doc_id", _hex_shingles(F.col("payload_hex")).alias("shingles"))
    bands = minhash_band_rows(docs)
    n_cand = (bands.alias("a").join(
        bands.alias("b"),
        (F.col("a.band") == F.col("b.band")) &
        (F.col("a.bkey") == F.col("b.bkey")) &
        (F.col("a.doc_id") < F.col("b.doc_id")))
        .select("a.doc_id", "b.doc_id").distinct().count())
    t0 = time.time()
    pairs = payload_neardup_pairs(media, j_ppm=J_PPM).cache()
    n_pairs = pairs.count()
    wall = time.time() - t0
    base_side = F.col("doc_a") < 10_000_000
    tag_hits = pairs.filter(
        base_side &
        (F.col("doc_b") == F.col("doc_a") + 10_000_000)).count()
    cor_hits = pairs.filter(
        base_side &
        (F.col("doc_b") == F.col("doc_a") + 20_000_000)).count()
    # twins of the SAME base are near-dups of each other too
    # (tag vs corrupt: J ~ 0.71) — legitimate, counted separately
    cross_hits = pairs.filter(
        (F.col("doc_a") >= 10_000_000) &
        (F.col("doc_b") == F.col("doc_a") + 10_000_000)).count()
    n_tag = len(range(0, n_base, 10))
    n_cor = len(range(0, n_base, 20))
    rec = {
        "n_payloads": n_base + n_tag + n_cor,
        "candidates": n_cand,
        "verified_pairs": n_pairs,
        "tag_recall": round(tag_hits / n_tag, 4),
        "corrupt_recall": round(cor_hits / n_cor, 4),
        "twin_cross_pairs": cross_hits,
        "false_pairs": n_pairs - tag_hits - cor_hits - cross_hits,
        "candidates_per_kdoc": round(
            n_cand / (n_base + n_tag + n_cor) * 1000, 2),
        "wall_sec": round(wall, 1),
    }
    pairs.unpersist(); media.unpersist()
    print(json.dumps(rec), flush=True)
    return rec


def main():
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "20g")
        .appName("soak-multimodal").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    small = run_one(spark, n_base)
    big = run_one(spark, n_base * factor)
    print(json.dumps({
        "metric": "multimodal_soak",
        "candidate_growth_vs_size_growth": round(
            (big["candidates"] / max(1, small["candidates"])) / factor, 3),
        "tag_recall": (small["tag_recall"], big["tag_recall"]),
        "corrupt_recall": (small["corrupt_recall"], big["corrupt_recall"]),
        "false_pairs": small["false_pairs"] + big["false_pairs"],
    }), flush=True)


if __name__ == "__main__":
    main()
