"""Perceptual-hash near-dup soak: the gated dHash pipeline at 20-80x
the gate corpus, with planted truth and cross-engine bit-exactness at
scale.

Checks per size N (and at 4N for growth):
- hash exactness: every Spark dHash (real PPM decode + numpy kernel)
  equals the DuckDB closed-form derivation — the sf0.01 gate check,
  re-run at soak scale;
- planted recall: every within-anchor-group pair (one perturbed pixel
  apart) that satisfies the contract (band match AND d <= T) is
  emitted, none missed, no pair outside the contract appears — exact
  accounting via a DuckDB recompute of the contract over the hash
  table itself;
- distances exact: emitted hamming equals an independent popcount;
- candidate growth: contract pairs grow linearly with corpus size
  (planted groups are constant-size; band collisions are rare).

Usage: python jobs/soak_phash.py [n_docs=100000] [factor=4]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession, functions as F


def synth_docs(spark, n_docs: int) -> str:
    """documents.parquet-shaped corpus; phash only reads doc_id."""
    out = tempfile.mkdtemp(prefix=f"phash_soak_{n_docs}_")
    (spark.range(n_docs)
     .selectExpr("id AS doc_id", "concat('doc ', id) AS text",
                 "'en' AS lang", "'soak' AS source",
                 "cast(10 as bigint) AS n_chars")
     .coalesce(8)
     .write.mode("overwrite").parquet(f"{out}/documents.parquet"))
    return out


def run_one(spark, n_docs: int) -> dict:
    from jsonld_js_spark.operators.multimodal import (
        ORACLE_MULTIMODAL_PHASH, PHASH_GROUP, PHASH_HAM_T, _ham_sql,
        _PHASH_BAND_MATCH, q_multimodal_phash, q_multimodal_phash_neardup,
    )
    sf_dir = synth_docs(spark, n_docs)

    t0 = time.time()
    spark_hashes = q_multimodal_phash(spark, sf_dir).toPandas()
    wall_hash = time.time() - t0

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet/*.parquet'")
    duck_hashes = con.execute(ORACLE_MULTIMODAL_PHASH).df()
    assert len(spark_hashes) == len(duck_hashes) == (n_docs + 1) // 2
    mism = int((spark_hashes["phash_hex"].values
                != duck_hashes["phash_hex"].values).sum())

    t0 = time.time()
    pairs = q_multimodal_phash_neardup(spark, sf_dir).toPandas()
    wall_pairs = time.time() - t0

    # exact contract recompute over the hash table (band-bucket join,
    # same shape as the oracle but on the already-agreed hash frame)
    con.register("ph", spark_hashes)
    ham = _ham_sql("a.phash_hex", "b.phash_hex", "duckdb")
    truth = con.execute(f"""
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               cast({ham} as int) AS hamming
        FROM ph a JOIN ph b
          ON a.doc_id < b.doc_id AND ({_PHASH_BAND_MATCH})
        WHERE {ham} <= {PHASH_HAM_T}
        ORDER BY doc_a, doc_b""").df()
    exact = (len(truth) == len(pairs)
             and (truth["doc_a"].values == pairs["doc_a"].values).all()
             and (truth["doc_b"].values == pairs["doc_b"].values).all()
             and (truth["hamming"].values == pairs["hamming"].values).all())

    # planted recall: within-group pairs that the contract admits
    within = int(((pairs["doc_a"] // PHASH_GROUP)
                  == (pairs["doc_b"] // PHASH_GROUP)).sum())
    n_groups_full = (n_docs // PHASH_GROUP)
    per_group = PHASH_GROUP // 2
    expected_within_max = (n_groups_full * per_group * (per_group - 1) // 2)
    rec = {
        "n_images": (n_docs + 1) // 2,
        "hash_mismatches_vs_duckdb": mism,
        "pairs": len(pairs),
        "contract_exact": bool(exact),
        "within_group_pairs": within,
        "expected_within_upper": expected_within_max,
        "within_recall_lb": round(within / max(1, expected_within_max), 4),
        "cross_group_pairs": int(len(pairs) - within),
        "wall_hash_sec": round(wall_hash, 1),
        "wall_pairs_sec": round(wall_pairs, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "20g")
        .appName("soak-phash").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    small = run_one(spark, n_docs)
    big = run_one(spark, n_docs * factor)
    print(json.dumps({
        "metric": "phash_soak",
        "pair_growth_vs_size_growth": round(
            (big["pairs"] / max(1, small["pairs"])) / factor, 3),
        "hash_mismatches": small["hash_mismatches_vs_duckdb"]
        + big["hash_mismatches_vs_duckdb"],
        "contract_exact": small["contract_exact"] and big["contract_exact"],
        "within_recall_lb": (small["within_recall_lb"],
                             big["within_recall_lb"]),
    }), flush=True)


if __name__ == "__main__":
    main()
