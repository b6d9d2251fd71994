"""spark-submit entry point for the KG-construction pipeline
(north_rule: "launches via spark-submit --py-files on multi-executor
clusters").

    tools/package_pyfiles.sh             # → dist/jsonld_js_spark.zip
    spark-submit --py-files dist/jsonld_js_spark.zip \
        jobs/run_pipeline.py --warehouse /path/wh --n-conv 1000 \
        [--n-buckets 16] [--kernel-path] [--entity-map]

On a real cluster the transcripts source is an Iceberg table scan
(spark.read.table); here the deterministic generator stands in. The
run is checkpointed per partition and resumable — rerunning the same
command continues from the last committed partition.
"""
from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--n-conv", type=int, default=1000)
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--kernel-path", action="store_true",
                    help="use the generic JSON-LD kernel path")
    ap.add_argument("--entity-map", action="store_true",
                    help="also materialize the entity canonical map")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("jsonld-kg-pipeline")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())

    from jsonld_js_spark.pipeline.checkpoint import (
        Ledger, read_committed, run_checkpointed_triples,
    )
    from jsonld_js_spark.transcripts import transcripts_df

    t = transcripts_df(spark, n_conv=args.n_conv)
    stats = run_checkpointed_triples(
        spark, t, args.warehouse, n_buckets=args.n_buckets,
        use_kernel_path=args.kernel_path)

    triples = read_committed(spark, args.warehouse)
    n = triples.count()

    if args.entity_map:
        from jsonld_js_spark.pipeline import entity_canonical_map
        em_dir = f"{args.warehouse}/entity_canonical_map"
        entity_canonical_map(t).write.mode("overwrite").parquet(em_dir)

    print(json.dumps({
        "triples": n,
        "partitions": sorted(Ledger(args.warehouse, "triples").committed()),
        **stats,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
