"""Streaming-pipeline soak: file-stream → triples → parquet sink at
bench scale, reporting per-microbatch and end-to-end throughput plus
an exactly-once check against the batch plan.

The streaming surface's correctness is pytest-covered
(tests/test_streaming.py); this job adds the MEASURED throughput
evidence: the same stateless triple plan under readStream should
sustain batch-comparable rates because nothing in it is stateful —
the only streaming overhead is microbatch scheduling + sink commits.

Usage: python jobs/soak_streaming.py [sf_dir=/root/testdata/sf0.1]
                                     [n_shards=32] [files_per_trigger=4]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    fpt = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("soak-streaming").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from jsonld_js_spark.pipeline import transcript_triples
    from jsonld_js_spark.streaming import stream_transcript_triples
    from jsonld_js_spark.transcripts import transcripts_df

    work = tempfile.mkdtemp(prefix="spark-graft-stream-soak-")
    in_dir, out_dir, ckpt = (os.path.join(work, d)
                             for d in ("in", "out", "ckpt"))
    src = transcripts_df(spark, sf_dir=sf_dir)
    src.repartition(n_shards).write.parquet(in_dir)
    n_turns = src.count()
    expected = transcript_triples(
        spark.read.parquet(in_dir)).count()

    t0 = time.time()
    q = stream_transcript_triples(spark, in_dir, out_dir, ckpt)
    q.awaitTermination()
    wall = time.time() - t0
    got = spark.read.parquet(out_dir).count()

    prog = q.recentProgress
    batches = [{"rows": p["numInputRows"],
                "sec": round(p["durationMs"]["triggerExecution"] / 1000, 2)}
               for p in prog if p["numInputRows"]]
    print(json.dumps({
        "metric": "streaming_soak",
        "n_turns": n_turns,
        "triples_out": got,
        "exactly_once_matches_batch": got == expected,
        "microbatches": len(batches),
        "wall_sec": round(wall, 1),
        "triples_per_sec_end_to_end": int(got / wall),
        "per_batch": batches,
    }), flush=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
