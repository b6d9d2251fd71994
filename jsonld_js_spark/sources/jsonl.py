"""JSONL (newline-delimited JSON) source/sink for document shards —
the interchange format training-data pipelines actually move corpora
in. Spark's native JSON datasource does the heavy lifting (splittable
text input, JVM-side parse inside whole-stage codegen, column pruning
of unreferenced fields); this module pins the two things the default
leaves loose:

- an EXPLICIT schema on read (schema inference is a full extra pass
  over 100 TB and can silently widen types between shards), and
- deterministic, lossless string round-tripping — JSON string escapes
  are normative, so write-then-read reproduces the exact bytes of
  every text field (asserted by the gated roundtrip query).

At scale both directions are embarrassingly parallel: the sink writes
one .jsonl part per partition (no shuffle), the source splits on
newlines. No per-row Python anywhere.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCUMENTS_DDL = ("doc_id long, text string, lang string, "
                 "source string, n_chars long")


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite"):
    """DataFrame → .jsonl part files (one JSON object per line)."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str,
               schema: str = DOCUMENTS_DDL) -> DataFrame:
    """.jsonl files → DataFrame with a pinned schema (never inferred)."""
    return spark.read.schema(schema).json(path)
