"""Deterministic corpus sampling / splitting operators.

Reproducibility is the 100 TB requirement: split membership must be a
pure function of document identity — re-runs, late-arriving shards,
retried tasks, and incremental ingests all land every document in the
same split. `rand()` (or anything seeded per-partition) breaks all of
that, so both operators bucket on the portable 60-bit md5 hash shared
with the DuckDB oracle (CLAUDE.md portability rules).

Scale shape: pure JVM column expressions over one narrow scan — no
shuffle at all except the driver gate's determinism orderBy; the
stratified filter is pushed to the scan. Works identically on one
executor or a thousand because nothing depends on partitioning.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from .textstats import _docs, hash60, hash60_sql

QUERIES: dict = {}
ORACLES: dict = {}

# hash buckets are per-mille; salts decorrelate the two operators
SPLIT_SALT = "split:"
SAMPLE_SALT = "sample:"
TRAIN_LT, VAL_LT = 900, 950  # train < 900 <= val < 950 <= test

# stratified per-mille keep rates: downsample the dominant language,
# keep the tail (the standard rebalancing move for training corpora)
SAMPLE_RATES = {"en": 250, "de": 800, "fr": 800, "es": 800, "zh": 800}
SAMPLE_DEFAULT = 1000  # unknown languages kept whole


def _bucket(salt: str):
    return F.pmod(
        hash60(F.concat(F.lit(salt), F.col("doc_id").cast("string"))),
        F.lit(1000))


def _bucket_sql(salt: str) -> str:
    return (hash60_sql(f"'{salt}' || cast(doc_id as varchar)")
            + " % 1000")


def q_corpus_split(spark, sf_dir):
    """Deterministic train/val/test assignment (90/5/5) keyed on the
    salted portable hash of doc_id."""
    b = _bucket(SPLIT_SALT)
    return (_docs(spark, sf_dir)
            .select("doc_id", b.alias("bucket"),
                    F.when(b < TRAIN_LT, "train")
                     .when(b < VAL_LT, "val")
                     .otherwise("test").alias("split"))
            .orderBy("doc_id"))


ORACLE_CORPUS_SPLIT = f"""
SELECT doc_id,
       {_bucket_sql(SPLIT_SALT)} AS bucket,
       CASE WHEN {_bucket_sql(SPLIT_SALT)} < {TRAIN_LT} THEN 'train'
            WHEN {_bucket_sql(SPLIT_SALT)} < {VAL_LT} THEN 'val'
            ELSE 'test' END AS split
FROM documents ORDER BY doc_id
"""


def _rate_expr():
    expr = F.lit(SAMPLE_DEFAULT)
    for lang, rate in SAMPLE_RATES.items():
        expr = F.when(F.col("lang") == lang, F.lit(rate)).otherwise(expr)
    return expr


def q_corpus_sample_stratified(spark, sf_dir):
    """Deterministic stratified downsample: per-language keep rates
    (per-mille) applied by salted-hash bucket, so the sample is stable
    under re-runs and incremental ingest."""
    b = _bucket(SAMPLE_SALT)
    return (_docs(spark, sf_dir)
            .select("doc_id", "lang", b.alias("bucket"),
                    _rate_expr().alias("keep_rate"))
            .filter(F.col("bucket") < F.col("keep_rate"))
            .orderBy("doc_id"))


_RATE_SQL = ("CASE lang "
             + " ".join(f"WHEN '{lang}' THEN {rate}"
                        for lang, rate in SAMPLE_RATES.items())
             + f" ELSE {SAMPLE_DEFAULT} END")

ORACLE_CORPUS_SAMPLE = f"""
SELECT doc_id, lang,
       {_bucket_sql(SAMPLE_SALT)} AS bucket,
       {_RATE_SQL} AS keep_rate
FROM documents
WHERE {_bucket_sql(SAMPLE_SALT)} < {_RATE_SQL}
ORDER BY doc_id
"""

QUERIES["corpus_split"] = q_corpus_split
QUERIES["corpus_sample_stratified"] = q_corpus_sample_stratified
ORACLES["corpus_split"] = ORACLE_CORPUS_SPLIT
ORACLES["corpus_sample_stratified"] = ORACLE_CORPUS_SAMPLE
