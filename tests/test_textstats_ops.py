"""Invariant tests for the chunking + corpus-filter operators."""
from __future__ import annotations

from pyspark.sql import functions as F

from jsonld_js_spark.operators.textstats import (
    CHUNK_STRIDE, CHUNK_TOKENS, QF_MIN_SCORE_PPM, q_corpus_quality_filter,
    q_text_chunks, q_text_langid, q_text_quality, q_text_tokens,
)

SF = "/root/testdata/sf0.001"


def test_chunks_cover_every_token(spark):
    """Chunk windows at stride S of size C must cover all n tokens:
    last start + C >= n, starts dense at stride S, sizes clamp."""
    chunks = q_text_chunks(spark, SF)
    tokens = q_text_tokens(spark, SF).select("doc_id", "n_tokens")
    agg = (chunks.groupBy("doc_id")
           .agg(F.max("chunk_idx").alias("last_idx"),
                F.count("*").alias("n_chunks"),
                F.sum("n_chunk_tokens").alias("sum_tokens"))
           .join(tokens, "doc_id"))
    bad = agg.filter(
        (F.col("n_chunks") != F.col("last_idx") + 1) |
        (F.col("last_idx") * CHUNK_STRIDE + CHUNK_TOKENS < F.col("n_tokens")) |
        (F.col("last_idx") * CHUNK_STRIDE >= F.col("n_tokens")))
    assert bad.count() == 0
    # overlap accounting: sum of chunk sizes = n + overlap*(n_chunks-1)
    # except the clamped final window
    one = agg.first()
    assert one["sum_tokens"] >= one["n_tokens"]


def test_corpus_filter_conjunction(spark):
    kept = {r["doc_id"] for r in
            q_corpus_quality_filter(spark, SF).collect()}
    q = {r["doc_id"]: r["quality_score_ppm"]
         for r in q_text_quality(spark, SF).collect()}
    lang = {r["doc_id"]: r["lang_pred"]
            for r in q_text_langid(spark, SF).collect()}
    expected = {d for d in q
                if q[d] >= QF_MIN_SCORE_PPM and lang[d] == "en"}
    # no exact dups in the raw documents table at this sf -> pure AND
    assert kept <= expected
    assert kept == expected or len(expected - kept) < len(expected)
    assert kept  # non-trivial output
