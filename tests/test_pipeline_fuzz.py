"""Adversarial-content differential tests for the Spark pipeline:
the vectorized column-expression path vs the kernel path must emit
identical triples for ANY text content — including the characters the
N-Quads escaper and the mention regex care about."""
from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, StringType, StructField, StructType, TimestampType,
)

from jsonld_js_spark.pipeline import transcript_triples
from jsonld_js_spark.pipeline.kernel_path import kernel_transcript_triples

ADVERSARIAL_TEXTS = [
    'quote " in text',
    "backslash \\ and double \\\\",
    "tab\tand\nnewline\rand\r\nboth",
    "unicode: café 中文 \U0001f600 ​",
    "[[Entity1]] then [[entity2]] and [[EntityX]] and [[entity]]",
    "[[nested [[Entity3]] brackets]]",
    "[[Entity4]][[Entity5]]no space",
    "almost [[Entity6] missing bracket",
    "empty [[]] brackets",
    "",
    " ",
    "   leading and trailing   ",
    "control \x01 char",
    'all specials: "\\\n\r\t[[Entity7]]',
    "very " + "long " * 200 + "[[Entity8]] text",
    "mixed [[Alpha9Beta10]] digits",
]


def _adversarial_transcripts(spark, seed=0):
    from datetime import datetime, timezone
    rng = random.Random(seed)
    rows = []
    texts = list(ADVERSARIAL_TEXTS)
    rng.shuffle(texts)
    for c in range(4):
        conv = f"fuzz-{c:03d}"
        for t in range(4):
            rows.append((
                conv, t, rng.choice(["user", "assistant"]),
                texts[(c * 4 + t) % len(texts)],
                rng.choice([None, "search", "calc"]),
                datetime(2026, 1, 1, c, t, tzinfo=timezone.utc)
                .replace(tzinfo=None),
            ))
    schema = StructType([
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ])
    return spark.createDataFrame(rows, schema)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vectorized_matches_kernel_on_adversarial_text(spark, seed):
    t = _adversarial_transcripts(spark, seed)
    vec = {tuple(r) for r in transcript_triples(t).collect()}
    ker = {tuple(r) for r in kernel_transcript_triples(t).collect()}
    assert vec == ker


def test_nquads_escaping_matches_kernel(spark):
    """The column-expression N-Quads escaper must agree with the
    kernel's serialize_nquads byte-for-byte on adversarial literals."""
    from jsonld_js_spark.kernel import serialize_nquads

    t = _adversarial_transcripts(spark, 0)
    triples = transcript_triples(t)
    # column-expression serialization (same exprs as q_kg_nquads)
    esc = F.col("obj_value")
    for pat, rep in ((r"\\", r"\\\\"), ('"', r'\\"'),
                     ("\n", r"\\n"), ("\r", r"\\r"), ("\t", r"\\t")):
        esc = F.regexp_replace(esc, pat, rep)
    xsd_string = "http://www.w3.org/2001/XMLSchema#string"
    obj = (F.when(F.col("obj_termtype") != "Literal",
                  F.when(F.col("obj_value").startswith("_:"),
                         F.col("obj_value"))
                  .otherwise(F.concat(F.lit("<"), F.col("obj_value"),
                                      F.lit(">"))))
           .when(F.col("obj_datatype").isNotNull() &
                 (F.col("obj_datatype") != xsd_string),
                 F.concat(F.lit('"'), esc, F.lit('"^^<'),
                          F.col("obj_datatype"), F.lit(">")))
           .otherwise(F.concat(F.lit('"'), esc, F.lit('"'))))
    line = F.concat(F.lit("<"), F.col("subj"), F.lit("> <"),
                    F.col("pred"), F.lit("> "), obj, F.lit(" ."))
    spark_lines = sorted(r["line"] for r in
                         triples.select(line.alias("line")).collect())
    quads = [tuple(r) for r in triples.collect()]
    kernel_lines = sorted(
        ln for ln in serialize_nquads(quads).split("\n") if ln)
    assert spark_lines == kernel_lines
