"""End-to-end pipeline tests: vectorized path ≡ kernel path ≡ DuckDB
oracle SQL, plus the per-turn text-equality invariant (input_hint)."""
from __future__ import annotations

import pytest

from jsonld_js_spark.pipeline import (
    entity_canonical_map, kernel_transcript_triples, transcript_triples,
)
from jsonld_js_spark.transcripts import transcripts_df, transcripts_sql
from jsonld_js_spark.vocab import TR

N_CONV = 120  # includes hot conversations (i % 97 == 0) and case variants


@pytest.fixture(scope="module")
def transcripts(spark):
    df = transcripts_df(spark, n_conv=N_CONV).cache()
    df.count()
    return df


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_vectorized_matches_kernel_path(spark, transcripts):
    """Differential: the fixed-shape column-expression specialization
    must emit exactly the triple set of the generic JSON-LD kernel."""
    vec = _as_set(transcript_triples(transcripts))
    ker = _as_set(kernel_transcript_triples(transcripts))
    missing = ker - vec
    extra = vec - ker
    assert not missing and not extra, (
        f"missing={list(missing)[:5]} extra={list(extra)[:5]} "
        f"(vec={len(vec)} kernel={len(ker)})")


def test_triples_match_duckdb_oracle(spark, transcripts):
    """The Spark triple table equals an independently-written ANSI-SQL
    derivation run in DuckDB (same comparison the driver performs)."""
    import duckdb
    import __spark_entry__ as entrymod
    sql = entrymod._oracle_sql(N_CONV)["kg_transcript_triples"]
    con = duckdb.connect()
    oracle = {tuple(r) for r in con.execute(sql).fetchall()}
    mine = _as_set(transcript_triples(transcripts))
    assert mine == oracle, (
        f"missing={list(oracle - mine)[:5]} extra={list(mine - oracle)[:5]}")


def test_per_turn_text_equality(spark, transcripts):
    """input_hint invariant: every (turn, text) survives the KG
    round-trip byte-identically under stable turn ordering."""
    from pyspark.sql import functions as F
    triples = transcript_triples(transcripts)
    texts = (triples.filter(F.col("pred") == TR + "text")
             .select(F.col("subj"), F.col("obj_value").alias("kg_text")))
    src = transcripts.select(
        F.concat(F.lit("http://example.org/conv/"), "conv_id",
                 F.lit("/turn/"), F.col("turn_idx").cast("string"))
        .alias("subj"),
        F.col("text"))
    joined = src.join(texts, "subj", "full_outer")
    bad = joined.filter(
        (F.col("text").isNull()) | (F.col("kg_text").isNull()) |
        (F.col("text") != F.col("kg_text"))).count()
    assert bad == 0
    assert joined.count() == transcripts.count()


def test_entity_canonicalization(spark, transcripts):
    rows = entity_canonical_map(transcripts).collect()
    by_surface = {r["surface"]: r for r in rows}
    # case-variant surfaces canonicalize to the same IRI with score 0.9
    lower = [r for r in rows if r["surface"].startswith("entity")]
    assert lower, "generator must produce case-variant mentions"
    for r in lower:
        canon = by_surface.get("Entity" + r["surface"][len("entity"):])
        assert r["canonical_iri"].endswith(
            "Entity" + r["surface"][len("entity"):])
        assert r["link_score"] == 0.9
        if canon is not None:
            assert canon["canonical_iri"] == r["canonical_iri"]
            assert canon["link_score"] == 1.0


def test_hot_conversation_and_entity_skew(spark, transcripts):
    """The generator's skew knobs exist (they back the salting story)."""
    from pyspark.sql import functions as F
    sizes = transcripts.groupBy("conv_id").count().collect()
    counts = sorted(r["count"] for r in sizes)
    assert counts[-1] == 500 and counts[len(counts) // 2] <= 15
    ents = entity_canonical_map(transcripts)
    top = ents.orderBy(F.desc("n_mentions")).first()
    med = ents.approxQuantile("n_mentions", [0.5], 0.01)[0]
    assert top["n_mentions"] > 10 * med


def test_generator_matches_duckdb(spark, transcripts):
    import duckdb
    con = duckdb.connect()
    got = {tuple(map(str, r)) for r in con.execute(
        transcripts_sql(N_CONV, "duckdb")).fetchall()}
    mine = {tuple(map(str, r)) for r in transcripts.collect()}
    assert mine == got


def test_kernel_path_hooks(spark, transcripts):
    """expansionMap-analog surface: Python callables ride the UDF
    closure — a doc transform adds a property, a quad filter drops
    text triples."""
    def add_flag(doc):
        doc["pipelineRun"] = "r1"
        return doc

    def no_text(quad):
        return not quad[1].endswith("#text")

    df = kernel_transcript_triples(transcripts, doc_transform=add_flag,
                                   quad_filter=no_text)
    preds = {r["pred"] for r in df.select("pred").distinct().collect()}
    assert TR + "pipelineRun" in preds
    assert TR + "text" not in preds


def test_kernel_path_expansion_map(spark, transcripts):
    """Per-event expansionMap hook reachable from the distributed
    kernel path (VERDICT round-1 item 5): an unmapped property is
    custom-mapped to an IRI inside executor-side expansion."""
    def add_weird(doc):
        doc["weird key"] = "hook me"
        return doc

    def emap(info):
        if info.get("unmappedProperty") == "weird key":
            return TR + "mappedKey"
        return None

    df = kernel_transcript_triples(transcripts, doc_transform=add_weird,
                                   expansion_map=emap)
    preds = {r["pred"] for r in df.select("pred").distinct().collect()}
    assert TR + "mappedKey" in preds
    # without the hook the key is dropped
    df2 = kernel_transcript_triples(transcripts, doc_transform=add_weird)
    preds2 = {r["pred"] for r in df2.select("pred").distinct().collect()}
    assert TR + "mappedKey" not in preds2


def test_kernel_path_assume_grouped(spark, transcripts):
    """Generator output is conversation-contiguous → the shuffle-free
    variant must produce the identical triple set."""
    want = _as_set(kernel_transcript_triples(transcripts))
    got = _as_set(kernel_transcript_triples(
        transcripts_df(spark, n_conv=N_CONV), assume_grouped=True))
    assert got == want


def test_kernel_path_assume_grouped_violated_dedup_recovers(spark,
                                                            transcripts):
    """If the contiguity precondition is violated (here: rows scattered
    by a round-robin repartition), assume_grouped emits per-fragment
    triples — dedup=True must still recover the exact triple set
    (documented recovery path in kernel_transcript_triples)."""
    want = _as_set(kernel_transcript_triples(transcripts))
    scattered = transcripts_df(spark, n_conv=N_CONV).repartition(8)
    got = _as_set(kernel_transcript_triples(
        scattered, assume_grouped=True, dedup=True))
    assert got == want


def test_kernel_path_conversation_spanning_batches(spark):
    """A conversation larger than an Arrow batch must be reassembled by
    the partition-local tail-carry (not split into partial docs)."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                         None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "500")
    try:
        from pyspark.sql import functions as F
        big = spark.range(3000).select(
            F.lit("conv-big").alias("conv_id"),
            F.col("id").cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.concat(F.lit("Turn about [[Entity"),
                     (F.col("id") % 7).cast("string"),
                     F.lit("]].")).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            (F.lit("2026-01-01 00:00:00").cast("timestamp")).alias("ts"),
        ).coalesce(1)
        triples = kernel_transcript_triples(big, num_partitions=1)
        # exactly one hasTurn edge per turn and ONE conversation node
        n_hasturn = triples.filter(
            F.col("pred") == TR + "hasTurn").count()
        n_conv_nodes = triples.filter(
            (F.col("pred").endswith("#type")) &
            (F.col("obj_value") == TR + "Conversation")).count()
        assert n_hasturn == 3000
        assert n_conv_nodes == 1
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_salted_aggregation_splits_hot_keys(spark, transcripts):
    """The two-phase entity count's first phase keys on
    (surface, partition-salt): the hottest entity must be split across
    multiple partial groups, so no reducer sees the full hot key."""
    from pyspark.sql import functions as F
    from jsonld_js_spark.vocab import MENTION_RE
    surfaces = transcripts.select(
        F.explode(F.regexp_extract_all("text", F.lit(MENTION_RE), 1))
         .alias("surface"))
    salted = surfaces.groupBy(
        "surface", (F.spark_partition_id() % 16).alias("_salt"),
    ).agg(F.count("*").alias("_c"))
    hot = (salted.groupBy("surface")
           .agg(F.countDistinct("_salt").alias("n_salts"),
                F.sum("_c").alias("total"))
           .orderBy(F.desc("total")).first())
    assert hot["n_salts"] >= 2, hot


def test_pipeline_matches_reference_implementation(spark):
    """North-rule gate, end-to-end: the Spark pipeline's triples equal
    the reference jsonld.js toRDF output on the identical documents
    (modulo bnode bijection). Skipped when node or the reference tree
    is unavailable (the committed PR_REPORT.json carries the result).
    """
    import shutil

    import pytest as _pytest
    if shutil.which("node") is None or not __import__("os").path.isdir(
            "/root/reference/lib"):
        _pytest.skip("reference oracle unavailable")
    import re

    from jsonld_js_spark.pipeline.kernel_path import build_conversation_doc
    from jsonld_js_spark.testing import compare_triple_sets, normalize_quads
    from jsonld_js_spark.vocab import ENT_NS, MENTION_RE
    from tools.pipeline_pr_vs_reference import reference_quads

    t = transcripts_df(spark, n_conv=8)
    rows = t.orderBy("conv_id", "turn_idx").collect()
    spark_quads = [tuple(r) for r in transcript_triples(t).collect()]
    pat = re.compile(MENTION_RE)
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append({
            "turn_idx": r.turn_idx, "role": r.role, "text": r.text,
            "tool": r.tool,
            "ts_lex": r.ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
            "mention_iris": [ENT_NS + "Entity" +
                             "".join(c for c in m if c.isdigit())
                             for m in pat.findall(r.text)]})
    ref = []
    for conv_id, turns in sorted(by_conv.items()):
        ref.extend(reference_quads(build_conversation_doc(conv_id, turns)))
    res = compare_triple_sets(normalize_quads(spark_quads),
                              normalize_quads(ref))
    assert res["precision"] == 1.0 and res["recall"] == 1.0, res


def test_jsonld_column_expansion_map(spark):
    """expansionMap threads through the schemaless JSON-LD column
    path: an unmapped property is custom-mapped inside executors."""
    from jsonld_js_spark.operators.jsonld_column import (
        jsonld_column_to_triples,
    )
    df = spark.createDataFrame(
        [(1, '{"known": 1, "weird key": "x"}')], "id long, doc string")

    def emap(info):
        if info.get("unmappedProperty") == "weird key":
            return "http://mapped/weird"
        return None

    out = jsonld_column_to_triples(
        df, "id", "doc", {"known": "http://e/known"},
        id_ns="http://e/x/", expansion_map=emap)
    preds = {r["pred"] for r in out.collect()}
    assert preds == {"http://e/known", "http://mapped/weird"}


def test_flagship_plan_is_shuffle_free(spark):
    """The flagship contract pytest-enforced (it was previously only a
    CLAUDE.md/PLANS.md rule): transcript_triples over a parquet source
    plans ZERO Exchange (one scan, one Generate) and ONE FileScan —
    the union-of-branches shape that multiplies source scans must
    never reappear."""
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        transcripts_df(spark, n_conv=20).write \
            .mode("overwrite").parquet(f"{d}/t.parquet")
        src = spark.read.parquet(f"{d}/t.parquet")
        plan = transcript_triples(src)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
        assert plan.count("FileScan") == 1
        assert "Generate" in plan  # the one explode
        assert "Union" not in plan


def test_grouped_kernel_plan_is_shuffle_free(spark):
    """The layout-aware kernel path (assume_grouped=True, the registry's
    kg_transcript_triples_grouped) must plan ZERO Exchange: one scan
    straight into the Arrow-batched kernel stage — the production plan
    over an Iceberg table bucketed/sorted by (conv_id, turn_idx)."""
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        transcripts_df(spark, n_conv=20).write \
            .mode("overwrite").parquet(f"{d}/t.parquet")
        src = spark.read.parquet(f"{d}/t.parquet")
        plan = kernel_transcript_triples(src, assume_grouped=True) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert plan.count("FileScan") == 1
