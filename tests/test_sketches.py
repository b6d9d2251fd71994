"""HyperLogLog register sketch: integer-arithmetic hand truths, the
algebraic properties the oracle gate covers only implicitly
(duplicate-insensitivity, shard mergeability), and the estimator
accuracy the equality gate structurally cannot judge."""
from __future__ import annotations

from pyspark.sql import functions as F

from jsonld_js_spark.operators.sketches import (
    HLL_M, hll_estimate, hll_merge, hll_registers)

SF = "/root/testdata/sf0.001"


def _registers_rows(df):
    return sorted((r["bucket"], r["max_rho"]) for r in df.collect())


def test_hll_rho_bucket_hand_truth(spark):
    """The bucket/rho arithmetic on crafted hash values, checked
    against plain-python bit math (independent of both engines).
    hash60('x') is deterministic md5, so plant items whose hashes we
    recompute here instead of crafting preimages."""
    import hashlib
    items = ["alpha", "beta", "gamma", "delta", ""]
    df = spark.createDataFrame([(i,) for i in items], "item string")
    got = {(r["bucket"], r["max_rho"])
           for r in hll_registers(df).collect()}
    expect = {}
    for it in items:
        h = int(hashlib.md5(it.encode()).hexdigest()[:15], 16)
        bucket, w = h >> 50, h & ((1 << 50) - 1)
        rho = 51 if w == 0 else 51 - w.bit_length()
        expect[bucket] = max(expect.get(bucket, 0), rho)
    assert got == set(expect.items())


def test_hll_duplicate_insensitive(spark):
    """max is idempotent: the register table over a corpus with every
    item tripled equals the table over the distinct items — the
    property that lets the plan skip distinct() entirely."""
    base = spark.createDataFrame(
        [(f"tok{i}",) for i in range(500)], "item string")
    tripled = base.unionAll(base).unionAll(base)
    assert _registers_rows(hll_registers(tripled)) == \
        _registers_rows(hll_registers(base))


def test_hll_merge_equals_union_sketch(spark):
    """Shard mergeability: sketch(A) merged with sketch(B) is exactly
    sketch(A ∪ B), so daily register tables compose without
    re-scanning history."""
    a = spark.createDataFrame([(f"a{i}",) for i in range(300)],
                              "item string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(300)],
                              "item string")
    merged = hll_merge(hll_registers(a), hll_registers(b))
    assert _registers_rows(merged) == \
        _registers_rows(hll_registers(a.unionAll(b)))


def test_hll_estimate_accuracy(spark):
    """Estimator vs exact distinct counts across regimes: the linear-
    counting range (n ~ m/2), the correction boundary, and the raw-
    estimator range (n ~ 30m). Tolerance 4 sigma of the published
    1.04/sqrt(m) standard error (m=1024 -> 13%) — loose enough to be
    deterministic, tight enough that an off-by-2x register bug
    fails."""
    for n in (500, 2_500, 30_000):
        df = spark.createDataFrame(
            [(f"item-{i}",) for i in range(n)], "item string")
        est = hll_estimate(hll_registers(df).collect())
        assert abs(est - n) / n < 0.13, (n, est)


def test_hll_postings_query_shape_and_estimate(spark):
    """The gated query at sf0.001: registers bounded by m, and the
    estimate lands within tolerance of the exact distinct posting
    count computed the expensive way."""
    from jsonld_js_spark.operators.sketches import q_sketch_hll_postings
    regs = q_sketch_hll_postings(spark, SF)
    rows = regs.collect()
    assert 0 < len(rows) <= HLL_M
    assert all(1 <= r["max_rho"] <= 51 for r in rows)
    d = spark.read.parquet(f"{SF}/documents.parquet")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    exact = (d.select(F.col("doc_id"),
                      F.explode(F.split(norm, " ")).alias("tok"))
             .select(F.concat_ws(":", "doc_id", "tok").alias("item"))
             .distinct().count())
    est = hll_estimate(rows)
    assert abs(est - exact) / exact < 0.13, (exact, est)
