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


def test_countmin_hand_truth(spark):
    """The counter table on a tiny stream equals plain-python md5 bit
    math (independent of both engines), duplicates included."""
    import hashlib
    from jsonld_js_spark.operators.sketches import (
        CM_D, CM_W, countmin_table)
    stream = ["a", "b", "a", "c", "a", "b"]
    df = spark.createDataFrame([(s,) for s in stream], "item string")
    got = sorted((r["r"], r["cell"], r["cnt"])
                 for r in countmin_table(df).collect())
    expect = {}
    for s in stream:
        for i in range(CM_D):
            cell = int(hashlib.md5(f"{i}:{s}".encode())
                       .hexdigest()[:15], 16) % CM_W
            expect[(i, cell)] = expect.get((i, cell), 0) + 1
    assert got == sorted((r, c, n) for (r, c), n in expect.items())


def test_countmin_one_sided_and_merge(spark):
    """Planted frequencies: the estimate is NEVER below the true
    count (the CM guarantee), overshoot stays within (e/w)*N, shard
    tables merge by cellwise sum, and an absent item estimates ~0."""
    from jsonld_js_spark.operators.sketches import (
        CM_W, countmin_estimate, countmin_merge, countmin_table)
    truth = {f"hh{i}": 200 - 15 * i for i in range(10)}
    truth.update({f"tail{i}": 1 for i in range(2000)})
    stream = [s for s, n in truth.items() for _ in range(n)]
    n_total = len(stream)
    df = spark.createDataFrame([(s,) for s in stream], "item string")
    half = len(stream) // 2
    a = spark.createDataFrame([(s,) for s in stream[:half]],
                              "item string")
    b = spark.createDataFrame([(s,) for s in stream[half:]],
                              "item string")
    rows = countmin_table(df).collect()
    merged = sorted((r["r"], r["cell"], r["cnt"]) for r in
                    countmin_merge(countmin_table(a),
                                   countmin_table(b)).collect())
    assert merged == sorted((r["r"], r["cell"], r["cnt"]) for r in rows)
    bound = int(2.72 * n_total / CM_W) + 1
    for item, n in list(truth.items())[:10] + [("tail0", 1)]:
        est = countmin_estimate(rows, item)
        assert est >= n, (item, n, est)
        assert est <= n + bound, (item, n, est, bound)
    assert countmin_estimate(rows, "never-seen") <= bound


def test_countmin_gated_query_estimates(spark):
    """The gated token sketch at sf0.001: every token's estimate is
    >= its exact count and the heaviest token's estimate is exact or
    within the epsilon-N overshoot."""
    from jsonld_js_spark.operators.sketches import (
        CM_W, countmin_estimate, q_sketch_countmin_tokens)
    rows = q_sketch_countmin_tokens(spark, SF).collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    exact = {r["item"]: r["n"] for r in
             d.select(F.explode(F.split(norm, " ")).alias("item"))
             .groupBy("item").agg(F.count("*").alias("n")).collect()}
    n_total = sum(exact.values())
    bound = int(2.72 * n_total / CM_W) + 1
    for item, n in exact.items():
        est = countmin_estimate(rows, item)
        assert n <= est <= n + bound, (item, n, est)


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

def test_qhist_bucket_hand_truth(spark):
    """The log-linear bucket arithmetic vs plain-python bit math on
    crafted values: exact below 16, octave boundaries, within-octave
    sub-buckets, and a large value."""
    from jsonld_js_spark.operators.sketches import (
        QH_LIN, qhist_lower, qhist_table)
    vals = [0, 1, 15, 16, 17, 31, 32, 33, 34, 63, 64, 100, 1023, 1024,
            123_456_789]
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    got = {r["bucket"]: r["cnt"] for r in qhist_table(df).collect()}

    def py_bucket(n):
        if n < 16:
            return n
        m = n.bit_length()
        return (m - 5) * 16 + (n >> (m - 5))

    expect = {}
    for v in vals:
        expect[py_bucket(v)] = expect.get(py_bucket(v), 0) + 1
    assert got == expect
    # decode inverts to the bucket's range: lb(b) <= v < lb(b+1)
    for v in vals:
        b = py_bucket(v)
        assert qhist_lower(b) <= v
        assert v < qhist_lower(b + 1)
    # monotone + contiguous decode across the first octaves
    lows = [qhist_lower(b) for b in range(4 * QH_LIN)]
    assert lows == sorted(lows)


def test_qhist_merge_and_rank_preservation(spark):
    """Shard histograms merge by cellwise sum into exactly the
    whole-corpus histogram, and the quantile walk's answer carries the
    provable one-sided bound vs the true nearest-rank element:
    est <= v and v - est <= max(1, v div 16)."""
    import random
    from jsonld_js_spark.operators.sketches import (
        qhist_merge, qhist_quantile, qhist_table)
    rng = random.Random(4242)
    vals = ([rng.randrange(0, 40) for _ in range(400)] +
            [rng.randrange(40, 5000) for _ in range(400)] +
            [rng.randrange(5000, 10**7) for _ in range(200)])
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    half = len(vals) // 2
    a = spark.createDataFrame([(v,) for v in vals[:half]], "n long")
    b = spark.createDataFrame([(v,) for v in vals[half:]], "n long")
    whole = sorted((r["bucket"], r["cnt"])
                   for r in qhist_table(df).collect())
    merged = sorted((r["bucket"], r["cnt"]) for r in
                    qhist_merge(qhist_table(a), qhist_table(b))
                    .collect())
    assert merged == whole
    rows = qhist_table(df).collect()
    s = sorted(vals)
    for pct in (1, 25, 50, 75, 90, 99, 100):
        rank = (len(s) * pct + 99) // 100
        v = s[rank - 1]
        est = qhist_quantile(rows, pct)
        assert est <= v, (pct, v, est)
        assert v - est <= max(1, v // 16), (pct, v, est)


def test_qhist_gated_query_vs_exact_percentiles(spark):
    """The gated doc-length sketch at sf0.001 against exact sorted
    percentiles of the same lengths: every estimate obeys the
    one-sided 1/16 bound."""
    from jsonld_js_spark.operators.sketches import (
        q_sketch_quantile_doclen, qhist_quantile)
    rows = q_sketch_quantile_doclen(spark, SF).collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    lens = sorted(r["n"] for r in
                  d.select(F.size(F.split(norm, " "))
                           .cast("long").alias("n")).collect())
    for pct in (10, 50, 90, 99):
        rank = (len(lens) * pct + 99) // 100
        v = lens[rank - 1]
        est = qhist_quantile(rows, pct)
        assert est <= v and v - est <= max(1, v // 16), (pct, v, est)

def test_bloom_hand_truth_and_no_false_negative(spark):
    """Counter table equals plain-python md5 bit math; EVERY inserted
    item probes True (the no-false-negative guarantee)."""
    import hashlib
    from jsonld_js_spark.operators.sketches import (
        BF_K, BF_M, bloom_contains, bloom_table)
    items = [f"doc fingerprint {i}" for i in range(50)] + ["dup", "dup"]
    df = spark.createDataFrame([(s,) for s in items], "item string")
    rows = bloom_table(df).collect()
    expect = {}
    for s in items:
        for i in range(BF_K):
            cell = int(hashlib.md5(f"bf{i}:{s}".encode())
                       .hexdigest()[:15], 16) % BF_M
            expect[cell] = expect.get(cell, 0) + 1
    assert sorted((r["cell"], r["cnt"]) for r in rows) == \
        sorted(expect.items())
    for s in items:
        assert bloom_contains(rows, s), s


def test_bloom_merge_and_fp_rate(spark):
    """Shard tables merge by cellwise sum into exactly the whole-set
    table; the false-positive rate over 2000 planted NON-members stays
    within 3x the analytic (1-e^(-kn/m))^k bound (n=5000 -> ~0.25%)."""
    import math
    from jsonld_js_spark.operators.sketches import (
        BF_K, BF_M, bloom_contains, bloom_merge, bloom_table)
    members = [f"m{i}" for i in range(5000)]
    df = spark.createDataFrame([(s,) for s in members], "item string")
    a = spark.createDataFrame([(s,) for s in members[:2500]],
                              "item string")
    b = spark.createDataFrame([(s,) for s in members[2500:]],
                              "item string")
    whole = sorted((r["cell"], r["cnt"])
                   for r in bloom_table(df).collect())
    merged = sorted((r["cell"], r["cnt"]) for r in
                    bloom_merge(bloom_table(a), bloom_table(b))
                    .collect())
    assert merged == whole
    rows = bloom_table(df).collect()
    fp = sum(bloom_contains(rows, f"absent{i}") for i in range(2000))
    p = (1 - math.exp(-BF_K * 5000 / BF_M)) ** BF_K
    assert fp / 2000 <= 3 * p + 0.002, (fp, p)


def test_bloom_gated_query_probes(spark):
    """The gated fingerprint table at sf0.001: every real document's
    normalized text probes True; garbage strings probe False (2000
    trials, FP-bounded)."""
    from jsonld_js_spark.operators.sketches import (
        q_sketch_bloom_fingerprints, bloom_contains)
    rows = q_sketch_bloom_fingerprints(spark, SF).collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fps = [r["item"] for r in d.select(norm.alias("item"))
           .limit(200).collect()]
    for s in fps:
        assert bloom_contains(rows, s)
    fp = sum(bloom_contains(rows, f"never seen doc {i}")
             for i in range(500))
    assert fp <= 5

def test_sketch_plan_contracts(spark):
    """Scan-level contracts for all four gated sketches: ONE FileScan
    (no self-union re-reads), pruned ReadSchema (a sketch never needs
    the full document width), map-side partial aggregation, and at
    most two exchanges (the tiny-group agg + the deterministic output
    sort) — the shape that makes a sketch scan-bound at 100 TB."""
    from jsonld_js_spark.operators.sketches import (
        q_sketch_bloom_fingerprints, q_sketch_countmin_tokens,
        q_sketch_hll_postings, q_sketch_quantile_doclen)
    for q, needs_doc_id in [(q_sketch_hll_postings, True),
                            (q_sketch_countmin_tokens, False),
                            (q_sketch_quantile_doclen, False),
                            (q_sketch_bloom_fingerprints, False)]:
        plan = q(spark, SF)._jdf.queryExecution().executedPlan() \
            .toString()
        assert plan.count("FileScan") == 1, q.__name__
        assert "partial" in plan.lower(), q.__name__
        assert plan.count("Exchange") <= 2, q.__name__
        # pruned scan: never reads source/lang/n_chars
        import re
        rs = re.search(r"ReadSchema: (\S+)", plan).group(1)
        assert "source" not in rs and "n_chars" not in rs, (q.__name__, rs)
        assert ("doc_id" in rs) == needs_doc_id, (q.__name__, rs)

def test_hll_by_source_estimates_and_merge(spark):
    """Grouped registers at sf0.001: each source's estimate lands
    within 4 sigma of its exact distinct-token count; two shard
    grouped tables merge by (group, bucket) max into exactly the
    whole-corpus grouped table."""
    from jsonld_js_spark.operators.sketches import (
        hll_estimate, hll_registers_by, q_sketch_hll_by_source)
    rows = q_sketch_hll_by_source(spark, SF).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    d = spark.read.parquet(f"{SF}/documents.parquet")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    items = d.select("source",
                     F.explode(F.split(norm, " ")).alias("item"))
    exact = {r["source"]: r["n"] for r in
             items.groupBy("source")
             .agg(F.countDistinct("item").alias("n")).collect()}
    assert set(by_src) == set(exact)
    for src, n in exact.items():
        est = hll_estimate(by_src[src])
        assert abs(est - n) / n < 0.13, (src, n, est)
    # grouped shard merge: (group, bucket) max
    a = hll_registers_by(items.filter(F.col("item") < "m"), "source")
    b = hll_registers_by(items.filter(~(F.col("item") < "m")), "source")
    merged = (a.unionAll(b).groupBy("source", "bucket")
              .agg(F.max("max_rho").alias("max_rho")))
    as_set = lambda df: {(r["source"], r["bucket"], r["max_rho"])  # noqa: E731
                         for r in df.collect()}
    assert as_set(merged) == {(r["source"], r["bucket"], r["max_rho"])
                              for r in rows}


# ---------------------------------------------------------------------------
# OPH MinHash (one-permutation hashing)

def _oph_py(items, k):
    """Independent pure-python reference: bucket -> min 60-bit hash."""
    import hashlib
    regs = {}
    for it in set(items):
        h = int(hashlib.md5(it.encode()).hexdigest()[:15], 16)
        b = h % k
        if b not in regs or h < regs[b]:
            regs[b] = h
    return regs


def test_oph_hand_truth(spark):
    """Register table matches plain-python bit math on a small set."""
    from jsonld_js_spark.operators.sketches import OPH_K, oph_table
    items = [f"tok{i}" for i in range(200)] + ["tok0", "tok1"]  # dups
    df = spark.createDataFrame([(i,) for i in items], "item string")
    got = {(r["bucket"], r["min_h"]) for r in oph_table(df).collect()}
    assert got == set(_oph_py(items, OPH_K).items())


def test_oph_merge_equals_union_sketch(spark):
    """Shard tables merged by elementwise min == sketch of the union
    (bit-exact), including overlapping shards (min is idempotent)."""
    from jsonld_js_spark.operators.sketches import oph_merge, oph_table
    a_items = [f"w{i}" for i in range(500)]
    b_items = [f"w{i}" for i in range(300, 900)]  # overlaps a
    mk = lambda xs: spark.createDataFrame([(x,) for x in xs],  # noqa: E731
                                          "item string")
    merged = {(r["bucket"], r["min_h"]) for r in
              oph_merge(oph_table(mk(a_items)),
                        oph_table(mk(b_items))).collect()}
    whole = {(r["bucket"], r["min_h"]) for r in
             oph_table(mk(a_items + b_items)).collect()}
    assert merged == whole


def test_oph_jaccard_accuracy(spark):
    """Planted overlap: J(A, B) estimated within the k = 256 noise
    band, judged against the exact Jaccard the equality gate cannot
    grade."""
    from jsonld_js_spark.operators.sketches import oph_table, oph_jaccard
    a_items = [f"t{i}" for i in range(3000)]
    b_items = [f"t{i}" for i in range(1500, 4500)]  # J = 1500/4500
    mk = lambda xs: spark.createDataFrame([(x,) for x in xs],  # noqa: E731
                                          "item string")
    est = oph_jaccard(oph_table(mk(a_items)).collect(),
                      oph_table(mk(b_items)).collect())
    assert abs(est - 1 / 3) < 0.09, est
    # identical sets -> exactly 1; disjoint small sets -> near 0
    same = oph_table(mk(a_items)).collect()
    assert oph_jaccard(same, same) == 1.0
    dis = oph_jaccard(oph_table(mk([f"x{i}" for i in range(400)])).collect(),
                      oph_table(mk([f"y{i}" for i in range(400)])).collect())
    assert dis < 0.05, dis


def test_oph_distinct_estimates(spark):
    """Cardinality read-off: linear-counting regime (n < k) and the
    mean-min regime (n >> k), both within tolerance of truth."""
    from jsonld_js_spark.operators.sketches import (
        oph_estimate_distinct, oph_table)
    mk = lambda xs: spark.createDataFrame([(x,) for x in xs],  # noqa: E731
                                          "item string")
    small = oph_estimate_distinct(oph_table(mk([f"s{i}" for i in range(60)]))
                                  .collect())
    assert abs(small - 60) / 60 < 0.15, small
    big_n = 20000
    big = oph_estimate_distinct(oph_table(mk([f"b{i}" for i in range(big_n)]))
                                .collect())
    assert abs(big - big_n) / big_n < 0.20, big
    assert oph_estimate_distinct([]) == 0


def test_oph_gated_query_shape(spark):
    """Gated per-source query: <= k rows per source, registers agree
    with a per-source pure-python recompute."""
    from jsonld_js_spark.operators.sketches import (
        OPH_K, q_sketch_oph_sources)
    rows = q_sketch_oph_sources(spark, SF).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], {})[r["bucket"]] = r["min_h"]
    assert all(len(v) <= OPH_K for v in by_src.values())
    d = spark.read.parquet(f"{SF}/documents.parquet")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    items = d.select("source", F.explode(F.split(norm, " ")).alias("item"))
    for src in by_src:
        toks = [r["item"] for r in
                items.filter(F.col("source") == src).collect()]
        assert by_src[src] == _oph_py(toks, OPH_K), src
