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


def test_pii_scrub_semantics(spark):
    """Redaction actually fires: injected emails/phones/ids are
    counted, and a directly-scrubbed sample contains the replacement
    tokens and none of the injected PII."""
    from pyspark.sql import functions as F

    from jsonld_js_spark.operators.textstats import (
        PII_EMAIL_RE, PII_ID_RE, PII_PHONE_RE, _pii_augmented,
        q_text_pii_scrub,
    )
    rows = q_text_pii_scrub(spark, SF).collect()
    by_id = {r["doc_id"]: r for r in rows}
    for doc_id, r in by_id.items():
        assert r["n_emails"] == (1 if doc_id % 3 == 0 else 0), doc_id
        assert r["n_phones"] == (1 if doc_id % 5 == 0 else 0), doc_id
        assert r["n_ids"] == (1 if doc_id % 7 == 0 else 0), doc_id
    # direct string check on one doc containing all three classes
    target = next(d for d in by_id if d % 105 == 0)
    df = spark.createDataFrame([(target, "hello world")],
                               "doc_id long, text string")
    aug = df.select(_pii_augmented(F.col("doc_id"),
                                   F.col("text")).alias("a"))
    scrubbed = aug.select(
        F.regexp_replace(F.regexp_replace(F.regexp_replace(
            F.col("a"), PII_EMAIL_RE, "[EMAIL]"),
            PII_PHONE_RE, "[PHONE]"), PII_ID_RE, "[ID]").alias("s")
    ).collect()[0]["s"]
    assert "[EMAIL]" in scrubbed and "[PHONE]" in scrubbed \
        and "[ID]" in scrubbed
    assert "@mail.example.com" not in scrubbed
    assert "+1-555-" not in scrubbed


def test_tfidf_topk_invariants(spark):
    """Per doc: <= K rows, ranks dense from 1, scores non-increasing,
    and score = tf * 1e6 DIV df with df = number of docs containing
    the token."""
    from jsonld_js_spark.operators.textstats import (
        TFIDF_TOP_K, q_text_tfidf_topk,
    )
    out = q_text_tfidf_topk(spark, SF)
    per_doc = out.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.min("rank").alias("rmin"),
        F.max("rank").alias("rmax"))
    bad = per_doc.filter((F.col("n") > TFIDF_TOP_K) |
                         (F.col("rmin") != 1) |
                         (F.col("rmax") != F.col("n")))
    assert bad.count() == 0
    rows = out.filter(F.col("doc_id") == out.first()["doc_id"]).collect()
    scores = [r["score_ppm"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["score_ppm"] == r["tf"] * 1000000 // r["df"]


def test_corpus_split_deterministic_partition(spark):
    """Splits are a pure function of doc_id: re-running yields the
    same assignment, every doc lands in exactly one split, and the
    90/5/5 buckets hold to within sampling noise."""
    from jsonld_js_spark.operators.sampling import q_corpus_split
    a = {r["doc_id"]: r["split"] for r in q_corpus_split(spark, SF).collect()}
    b = {r["doc_id"]: r["split"] for r in q_corpus_split(spark, SF).collect()}
    assert a == b
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    assert 0.80 < frac_train < 0.97
    assert set(a.values()) <= {"train", "val", "test"}


def test_corpus_sample_rates_and_stability(spark):
    """Stratified sample keeps <= the per-language rate (hash bucket
    is uniform) and is a subset-stable pure function of doc_id."""
    from jsonld_js_spark.operators.sampling import (
        SAMPLE_RATES, q_corpus_sample_stratified)
    sampled = q_corpus_sample_stratified(spark, SF)
    per_lang = {r["lang"]: r["n"] for r in
                sampled.groupBy("lang").agg(F.count("*").alias("n"))
                .collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # en is downsampled hard; the tail languages keep most docs
    assert per_lang.get("en", 0) < totals["en"]
    for lang, kept in per_lang.items():
        rate = SAMPLE_RATES.get(lang, 1000) / 1000
        assert kept <= totals[lang]
        # loose two-sided bound: binomial, small n at sf0.001
        assert kept >= rate * totals[lang] * 0.4
    # pure function: same rows on re-run
    assert (sampled.collect() ==
            q_corpus_sample_stratified(spark, SF).collect())


def test_corpus_ngram_topk_shape(spark):
    """Top-k bigrams: k rows, df descending, each ngram is two
    space-joined tokens, and df counts DOCUMENTS (<= corpus size)."""
    from jsonld_js_spark.operators.textstats import (
        NGRAM_TOP_K, q_corpus_ngram_topk)
    rows = q_corpus_ngram_topk(spark, SF).collect()
    assert len(rows) == NGRAM_TOP_K
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert all(1 <= r["df"] <= n_docs for r in rows)
    assert all(len(r["ngram"].split(" ")) == 2 for r in rows)


def test_repetition_hand_computed(spark):
    """Planted repetition with hand-computed exact ppm:
    - doc 1: 'a b c d e f g h' — all unique, nothing repeats.
    - doc 2: 'x y ' * 12 (24 tokens): dup_token (24-2)/24; top
      bigram 'x y' occurs 12x -> 12*2/24 = 1.0 clamped; the repeated
      5-grams cover ALL positions -> 1.0; repetitive.
    - doc 3: the 5-gram 's0..s4' at positions 0 and 15 of a
      20-token doc (10 unique fillers between) -> coverage exactly
      10/20.
    """
    from jsonld_js_spark.operators.textstats import q_text_repetition

    span = "s0 s1 s2 s3 s4"
    docs = spark.createDataFrame([
        (1, "a b c d e f g h"),
        (2, ("x y " * 12).strip()),
        (3, span + " f0 f1 f2 f3 f4 f5 f6 f7 f8 f9 " + span),
    ], "doc_id long, text string")
    import jsonld_js_spark.operators.textstats as ts
    orig = ts._docs
    ts._docs = lambda spark, sf_dir: docs
    try:
        out = {r["doc_id"]: r for r in
               q_text_repetition(spark, "unused").collect()}
    finally:
        ts._docs = orig
    r1, r2, r3 = out[1], out[2], out[3]
    assert (r1["dup_token_ppm"], r1["top_bigram_ppm"],
            r1["dup_5gram_ppm"], r1["repetitive"]) == (0, 250000, 0, 0)
    # doc1 top bigram: each of 7 bigrams once -> 1*2/8 = 250000;
    # NOT repetitive despite 250000 > threshold: below REP_MIN_TOKENS
    assert r2["dup_token_ppm"] == 916666   # floor(22e6/24)
    assert r2["top_bigram_ppm"] == 1000000  # clamped from 12*2/24
    assert r2["dup_5gram_ppm"] == 1000000   # all 24 positions covered
    assert r2["repetitive"] == 1
    assert r3["n_tokens"] == 20
    assert r3["dup_token_ppm"] == 250000    # 5 of 20 tokens repeat
    assert r3["dup_5gram_ppm"] == 500000    # exactly positions 0-4,10-14
    assert r3["repetitive"] == 1


def test_domain_mix_hand_computed(spark):
    """Hand-computed mixture plan on a controlled supply — the
    independent-ground-truth layer (the Spark and DuckDB versions
    share the formula, so only a third derivation can catch a shared
    defect). Supply: A=1000 tokens, B=300, weights 800/200 per-mille.
      budget  = min(1000*1000//800, 300*1000//200) = min(1250, 1500)
              = 1250                     (A is the bottleneck)
      alloc_A = 1250*800//1000 = 1000 -> keep_pm 1000 (keep all)
      alloc_B = 1250*200//1000 =  250 -> keep_pm 250*1000//300 = 833
    """
    from jsonld_js_spark.operators.sampling import domain_mix_plan
    rows = ([(i, "A", 10) for i in range(100)]
            + [(1000 + i, "B", 10) for i in range(30)])
    docs = spark.createDataFrame(rows, "doc_id long, lang string, "
                                       "n_tokens long")
    plan = {r["domain"]: r for r in
            domain_mix_plan(docs, weights={"A": 800, "B": 200})
            .collect()}
    a, b = plan["A"], plan["B"]
    assert (a["n_docs"], a["n_tokens"], a["alloc_tokens"],
            a["keep_pm"]) == (100, 1000, 1000, 1000)
    assert (b["n_docs"], b["n_tokens"], b["alloc_tokens"],
            b["keep_pm"]) == (30, 300, 250, 833)
    # bottleneck domain keeps everything; achieved == supply for A
    assert a["kept_docs"] == 100 and a["kept_tokens"] == 1000
    # B's kept side is hash-sampled at 833 per-mille: subset, nonzero
    assert 0 < b["kept_docs"] <= 30
    assert b["kept_tokens"] == b["kept_docs"] * 10


def test_domain_mix_gated_invariants(spark):
    """Gated query invariants at sf0.001: composition targets hold —
    alloc_d = budget*w_d//1000 for a single shared budget, alloc <=
    supply everywhere (no upsampling), exactly one bottleneck domain
    at keep_pm >= 999, and determinism under re-run."""
    from jsonld_js_spark.operators.sampling import (
        MIX_WEIGHTS, q_corpus_domain_mix)
    out = q_corpus_domain_mix(spark, SF).collect()
    assert {r["domain"] for r in out} == set(MIX_WEIGHTS)
    budgets = {r["alloc_tokens"] * 1000 // r["weight_pm"] for r in out}
    # all allocs derive from one budget (floor makes them within 1)
    assert max(budgets) - min(budgets) <= max(
        1000 // min(MIX_WEIGHTS.values()), 1) * 2
    for r in out:
        assert r["alloc_tokens"] <= r["n_tokens"]
        assert 0 <= r["keep_pm"] <= 1000
        assert r["kept_docs"] <= r["n_docs"]
    assert sum(1 for r in out if r["keep_pm"] >= 999) >= 1
    assert out == q_corpus_domain_mix(spark, SF).collect()


def test_domain_mix_zero_supply_domain_dropped(spark):
    """A domain whose total token mass is 0 (possible under BPE
    counts) must be dropped from the plan — not crash the budget
    arithmetic or pin it to 0."""
    from jsonld_js_spark.operators.sampling import domain_mix_plan
    rows = ([(i, "A", 10) for i in range(10)]
            + [(100 + i, "Z", 0) for i in range(5)])
    docs = spark.createDataFrame(rows, "doc_id long, lang string, "
                                       "n_tokens long")
    plan = {r["domain"]: r for r in
            domain_mix_plan(docs, weights={"A": 800, "Z": 200})
            .collect()}
    assert set(plan) == {"A"}
    assert plan["A"]["keep_pm"] == 1000  # sole supplier keeps all


def test_domain_mix_bpe_matches_whitespace_structure(spark):
    """The BPE-count mix plan obeys the same invariants as the
    whitespace plan (one shared budget, alloc <= supply, >= 1
    bottleneck) and its token masses equal the gated BPE tokenize
    counts summed per language — tying the two gated queries to each
    other through an independent aggregation."""
    from jsonld_js_spark.operators.sampling import (
        MIX_WEIGHTS, q_corpus_domain_mix_bpe)
    from jsonld_js_spark.operators.bpe import q_vocab_bpe_tokenize_scale
    import pyspark.sql.functions as F
    out = q_corpus_domain_mix_bpe(spark, SF).collect()
    assert {r["domain"] for r in out} <= set(MIX_WEIGHTS)
    for r in out:
        assert r["alloc_tokens"] <= r["n_tokens"]
        assert 0 <= r["keep_pm"] <= 1000
        assert r["kept_docs"] <= r["n_docs"]
    assert sum(1 for r in out if r["keep_pm"] >= 999) >= 1
    counts = q_vocab_bpe_tokenize_scale(spark, SF)
    langs = (spark.read.parquet(f"{SF}/documents.parquet")
             .select("doc_id", "lang"))
    mass = {r["lang"]: r["t"] for r in
            counts.join(langs, "doc_id")
            .filter(F.col("lang").isin(*MIX_WEIGHTS.keys()))
            .groupBy("lang")
            .agg(F.sum("n_bpe_tokens").alias("t")).collect()
            if r["t"] and r["t"] > 0}
    assert {r["domain"]: r["n_tokens"] for r in out} == mass


def test_mix_upsample_zero_supply_domain_dropped(spark):
    from jsonld_js_spark.operators.sampling import mix_upsample_plan
    rows = ([(i, "A", 10) for i in range(10)]
            + [(100 + i, "Z", 0) for i in range(5)])
    docs = spark.createDataFrame(rows, "doc_id long, lang string, "
                                       "n_tokens long")
    out = mix_upsample_plan(docs, weights={"A": 800, "Z": 200}).collect()
    assert {r["domain"] for r in out} == {"A"}
    # sole surviving supplier at target == its own supply but weight
    # 800/1000: epochs_pm = (100*800//1000)*1000//100 = 800
    assert all(r["epochs_pm"] == 800 for r in out)


def test_mix_upsample_bpe_invariants(spark):
    """Copy-mass conservation under BPE token denomination: per
    domain, sum(n_copies * n_tokens) lands within one doc of
    alloc = target * w // 1000, and the token masses equal the gated
    BPE counts."""
    from jsonld_js_spark.operators.sampling import (
        MIX_WEIGHTS, q_corpus_mix_upsample_bpe)
    from jsonld_js_spark.operators.bpe import q_vocab_bpe_tokenize_scale
    import pyspark.sql.functions as F
    out = q_corpus_mix_upsample_bpe(spark, SF).collect()
    counts = {r["doc_id"]: r["n_bpe_tokens"] for r in
              q_vocab_bpe_tokenize_scale(spark, SF).collect()}
    langs = {r["doc_id"]: r["lang"] for r in
             spark.read.parquet(f"{SF}/documents.parquet")
             .select("doc_id", "lang").collect()}
    supply: dict = {}
    for d, n in counts.items():
        lg = langs[d]
        if lg in MIX_WEIGHTS:
            supply[lg] = supply.get(lg, 0) + n
    supply = {k: v for k, v in supply.items() if v > 0}
    target = sum(supply.values())
    for r in out:
        assert r["n_tokens"] == counts[r["doc_id"]]
        alloc = target * MIX_WEIGHTS[r["domain"]] // 1000
        assert r["epochs_pm"] == alloc * 1000 // supply[r["domain"]]
        assert r["n_copies"] in (r["epochs_pm"] // 1000,
                                 r["epochs_pm"] // 1000 + 1)


def test_domain_mix_edge_cases(spark):
    """Crafted edge supplies: single domain (everything kept),
    extreme weight disparity (tiny-weight domain becomes the
    bottleneck ONLY when its supply is short), a weights domain
    absent from the corpus (inner-join scope: not in the output and
    not pinning the budget to 0), and an empty corpus (empty plan)."""
    from jsonld_js_spark.operators.sampling import domain_mix_plan

    def mk(rows):
        return spark.createDataFrame(
            rows, "doc_id long, lang string, n_tokens long")

    # single domain, weight 1000: budget == supply, keep everything
    p = domain_mix_plan(mk([(i, "A", 7) for i in range(10)]),
                        weights={"A": 1000}).collect()
    assert len(p) == 1 and p[0]["alloc_tokens"] == 70
    assert p[0]["keep_pm"] == 1000
    assert p[0]["kept_docs"] == 10 and p[0]["kept_tokens"] == 70

    # extreme disparity: A w=999 T=999, B w=1 T=1000.
    # budget = min(999*1000//999, 1000*1000//1) = 1000 -> A allocates
    # 999 (all of it), B allocates 1 token of 1000 -> keep_pm 1
    p = {r["domain"]: r for r in domain_mix_plan(
        mk([(1, "A", 999), (2, "B", 1000)]),
        weights={"A": 999, "B": 1}).collect()}
    assert p["A"]["alloc_tokens"] == 999 and p["A"]["keep_pm"] == 1000
    assert p["B"]["alloc_tokens"] == 1 and p["B"]["keep_pm"] == 1
    assert p["B"]["kept_docs"] in (0, 1)  # hash-bucket < 1 is rare

    # a weights domain with NO corpus rows is out of scope (does not
    # zero the budget); corpus-only domains outside weights filtered
    p = {r["domain"]: r for r in domain_mix_plan(
        mk([(1, "A", 100), (2, "C", 50)]),
        weights={"A": 500, "B": 500}).collect()}
    assert set(p) == {"A"}
    assert p["A"]["alloc_tokens"] == 100  # budget = 100*1000//500*500//1000

    # empty corpus -> empty plan, correct schema
    empty = domain_mix_plan(mk([]), weights={"A": 1000})
    assert empty.collect() == []
    assert empty.columns == ["domain", "n_docs", "n_tokens", "weight_pm",
                             "alloc_tokens", "keep_pm", "kept_docs",
                             "kept_tokens"]


def test_mix_upsample_hand_computed(spark):
    """Hand-computed epochs plan: A=1000 tokens, B=300, weights
    800/200, default target = 1300 total.
      alloc_A = 1300*800//1000 = 1040 -> epochs_pm 1040*1000//1000
              = 1040 (every A doc gets >=1 copy, 4% get 2)
      alloc_B = 1300*200//1000 = 260  -> epochs_pm 260*1000//300
              = 866 (B docs hash-sampled under one epoch)
    """
    from jsonld_js_spark.operators.sampling import mix_upsample_plan
    rows = ([(i, "A", 10) for i in range(100)]
            + [(1000 + i, "B", 10) for i in range(30)])
    docs = spark.createDataFrame(rows, "doc_id long, lang string, "
                                       "n_tokens long")
    out = mix_upsample_plan(docs, weights={"A": 800, "B": 200}).collect()
    a = [r for r in out if r["domain"] == "A"]
    bb = [r for r in out if r["domain"] == "B"]
    assert all(r["epochs_pm"] == 1040 for r in a)
    assert all(r["epochs_pm"] == 866 for r in bb)
    assert all(r["n_copies"] in (1, 2) for r in a)
    assert all(r["n_copies"] in (0, 1) for r in bb)
    # determinism: pure function of doc identity
    again = mix_upsample_plan(docs, weights={"A": 800, "B": 200}).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # explicit target overrides the constant-mass default: 2600 total
    # doubles every allocation -> epochs_pm doubles exactly
    double = mix_upsample_plan(docs, weights={"A": 800, "B": 200},
                               target_tokens=2600).collect()
    assert {r["epochs_pm"] for r in double if r["domain"] == "A"} == {2080}
    assert {r["epochs_pm"] for r in double if r["domain"] == "B"} == {1733}


def test_mix_upsample_gated_invariants(spark):
    """Gated query: emitted token mass per domain approximates its
    allocation (exact up to per-doc fractional rounding), the dominant
    domain upsamples (> 1 epoch) while every tail downsamples, and
    total emitted mass ~ total supply (constant-size rebalance)."""
    from jsonld_js_spark.operators.sampling import (
        MIX_WEIGHTS, q_corpus_mix_upsample)
    import pyspark.sql.functions as F
    out = q_corpus_mix_upsample(spark, SF)
    agg = {r["domain"]: r for r in
           out.groupBy("domain").agg(
               F.min("epochs_pm").alias("pm"),
               F.sum(F.col("n_copies") * F.col("n_tokens"))
               .alias("emitted"),
               F.sum("n_tokens").alias("supply")).collect()}
    assert set(agg) == set(MIX_WEIGHTS)
    assert agg["en"]["pm"] > 1000
    for lang in ("de", "fr", "es", "zh"):
        assert agg[lang]["pm"] < 1000
    total_supply = sum(r["supply"] for r in agg.values())
    for lang, r in agg.items():
        alloc = total_supply * MIX_WEIGHTS[lang] // 1000
        # fractional-epoch sampling: per-doc binomial around alloc
        assert abs(r["emitted"] - alloc) <= max(0.25 * alloc, 200), lang


# ---------------------------------------------------------------------------
# hashed linear-classifier scoring (operators/classifier.py)

def _py_hash60(s: str) -> int:
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_weight(j: int) -> int:
    from jsonld_js_spark.operators.classifier import WEIGHT_MIX, WEIGHT_MOD
    return (j * WEIGHT_MIX) % WEIGHT_MOD


def _py_classifier(text: str):
    """Independent pure-python reimplementation (third engine) of the
    classifier formula — guards the shared Spark/DuckDB arithmetic."""
    import re
    from jsonld_js_spark.operators.classifier import D_FEATURES
    toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    ngrams = list(toks)
    ngrams += [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
    ws = [_py_weight(_py_hash60(g) % D_FEATURES) for g in ngrams]
    score = sum(ws) * 1000 // len(ws)
    return len(ngrams), score, score >= 1_000_000


def test_classifier_score_hand_truth(spark):
    from jsonld_js_spark.operators.classifier import (
        classifier_score, synthetic_weights,
    )
    texts = [
        "The quick brown fox jumps over the lazy dog",
        "one",
        "  Mixed   CASE   and    spacing  ",
        "a b a b a b",
        "punctuation, works? fine!",
    ]
    docs = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)],
        "doc_id string, text string")
    got = {r["doc_id"]: (r["n_features"], r["score_milli"], r["keep"])
           for r in classifier_score(docs, synthetic_weights(spark))
           .collect()}
    expect = {f"d{i}": _py_classifier(t) for i, t in enumerate(texts)}
    assert got == expect


def test_classifier_keep_separates(spark):
    """Single-token docs: keep is exactly w(bucket) >= 1000 — pick one
    high-weight and one low-weight token programmatically and assert
    the decision boundary is live in both directions."""
    from jsonld_js_spark.operators.classifier import (
        D_FEATURES, classifier_score, synthetic_weights,
    )
    hi = lo = None
    for i in range(1000):
        tok = f"tok{i}"
        w = _py_weight(_py_hash60(tok) % D_FEATURES)
        if hi is None and w >= 1500:
            hi = tok
        if lo is None and w <= 500:
            lo = tok
        if hi and lo:
            break
    assert hi and lo
    docs = spark.createDataFrame(
        [("good", hi), ("bad", lo)], "doc_id string, text string")
    got = {r["doc_id"]: r["keep"]
           for r in classifier_score(docs, synthetic_weights(spark))
           .collect()}
    assert got == {"good": True, "bad": False}


def test_length_percentiles_hand_truth(spark):
    """Nearest-rank percentiles: rank ceil(p*n/100) over the sorted
    group — p50 of [1..4] is the rank-2 value, p99 is the max; a
    single-doc group returns its own value everywhere."""
    from jsonld_js_spark.operators.textstats import length_percentiles
    rows = [(1, "a", "one two"), (2, "a", "one"),
            (3, "a", "one two three four"), (4, "a", "one two three"),
            (5, "b", "solo doc here")]
    docs = spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")
    got = {r["source"]: r for r in length_percentiles(docs).collect()}
    a = got["a"]  # token counts sorted: [1, 2, 3, 4]
    assert (a["n_docs"], a["min_tokens"], a["max_tokens"]) == (4, 1, 4)
    assert a["p50_tokens"] == 2      # rank ceil(0.5*4)=2
    assert a["p90_tokens"] == 4      # rank ceil(0.9*4)=4
    assert a["p99_tokens"] == 4
    b = got["b"]
    assert (b["n_docs"], b["p50_tokens"], b["p99_tokens"]) == (1, 3, 3)


def test_jsonl_roundtrip_escapes(spark, tmp_path):
    """JSONL write→read is byte-exact for strings with quotes,
    backslashes, newlines, tabs, unicode, and empty/null fields."""
    from jsonld_js_spark.sources import read_jsonl, write_jsonl
    rows = [
        (1, 'he said "hi" \\ and\nleft\tfast', "en", "web", 7),
        (2, "naïve – ünïcødé ✓ 中文", "und", "books", 3),
        (3, "", "en", None, 0),
    ]
    ddl = ("doc_id long, text string, lang string, source string, "
           "n_chars long")
    df = spark.createDataFrame(rows, ddl)
    path = str(tmp_path / "jl")
    write_jsonl(df, path)
    got = sorted(tuple(r) for r in read_jsonl(spark, path, ddl).collect())
    assert got == sorted(rows)


def test_corpus_sample_weighted_truth_and_determinism(spark):
    """Weighted priority sample: exactly min(K, |lang|) survivors per
    language, selection matches an independent pure-python recompute
    (md5 + integer div — no Spark arithmetic shared), and re-runs
    agree."""
    import hashlib
    from jsonld_js_spark.operators.sampling import (
        WSAMPLE_K, WSAMPLE_SALT, q_corpus_sample_weighted)
    rows = q_corpus_sample_weighted(spark, SF).collect()
    again = q_corpus_sample_weighted(spark, SF).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    by_lang = {}
    for d in docs:
        w = max(1, d["n_chars"])
        h = int(hashlib.md5(
            f"{WSAMPLE_SALT}{d['doc_id']}".encode()).hexdigest()[:15], 16)
        by_lang.setdefault(d["lang"], []).append((h // w, d["doc_id"], w))
    expect = {}
    for lang, cand in by_lang.items():
        for pri, doc_id, w in sorted(cand)[:WSAMPLE_K]:
            expect[doc_id] = (lang, w, pri)
    got = {r["doc_id"]: (r["lang"], r["w"], r["priority"]) for r in rows}
    assert got == expect
    from collections import Counter
    per_lang = Counter(r["lang"] for r in rows)
    for lang, cand in by_lang.items():
        assert per_lang[lang] == min(WSAMPLE_K, len(cand))


def test_corpus_sample_weighted_is_weight_biased(spark):
    """Inclusion tracks weight: on a synthetic corpus where 'heavy'
    docs carry 50x the weight of 'light' ones, the K survivors skew
    heavily to the heavy class (P(select) ~ w)."""
    import hashlib
    from jsonld_js_spark.operators.sampling import WSAMPLE_SALT
    heavy = [(i, 5000) for i in range(200)]
    light = [(i + 1000, 100) for i in range(200)]
    k = 40
    pris = []
    for doc_id, w in heavy + light:
        h = int(hashlib.md5(
            f"{WSAMPLE_SALT}{doc_id}".encode()).hexdigest()[:15], 16)
        pris.append((h // w, doc_id, w))
    chosen_w = [w for _, _, w in sorted(pris)[:k]]
    n_heavy = sum(1 for w in chosen_w if w == 5000)
    # E[n_heavy] = k * 50/51 ~ 39.2; even 3 sigma stays > 34
    assert n_heavy >= 34, n_heavy
