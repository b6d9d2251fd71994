"""Dedup operator tests: rarest-first prefix filtering (the 100 TB
hot-shingle fix), MinHash recall on the injected near-dups, and the
one-hash mix arithmetic staying in int64."""
from __future__ import annotations

from pyspark.sql import functions as F

from jsonld_js_spark.operators.dedup import (
    MASK30, MIX_CONSTS, MIX_PRIME, ngram_candidates, ngram_prefixes,
    shingles_col,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    return df.select("doc_id", shingles_col(F.col("text")).alias("shingles"))


def test_rarest_first_prefix_drops_hot_shingle_candidates(spark):
    """A corpus-wide common 3-gram (lexicographically FIRST, so the
    round-1 ordering put it in every prefix) must not explode the
    candidate set under document-frequency ordering."""
    n = 12
    texts = [
        "aaa aaa aaa " + " ".join(f"u{i}x{j}" for j in range(5))
        for i in range(n)]
    docs = _docs(spark, texts).cache()
    lex = ngram_candidates(ngram_prefixes(docs, ordering="lex")).count()
    df_ord = ngram_candidates(ngram_prefixes(docs, ordering="df")).count()
    # lexicographic: the hot shingle pairs every doc with every other
    assert lex >= n * (n - 1) // 2
    # rarest-first: the hot shingle falls out of every prefix
    assert df_ord < lex
    assert df_ord == 0


def test_prefix_filter_still_complete(spark):
    """Rarest-first ordering must not lose true pairs: two docs with
    J >= 0.5 always share a prefix shingle."""
    base = " ".join(f"w{j}" for j in range(10))
    texts = [base,                      # doc 0
             base + " extra tail",      # doc 1: J > 0.5 with doc 0
             " ".join(f"z{j}" for j in range(10))]  # doc 2: unrelated
    docs = _docs(spark, texts).cache()
    cand = {(r["doc_a"], r["doc_b"]) for r in
            ngram_candidates(ngram_prefixes(docs)).collect()}
    assert (0, 1) in cand


def test_injection_guard_rejects_colliding_corpus(spark):
    """A corpus whose ids reach the fixed injection offset must fail
    fast, not silently duplicate ids (the soak_curate finding)."""
    import pytest
    from jsonld_js_spark.operators.dedup import guard_injection_span
    big = spark.range(3).select(
        (F.col("id") + 99999).alias("doc_id"),
        F.lit("x").alias("text"))
    with pytest.raises(ValueError, match="collides"):
        guard_injection_span(big, 100000)
    # under the offset: passes through unchanged
    ok = spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text"))
    assert guard_injection_span(ok, 100000).count() == 3


def test_minhash_finds_injected_near_dups(spark):
    """The corpus injects a near-copy (+100000) for every 10th doc and
    an exact copy (+200000) for every 25th; MinHash+LSH must recover
    the exact copies (J=1 always collides) and most near-copies."""
    from jsonld_js_spark.operators.dedup import q_dedup_minhash_lsh
    pairs = {(r["doc_a"], r["doc_b"])
             for r in q_dedup_minhash_lsh(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    exact_expected = {(i, i + 200000) for i in ids if i % 25 == 0}
    assert exact_expected <= pairs
    near_expected = {(i, i + 100000) for i in ids if i % 10 == 0}
    found = len(near_expected & pairs) / len(near_expected)
    assert found >= 0.9, f"near-dup recall too low: {found}"


def _rot_mix(a, h):
    """The engine's overflow-free A*h mod (2^61-1) (both dialects)."""
    from jsonld_js_spark.operators.dedup import MASK31
    x = a * (h >> 30)
    return ((x >> 31) + ((x & MASK31) << 30) + a * (h & MASK30)) % MIX_PRIME


def test_mix_is_exact_multiplicative_hash():
    """The split/rotate formula must equal A*h mod p exactly (that is
    what makes the 8 orderings independent permutations — the round-3
    soak found the old non-wrapping affine mix kept all 8 minima on
    the raw-h order, recall 0.96 instead of 0.9999), and every
    intermediate must fit int64."""
    import random
    rng = random.Random(7)
    hs = [0, 1, MASK30, (1 << 60) - 1, MIX_PRIME - 1] + \
        [rng.randrange(1 << 60) for _ in range(2000)]
    for a in MIX_CONSTS:
        assert 1 <= a <= MASK30 and a % 2 == 1
        for h in hs:
            assert _rot_mix(a, h) == (a * h) % MIX_PRIME
            # int64 bounds of each intermediate
            x = a * (h >> 30)
            assert x < 2 ** 63
            assert (x >> 31) + ((x & ((1 << 31) - 1)) << 30) \
                + a * (h & MASK30) < 2 ** 63


def test_minhash_orderings_decorrelated():
    """A shingle whose raw h is the set minimum must NOT capture every
    signature (the old monotone-mix failure mode): across the 8 mixes,
    argmin positions must differ."""
    import random
    rng = random.Random(11)
    hs = [rng.randrange(1 << 60) for _ in range(40)]
    hs[7] = min(hs) // 2  # force a clear raw-order winner
    argmins = {min(range(len(hs)), key=lambda j: _rot_mix(a, hs[j]))
               for a in MIX_CONSTS}
    assert len(argmins) >= 4, f"orderings still correlated: {argmins}"


def test_dedup_clusters_transitive(spark):
    """Every 50th doc has BOTH a near-copy (+100000) and an exact copy
    (+200000); all three must land in one component labeled by the
    original (min) doc_id — transitivity that pairwise output lacks."""
    from jsonld_js_spark.operators.dedup import q_dedup_clusters
    labels = {r["doc_id"]: r["cluster_id"]
              for r in q_dedup_clusters(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    triples_checked = 0
    for i in ids:
        if i % 50 == 0 and (i + 100000) in labels and (i + 200000) in labels:
            # same component; label is the component MIN so it can be
            # smaller than i when template-similar originals also match
            assert labels[i + 100000] == labels[i + 200000] == labels[i]
            assert labels[i] <= i
            triples_checked += 1
    assert triples_checked > 0
    # labels are canonical: every cluster_id is itself a member doc
    assert set(labels.values()) <= set(labels)


def test_simhash_band_candidates_stay_bounded(spark):
    """Round-3 scale fix: 15-bit bands (32768 buckets) must keep the
    band-join RANDOM-collision candidates near zero as the corpus
    scales 1x -> 4x (growth stays far from the quadratic 16x), while
    8-bit bands (the round-2 granularity: 256 buckets) explode into
    tens of thousands of uniform-collision pairs on the same 4x
    corpus. True-similarity candidates (this synthetic corpus is
    heavily templated) are a property of the data, not the scheme, so
    the assertion is on GROWTH, not an absolute count."""
    from jsonld_js_spark.operators.dedup import (
        SIMHASH_BAND_BITS, SIMHASH_N_BANDS, simhash_df)

    def corpus(mult):
        d = (spark.read.parquet(f"{SF}/documents.parquet")
             .select("doc_id", "text"))
        # replica k > 0: per-(k, doc) unique token bags — unrelated to
        # every other doc (simhash is a token-bag signature, so the
        # filler must differ in token SET, not order or a single salt)
        reps = [d if k == 0 else d.select(
            (F.col("doc_id") + 1000000 * k).alias("doc_id"),
            F.concat_ws(" ", F.transform(
                F.sequence(F.lit(1), F.lit(60)),
                lambda j: F.concat(F.lit(f"s{k}d"), F.col("doc_id"),
                                   F.lit("w"), j))).alias("text"))
            for k in range(mult)]
        out = reps[0]
        for r in reps[1:]:
            out = out.unionAll(r)
        return out

    def n_candidates(sh, band_bits):
        nb = 60 // band_bits
        bands = sh.select("doc_id", F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.expr(f"(simhash >> {band_bits*b}) & "
                            f"{(1 << band_bits) - 1}").alias("bkey"))
            for b in range(nb)])).alias("bb")
        ).select("doc_id", "bb.band", "bb.bkey")
        return (bands.alias("a").join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band")) &
            (F.col("a.bkey") == F.col("b.bkey")) &
            (F.col("a.doc_id") < F.col("b.doc_id")))
            .select("a.doc_id", "b.doc_id").distinct().count())

    sh1 = simhash_df(corpus(1)).cache()
    sh4 = simhash_df(corpus(4)).cache()
    n1, n4 = sh1.count(), sh4.count()
    assert n4 == 4 * n1
    assert SIMHASH_BAND_BITS == 15 and SIMHASH_N_BANDS == 4
    c1 = n_candidates(sh1, SIMHASH_BAND_BITS)
    c4 = n_candidates(sh4, SIMHASH_BAND_BITS)
    # 4x the corpus (new docs unrelated): candidates grow by at most
    # the small uniform-collision term, nowhere near quadratic 16x
    assert c4 <= 2.5 * max(c1, 1), (c1, c4)
    # the old 8-bit band granularity explodes on the SAME 4x corpus:
    # uniform collisions alone give ~n^2/2^8 pairs per band
    c4_old = n_candidates(sh4, 8)
    assert c4_old > 10 * c4, (c4_old, c4)
    sh1.unpersist(); sh4.unpersist()


def test_cc_long_chain_star_converges_label_raises(spark):
    """Adversarial diameter (a 200-node path graph): label propagation
    must REFUSE to return wrong labels past its round budget (round-3
    ADVICE fix — it previously returned silently-wrong clusters),
    while large-star/small-star converges within O(log n) rounds and
    produces the exact single component."""
    import pytest
    from jsonld_js_spark.operators.dedup import connected_components

    n = 200
    chain = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(chain, "src long, dst long")
    edges = df.unionAll(
        df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).cache()

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iters=10)

    labels = connected_components(edges, max_iters=12, algorithm="star")
    rows = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert len(rows) == n
    assert set(rows.values()) == {0}


def test_boilerplate_lines_hit_injected_dups(spark):
    """Exact-copy docs share ALL lines with their original; with
    BOILERPLATE_MIN_DOCS=3 a line must appear in >= 3 docs, which the
    exact+near chains (orig, +100000, +200000) provide for every 50th
    doc — those docs must show n_boilerplate > 0 and kept_ppm < 1e6,
    while a unique doc keeps everything."""
    from pyspark.sql import functions as F

    from jsonld_js_spark.operators.dedup import q_corpus_boilerplate_stats
    rows = {r["doc_id"]: r for r in
            q_corpus_boilerplate_stats(spark, SF).collect()}
    assert rows, "no stats emitted"
    flagged = [r for r in rows.values() if r["n_boilerplate"] > 0]
    assert flagged, "no boilerplate found despite injected duplicates"
    for r in flagged:
        assert 0 <= r["n_boilerplate"] <= r["n_lines"]
        assert r["kept_ppm"] == (r["n_lines"] - r["n_boilerplate"]) \
            * 1000000 // r["n_lines"]
    # a doc in a 3-member identity chain is fully boilerplate
    chains = [i for i in rows if i % 50 == 0 and i + 200000 in rows
              and i + 100000 in rows]
    assert chains and any(rows[i]["n_boilerplate"] == rows[i]["n_lines"]
                          for i in chains)


def test_duplicated_spans_exact_planted(spark):
    """A 20-token span planted verbatim into two otherwise-unique docs
    is recovered EXACTLY (same start/end extents, same cluster id in
    both docs, nothing else reported) — the extents are maximal and
    token-precise, not approximate."""
    from jsonld_js_spark.operators.dedup import SUBSTR_K, duplicated_spans

    span = " ".join(f"s{i}" for i in range(20))
    docs = spark.createDataFrame([
        (1, " ".join(f"a{i}" for i in range(10)) + " " + span + " " +
            " ".join(f"b{i}" for i in range(7))),
        (2, " ".join(f"c{i}" for i in range(5)) + " " + span + " " +
            " ".join(f"d{i}" for i in range(12))),
        (3, " ".join(f"e{i}" for i in range(30))),
    ], "doc_id long, text string")
    rows = sorted(duplicated_spans(docs).collect(),
                  key=lambda r: (r["doc_id"], r["span_start"]))
    assert [(r["doc_id"], r["span_start"], r["span_end"],
             r["span_tokens"]) for r in rows] == \
        [(1, 10, 29, 20), (2, 5, 24, 20)]
    assert rows[0]["cluster"] == rows[1]["cluster"]
    assert 20 >= SUBSTR_K


def test_duplicated_spans_submin_span_invisible(spark):
    """A shared span shorter than SUBSTR_K tokens contains no
    duplicated K-gram and must NOT be reported (the documented
    minimum-span contract)."""
    from jsonld_js_spark.operators.dedup import SUBSTR_K, duplicated_spans

    short = " ".join(f"s{i}" for i in range(SUBSTR_K - 1))
    docs = spark.createDataFrame([
        (1, " ".join(f"a{i}" for i in range(10)) + " " + short),
        (2, " ".join(f"b{i}" for i in range(10)) + " " + short),
    ], "doc_id long, text string")
    assert duplicated_spans(docs).count() == 0


def test_duplicated_spans_merge_adjacent_and_multiple(spark):
    """Two disjoint duplicated regions in one doc yield two separate
    maximal spans (the gaps-and-islands merge does not bridge a gap),
    and a doc sharing different spans with different partners reports
    each with its own cluster."""
    from jsonld_js_spark.operators.dedup import duplicated_spans

    p = " ".join(f"p{i}" for i in range(10))
    q = " ".join(f"q{i}" for i in range(10))
    docs = spark.createDataFrame([
        (1, p + " " + " ".join(f"x{i}" for i in range(8)) + " " + q),
        (2, " ".join(f"y{i}" for i in range(4)) + " " + p),
        (3, q + " " + " ".join(f"z{i}" for i in range(4))),
    ], "doc_id long, text string")
    rows = sorted(duplicated_spans(docs).collect(),
                  key=lambda r: (r["doc_id"], r["span_start"]))
    got = [(r["doc_id"], r["span_start"], r["span_end"]) for r in rows]
    assert got == [(1, 0, 9), (1, 18, 27), (2, 4, 13), (3, 0, 9)]
    by_extent = {(r["doc_id"], r["span_start"]): r["cluster"]
                 for r in rows}
    assert by_extent[(1, 0)] == by_extent[(2, 4)]      # the p span
    assert by_extent[(1, 18)] == by_extent[(3, 0)]     # the q span
    assert by_extent[(1, 0)] != by_extent[(1, 18)]


def test_contamination_flags_planted_copies(spark):
    """Planted contamination: the gated corpus contains exact
    (+200000) and near (+100000) copies of eval docs — the exact flag
    set must contain every planted (copy, eval) pair at overlap_ppm
    1e6 (exact) / >= 90% (near), and never flag a doc against
    itself."""
    from jsonld_js_spark.operators.dedup import (
        CONTAM_EVAL_EVERY, q_corpus_contamination)

    sf_dir = SF
    rows = q_corpus_contamination(spark, sf_dir).collect()
    assert rows
    flagged = {(r["doc_id"], r["eval_doc_id"]): r["overlap_ppm"]
               for r in rows}
    assert all(d != e for d, e in flagged)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    eval_ids = [i for i in range(0, n_docs, CONTAM_EVAL_EVERY)]
    assert eval_ids
    for e in eval_ids:
        if e % 25 == 0:  # exact copy planted in the corpus
            assert flagged[(e + 200000, e)] == 1000000
        if e % 10 == 0:  # near copy (4-token suffix) planted
            assert flagged[(e + 100000, e)] >= 900000


def test_scrub_keeps_one_canonical_copy(spark):
    """Scrub contract: the span cluster's canonical holder (smallest
    (doc_id, span_start)) keeps the span verbatim; every other holder
    has it excised with exact token accounting; untouched docs pass
    through byte-identical."""
    from jsonld_js_spark.operators.dedup import scrub_duplicated_spans

    span = " ".join(f"s{i}" for i in range(20))
    pre1, post1 = [f"a{i}" for i in range(10)], [f"b{i}" for i in range(7)]
    pre2, post2 = [f"c{i}" for i in range(5)], [f"d{i}" for i in range(12)]
    solo = " ".join(f"e{i}" for i in range(30))
    docs = spark.createDataFrame([
        (1, " ".join(pre1) + " " + span + " " + " ".join(post1)),
        (2, " ".join(pre2) + " " + span + " " + " ".join(post2)),
        (3, solo),
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in scrub_duplicated_spans(docs).collect()}
    assert out[1]["n_spans_scrubbed"] == 0
    assert out[1]["n_tokens_removed"] == 0
    assert span in out[1]["text"]
    assert out[2]["n_spans_scrubbed"] == 1
    assert out[2]["n_tokens_removed"] == 20
    assert out[2]["text"] == " ".join(pre2 + post2)
    assert out[3]["text"] == solo
    assert out[3]["n_tokens_removed"] == 0


def test_scrub_multiple_spans_one_doc(spark):
    """A doc holding two non-canonical spans loses both; a doc that is
    canonical for one cluster and non-canonical for another loses only
    the non-canonical one."""
    from jsonld_js_spark.operators.dedup import scrub_duplicated_spans

    p = " ".join(f"p{i}" for i in range(10))
    q = " ".join(f"q{i}" for i in range(10))
    mid = " ".join(f"x{i}" for i in range(8))
    docs = spark.createDataFrame([
        (1, p + " " + mid + " " + q),          # canonical for p AND q
        (2, " ".join(f"y{i}" for i in range(4)) + " " + p + " " + q),
        (3, q + " " + " ".join(f"z{i}" for i in range(4))),
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in scrub_duplicated_spans(docs).collect()}
    assert out[1]["n_spans_scrubbed"] == 0 and p in out[1]["text"] \
        and q in out[1]["text"]
    assert out[2]["n_spans_scrubbed"] == 2
    assert out[2]["n_tokens_removed"] == 20
    assert out[2]["text"] == " ".join(f"y{i}" for i in range(4))
    assert out[3]["n_spans_scrubbed"] == 1
    assert out[3]["text"] == " ".join(f"z{i}" for i in range(4))


def test_scrub_gated_corpus_per_cluster_accounting(spark):
    """On the gated planted-span corpus the scrub matches the spans
    output exactly: per doc, n_spans_scrubbed = its non-canonical span
    rows and n_tokens_removed = their summed lengths; every canonical
    holder still contains its span text verbatim; and the planted
    boilerplate population shrinks (identical text embedded in
    DIFFERENT maximal extents forms different clusters and each keeps
    a canonical copy — the documented maximal-extent semantic)."""
    from jsonld_js_spark.operators.dedup import (
        SUBSTR_BOILER, duplicated_spans, scrub_duplicated_spans,
        substr_corpus_df, _norm)

    corpus = substr_corpus_df(spark, SF)
    toks = {r["doc_id"]: r["t"].split(" ") for r in corpus.select(
        "doc_id", _norm(F.col("text")).alias("t")).collect()}
    spans = duplicated_spans(corpus).collect()
    by_cluster = {}
    for r in spans:
        by_cluster.setdefault(r["cluster"], []).append(r)
    kills, canon = {}, []
    for rows in by_cluster.values():
        rows.sort(key=lambda r: (r["doc_id"], r["span_start"]))
        canon.append(rows[0])
        for r in rows[1:]:
            kills.setdefault(r["doc_id"], []).append(r)
    out = {r["doc_id"]: r for r in
           scrub_duplicated_spans(corpus).collect()}
    assert set(out) == set(toks)
    for d, r in out.items():
        ks = kills.get(d, [])
        assert r["n_spans_scrubbed"] == len(ks)
        # kill spans from different clusters may OVERLAP in token
        # space (a gram-position gap < K still overlaps after the
        # +K-1 extent); removal is the position UNION minus positions
        # protected by a canonical span (canonical extents win)
        killed_pos = set()
        for k in ks:
            killed_pos.update(range(k["span_start"], k["span_end"] + 1))
        for c in canon:
            if c["doc_id"] == d:
                killed_pos.difference_update(
                    range(c["span_start"], c["span_end"] + 1))
        assert r["n_tokens_removed"] == len(killed_pos)
    for c in canon:
        span_text = " ".join(
            toks[c["doc_id"]][c["span_start"]:c["span_end"] + 1])
        assert span_text in out[c["doc_id"]]["text"]
    n_before = sum(SUBSTR_BOILER in " ".join(t) for t in toks.values())
    n_after = sum(SUBSTR_BOILER in r["text"] for r in out.values())
    assert 1 <= n_after < n_before


def test_decontaminate_drops_planted_copies(spark):
    """Every planted exact/near copy of an eval doc is gone from the
    decontaminated corpus; originals that never overlap an eval doc
    survive."""
    from jsonld_js_spark.operators.dedup import (
        CONTAM_EVAL_EVERY, corpus_df, decontaminate, eval_set_df)

    kept = {r["doc_id"] for r in decontaminate(
        corpus_df(spark, SF), eval_set_df(spark, SF))
        .select("doc_id").collect()}
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert n_docs > 0
    for e in range(0, n_docs, CONTAM_EVAL_EVERY):
        if e % 25 == 0:
            assert e + 200000 not in kept
        if e % 10 == 0:
            assert e + 100000 not in kept
    # a doc whose id is odd and not near an eval multiple keeps its
    # unique text -> must survive
    assert any(d in kept for d in range(1, n_docs, 2))


def test_keep_best_hand_truth(spark):
    """keep_best argmax semantics on a hand-built cluster table:
    highest quality wins, score ties break to the SMALLEST doc_id,
    singletons always keep."""
    from jsonld_js_spark.operators.dedup import keep_best
    rich = ("the quick brown fox jumps over the lazy dog and the "
            "cat sat on the mat with a friend of the family") * 3
    poor = "zzz qqq xxx"
    corpus = spark.createDataFrame(
        [(1, rich), (2, poor),          # cluster 1: 1 outranks 2
         (3, poor), (4, poor),          # cluster 3: tie -> min id 3
         (9, poor)],                    # singleton
        "doc_id long, text string")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3)], "doc_id long, cluster_id long")
    rows = {r["doc_id"]: r for r in keep_best(corpus, clusters).collect()}
    assert rows[1]["keep"] == 1 and rows[2]["keep"] == 0
    assert rows[1]["quality_score_ppm"] > rows[2]["quality_score_ppm"]
    assert rows[3]["quality_score_ppm"] == rows[4]["quality_score_ppm"]
    assert rows[3]["keep"] == 1 and rows[4]["keep"] == 0
    assert rows[9]["keep"] == 1 and rows[9]["cluster_id"] == 9


def test_keep_best_gated_invariants(spark):
    """Gated query: exactly ONE survivor per cluster, every corpus doc
    accounted for, every singleton kept, and every exact-copy pair
    (+200000, identical text -> tied score) resolves to the base doc."""
    from jsonld_js_spark.operators.dedup import q_dedup_keep_best
    rows = q_dedup_keep_best(spark, SF).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert sum(len(v) for v in by_cluster.values()) == len(rows)
    for cid, members in by_cluster.items():
        keeps = [r for r in members if r["keep"] == 1]
        assert len(keeps) == 1, f"cluster {cid}: {len(keeps)} keeps"
        best = max(members,
                   key=lambda r: (r["quality_score_ppm"], -r["doc_id"]))
        assert keeps[0]["doc_id"] == best["doc_id"]
        if len(members) == 1:
            assert members[0]["keep"] == 1
    # exact copies: base doc (smaller id) must be the survivor
    ids = {r["doc_id"]: r for r in rows}
    exact_pairs = [(i, i + 200000) for i in ids
                   if i < 100000 and i + 200000 in ids]
    assert exact_pairs, "corpus should contain injected exact copies"
    for base, copy in exact_pairs:
        if ids[base]["cluster_id"] == ids[copy]["cluster_id"]:
            assert ids[copy]["keep"] == 0


def test_multimodal_payload_dedup_planted(spark):
    """payload_dedup must collapse byte-identical payloads (planted
    triple + pair among distinct blobs) onto the min doc_id with exact
    copy counts — the fingerprint is content-only, so doc_id plays no
    part in the key."""
    from jsonld_js_spark.operators.multimodal import payload_dedup
    rows = [(1, b"\x89PNGaaaa"), (2, b"\x89PNGbbbb"),
            (7, b"\x89PNGaaaa"), (3, b"\x89PNGaaaa"),
            (9, b"\xff\xd8\xff\xe0cc"), (4, b"\xff\xd8\xff\xe0cc"),
            (5, b"RIFFdddd")]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["keep_doc_id"]: r["n_copies"]
           for r in payload_dedup(media).collect()}
    assert got == {1: 3, 2: 1, 4: 2, 5: 1}


def test_cross_corpus_pairs_planted(spark):
    """Planted shard-vs-store truth: an exact copy and a one-token-edit
    near-dup of a store doc must be flagged (with the exact store match),
    a novel doc must not, and batch-internal duplicates (b1/b4 copies)
    are NOT emitted — the operator pairs batch x store only (shard
    self-dedup is the regular minhash_pairs pass)."""
    from jsonld_js_spark.operators.dedup import cross_corpus_pairs
    base = " ".join(f"tok{i}" for i in range(30))
    store = spark.createDataFrame(
        [(1, base), (2, "completely unrelated store material body")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(101, base),                                  # exact copy of 1
         (102, base + " trailing"),                    # near-dup of 1
         (103, "totally different words here now ok"), # novel
         (104, base)],                                 # copy of 101 too
        "doc_id long, text string")
    got = {(r["batch_doc"], r["store_doc"])
           for r in cross_corpus_pairs(store, batch).collect()}
    assert got == {(101, 1), (102, 1), (104, 1)}


def test_multimodal_neardup_planted_and_corruption_modes(spark):
    """Byte-gram MinHash near-dup: a tail-appended copy AND a
    mid-byte-corrupted copy of the same blob are both caught with
    high Jaccard; unrelated blobs are not paired. Payload hex is
    synthesized like the gated corpus (md5-derived, so unrelated
    blobs share ~no grams)."""
    import hashlib

    from jsonld_js_spark.operators.multimodal import (
        payload_neardup_pairs)

    def hx(seed):
        return (hashlib.md5(seed.encode()).hexdigest() +
                hashlib.md5((seed + "2").encode()).hexdigest() +
                hashlib.md5((seed + "3").encode()).hexdigest())

    base = hx("blob-a")                    # 96 hex chars = 48 bytes
    appended = base + "DEADBEEF"           # re-encode w/ metadata atom
    corrupted = base[:40] + "00" + base[42:]  # one flipped mid-byte
    rows = [(1, base), (2, appended), (3, corrupted),
            (4, hx("blob-b")), (5, hx("blob-c"))]
    media = spark.createDataFrame(rows, "doc_id long, payload_hex string")
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard_ppm"]
             for r in payload_neardup_pairs(media, j_ppm=600000).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 800000
    assert (1, 3) in pairs  # 4-byte grams around one bad byte drop out
    for p in pairs:
        assert 4 not in p and 5 not in p


def test_multimodal_neardup_gated_planted_truth(spark):
    """Gated corpus: exactly the 50 planted (orig, orig+500000) pairs
    at sf0.001 — byte-gram blocking adds no md5-collision false
    positives and the exact-Jaccard verify keeps every planted pair."""
    from jsonld_js_spark.operators.multimodal import q_multimodal_neardup
    got = {(r["doc_a"], r["doc_b"])
           for r in q_multimodal_neardup(
               spark, "/root/testdata/sf0.001").collect()}
    assert got and all(b == a + 500000 for a, b in got)
    assert all(a % 10 == 0 for a, _ in got)


def test_line_dedup_scrub_exact_planted(spark):
    """Hand-built corpus with a known boilerplate line: exact removal
    accounting and byte-exact kept-text hash (the excision contract,
    not just counts)."""
    from jsonld_js_spark.operators.dedup import (
        hash60, line_dedup_stats)

    boiler = "cookie notice accept all"
    docs = spark.createDataFrame(
        [(1, f"{boiler}\nalpha beta\ngamma delta"),
         (2, f"{boiler}\nepsilon zeta"),
         (3, f"eta theta\n{boiler}"),
         (4, "iota kappa\nlambda mu")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in line_dedup_stats(docs).collect()}
    # boiler appears in 3 docs -> removed from each; unique lines stay
    assert rows[1]["n_lines"] == 3 and rows[1]["n_removed"] == 1
    assert rows[1]["tokens_removed"] == 4
    assert rows[2]["n_removed"] == 1 and rows[3]["n_removed"] == 1
    assert rows[4]["n_removed"] == 0 and rows[4]["tokens_removed"] == 0
    # kept text is the original minus the boiler line, order preserved
    expect = {1: "alpha beta\ngamma delta", 2: "epsilon zeta",
              3: "eta theta", 4: "iota kappa\nlambda mu"}
    got_hash = {d: rows[d]["kept_hash"] for d in expect}
    want = spark.createDataFrame(
        [(d, t) for d, t in expect.items()], "doc_id long, t string") \
        .select("doc_id", hash60(F.col("t")).alias("h")).collect()
    assert got_hash == {r["doc_id"]: r["h"] for r in want}


def test_line_dedup_threshold_boundary(spark):
    """A line in exactly LINE_MIN_DOCS-1 docs survives; at
    LINE_MIN_DOCS it is removed (>= semantics)."""
    from jsonld_js_spark.operators.dedup import (
        LINE_MIN_DOCS, line_dedup_stats)

    below = "seen twice only"
    at = "seen exactly thrice"
    rows = [(i, f"{below}\nuniq{i}") for i in range(LINE_MIN_DOCS - 1)]
    rows += [(100 + i, f"{at}\nuniq{100 + i}")
             for i in range(LINE_MIN_DOCS)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["n_removed"]
           for r in line_dedup_stats(docs).collect()}
    assert all(out[i] == 0 for i in range(LINE_MIN_DOCS - 1))
    assert all(out[100 + i] == 1 for i in range(LINE_MIN_DOCS))


def test_multimodal_real_decode_roundtrip(spark):
    """The REAL stdlib decoders verified against stdlib-WRITTEN media:
    a WAV authored by wave.Wave_write round-trips through _decode_wav
    with exact sample features; a hand-built P6 PPM with known pixels
    round-trips through _decode_ppm; truncated containers raise."""
    import io
    import struct
    import wave

    import pytest

    from jsonld_js_spark.operators.multimodal import (
        _decode_ppm, _decode_wav,
    )

    samples = [0, 1, -1, 32767, -32768, 1234, -4321]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    n, rate, dur, sum_abs = _decode_wav(buf.getvalue())
    assert (n, rate) == (len(samples), 8000)
    assert dur == len(samples) * 1_000_000 // 8000
    assert sum_abs == sum(abs(s) for s in samples)

    px = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    ppm = b"P6\n2 2\n255\n" + px
    w, h, sr, sg, sb = _decode_ppm(ppm)
    assert (w, h) == (2, 2)
    assert (sr, sg, sb) == (sum(px[0::3]), sum(px[1::3]), sum(px[2::3]))

    with pytest.raises(ValueError):
        _decode_ppm(b"P6\n2 2\n255\n" + px[:-1])  # truncated pixels
    with pytest.raises(Exception):
        _decode_wav(b"RIFF\x00\x00\x00\x00WAVEjunk")  # bad chunks


def test_multimodal_real_media_df_is_decodable(spark):
    """Every synthesized payload is a VALID container: the real
    decoders parse all of them and dimensions match the generators'
    arithmetic."""
    from jsonld_js_spark.operators.multimodal import (
        _decode_ppm, _decode_wav, media_real_df,
    )
    import duckdb
    import os
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        import pytest
        pytest.skip("testdata missing")
    rows = media_real_df(spark, sf_dir).collect()
    assert rows
    for r in rows:
        b = bytes(r.payload)
        if r.doc_id % 2 == 0:
            w, h, *_ = _decode_ppm(b)
            assert w == 3 + r.doc_id % 7 and h == 3 + (r.doc_id * 5) % 7
        else:
            n, rate, _, _ = _decode_wav(b)
            assert n == 4 + r.doc_id % 13 and rate == 8000


def test_multimodal_resize_nearest_neighbor_exact(spark):
    """The numpy resize path equals a per-pixel pure-Python nearest-
    neighbor reference on the real gated corpus, and the emitted hex
    buffer is the exact resized image (sums re-derivable from it)."""
    import os

    import pytest

    from jsonld_js_spark.operators.multimodal import (
        RESIZE_OUT, _parse_ppm, media_real_df, q_multimodal_resize,
    )
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        pytest.skip("testdata missing")
    payloads = {r.doc_id: bytes(r.payload)
                for r in media_real_df(spark, sf_dir)
                .filter("doc_id % 2 = 0").collect()}
    out = q_multimodal_resize(spark, sf_dir).collect()
    assert {r.doc_id for r in out} == set(payloads)
    for r in out:
        w, h, px = _parse_ppm(payloads[r.doc_id])
        assert (r.src_w, r.src_h) == (w, h)
        assert (r.out_w, r.out_h) == (RESIZE_OUT, RESIZE_OUT)
        ref = bytearray()
        for y in range(RESIZE_OUT):
            for x in range(RESIZE_OUT):
                k = ((y * h) // RESIZE_OUT) * w + (x * w) // RESIZE_OUT
                ref += px[3 * k:3 * k + 3]
        assert r.resized_hex == bytes(ref).hex()
        assert r.sum_r == sum(ref[0::3])
        assert r.sum_g == sum(ref[1::3])
        assert r.sum_b == sum(ref[2::3])


def test_multimodal_audio_features_hand_truth(spark):
    """Gated audio features vs a pure-Python recompute from the
    decoded samples of every synthesized WAV (independent of both the
    numpy kernel and the oracle hex arithmetic)."""
    import io
    import os
    import struct
    import wave

    import pytest

    from jsonld_js_spark.operators.multimodal import (
        media_real_df, q_multimodal_audio_features,
    )
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        pytest.skip("testdata missing")
    payloads = {r.doc_id: bytes(r.payload)
                for r in media_real_df(spark, sf_dir)
                .filter("doc_id % 2 = 1").collect()}
    out = q_multimodal_audio_features(spark, sf_dir).collect()
    assert {r.doc_id for r in out} == set(payloads)
    for r in out:
        with wave.open(io.BytesIO(payloads[r.doc_id])) as wf:
            n = wf.getnframes()
            s = struct.unpack(f"<{n}h", wf.readframes(n))
        assert r.n_samples == n and r.sample_rate == 8000
        assert r.sum_sq == sum(v * v for v in s)
        assert r.zero_crossings == sum(
            1 for a, b in zip(s, s[1:]) if (a >= 0) != (b >= 0))
        assert r.peak_abs == max(abs(v) for v in s)


def _dhash_py(w, h, px):
    """Independent pure-Python dHash (no numpy) for planted truths."""
    def gray(y, x):
        k = ((y * h) // 8) * w + (x * w) // 9
        return px[3 * k] + px[3 * k + 1] + px[3 * k + 2]
    bits = [1 if gray(y, x) > gray(y, x + 1) else 0
            for y in range(8) for x in range(8)]
    return "".join(format(bits[4 * j] * 8 + bits[4 * j + 1] * 4
                          + bits[4 * j + 2] * 2 + bits[4 * j + 3], "x")
                   for j in range(16))


def test_multimodal_phash_matches_pure_python(spark):
    """The numpy dHash kernel over really-decoded PPMs equals an
    independent loop-and-index reference on the gated corpus."""
    import os

    import pytest

    from jsonld_js_spark.operators.multimodal import (
        _parse_ppm, media_phash_df, q_multimodal_phash,
    )
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        pytest.skip("testdata missing")
    payloads = {r.doc_id: bytes(r.payload)
                for r in media_phash_df(spark, sf_dir).collect()}
    out = q_multimodal_phash(spark, sf_dir).collect()
    assert {r.doc_id for r in out} == set(payloads)
    assert len(out) > 0
    for r in out:
        w, h, px = _parse_ppm(payloads[r.doc_id])
        assert (r.width, r.height) == (w, h)
        assert r.phash_hex == _dhash_py(w, h, px)


def test_multimodal_phash_neardup_planted_truth(spark):
    """Planted near-duplicates (one perturbed pixel per anchor-group
    member) are all recovered at small Hamming distance; the reported
    distances equal an independent popcount; heavy corruption (a
    different anchor) never pairs with the group."""
    import os

    import pytest

    from jsonld_js_spark.operators.multimodal import (
        PHASH_GROUP, PHASH_HAM_T, q_multimodal_phash,
        q_multimodal_phash_neardup,
    )
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        pytest.skip("testdata missing")
    hashes = {r.doc_id: r.phash_hex
              for r in q_multimodal_phash(spark, sf_dir).collect()}
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in q_multimodal_phash_neardup(spark, sf_dir).collect()}
    ids = sorted(hashes)

    def ham(a, b):
        return sum(bin(int(x, 16) ^ int(y, 16)).count("1")
                   for x, y in zip(hashes[a], hashes[b]))

    # every within-group pair whose distance clears the contract must
    # be reported, and with the exact popcount distance
    n_within = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            same_group = a - (a % PHASH_GROUP) == b - (b % PHASH_GROUP)
            d = ham(a, b)
            bands_a = [hashes[a][4 * i:4 * i + 4] for i in range(4)]
            bands_b = [hashes[b][4 * i:4 * i + 4] for i in range(4)]
            contract = d <= PHASH_HAM_T and any(
                x == y for x, y in zip(bands_a, bands_b))
            assert ((a, b) in pairs) == contract
            if (a, b) in pairs:
                assert pairs[(a, b)] == d
            if same_group:
                n_within += 1
                assert d <= PHASH_HAM_T  # planted perturbation is small
    assert n_within > 0 and len(pairs) >= n_within
