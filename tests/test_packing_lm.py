"""Independent ground-truth tests for sequence packing, token-budget
sampling, and bigram-LM scoring.

The oracle gate proves Spark == DuckDB; these tests prove both match a
THIRD implementation (pure Python / hand arithmetic) — the
planted-truth discipline from BENCH/SOAK_DEDUP_r3.md: an equality gate
cannot see a defect shared by both sides.
"""
from __future__ import annotations

import hashlib
import re

from jsonld_js_spark.operators.lm import PPM, q_text_lm_score
from jsonld_js_spark.operators.packing import (
    BUDGET_DEFAULT, BUDGET_SALT, LANG_BUDGETS, N_BUCKETS, PACK_SALT,
    SEQ_LEN, q_corpus_pack_sequences, q_corpus_token_budget_sample,
)

SF = "/root/testdata/sf0.001"


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.strip().lower()).split(" ")


def _py_docs(spark):
    return [(r["doc_id"], r["lang"], len(_py_tokens(r["text"])))
            for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "lang", "text").collect()]


def test_pack_offsets_match_pure_python(spark):
    """Recompute the whole packing layout in pure Python (hashlib md5
    order + cumsum) and require byte-identical offsets and pack ids."""
    docs = _py_docs(spark)
    keyed = sorted(
        ((h := _py_hash60(f"{PACK_SALT}{d}")) % N_BUCKETS, h, d, n)
        for d, _, n in docs)
    truth, cum = {}, 0
    for _, _, d, n in keyed:
        truth[d] = (n, cum, cum // SEQ_LEN, (cum + n - 1) // SEQ_LEN)
        cum += n
    out = {r["doc_id"]: r for r in
           q_corpus_pack_sequences(spark, SF).collect()}
    assert set(out) == set(truth)
    for d, (n, off, pf, pl) in truth.items():
        r = out[d]
        assert (r["n_tokens"], r["tok_offset"], r["pack_first"],
                r["pack_last"]) == (n, off, pf, pl), d
        assert r["packs_spanned"] == pl - pf + 1
    # the layout tiles the token axis exactly: offsets are a perfect
    # prefix sum (no gap, no overlap), total mass preserved
    assert sorted(off for _, off, _, _ in truth.values())[0] == 0
    assert cum == sum(n for n, _, _, _ in truth.values())


def test_pack_bpe_offsets_match_pure_python(spark):
    """BPE-count packing recomputed end-to-end in pure Python: learn
    the merge chain with the engine (fixture-verified elsewhere),
    apply it with the two-pass contract reference, lay out the axis
    with hashlib md5 order. Zero-token docs must be absent."""
    from jsonld_js_spark.operators.bpe import bpe_merges
    from jsonld_js_spark.operators.packing import (
        q_corpus_pack_sequences_bpe)
    rows = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").collect())
    rules = [tuple(r) for r in bpe_merges(
        spark.read.parquet(f"{SF}/documents.parquet")).collect()]
    # two-pass contract reference (tests/test_bpe.py::ref_tokenize_counts)
    import re as _re
    counts = {}
    for r in rows:
        n = 0
        for w in _re.findall("[a-z]+", r["text"].lower()):
            s = " " + " ".join(w) + " </w> "
            for _, a, b, _c in rules:
                pat, rep = f" {a} {b} ", f" {a}{b} "
                s = s.replace(pat, rep).replace(pat, rep)
            n += len(s.strip().split(" "))
        counts[r["doc_id"]] = n
    keyed = sorted(
        ((h := _py_hash60(f"{PACK_SALT}{d}")) % N_BUCKETS, h, d, n)
        for d, n in counts.items() if n > 0)
    truth, cum = {}, 0
    for _, _, d, n in keyed:
        truth[d] = (n, cum, cum // SEQ_LEN, (cum + n - 1) // SEQ_LEN)
        cum += n
    out = {r["doc_id"]: r for r in
           q_corpus_pack_sequences_bpe(spark, SF).collect()}
    assert set(out) == set(truth)  # zero-token docs excluded exactly
    for d, (n, off, pf, pl) in truth.items():
        r = out[d]
        assert (r["n_tokens"], r["tok_offset"], r["pack_first"],
                r["pack_last"], r["packs_spanned"]) == \
            (n, off, pf, pl, pl - pf + 1), d


def test_budget_sample_bpe_matches_pure_python(spark):
    """BPE-count budget sampling recomputed in pure Python: the kept
    set must be the per-language hash-order prefix under each budget,
    with token mass from the two-pass BPE contract reference."""
    from jsonld_js_spark.operators.bpe import bpe_merges
    from jsonld_js_spark.operators.packing import (
        q_corpus_token_budget_sample_bpe)
    rows = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "lang", "text").collect())
    rules = [tuple(r) for r in bpe_merges(
        spark.read.parquet(f"{SF}/documents.parquet")).collect()]
    import re as _re
    by_lang: dict[str, list] = {}
    for r in rows:
        n = 0
        for w in _re.findall("[a-z]+", r["text"].lower()):
            s = " " + " ".join(w) + " </w> "
            for _, a, b, _c in rules:
                pat, rep = f" {a} {b} ", f" {a}{b} "
                s = s.replace(pat, rep).replace(pat, rep)
            n += len(s.strip().split(" "))
        h = _py_hash60(f"{BUDGET_SALT}{r['doc_id']}")
        by_lang.setdefault(r["lang"], []).append(
            (h % N_BUCKETS, h, r["doc_id"], n))
    truth = {}
    for lang, lrows in by_lang.items():
        budget = LANG_BUDGETS.get(lang, BUDGET_DEFAULT)
        cum = 0
        for _, _, d, n in sorted(lrows):
            if cum < budget:
                truth[d] = (lang, n, cum)
            cum += n
    out = {r["doc_id"]: (r["lang"], r["n_tokens"], r["lang_tok_offset"])
           for r in q_corpus_token_budget_sample_bpe(spark, SF).collect()}
    assert out == truth


def test_budget_sample_matches_pure_python(spark):
    """The kept set must be exactly the per-language hash-order prefix
    under each budget — recomputed independently."""
    docs = _py_docs(spark)
    by_lang: dict[str, list] = {}
    for d, lang, n in docs:
        h = _py_hash60(f"{BUDGET_SALT}{d}")
        by_lang.setdefault(lang, []).append((h % N_BUCKETS, h, d, n))
    truth = {}
    for lang, rows in by_lang.items():
        budget = LANG_BUDGETS.get(lang, BUDGET_DEFAULT)
        cum = 0
        for _, _, d, n in sorted(rows):
            if cum < budget:
                truth[d] = (lang, n, cum)
            cum += n
    out = {r["doc_id"]: (r["lang"], r["n_tokens"], r["lang_tok_offset"])
           for r in q_corpus_token_budget_sample(spark, SF).collect()}
    assert out == truth
    # the budget actually binds for at least one language and is
    # non-binding for at least one (both paths exercised)
    kept_langs = {v[0] for v in truth.values()}
    all_langs = {lang for _, lang, _ in docs}
    binding = {lang for lang in all_langs
               if sum(n for d, lg, n in docs if lg == lang)
               > LANG_BUDGETS.get(lang, BUDGET_DEFAULT)}
    assert binding and binding != all_langs
    assert kept_langs == all_langs  # every language keeps its prefix


def _write_mini_corpus(spark, tmp_path, texts):
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars int")
    path = str(tmp_path / "mini")
    df.coalesce(1).write.parquet(f"{path}/documents.parquet")
    return path


def test_lm_score_hand_truth(spark, tmp_path):
    """Hand-computed bigram model on a four-doc corpus."""
    path = _write_mini_corpus(
        spark, tmp_path, ["a b", "a b", "a c", "b a b", "z"])
    # bigrams: d0 [a b], d1 [a b], d2 [a c], d3 [b a, a b]
    # model: c(a b)=3 c(a c)=1 c(b a)=1 ; c1(a)=4 c1(b)=1
    # d0,d1: floor(3e6/4)=750000 ; d2: floor(1e6/4)=250000
    # d3: (floor(1e6/1) + floor(3e6/4)) div 2 = (1000000+750000)//2
    # d4 "z": single token -> no row
    out = {r["doc_id"]: (r["n_bigrams"], r["score_ppm"])
           for r in q_text_lm_score(spark, path).collect()}
    assert out == {0: (1, 750000), 1: (1, 750000), 2: (1, 250000),
                   3: (2, 875000)}


def test_lm_score_ranks_fluent_above_gibberish(spark, tmp_path):
    """A document made of the corpus's dominant transitions must
    outscore a shuffled document taking rare transitions out of the
    same (common) head words. NB a doc of globally-unique tokens is
    NOT low-scoring under a transition model (its heads have exactly
    one continuation) — the discriminating signal is word-salad over
    a shared vocabulary, which is the distribution web-crawl noise
    actually has."""
    common = " ".join(["the cat sat"] * 20)
    texts = [common] * 9 + [" ".join(["sat cat the"] * 5)]
    path = _write_mini_corpus(spark, tmp_path, texts)
    out = {r["doc_id"]: r["score_ppm"]
           for r in q_text_lm_score(spark, path).collect()}
    assert min(out[i] for i in range(9)) > 30 * out[9]
    # every ppm is a valid probability in ppm
    assert all(0 < v <= PPM for v in out.values())
