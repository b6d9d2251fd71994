"""BPE merge learning: Spark vs an independently-written pure-Python
reference of the SAME documented contract (word-frequency BPE,
two-pass replace merge application), plus planted-truth and
degenerate-input cases. The DuckDB oracle is exercised separately by
tools/check_oracles.py; a shared-defect drift would also fail here
(the oracle-gate-blind-spots lesson)."""
from __future__ import annotations

import random
import re
from collections import Counter

from jsonld_js_spark.operators.bpe import bpe_merges


def ref_bpe(texts, k):
    """Reference BPE per the operator contract, written over plain
    dicts (no Spark, no SQL)."""
    vocab = Counter()
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            vocab[" ".join(w) + " </w>"] += 1
    v = dict(vocab)
    merges = []
    for rank in range(1, k + 1):
        pc = Counter()
        for sym, cnt in v.items():
            toks = sym.split(" ")
            for i in range(len(toks) - 1):
                pc[(toks[i], toks[i + 1])] += cnt
        if not pc:
            break
        (a, b), c = min(pc.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, c))
        if rank < k:
            pat, rep = f" {a} {b} ", f" {a}{b} "
            nv = {}
            for sym, cnt in v.items():
                s = f" {sym} ".replace(pat, rep).replace(pat, rep).strip()
                nv[s] = nv.get(s, 0) + cnt
            v = nv
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_bpe_matches_reference_random_corpus(spark):
    rng = random.Random(411)
    alphabet = "aabbcde"
    texts = []
    for _ in range(60):
        words = ["".join(rng.choice(alphabet)
                         for _ in range(rng.randint(1, 7)))
                 for _ in range(rng.randint(3, 25))]
        texts.append(" ".join(words) + (" 42!" if rng.random() < 0.3
                                        else ""))
    got = [tuple(r) for r in
           bpe_merges(_docs(spark, texts), 8).collect()]
    assert got == ref_bpe(texts, 8)


def test_bpe_planted_dominant_pair(spark):
    # 'th' occurs in every word of every doc and nowhere else a pair
    # comes close -> first merge must be (t, h)
    texts = ["the this that throb myth " * 3] * 10 + ["zq xv"]
    rows = bpe_merges(_docs(spark, texts), 3).collect()
    assert (rows[0]["left_sym"], rows[0]["right_sym"]) == ("t", "h")
    assert rows[0]["merge_rank"] == 1
    # counts are exact: 'th' appears once per word x 5 words x 3
    # repeats x 10 docs = 150 (myth contributes 'th' too)
    assert rows[0]["pair_count"] == 150
    assert [r["merge_rank"] for r in rows] == [1, 2, 3]


def test_bpe_merged_symbol_participates_in_later_rounds(spark):
    # the=20, thee=5. Round 1: (t,h)=(h,e)=(e,</w>)=25 tie -> ascending
    # (a,b) tie-break picks (e,</w>). Round 2: (t,h)=25 wins. Round 3
    # works on syms 'th e</w>' (20) and 'th e e</w>' (5): the winning
    # pair (th, e</w>)=20 has MERGED symbols on both sides — proving
    # later rounds re-pair over the updated vocab, not the chars.
    texts = ["the the the the thee"] * 5
    rows = [tuple(r) for r in bpe_merges(_docs(spark, texts), 3).collect()]
    assert rows == [(1, "e", "</w>", 25), (2, "t", "h", 25),
                    (3, "th", "e</w>", 20)]
    assert rows == ref_bpe(texts, 3)


def test_bpe_no_letters_yields_empty(spark):
    texts = ["12345 !!!", "   ", "42 42 42"]
    assert bpe_merges(_docs(spark, texts), 4).collect() == []


def test_bpe_single_char_words_stop_early(spark):
    # vocab 'a </w>' has exactly one pair; after merging (a, </w>)
    # there are no pairs left -> exactly one merge row
    texts = ["a a a a"]
    rows = [tuple(r) for r in bpe_merges(_docs(spark, texts), 5).collect()]
    assert rows == [(1, "a", "</w>", 4)]
    assert rows == ref_bpe(texts, 5)


def ref_tokenize_counts(texts, merges):
    out = []
    for t in texts:
        n = 0
        for w in re.findall("[a-z]+", t.lower()):
            s = " " + " ".join(w) + " </w> "
            for _, a, b, _c in merges:
                pat, rep = f" {a} {b} ", f" {a}{b} "
                s = s.replace(pat, rep).replace(pat, rep)
            n += len(s.strip().split(" "))
        out.append(n)
    return out


def test_bpe_tokenize_matches_reference(spark):
    from jsonld_js_spark.operators.bpe import (bpe_merges,
                                               bpe_tokenize_counts)
    rng = random.Random(733)
    texts = []
    for _ in range(40):
        words = ["".join(rng.choice("aabbcd")
                         for _ in range(rng.randint(1, 6)))
                 for _ in range(rng.randint(0, 20))]
        texts.append(" ".join(words))
    docs = _docs(spark, texts)
    merges = [tuple(r) for r in bpe_merges(docs, 5).collect()]
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_tokenize_counts(docs, merges).collect()}
    want = ref_tokenize_counts(texts, ref_bpe(texts, 5))
    assert got == {i: n for i, n in enumerate(want)}


def test_bpe_tokenize_fewer_tokens_than_chars(spark):
    # merges only ever shrink the symbol count; every doc's BPE count
    # is <= letters + words (the unmerged ceiling) and >= n_words
    from jsonld_js_spark.operators.bpe import (bpe_merges,
                                               bpe_tokenize_counts)
    texts = ["the cat and the hat sat on the mat"] * 3
    docs = _docs(spark, texts)
    merges = [tuple(r) for r in bpe_merges(docs, 6).collect()]
    rows = bpe_tokenize_counts(docs, merges).collect()
    words = re.findall("[a-z]+", texts[0])
    ceiling = sum(len(w) + 1 for w in words)
    for r in rows:
        assert len(words) <= r["n_bpe_tokens"] < ceiling


def _synth_rules(k, seed=7, max_sym_len=8):
    """Deterministic compositional rule generator for scale tests:
    start from the alphabet, repeatedly merge two existing symbols
    (seeded), growing a realistic rank-ordered vocabulary of k rules —
    no Spark learning loop needed."""
    rng = random.Random(seed)
    pool = list("abcdefghijklmnopqrstuvwxyz") + ["</w>"]
    rules, seen = [], set()
    while len(rules) < k:
        a, b = rng.choice(pool), rng.choice(pool)
        if len(a) + len(b) > max_sym_len or (a, b) in seen:
            continue
        seen.add((a, b))
        rules.append((len(rules) + 1, a, b, 0))
        pool.append(a + b)
    return rules


def test_bpe_tokenize_scale_path_matches_column_path(spark):
    # the vectorized/kernel-parity pattern: both appliers must emit
    # identical counts for the same learned rules
    from jsonld_js_spark.operators.bpe import (bpe_merges,
                                               bpe_tokenize_counts,
                                               bpe_tokenize_counts_scale)
    rng = random.Random(911)
    texts = []
    for _ in range(50):
        words = ["".join(rng.choice("aabbccde")
                         for _ in range(rng.randint(1, 8)))
                 for _ in range(rng.randint(0, 30))]
        texts.append(" ".join(words) + (" Zig 7!" if rng.random() < 0.2
                                        else ""))
    docs = _docs(spark, texts)
    merges = [tuple(r) for r in bpe_merges(docs, 6).collect()]
    col = [tuple(r) for r in bpe_tokenize_counts(docs, merges).collect()]
    scl = [tuple(r) for r in
           bpe_tokenize_counts_scale(docs, merges).collect()]
    assert col == scl
    assert scl == [(i, n) for i, n in
                   enumerate(ref_tokenize_counts(texts, merges))]


def test_bpe_tokenize_scale_path_large_k_matches_reference(spark):
    # 300 synthetic rules: far past the column-expr dispatch threshold;
    # the mapInPandas applier must plan instantly and match the pure-
    # Python two-pass contract exactly (incl. multi-char symbol rules)
    from jsonld_js_spark.operators.bpe import (SCALE_K_THRESHOLD,
                                               bpe_tokenize_counts,
                                               bpe_tokenize_counts_scale)
    rules = _synth_rules(300)
    assert len(rules) > SCALE_K_THRESHOLD
    rng = random.Random(137)
    texts = [" ".join("".join(rng.choice("abcde")
                              for _ in range(rng.randint(1, 9)))
                      for _ in range(rng.randint(1, 15)))
             for _ in range(30)] + ["", "999 ??"]
    docs = _docs(spark, texts)
    want = ref_tokenize_counts(texts, rules)
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_tokenize_counts_scale(docs, rules).collect()}
    assert got == {i: n for i, n in enumerate(want)}
    # the dispatching wrapper must route large K to the scale path
    # (identical result, no 600-deep replace chain in the plan)
    got2 = {r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_tokenize_counts(docs, rules).collect()}
    assert got2 == got


def test_bpe_tokenize_scale_null_and_empty_text(spark):
    from jsonld_js_spark.operators.bpe import bpe_tokenize_counts_scale
    docs = spark.createDataFrame(
        [(0, "the cat"), (1, None), (2, ""), (3, "THE")],
        "doc_id long, text string")
    rules = [(1, "t", "h", 0), (2, "th", "e</w>", 0),
             (3, "e", "</w>", 0)]
    rows = {r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_tokenize_counts_scale(docs, rules).collect()}
    # "the": ' t h e </w> ' -> rule1 -> ' th e </w> ' -> rule2 (needs
    # 'e</w>' symbol, absent) -> rule3 -> ' th e</w> ' = 2 tokens
    # "cat": no rule applies -> c a t </w> = 4
    assert rows == {0: 6, 1: 0, 2: 0, 3: 2}


def ref_tokens(texts, merges):
    """Per-doc BPE token sequences under the learned rules (pure
    Python, the two-pass-replace contract)."""
    out = {}
    for doc_id, t in enumerate(texts):
        toks = []
        for w in re.findall("[a-z]+", t.lower()):
            s = " " + " ".join(w) + " </w> "
            for _, a, b, _c in merges:
                pat, rep = f" {a} {b} ", f" {a}{b} "
                s = s.replace(pat, rep).replace(pat, rep)
            toks.extend(s.strip().split(" "))
        out[doc_id] = toks
    return out


def test_bpe_chunks_match_reference(spark):
    """Chunk rows equal the pure-Python reference: window extents,
    clamped tails, and the portable 60-bit hash of each window."""
    import hashlib

    from jsonld_js_spark.operators.bpe import bpe_chunk_rows_scale

    rng = random.Random(515)
    texts = []
    for _ in range(40):
        words = ["".join(rng.choice("aabbcde")
                         for _ in range(rng.randint(1, 7)))
                 for _ in range(rng.randint(0, 30))]
        texts.append(" ".join(words))
    texts += ["", "12345 !!", "a", "aaaa " * 50]
    d = _docs(spark, texts)
    merges = [tuple(r) for r in bpe_merges(d).collect()]
    C, S = 7, 5  # small windows so multi-chunk docs are common
    got = {(r.doc_id, r.chunk_idx): (r.n_chunk_tokens, r.chunk_hash)
           for r in bpe_chunk_rows_scale(d, merges, C, S).collect()}
    want = {}
    for doc_id, toks in ref_tokens(texts, merges).items():
        if not toks:
            continue
        for i in range((len(toks) - 1) // S + 1):
            seg = toks[i * S: i * S + C]
            want[(doc_id, i)] = (
                len(seg),
                int(hashlib.md5(" ".join(seg).encode())
                    .hexdigest()[:15], 16))
    assert got == want
    # every document with tokens is fully tiled: chunk 0 starts at
    # token 0 and consecutive starts advance by exactly the stride
    n_chunks = Counter(k[0] for k in got)
    for doc_id, toks in ref_tokens(texts, merges).items():
        expect = 0 if not toks else (len(toks) - 1) // S + 1
        assert n_chunks.get(doc_id, 0) == expect
