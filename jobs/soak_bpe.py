"""BPE-family soak: merge learning + tokenizer application at N and
4N documents with CLOSED-FORM planted truth.

Corpus (deterministic in-engine synthesis): doc d holds K=40 words at
positions j=0..K-1; position word id is

    wid(d, j) = (d*K + j) % 5000        (uniform tail)
    wid(d, j) = ((d*K + j) % 5000) % 50  when j % 3 == 0 (hot head)

so word frequencies are exactly computable in pure Python (a skewed
two-tier distribution — any count-proportionality bug in the
distributed pair aggregation shows up immediately, unlike a uniform
corpus where every pair ties). Words are base-4 'abcd' encodings, so
the pair space is dense and merges chain onto merged symbols.

Planted-truth assertions (all EXACT, derived from the closed-form
Counter via the contract reference implementation in
tests/test_bpe.py — never from the engine):
  1. the engine's K-merge table equals the reference merge table at
     BOTH corpus sizes;
  2. N*K is a multiple of 15000 at both sizes, so every word count at
     4N is exactly 4x its N count -> the 4N merge table must be the N
     table with pair_count*4, asserted directly (scale-equivariance);
  3. vocab_bpe_tokenize's total token count equals the closed form
     sum(count_w * len(ref_tokenize(w))), and per-doc counts equal the
     per-doc closed form at the small size.

Wall/RSS recorded per stage; the learn stage's corpus-scale pass and
the tokenize pass should grow ~linearly with N while the iteration
tail stays flat (vocab is CONSTANT at 5000 words at both sizes).

Usage: python jobs/soak_bpe.py [n_small=48000] [factor=4]
(n_small must be a multiple of 375: the hot/tail position pattern has
period lcm(3*K, VOCAB)=15000 words, so exact 4x count equivariance
needs n*K % 15000 == 0). One JSON line per size + a summary line.
"""
from __future__ import annotations

import json
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

K = 40
VOCAB = 5000
HOT = 50
N_MERGES = 8


def encode(i: int) -> str:
    s = ""
    for _ in range(7):
        s = "abcd"[i % 4] + s
        i //= 4
    return "x" + s


def wid(d: int, j: int) -> int:
    w = (d * K + j) % VOCAB
    return w % HOT if j % 3 == 0 else w


def closed_form_counts(n_docs: int) -> Counter:
    c = Counter()
    for d in range(n_docs):
        base = d * K
        for j in range(0, K, 3):
            c[(base + j) % VOCAB % HOT] += 1
        for j in range(K):
            if j % 3:
                c[(base + j) % VOCAB] += 1
    return Counter({encode(i): n for i, n in c.items()})


def ref_bpe_from_counts(vocab_counts: Counter, k: int):
    """Contract reference over a word-frequency map (same algorithm as
    tests/test_bpe.py::ref_bpe, lifted to counts)."""
    v = {" ".join(w) + " </w>": n for w, n in vocab_counts.items()}
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


def ref_tokenize_word(word: str, merges) -> int:
    s = " " + " ".join(word) + " </w> "
    for _, a, b, _c in merges:
        pat, rep = f" {a} {b} ", f" {a}{b} "
        s = s.replace(pat, rep).replace(pat, rep)
    return len(s.strip().split(" "))


def synth_docs(spark, n_docs: int):
    vdf = spark.createDataFrame(
        [(i, encode(i)) for i in range(VOCAB)], "wid long, word string")
    pos = (spark.range(n_docs).select(F.col("id").alias("doc_id"))
           .select("doc_id", F.explode(
               F.sequence(F.lit(0), F.lit(K - 1))).alias("j")))
    pos = pos.withColumn(
        "wid",
        F.when(F.col("j") % 3 == 0,
               (F.col("doc_id") * K + F.col("j")) % VOCAB % HOT)
        .otherwise((F.col("doc_id") * K + F.col("j")) % VOCAB))
    return (pos.join(F.broadcast(vdf), "wid")
            .groupBy("doc_id")
            .agg(F.concat_ws(" ", F.transform(
                F.sort_array(F.collect_list(F.struct("j", "word"))),
                lambda s: s["word"])).alias("text")))


def _jvm_peak_rss_gib():
    best = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as f:
                if "java" not in f.read():
                    continue
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM:"):
                        best = max(best, int(line.split()[1]))
        except OSError:
            continue
    return round(best / (1024 * 1024), 2)


def run_one(spark, n_docs: int, truth_small=None) -> dict:
    from jsonld_js_spark.operators.bpe import bpe_merges, bpe_tokenize_counts

    assert (n_docs * K) % (3 * VOCAB) == 0, \
        "n_docs must be a multiple of 375 (full hot/tail period)"
    docs = synth_docs(spark, n_docs).localCheckpoint()
    rec = {"n_docs": n_docs, "n_words": n_docs * K}

    counts = closed_form_counts(n_docs)
    truth = ref_bpe_from_counts(counts, N_MERGES)

    t0 = time.time()
    got = [tuple(r) for r in bpe_merges(docs, N_MERGES).collect()]
    rec["wall_learn_s"] = round(time.time() - t0, 1)
    rec["merges_match_closed_form"] = got == truth
    if truth_small is not None:
        rec["merges_scale_equivariant"] = (
            got == [(r, a, b, 4 * c) for r, a, b, c in truth_small])

    t0 = time.time()
    tok = bpe_tokenize_counts(docs, got)
    total = tok.agg(F.sum("n_bpe_tokens").alias("t")).collect()[0]["t"]
    rec["wall_tokenize_s"] = round(time.time() - t0, 1)
    expect_total = sum(n * ref_tokenize_word(w, truth)
                       for w, n in counts.items())
    rec["tokenize_total"] = int(total)
    rec["tokenize_total_match"] = int(total) == expect_total

    if n_docs <= 60000:  # exact per-doc truth at the small size
        per_word_tok = {w: ref_tokenize_word(w, truth) for w in counts}
        exp = {}
        for d in range(n_docs):
            exp[d] = sum(per_word_tok[encode(wid(d, j))] for j in range(K))
        got_per_doc = {r["doc_id"]: r["n_bpe_tokens"]
                       for r in tok.collect()}
        rec["tokenize_per_doc_match"] = got_per_doc == exp

    rec["peak_jvm_rss_gib"] = _jvm_peak_rss_gib()
    print(json.dumps(rec), flush=True)
    return rec, truth


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 48000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = (SparkSession.builder.master("local[32]")
             .appName("soak_bpe")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    small, truth_small = run_one(spark, n_small)
    large, _ = run_one(spark, n_small * factor,
                       truth_small=ref_bpe_from_counts(
                           closed_form_counts(n_small), N_MERGES))
    ok = all([small["merges_match_closed_form"],
              small["tokenize_total_match"],
              small.get("tokenize_per_doc_match", True),
              large["merges_match_closed_form"],
              large["merges_scale_equivariant"],
              large["tokenize_total_match"]])
    print(json.dumps({
        "summary": "bpe_soak",
        "ok": ok,
        "learn_wall_ratio": round(
            large["wall_learn_s"] / max(small["wall_learn_s"], 0.1), 2),
        "tokenize_wall_ratio": round(
            large["wall_tokenize_s"] /
            max(small["wall_tokenize_s"], 0.1), 2),
        "factor": factor}), flush=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
