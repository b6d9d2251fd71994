"""Packing / token-budget / LM-score soak: the round-4 operators at
4x corpus with CLOSED-FORM planted ground truth (the SOAK_DEDUP
discipline — the sf0.01 equality gate cannot see a defect shared by
the Spark and DuckDB implementations; a third, pure-Python derivation
of every expected value can).

Corpus (deterministic in-engine synthesis, written as parquet so the
gated operators run their real input path): doc d is k(d) repetitions
of a 3-token pattern, k(d) = 20 + (d*7919 mod 34), so
n_tokens(d) = 3*k(d) is a closed form no engine computes.
  - fluent docs (d % 10 != 7): "a b c a b c ..." — transitions
    a→b (k), b→c (k), c→a (k-1);
  - word-salad docs (d % 10 == 7): "a c b a c b ..." — transitions
    a→c (k), c→b (k), b→a (k-1).
  - lang: 'en' for d%3 != 2 (dominant), else one of de/fr/es/zh —
    every budget binds at soak scale.

Planted-truth assertions (all computed in pure Python — hashlib md5
order, closed-form token counts, exact integer bigram model):
  1. corpus_pack_sequences: byte-exact (tok_offset, pack_first,
     pack_last) for EVERY doc vs the Python prefix-sum over the salted
     hash order; perfect tiling (sum of n_tokens == final offset + n).
  2. corpus_token_budget_sample: kept set exactly equals each
     language's hash-order prefix under its budget.
  3. text_lm_score: per-doc score_ppm exactly equals the closed-form
     bigram model score; every fluent doc outscores every salad doc.
  4. corpus_domain_mix: the full 8-column per-domain plan (supply,
     bottleneck budget, allocation, keep_pm, achieved kept docs and
     tokens) byte-exactly equals the pure-Python derivation, kept
     sets included (the md5 bucket is recomputed in Python).

Usage: python jobs/soak_pack.py [n_small=100000] [factor=4]
Writes one JSON line per size + a summary line.
"""
from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

LANGS = ["de", "fr", "es", "zh"]


def k_of(d: int) -> int:
    return 20 + (d * 7919) % 34


def lang_of(d: int) -> str:
    return "en" if d % 3 != 2 else LANGS[(d // 3) % 4]


def is_salad(d: int) -> bool:
    return d % 10 == 7


def synth_corpus(spark, n_docs: int):
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    k = (F.lit(20) + (F.col("doc_id") * 7919) % 34).cast("int")
    pattern = F.when(F.col("doc_id") % 10 == 7, F.lit("a c b")) \
        .otherwise(F.lit("a b c"))
    text = F.array_join(
        F.transform(F.sequence(F.lit(1), k), lambda _: pattern), " ")
    lang = F.when(F.col("doc_id") % 3 != 2, F.lit("en")).otherwise(
        F.element_at(F.array(*[F.lit(s) for s in LANGS]),
                     ((F.col("doc_id") / 3).cast("long") % 4 + 1)
                     .cast("int")))
    return ids.select(
        "doc_id", text.alias("text"), lang.alias("lang"),
        F.lit("soak").alias("source"), F.length(text).alias("n_chars"))


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


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


def lm_truth(n_docs: int) -> dict[int, tuple[int, int]]:
    """Closed-form per-doc (n_bigrams, score_ppm)."""
    c = {"ab": 0, "bc": 0, "ca": 0, "ac": 0, "cb": 0, "ba": 0}
    for d in range(n_docs):
        k = k_of(d)
        if is_salad(d):
            c["ac"] += k; c["cb"] += k; c["ba"] += k - 1
        else:
            c["ab"] += k; c["bc"] += k; c["ca"] += k - 1
    c1 = {"a": c["ab"] + c["ac"], "b": c["bc"] + c["ba"],
          "c": c["ca"] + c["cb"]}
    ppm = {t: (c[t] * 1_000_000) // c1[t[0]] for t in c}
    truth = {}
    for d in range(n_docs):
        k = k_of(d)
        nb = 3 * k - 1
        if is_salad(d):
            s = k * ppm["ac"] + k * ppm["cb"] + (k - 1) * ppm["ba"]
        else:
            s = k * ppm["ab"] + k * ppm["bc"] + (k - 1) * ppm["ca"]
        truth[d] = (nb, s // nb)
    return truth


def run_one(spark, n_docs: int) -> dict:
    from jsonld_js_spark.operators.lm import q_text_lm_score
    from jsonld_js_spark.operators.packing import (
        BUDGET_DEFAULT, BUDGET_SALT, LANG_BUDGETS, N_BUCKETS, PACK_SALT,
        SEQ_LEN, q_corpus_pack_sequences, q_corpus_token_budget_sample,
    )

    sf_dir = f"/root/repo/.local/soak_pack/n{n_docs}"
    shutil.rmtree(sf_dir, ignore_errors=True)
    synth_corpus(spark, n_docs).write.mode("overwrite") \
        .parquet(f"{sf_dir}/documents.parquet")

    rec = {"n_docs": n_docs}
    walls = {}

    # ---- 1. packing: exact layout equality -------------------------
    t0 = time.time()
    got = {r["doc_id"]: (r["n_tokens"], r["tok_offset"],
                         r["pack_first"], r["pack_last"])
           for r in q_corpus_pack_sequences(spark, sf_dir).collect()}
    walls["pack_sequences"] = round(time.time() - t0, 1)
    keyed = sorted(
        ((h := _h60(f"{PACK_SALT}{d}")) % N_BUCKETS, h, d)
        for d in range(n_docs))
    cum, mism = 0, 0
    for _, _, d in keyed:
        n = 3 * k_of(d)
        want = (n, cum, cum // SEQ_LEN, (cum + n - 1) // SEQ_LEN)
        if got.get(d) != want:
            mism += 1
        cum += n
    rec["pack_layout_mismatches"] = mism
    rec["pack_total_tokens"] = cum
    rec["pack_tiling_exact"] = (
        len(got) == n_docs and
        max(off + n for n, off, _, _ in got.values()) == cum)

    # ---- 2. token budgets: exact per-language prefix ----------------
    t0 = time.time()
    kept = {r["doc_id"]: (r["lang"], r["n_tokens"], r["lang_tok_offset"])
            for r in q_corpus_token_budget_sample(spark, sf_dir).collect()}
    walls["token_budget"] = round(time.time() - t0, 1)
    by_lang: dict[str, list] = {}
    for d in range(n_docs):
        h = _h60(f"{BUDGET_SALT}{d}")
        by_lang.setdefault(lang_of(d), []).append((h % N_BUCKETS, h, d))
    truth = {}
    for lang, rows in by_lang.items():
        budget = LANG_BUDGETS.get(lang, BUDGET_DEFAULT)
        cum = 0
        for _, _, d in sorted(rows):
            if cum < budget:
                truth[d] = (lang, 3 * k_of(d), cum)
            cum += 3 * k_of(d)
    rec["budget_kept"] = len(kept)
    rec["budget_exact_match"] = kept == truth
    rec["budget_langs_binding"] = sorted(
        {lang for lang in by_lang
         if sum(3 * k_of(d) for _, _, d in by_lang[lang])
         > LANG_BUDGETS.get(lang, BUDGET_DEFAULT)})

    # ---- 3. LM score: exact closed-form equality --------------------
    t0 = time.time()
    got_lm = {r["doc_id"]: (r["n_bigrams"], r["score_ppm"])
              for r in q_text_lm_score(spark, sf_dir).collect()}
    walls["lm_score"] = round(time.time() - t0, 1)
    want_lm = lm_truth(n_docs)
    rec["lm_score_mismatches"] = sum(
        1 for d in want_lm if got_lm.get(d) != want_lm[d])
    fluent_min = min(s for d, (_, s) in got_lm.items() if not is_salad(d))
    salad_max = max(s for d, (_, s) in got_lm.items() if is_salad(d))
    rec["lm_fluent_min_ppm"] = fluent_min
    rec["lm_salad_max_ppm"] = salad_max
    rec["lm_separation_ok"] = fluent_min > salad_max

    # ---- 4. domain mix: byte-exact plan vs pure-Python truth --------
    from jsonld_js_spark.operators.sampling import (
        MIX_SALT, MIX_WEIGHTS, q_corpus_domain_mix)
    t0 = time.time()
    got_mix = {r["domain"]: (r["n_docs"], r["n_tokens"], r["weight_pm"],
                             r["alloc_tokens"], r["keep_pm"],
                             r["kept_docs"], r["kept_tokens"])
               for r in q_corpus_domain_mix(spark, sf_dir).collect()}
    walls["domain_mix"] = round(time.time() - t0, 1)
    supply: dict[str, list[int]] = {}
    for d in range(n_docs):
        supply.setdefault(lang_of(d), [0, 0])
        supply[lang_of(d)][0] += 1
        supply[lang_of(d)][1] += 3 * k_of(d)
    budget = min(t * 1000 // MIX_WEIGHTS[lang]
                 for lang, (_, t) in supply.items())
    want_mix = {}
    for lang, (nd, t) in supply.items():
        w = MIX_WEIGHTS[lang]
        alloc = budget * w // 1000
        keep_pm = alloc * 1000 // t
        kd = kt = 0
        for d in range(n_docs):
            if lang_of(d) == lang and \
                    _h60(f"{MIX_SALT}{d}") % 1000 < keep_pm:
                kd += 1
                kt += 3 * k_of(d)
        want_mix[lang] = (nd, t, w, alloc, keep_pm, kd, kt)
    rec["mix_plan_exact"] = got_mix == want_mix
    rec["mix_bottleneck"] = max(got_mix, key=lambda L: got_mix[L][4])
    rec["mix_keep_pm"] = {L: v[4] for L, v in sorted(got_mix.items())}

    # ---- 5. mix upsample: byte-exact per-doc copy counts ------------
    from jsonld_js_spark.operators.sampling import (
        UPSAMPLE_SALT, q_corpus_mix_upsample)
    t0 = time.time()
    got_up = {r["doc_id"]: (r["epochs_pm"], r["n_copies"])
              for r in q_corpus_mix_upsample(spark, sf_dir).collect()}
    walls["mix_upsample"] = round(time.time() - t0, 1)
    target = sum(t for _, t in supply.values())
    pm = {lang: (target * MIX_WEIGHTS[lang] // 1000) * 1000 // t
          for lang, (_, t) in supply.items()}
    mism = 0
    for d in range(n_docs):
        e = pm[lang_of(d)]
        want = (e, e // 1000
                + (1 if _h60(f"{UPSAMPLE_SALT}{d}") % 1000 < e % 1000
                   else 0))
        if got_up.get(d) != want:
            mism += 1
    rec["upsample_mismatches"] = mism
    rec["upsample_epochs_pm"] = dict(sorted(pm.items()))

    rec["walls_sec"] = walls
    rec["peak_jvm_rss_gib"] = _jvm_peak_rss_gib()
    print(json.dumps(rec), flush=True)
    return rec


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "20g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("soak-pack").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    small = run_one(spark, n_small)
    big = run_one(spark, n_small * factor)
    ok = all(
        r["pack_layout_mismatches"] == 0 and r["pack_tiling_exact"] and
        r["budget_exact_match"] and r["lm_score_mismatches"] == 0 and
        r["lm_separation_ok"] and r["mix_plan_exact"] and
        r["upsample_mismatches"] == 0
        for r in (small, big))
    print(json.dumps({
        "metric": "pack_soak", "all_planted_truth_exact": ok,
        "sizes": [small["n_docs"], big["n_docs"]],
        "wall_growth": {
            k: round(big["walls_sec"][k] / max(small["walls_sec"][k], .1), 2)
            for k in big["walls_sec"]}}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
