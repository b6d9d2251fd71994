"""Planted-truth soak for the round-5 eighth-pass operators:
tool_transitions, relation_timeline, bm25_topk, kg-style connected
components over string-labeled entity edges.

Check strength: EXACT equality of the full distributed result against
an independently written pure-Python reference on the same generated
input (all four contracts are int64/lexicographic — no tolerance
band), plus a semantic planted property per family:

  - tool_transitions: trajectories drawn from a known Markov chain
    over T tools; reference counts bigrams per conversation ordered
    by turn idx. Property: full table equality AND every chain edge
    with nonzero draw probability appears.
  - relation_timeline: conversations mention entity pairs from a
    planted schedule with known conversation timestamps; reference
    recomputes first/last/support from the raw rows. Property: full
    equality AND a planted "revived" pair spans the full time range.
  - bm25_topk: random filler docs + planted high-tf docs for the
    query terms; reference implements the documented integer contract
    from the docstring. Property: full top-k equality AND the planted
    docs occupy the top ranks.
  - components: C disjoint planted cliques + long 8-node chains wired
    to nothing else; reference = union-find. Property: full equality
    AND component count == C + #chains.

Run at N and 4N conversations/docs, report wall at both.
Usage: python tools/soak_pass8.py [N]
"""
import random
import sys
import time
from collections import defaultdict

from pyspark.sql import SparkSession

sys.path.insert(0, ".")
from jsonld_js_spark.kg_api import (  # noqa: E402
    relation_timeline, tool_transitions,
)
from jsonld_js_spark.operators.dedup import (  # noqa: E402
    connected_components,
)
from jsonld_js_spark.operators.textstats import bm25_topk  # noqa: E402

TOOLS = ["search", "code", "web", "files", "shell", "plot"]
CHAIN = {  # tool -> candidate successors (Markov support)
    "search": ["code", "web", "search"],
    "code": ["shell", "code", "files"],
    "web": ["search", "plot"],
    "files": ["code"],
    "shell": ["code", "plot"],
    "plot": ["search"],
}
TERMS = ("hash", "join", "vector")
FILLER = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]


def soak_tool_transitions(spark, n_conv, rng):
    rows = []
    for c in range(n_conv):
        tool = rng.choice(TOOLS)
        idx = rng.randrange(3)
        for _ in range(rng.randint(1, 8)):
            rows.append((f"c{c:07d}", idx, tool))
            tool = rng.choice(CHAIN[tool])
            idx += rng.randint(1, 4)
    # independent reference: bigram counts per conv in idx order
    per_conv = defaultdict(list)
    for conv, idx, tool in rows:
        per_conv[conv].append((idx, tool))
    trans = defaultdict(int)
    for conv, seq in per_conv.items():
        seq.sort()
        for (_, a), (_, b) in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    totals = defaultdict(int)
    for (a, _), n in trans.items():
        totals[a] += n
    expect = sorted(
        (a, b, n, (1_000_000 * n) // totals[a])
        for (a, b), n in trans.items())

    df = spark.createDataFrame(rows, "conv string, idx int, tool string")
    t0 = time.time()
    got = [tuple(r) for r in tool_transitions(df).collect()]
    wall = time.time() - t0
    assert got == expect, (
        f"transition table mismatch at n_conv={n_conv}: "
        f"{len(got)} vs {len(expect)} rows")
    seen = {(a, b) for a, b, _, _ in got}
    for a, succs in CHAIN.items():
        for b in succs:
            assert (a, b) in seen, f"chain edge ({a},{b}) never seen"
    return wall, len(got)


def soak_relation_timeline(spark, n_conv, rng):
    ents = [f"E{i}" for i in range(max(30, n_conv // 1000))]
    conv_rows, ts_rows = [], []
    raw = []
    for c in range(n_conv):
        conv = f"c{c:07d}"
        k = rng.randint(1, 5)
        convents = sorted(set(rng.choice(ents) for _ in range(k)))
        ts = (f"2024-{1 + (c % 12):02d}-{1 + (c % 28):02d}"
              f"T{c % 24:02d}:00:00Z")
        conv_rows.append((conv, convents))
        ts_rows.append((conv, ts))
        raw.append((convents, ts))
    # planted revived pair: in the earliest and latest instants only
    conv_rows.append(("c_lo", ["ZREV_a", "ZREV_b"]))
    ts_rows.append(("c_lo", "2000-01-01T00:00:00Z"))
    conv_rows.append(("c_hi", ["ZREV_a", "ZREV_b"]))
    ts_rows.append(("c_hi", "2099-12-31T23:59:59Z"))
    raw.append((["ZREV_a", "ZREV_b"], "2000-01-01T00:00:00Z"))
    raw.append((["ZREV_a", "ZREV_b"], "2099-12-31T23:59:59Z"))

    acc = {}
    for convents, ts in raw:
        for i, a in enumerate(convents):
            for b in convents[i + 1:]:
                lo, hi, n = acc.get((a, b), ("~", "", 0))
                acc[(a, b)] = (min(lo, ts), max(hi, ts), n + 1)
    expect = sorted((a, b, lo, hi, n)
                    for (a, b), (lo, hi, n) in acc.items() if n >= 2)

    ce = spark.createDataFrame(conv_rows,
                               "conv string, ents array<string>")
    ct = spark.createDataFrame(ts_rows, "conv string, conv_ts string")
    t0 = time.time()
    got = [tuple(r) for r in relation_timeline(ce, ct).collect()]
    wall = time.time() - t0
    assert got == expect, (
        f"timeline mismatch at n_conv={n_conv}: "
        f"{len(got)} vs {len(expect)} rows")
    rev = [r for r in got if r[0] == "ZREV_a"]
    assert rev == [("ZREV_a", "ZREV_b", "2000-01-01T00:00:00Z",
                    "2099-12-31T23:59:59Z", 2)], rev
    return wall, len(got)


def bm25_reference(docs, terms, k):
    """Written against the documented contract, not the Spark code."""
    toks = {d: t.split(" ") for d, t in docs}
    n_docs = len(docs)
    total = sum(len(t) for t in toks.values())
    avgdl = max(total // n_docs, 1)
    df = {trm: sum(1 for t in toks.values() if trm in t)
          for trm in terms}
    out = []
    for d, t in toks.items():
        score, n_match = 0, 0
        for trm in terms:
            tf = t.count(trm)
            if tf == 0:
                continue
            n_match += 1
            idf_pm = (1000 * (n_docs - df[trm])) // df[trm]
            denom_m = 300 + (900 * len(t)) // avgdl
            tf_pm = (tf * 2_200_000) // (tf * 1000 + denom_m)
            score += idf_pm * tf_pm
        if n_match:
            out.append((d, score, n_match))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


def soak_bm25(spark, n_docs, rng):
    docs = []
    for d in range(n_docs):
        words = [rng.choice(FILLER) for _ in range(rng.randint(5, 60))]
        if rng.random() < 0.05:
            words.append(rng.choice(TERMS))
        docs.append((d, " ".join(words)))
    n_planted = 10
    for j in range(n_planted):  # dense query-term docs must win top-k
        docs.append((n_docs + j,
                     " ".join(["hash join vector"] * (10 + j))))
    expect = bm25_reference(docs, TERMS, 20)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    t0 = time.time()
    got = [tuple(r) for r in bm25_topk(df).collect()]
    wall = time.time() - t0
    assert got == expect, f"bm25 mismatch at n_docs={n_docs}"
    top_ids = {r[0] for r in got[:n_planted]}
    assert top_ids == {n_docs + j for j in range(n_planted)}, (
        "planted dense docs not in the top ranks")
    return wall, len(got)


def soak_components(spark, n_ent, rng):
    c_cliques = max(5, n_ent // 200)
    n_chains = max(3, n_ent // 500)
    edges = []
    uf = {}

    def find(x):
        while uf.get(x, x) != x:
            uf[x] = uf.get(uf[x], uf[x])
            x = uf[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            uf[max(ra, rb)] = min(ra, rb)

    for c in range(c_cliques):
        mem = [f"K{c:05d}_{i}" for i in range(rng.randint(3, 6))]
        for i, a in enumerate(mem):
            for b in mem[i + 1:]:
                edges.append((a, b))
                union(a, b)
    for c in range(n_chains):
        mem = [f"L{c:05d}_{i}" for i in range(8)]
        for a, b in zip(mem, mem[1:]):
            edges.append((a, b))
            union(a, b)
    nodes = sorted({x for e in edges for x in e})
    expect = sorted((n, find(n)) for n in nodes)

    pairs = spark.createDataFrame(edges, "src string, dst string")
    both = pairs.unionAll(
        pairs.select(pairs.dst.alias("src"), pairs.src.alias("dst")))
    t0 = time.time()
    got = sorted(tuple(r) for r in
                 connected_components(both.distinct()).collect())
    wall = time.time() - t0
    assert got == expect, f"components mismatch at n_ent={n_ent}"
    n_comp = len({c for _, c in got})
    assert n_comp == c_cliques + n_chains, (n_comp, c_cliques, n_chains)
    return wall, n_comp


def soak_mention_contexts(spark, n_docs, rng):
    """Tenth-pass sibling: planted-mention snippet extraction — exact
    full-table equality against a pure-Python reference implementing
    the documented locate/substr contract on synthetic turns with
    mentions at the start, middle, end, and repeated."""
    from pyspark.sql import functions as F

    from jsonld_js_spark.vocab import MENTION_RE
    rows = []
    for d in range(n_docs):
        pre = "w" * rng.randrange(0, 80)
        post = "v" * rng.randrange(0, 80)
        surface = f"Ent{rng.randrange(50)}"
        text = f"{pre}[[{surface}]]{post}"
        if rng.random() < 0.3:  # second, possibly repeated mention
            s2 = surface if rng.random() < 0.5 else f"Ent{rng.randrange(50)}"
            text += f" mid [[{s2}]] tail"
        rows.append((f"c{d:07d}", d % 7, text))

    import re as _re
    expect = []
    for conv, ti, text in rows:
        for surface in dict.fromkeys(
                _re.findall(r"\[\[([A-Za-z]+[0-9]+)\]\]", text)):
            pos = text.index(f"[[{surface}]]") + 1
            start = max(1, pos - 30)
            expect.append((conv, ti, surface,
                           text[start - 1:start - 1 + 64 + len(surface)]))
    expect.sort()

    df = spark.createDataFrame(rows,
                               "conv_id string, turn_idx int, text string")
    t0 = time.time()
    got = sorted(tuple(r) for r in df.select(
        "conv_id", "turn_idx", "text",
        F.explode(F.array_distinct(
            F.regexp_extract_all("text", F.lit(MENTION_RE), 1)))
        .alias("surface"))
        .select("conv_id", "turn_idx", "surface", F.expr(
            "substr(text, greatest(1, "
            "locate(concat('[[', surface, ']]'), text) - 30), "
            "64 + length(surface))").alias("snippet")).collect())
    wall = time.time() - t0
    assert got == expect, f"snippet mismatch at n_docs={n_docs}"
    return wall, len(got)


def soak_role_affinity(spark, n_rows, rng):
    """Per-(ent, role) counts + ppm shares — exact equality vs a
    pure-Python tally over random mention rows."""
    from collections import Counter

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    ents = [f"E{i}" for i in range(max(20, n_rows // 2000))]
    roles = ["user", "assistant", "tool"]
    rows = [(rng.choice(ents), rng.choice(roles)) for _ in range(n_rows)]
    c = Counter(rows)
    tot = Counter()
    for (e, _r), n in c.items():
        tot[e] += n
    expect = sorted((e, r, n, (1_000_000 * n) // tot[e])
                    for (e, r), n in c.items())

    df = spark.createDataFrame(rows, "ent string, role string")
    base = df.groupBy("ent", "role").agg(
        F.count(F.lit(1)).cast("long").alias("n_mentions"))
    w = Window.partitionBy("ent")
    t0 = time.time()
    got = sorted(tuple(r) for r in base.withColumn(
        "total", F.sum("n_mentions").over(w)).select(
        "ent", "role", "n_mentions",
        F.expr("(1000000 * n_mentions) DIV total").cast("long")
        .alias("share_ppm")).collect())
    wall = time.time() - t0
    assert got == expect, f"affinity mismatch at n_rows={n_rows}"
    return wall, len(got)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory", "12g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for scale in (n, 4 * n):
        rng = random.Random(4242 + scale)
        w1, r1 = soak_tool_transitions(spark, scale, rng)
        w2, r2 = soak_relation_timeline(spark, scale, rng)
        w3, r3 = soak_bm25(spark, scale, rng)
        w4, r4 = soak_components(spark, scale, rng)
        w5, r5 = soak_mention_contexts(spark, scale, rng)
        w6, r6 = soak_role_affinity(spark, scale, rng)
        print({"scale": scale,
               "tool_transitions": {"wall_s": round(w1, 2), "rows": r1},
               "relation_timeline": {"wall_s": round(w2, 2), "rows": r2},
               "bm25_topk": {"wall_s": round(w3, 2), "rows": r3},
               "components": {"wall_s": round(w4, 2), "comps": r4},
               "mention_contexts": {"wall_s": round(w5, 2), "rows": r5},
               "role_affinity": {"wall_s": round(w6, 2), "rows": r6},
               "status": "OK"}, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
