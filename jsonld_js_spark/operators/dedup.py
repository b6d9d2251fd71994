"""Deduplication operators over the `documents` table: exact
(hash-groupBy), MinHash+LSH banding, prefix-filtered exact n-gram
Jaccard, and SimHash hamming-band near-dup.

The corpus is `documents` augmented with deterministic exact and
near-duplicate rows (so dedup output is non-trivial and the oracle can
reproduce it): every 25th doc gets an exact copy (+200000 id), every
10th a near-copy with a 4-token suffix (+100000 id).

All hashing is the portable 60-bit md5 prefix (textstats.hash60) so
the DuckDB oracle computes the identical algorithm. Jaccard is emitted
as exact integer ppm (no cross-engine float rounding).

Scale notes (100 TB): every op is shuffle-by-short-key (fingerprint /
band key / shingle prefix); candidate verification joins carry only
shingle arrays for candidate pairs, never a cross join. Band keys are
md5 strings → uniformly distributed → no hot reducers; exact-dup
groups are the only potential hot keys and collapse map-side via
partial aggregation.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from .textstats import hash60, hash60_sql

N_MINHASH = 8
N_BANDS = 4  # rows per band = 2
JACCARD_PPM_MIN = 500000  # J >= 0.5
SIMHASH_BITS = 60           # full width of the portable hash60
SIMHASH_BAND_BITS = 15      # 4 bands x 15 bits -> 32768 buckets/band
SIMHASH_N_BANDS = SIMHASH_BITS // SIMHASH_BAND_BITS
SIMHASH_MAX_HAMMING = 6

# One-hash MinHash mixing: each shingle is hashed ONCE (60-bit md5
# prefix), then the 8 signature values are TRUE multiplicative hashes
# A_i * h mod (2^61 - 1), computed overflow-free in int64 via the
# Mersenne rotation identity (2^61 ≡ 1, so x*2^30 mod p is a 61-bit
# rotation). Replaces round 1's 8 md5 calls per shingle.
#
# WHY full mod-wrap (round-3 soak find): the earlier "affine mix of
# the two 30-bit halves" a*(h>>30) + b*(h&mask) + c never wraps p, so
# it is jointly MONOTONE in (h_hi, h_lo) — all 8 mixes preserve the
# raw-h rank order, and a doc whose unique shingle holds the group's
# smallest raw hash captures every signature and misses every band.
# Measured recall on planted J=0.95 near-dup groups was 0.96 (theory
# for 4 bands x 2 rows: 0.9999); the orderings were one permutation,
# not eight. A_i*h mod p wraps ~A_i times per 2^61, so the 8 orderings
# decorrelate (capture now needs h < p/A_i ~ 2^31: P ~ 2^-29).
MIX_PRIME = (1 << 61) - 1
MASK30 = (1 << 30) - 1
MASK31 = (1 << 31) - 1
# deterministic 30-bit odd multipliers, random.Random(42):
# randrange(1, 2**30) | 1
MIX_CONSTS = [686579305, 119540833, 239670713, 149827707,
              726600541, 795285933, 31994525, 100604503]


# ---------------------------------------------------------------------------
# corpus with injected duplicates

def guard_injection_span(d, offset: int, col: str = "doc_id"):
    """Fail fast if a fixed duplicate-injection id offset would
    collide with real ids (id uniqueness silently breaks and every
    downstream id join multiplies rows — the defect class
    jobs/soak_curate.py caught in the curate corpus builder at 120k
    docs). These injected corpora are gated/fuzz test harnesses; the
    underlying operators take arbitrary frames and carry no offsets.
    One 1-row agg job (driver-scalar pattern)."""
    mx = d.agg(F.max(col)).collect()[0][0]
    if mx is not None and int(mx) >= offset:
        raise ValueError(
            f"injected-duplicate offset {offset} collides with "
            f"max({col})={mx}; use a corpus under {offset} ids or the "
            f"span-relative builder (pipeline/curate.py)")
    return d


def corpus_df(spark, sf_dir):
    d = guard_injection_span(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text"), 100000)
    near = (d.filter(F.col("doc_id") % 10 == 0)
            .select((F.col("doc_id") + 100000).alias("doc_id"),
                    F.concat("text", F.lit(" near duplicate suffix marker"))
                    .alias("text")))
    exact = (d.filter(F.col("doc_id") % 25 == 0)
             .select((F.col("doc_id") + 200000).alias("doc_id"), "text"))
    return d.unionAll(near).unionAll(exact)


CORPUS_SQL = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text || ' near duplicate suffix marker'
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 25 = 0
)"""


# ---------------------------------------------------------------------------
# shared shingle expressions (distinct word-3-grams of normalized text)

def _norm(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def shingles_col(col):
    # The token array is bound ONCE as a lambda variable via
    # transform(array(split(...)), toks -> ...)[1] — a let-binding.
    # Inlining `split(regexp_replace(...))` into the per-index lambda
    # makes codegen re-run the split per element_at: O(tokens²) regex
    # work per document (measured 13.6 s -> 0.6 s for the corpus
    # shingle explode at sf0.1, byte-identical output).
    norm = _norm(col)

    def _grams_of(tokens):
        n = F.size(tokens)
        grams = F.array_distinct(F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(
                " ", F.element_at(tokens, i + 1),
                F.element_at(tokens, i + 2),
                F.element_at(tokens, i + 3))))
        return F.when(n >= 3, grams).otherwise(F.array(norm))

    return F.element_at(
        F.transform(F.array(F.split(norm, " ")), _grams_of), 1)


_NORM_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_TOK_SQL = f"string_split({_NORM_SQL}, ' ')"
SHINGLES_SQL = f"""
case when len({_TOK_SQL}) >= 3 then
  list_distinct(list_transform(range(1, len({_TOK_SQL}) - 1),
    i -> {_TOK_SQL}[i] || ' ' || {_TOK_SQL}[i+1] || ' ' || {_TOK_SQL}[i+2]))
else [{_NORM_SQL}] end"""


def _jaccard_ppm(sa, sb):
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(sa) + F.size(sb) - inter
    return F.floor(inter * F.lit(1000000.0) / union).cast("long")


_JACCARD_PPM_SQL = (
    "cast(floor(len(list_intersect(sa, sb)) * 1000000.0 / "
    "(len(sa) + len(sb) - len(list_intersect(sa, sb)))) as bigint)")


# ---------------------------------------------------------------------------
def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on normalized-text fingerprint.
    At scale: one shuffle on an md5 key (uniform), partial-agg combines
    map-side; no skew possible beyond true duplicate mass."""
    c = corpus_df(spark, sf_dir)
    return (c.groupBy(F.md5(_norm(F.col("text"))).alias("fingerprint"))
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("canonical_doc_id"))
            .filter(F.col("n_docs") > 1)
            .orderBy("fingerprint"))


ORACLE_DEDUP_EXACT = f"""
WITH {CORPUS_SQL}
SELECT md5({_NORM_SQL}) AS fingerprint, count(*) AS n_docs,
       min(doc_id) AS canonical_doc_id
FROM corpus GROUP BY 1 HAVING count(*) > 1 ORDER BY fingerprint
"""


# ---------------------------------------------------------------------------
def shingle_table(corpus):
    """Shingle table from a (doc_id, text) DataFrame, cached: every
    dedup op self-joins it 2-3 times (signature build, candidate
    sides, verification) — one scan + in-memory columnar reuse instead
    of recomputing the corpus DAG per branch. At 100 TB the same role
    is played by materializing the shingle/signature table once per
    run.

    The token split is materialized in its own projection so the
    3-gram lambda reads the token ARRAY instead of re-running
    split(regexp_replace(...)) per element_at — inlined, the shingle
    build is O(tokens²) string work per document (measured 3× the
    whole minhash job at sf0.1). CollapseProject keeps the non-cheap
    split single-evaluated because it is referenced 5×."""
    toks = corpus.select("doc_id", F.split(_norm(F.col("text")), " ")
                         .alias("toks"))
    n = F.size("toks")
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(0), n - 3),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("toks"), i + 1),
            F.element_at(F.col("toks"), i + 2),
            F.element_at(F.col("toks"), i + 3))))
    shingles = F.when(n >= 3, grams).otherwise(
        F.array(F.concat_ws(" ", "toks")))
    return toks.select("doc_id", shingles.alias("shingles")).cache()


def shingle_cols(corpus, extra_cols=()):
    """Uncached (doc_id, *extra_cols, shingles) projection with the
    identical shingle semantics as `shingle_table` — for STREAMING
    inputs (`.cache()` is illegal on a streaming DataFrame) and any
    caller that carries event-time columns through."""
    toks = corpus.select("doc_id", *extra_cols,
                         F.split(_norm(F.col("text")), " ").alias("toks"))
    n = F.size("toks")
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(0), n - 3),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("toks"), i + 1),
            F.element_at(F.col("toks"), i + 2),
            F.element_at(F.col("toks"), i + 3))))
    shingles = F.when(n >= 3, grams).otherwise(
        F.array(F.concat_ws(" ", "toks")))
    return toks.select("doc_id", *extra_cols, shingles.alias("shingles"))


def _with_shingles(spark, sf_dir):
    return shingle_table(corpus_df(spark, sf_dir))


def minhash_band_rows(sh, carry=(), carry_shingles=False):
    """(doc_id[, carry...], shingles) -> exploded LSH band rows
    (doc_id, *carry[, shingles], band, bkey) — the signature/band
    math shared by the batch `minhash_pairs` and the streaming
    near-dup join (streaming/ingest.py), which carries (ts, shingles)
    through so the stream-stream candidate join can verify exact
    Jaccard without a second stateful lookup.

    One md5 per shingle, materialized as its own projection so the 8
    signature mixes reuse it (CollapseProject keeps non-cheap exprs
    single-evaluated); each sig is min over A_i*h mod 2^61-1."""
    hashed = sh.select(
        "doc_id", *carry, "shingles",
        F.transform(F.col("shingles"), hash60).alias("hs"))

    def mixer(a):
        # A*h mod (2^61-1) overflow-free: split h into 30-bit halves;
        # the high product re-enters low via the Mersenne rotation
        # x*2^30 ≡ (x >> 31) + ((x & MASK31) << 30)  (2^61 ≡ 1 mod p).
        # Single-arg lambda on purpose: pyspark treats 2-arg lambdas
        # as (element, index) functions.
        def g(h):
            x = F.lit(a) * F.shiftright(h, 30)
            rot = (F.shiftright(x, 31) +
                   F.shiftleft(x.bitwiseAND(F.lit(MASK31)), 30))
            return ((rot + F.lit(a) * h.bitwiseAND(F.lit(MASK30)))
                    % F.lit(MIX_PRIME))
        return g

    keep = ["doc_id", *carry] + (["shingles"] if carry_shingles else [])
    sig = hashed.select(
        *keep,
        *[F.array_min(F.transform(F.col("hs"), mixer(a)))
          .alias(f"sig{i}") for i, a in enumerate(MIX_CONSTS)])
    return sig.select(
        *keep,
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.md5(F.concat_ws(
                         "_", F.col(f"sig{2*b}").cast("string"),
                         F.col(f"sig{2*b+1}").cast("string")))
                     .alias("bkey"))
            for b in range(N_BANDS)])).alias("bb"),
    ).select(*keep, "bb.band", "bb.bkey")


def minhash_pairs(corpus):
    """MinHash(8) + LSH(4 bands x 2 rows) near-dup pairs from a
    (doc_id, text) DataFrame: shingle→minhash→band→bucket-join→
    exact-Jaccard verify (J >= 0.5). Unordered; the q_ wrapper adds
    the gate's determinism orderBy.

    Scale path: band-key self-join is the only shuffle over candidates;
    signatures are 8 longs/doc (tiny); verification joins shingle
    arrays only for candidate pairs."""
    docs = shingle_table(corpus)
    bands = minhash_band_rows(docs)
    pairs = (bands.alias("a").join(
        bands.alias("b"),
        (F.col("a.band") == F.col("b.band")) &
        (F.col("a.bkey") == F.col("b.bkey")) &
        (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct())
    sh = docs
    verified = (pairs
                .join(sh.select(F.col("doc_id").alias("doc_a"),
                                F.col("shingles").alias("sa")), "doc_a")
                .join(sh.select(F.col("doc_id").alias("doc_b"),
                                F.col("shingles").alias("sb")), "doc_b")
                .select("doc_a", "doc_b",
                        _jaccard_ppm(F.col("sa"), F.col("sb"))
                        .alias("jaccard_ppm"))
                .filter(F.col("jaccard_ppm") >= JACCARD_PPM_MIN))
    return verified


def q_dedup_minhash_lsh(spark, sf_dir):
    """Near-dup pairs over the injected-duplicate corpus (gate entry
    for `minhash_pairs`)."""
    return (minhash_pairs(corpus_df(spark, sf_dir))
            .orderBy("doc_a", "doc_b"))


_SIG_SQL = ", ".join(
    f"list_min(list_transform(hs, h -> "
    f"(((({a} * (h >> 30)) >> 31) + ((({a} * (h >> 30)) & {MASK31}) << 30)"
    f" + {a} * (h & {MASK30})) % {MIX_PRIME})))"
    f" AS sig{i}" for i, a in enumerate(MIX_CONSTS))
_BANDS_SQL = ", ".join(
    f"md5(cast(sig{2*b} as string) || '_' || cast(sig{2*b+1} as string))"
    f" AS bkey{b}" for b in range(N_BANDS))
_BAND_UNION = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, bkey{b} AS bkey FROM sigs"
    for b in range(N_BANDS))
# shingle→minhash→band CTE chain shared by the self-join oracle, the
# cross-corpus oracle, and the composed curation-pipeline oracle
# (band math is per-doc, so filtering the one band table is exactly
# equivalent to banding each side separately). Parameterized on the
# (doc_id, text) source relation so it composes mid-pipeline.

def band_ctes_over(rel: str) -> str:
    return f"""docs AS (SELECT doc_id, {SHINGLES_SQL} AS shingles FROM {rel}),
hashed AS (SELECT doc_id, shingles,
           list_transform(shingles, s -> {hash60_sql('s')}) AS hs
           FROM docs),
sigs0 AS (SELECT doc_id, shingles, {_SIG_SQL} FROM hashed),
sigs AS (SELECT *, {_BANDS_SQL} FROM sigs0),
bands AS ({_BAND_UNION})"""


def minhash_ctes_over(rel: str) -> str:
    """docs/.../dup_pairs CTE chain: verified near-dup pairs
    (J >= {JACCARD_PPM_MIN} ppm) over any (doc_id, text) relation."""
    return f"""{band_ctes_over(rel)},
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
verified AS (
  SELECT doc_a, doc_b, {_JACCARD_PPM_SQL} AS jaccard_ppm
  FROM (SELECT p.doc_a, p.doc_b, da.shingles AS sa, db.shingles AS sb
        FROM pairs p
        JOIN docs da ON da.doc_id = p.doc_a
        JOIN docs db ON db.doc_id = p.doc_b)
),
dup_pairs AS (
  SELECT doc_a, doc_b FROM verified WHERE jaccard_ppm >= {JACCARD_PPM_MIN}
)"""


_BAND_CTES = f"{CORPUS_SQL},\n{band_ctes_over('corpus')}"

_MINHASH_CTES = f"{CORPUS_SQL},\n{minhash_ctes_over('corpus')}"

ORACLE_DEDUP_MINHASH = f"""
WITH {_MINHASH_CTES}
SELECT doc_a, doc_b, jaccard_ppm FROM verified
WHERE jaccard_ppm >= {JACCARD_PPM_MIN}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# cross-corpus near-dedup: incoming shard vs existing corpus snapshot

CROSS_STORE_MAX_ID = 100000  # gated split: base docs = store, injected = batch


def cross_corpus_pairs(store, batch):
    """Incremental-ingestion near-dedup: flag every document of an
    incoming `batch` shard that is a near-duplicate (verified Jaccard
    >= 0.5) of ANY document already in the `store` corpus — the dedup
    a training pipeline runs on each new crawl shard BEFORE admitting
    it, so the growing corpus never re-pairs against itself.

    Scale shape: both sides run the same shingle→minhash→band
    projection (`minhash_band_rows`); the candidate join is
    batch-bands ⋈ store-bands on (band, bkey) — in production the
    store's band table is a MATERIALIZED index written once per
    snapshot (bucketed by bkey), so each shard ingest pays only the
    shard's own banding plus one bucketed join, never an all-pairs or
    store-rescan. The shard side is typically orders smaller than the
    store, so AQE broadcasts the shard bands. Exact-Jaccard
    verification joins shingle arrays for candidate pairs only."""
    sd = shingle_table(store)
    bd = shingle_table(batch)
    sb = minhash_band_rows(sd)
    bb = minhash_band_rows(bd)
    cands = (bb.alias("b").join(
        sb.alias("s"),
        (F.col("b.band") == F.col("s.band")) &
        (F.col("b.bkey") == F.col("s.bkey")))
        .select(F.col("b.doc_id").alias("batch_doc"),
                F.col("s.doc_id").alias("store_doc"))
        .distinct())
    return (cands
            .join(bd.select(F.col("doc_id").alias("batch_doc"),
                            F.col("shingles").alias("sa")), "batch_doc")
            .join(sd.select(F.col("doc_id").alias("store_doc"),
                            F.col("shingles").alias("sb")), "store_doc")
            .select("batch_doc", "store_doc",
                    _jaccard_ppm(F.col("sa"), F.col("sb"))
                    .alias("jaccard_ppm"))
            .filter(F.col("jaccard_ppm") >= JACCARD_PPM_MIN))


def q_dedup_cross_corpus(spark, sf_dir):
    """Gated query: the injected near/exact copies (doc_id >= 100000)
    arrive as the incoming shard; the base documents are the store.
    Every emitted pair crosses the shard boundary by construction."""
    c = corpus_df(spark, sf_dir)
    store = c.filter(F.col("doc_id") < CROSS_STORE_MAX_ID)
    batch = c.filter(F.col("doc_id") >= CROSS_STORE_MAX_ID)
    return (cross_corpus_pairs(store, batch)
            .orderBy("batch_doc", "store_doc"))


ORACLE_DEDUP_CROSS_CORPUS = f"""
WITH {_BAND_CTES},
cands AS (
  SELECT DISTINCT b.doc_id AS batch_doc, s.doc_id AS store_doc
  FROM bands b JOIN bands s
    ON b.band = s.band AND b.bkey = s.bkey
  WHERE b.doc_id >= {CROSS_STORE_MAX_ID}
    AND s.doc_id < {CROSS_STORE_MAX_ID}
),
verified AS (
  SELECT batch_doc, store_doc, {_JACCARD_PPM_SQL} AS jaccard_ppm
  FROM (SELECT c.batch_doc, c.store_doc,
               da.shingles AS sa, db.shingles AS sb
        FROM cands c
        JOIN docs da ON da.doc_id = c.batch_doc
        JOIN docs db ON db.doc_id = c.store_doc)
)
SELECT batch_doc, store_doc, jaccard_ppm FROM verified
WHERE jaccard_ppm >= {JACCARD_PPM_MIN}
ORDER BY batch_doc, store_doc
"""


# ---------------------------------------------------------------------------
def ngram_prefixes(docs, ordering: str = "df"):
    """Prefix-filter blocking table (doc_id, shingle).

    Prefix filtering is complete under ANY fixed total order of the
    shingle universe: two docs with J >= t must share a shingle among
    the first floor((1-t)*|S|)+1 of their ordered shingle sets. The
    ORDER choice only affects candidate volume, and that is the 100 TB
    scale knob: lexicographic order (round 1) lets a corpus-common
    3-gram land in many prefixes → quadratic blow-up on one join key.
    `ordering="df"` ranks shingles rarest-first by GLOBAL document
    frequency (one count pass, shuffle on the same shingle key the
    candidate join uses; ties broken by shingle string so both engines
    agree), pushing corpus-common shingles out of every prefix.
    `ordering="lex"` keeps the round-1 order (tests compare candidate
    volumes between the two)."""
    from pyspark.sql.window import Window
    prefix_len = (F.col("n_sh") -
                  F.ceil(F.col("n_sh") * F.lit(0.5)).cast("int") + 1)
    ex = docs.select("doc_id", F.size("shingles").alias("n_sh"),
                     F.explode("shingles").alias("shingle"))
    if ordering == "lex":
        order_cols = [F.col("shingle")]
        ranked = ex
    else:
        # shingles are distinct per doc, so count(*) == document freq
        dfreq = ex.groupBy("shingle").agg(F.count("*").alias("df"))
        ranked = ex.join(dfreq, "shingle")
        order_cols = [F.col("df"), F.col("shingle")]
    w = Window.partitionBy("doc_id").orderBy(*order_cols)
    return (ranked.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= prefix_len)
            .select("doc_id", "shingle"))


def ngram_candidates(prefix):
    return (prefix.alias("a").join(
        prefix.alias("b"),
        (F.col("a.shingle") == F.col("b.shingle")) &
        (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b")).distinct())


def q_dedup_ngram_jaccard(spark, sf_dir):
    """EXACT n-gram Jaccard pairs (J >= 0.5) via rarest-first prefix
    filtering (see ngram_prefixes). Complete (no missed pairs), no
    cross join — the blocking join key is a single shingle string."""
    docs = _with_shingles(spark, sf_dir)
    cand = ngram_candidates(ngram_prefixes(docs))
    verified = (cand
                .join(docs.select(F.col("doc_id").alias("doc_a"),
                                  F.col("shingles").alias("sa")), "doc_a")
                .join(docs.select(F.col("doc_id").alias("doc_b"),
                                  F.col("shingles").alias("sb")), "doc_b")
                .select("doc_a", "doc_b",
                        _jaccard_ppm(F.col("sa"), F.col("sb"))
                        .alias("jaccard_ppm"))
                .filter(F.col("jaccard_ppm") >= JACCARD_PPM_MIN))
    return verified.orderBy("doc_a", "doc_b")


ORACLE_DEDUP_NGRAM = f"""
WITH {CORPUS_SQL},
docs AS (SELECT doc_id, {SHINGLES_SQL} AS shingles FROM corpus),
ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
       FROM docs),
dfreq AS (SELECT shingle, count(*) AS df FROM ex GROUP BY shingle),
ranked AS (
  SELECT e.doc_id, e.shingle, e.n_sh,
         row_number() OVER (PARTITION BY e.doc_id
                            ORDER BY d.df, e.shingle) AS rn
  FROM ex e JOIN dfreq d USING (shingle)
),
prefixes AS (
  SELECT doc_id, shingle FROM ranked
  WHERE rn <= n_sh - cast(ceil(n_sh * 0.5e0) as int) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM prefixes a JOIN prefixes b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
verified AS (
  SELECT doc_a, doc_b, {_JACCARD_PPM_SQL} AS jaccard_ppm
  FROM (SELECT c.doc_a, c.doc_b, da.shingles AS sa, db.shingles AS sb
        FROM cand c
        JOIN docs da ON da.doc_id = c.doc_a
        JOIN docs db ON db.doc_id = c.doc_b)
)
SELECT * FROM verified WHERE jaccard_ppm >= {JACCARD_PPM_MIN}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
CC_MAX_ITERS = 20


def _reliable_checkpoint(df):
    """checkpoint() against reliable storage (truncates iterative
    lineage AND survives executor loss — localCheckpoint pins blocks
    to executor memory/disk, so one lost executor kills a 100 TB
    clustering run). The checkpoint dir defaults to a local tmp path;
    on a cluster set SPARK_GRAFT_CHECKPOINT_DIR to an HDFS/S3 URI or
    pre-set sparkContext.setCheckpointDir."""
    import os
    import tempfile
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(os.environ.get(
            "SPARK_GRAFT_CHECKPOINT_DIR",
            tempfile.mkdtemp(prefix="spark-graft-ckpt-")))
    return df.checkpoint(eager=True)


def connected_components(edges, max_iters: int = CC_MAX_ITERS,
                         algorithm: str = "label"):
    """(src, dst) undirected edge list -> (doc_id, cluster_id) with
    cluster_id = component-min node id.

    algorithm='label': min-label propagation — every node takes the
    min of its own and neighbors' labels per round (one edges⋈labels
    shuffle + groupBy); converges in graph-DIAMETER rounds, which is
    small for near-dup graphs (dup clusters are dense). RAISES if the
    diameter exceeds max_iters — silently wrong labels were the
    round-2 failure mode flagged in ADVICE.

    algorithm='star': alternating large-star/small-star (Kiveris et
    al., "Connected Components in MapReduce and Beyond", 2014) —
    label spread SQUARES per round, so adversarial long chains
    converge in O(log n) rounds. Each round is two grouped-min joins
    over the shrinking edge set; the driver sees only a fixpoint
    checksum. Use for graphs whose diameter is unknown.

    Both variants checkpoint per round against reliable storage
    (`_reliable_checkpoint`) so lineage stays flat and executor loss
    cannot kill the run.

    Expects `edges` to contain each undirected edge in BOTH
    directions (src->dst and dst->src)."""
    if algorithm == "star":
        return _cc_star(edges, max_iters)
    labels = (edges.select(F.col("src").alias("doc_id")).distinct()
              .withColumn("cluster_id", F.col("doc_id"))
              .cache())
    changed = -1
    for _ in range(max_iters):
        nbr_min = (edges.join(labels, edges["dst"] == labels["doc_id"])
                   .groupBy("src").agg(F.min("cluster_id").alias("nbr_min")))
        # carry the changed flag INTO the checkpointed rows: the
        # convergence check is then a scan of the checkpoint instead
        # of an extra old⋈new join job per round
        new_label = F.least(labels["cluster_id"],
                            F.coalesce(nbr_min["nbr_min"],
                                       labels["cluster_id"]))
        new_labels = (labels.join(nbr_min,
                                  labels["doc_id"] == nbr_min["src"], "left")
                      .select(labels["doc_id"],
                              new_label.alias("cluster_id"),
                              (new_label != labels["cluster_id"])
                              .alias("_chg")))
        new_labels = _reliable_checkpoint(new_labels)
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components(label) did not converge in "
            f"{max_iters} rounds (graph diameter too large) — "
            f"use algorithm='star'")
    return labels


def _edge_checksum(edges):
    """Deterministic (count, xor-ish sum) fingerprint of an edge SET —
    one driver-side row per round, order-independent."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(src, dst))").alias("h")).collect()[0]
    return (row["n"], row["h"])


def _cc_star(edges, max_iters):
    """Alternating large-star/small-star; `edges` has both directions.
    Invariant per round: edge set shrinks toward the star set
    {(v, component_min)}; fixpoint detected by set checksum."""
    cur = edges.filter(F.col("src") != F.col("dst")).distinct().cache()
    all_nodes = cur.select(F.col("src").alias("doc_id")).distinct().cache()
    prev_sig = None
    for _ in range(max_iters):
        # large-star: connect every strictly-larger neighbor of u to
        # m_u = min(N(u) + {u})
        mins = (cur.groupBy("src")
                .agg(F.min("dst").alias("mn"))
                .select("src", F.least("mn", F.col("src")).alias("m")))
        large = (cur.join(mins, "src")
                 .filter(F.col("dst") > F.col("src"))
                 .select(F.col("dst").alias("src"),
                         F.col("m").alias("dst")))
        # cache (not checkpoint): lg feeds sm_in twice in the same
        # round; lineage back to the PREVIOUS round's checkpointed
        # `small` stays short, so executor loss just recomputes one
        # round — and one parquet round-trip per iteration is saved
        lg = large.filter(F.col("src") != F.col("dst")).distinct().cache()
        # small-star: orient each edge large->small, connect every
        # smaller-or-equal neighbor (and u itself) to the min
        sm_in = (lg.select("src", "dst")
                 .unionAll(lg.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst")))
                 .filter(F.col("dst") <= F.col("src")))
        smins = sm_in.groupBy("src").agg(F.min("dst").alias("m"))
        small = (sm_in.join(smins, "src")
                 .select(F.col("dst").alias("node"), "m")
                 .unionAll(smins.select(F.col("src").alias("node"), "m"))
                 .filter(F.col("node") != F.col("m"))
                 .select(F.col("node").alias("src"),
                         F.col("m").alias("dst"))
                 .distinct())
        small = _reliable_checkpoint(small)
        lg.unpersist()
        # fixpoint on the DIRECTED small set (every row has src > dst —
        # dst is the strict min — so the undirected mirror is a
        # bijection of it and adds nothing to the test); computed on
        # the checkpointed rows, no extra shuffle
        sig = _edge_checksum(small)
        # mirror WITHOUT distinct: src > dst on one side, src < dst on
        # the other — the union is disjoint by construction, and both
        # uses next round re-read the checkpoint parquet (cheaper than
        # re-materializing a cache of a derived mirror)
        new_cur = small.unionAll(
            small.select(F.col("dst").alias("src"),
                         F.col("src").alias("dst")))
        cur.unpersist()
        cur = new_cur
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components(star) did not converge in "
            f"{max_iters} rounds")
    roots = (cur.filter(F.col("src") > F.col("dst"))
             .groupBy("src").agg(F.min("dst").alias("cluster_id"))
             .select(F.col("src").alias("doc_id"), "cluster_id"))
    return (all_nodes.join(roots, "doc_id", "left")
            .select("doc_id", F.coalesce("cluster_id", "doc_id")
                    .alias("cluster_id")))


def _dup_edges(spark, sf_dir):
    pairs = (q_dedup_minhash_lsh(spark, sf_dir)
             .select("doc_a", "doc_b").cache())
    return (pairs.select(F.col("doc_a").alias("src"),
                         F.col("doc_b").alias("dst"))
            .unionAll(pairs.select(F.col("doc_b").alias("src"),
                                   F.col("doc_a").alias("dst")))
            .cache())


def q_dedup_clusters(spark, sf_dir):
    """Duplicate-CLUSTER resolution — the dedup endgame: connected
    components over the verified MinHash near-dup pair graph, label =
    min doc_id in the component (the canonical survivor; every other
    member is the drop set). Default algorithm: min-label propagation
    (raises rather than returning wrong labels past CC_MAX_ITERS)."""
    return connected_components(_dup_edges(spark, sf_dir)).orderBy("doc_id")


def q_dedup_clusters_star(spark, sf_dir):
    """Same components via alternating large-star/small-star — the
    O(log n)-round variant for adversarial diameters; shares the
    exact recursive-CTE oracle with q_dedup_clusters."""
    return connected_components(
        _dup_edges(spark, sf_dir), algorithm="star").orderBy("doc_id")


ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_MINHASH_CTES},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM dup_pairs
  UNION ALL SELECT doc_b, doc_a FROM dup_pairs
),
reach(doc, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc
)
SELECT doc AS doc_id, min(r) AS cluster_id
FROM reach GROUP BY doc ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
def simhash_df(corpus):
    """(doc_id, text) -> (doc_id, simhash): 60-bit SimHash over token
    frequencies (one hash60 per token, 60 signed per-bit sums with
    map-side partial aggregation — the only shuffle is by doc_id)."""
    tok = corpus.select(
        "doc_id",
        F.explode(F.split(_norm(F.col("text")), " ")).alias("token"))
    tok = tok.withColumn("h", hash60(F.col("token")))
    sums = tok.groupBy("doc_id").agg(*[
        F.sum(F.when(F.expr(f"(h >> {j}) & 1") == 1, 1).otherwise(-1))
        .alias(f"s{j}") for j in range(SIMHASH_BITS)])
    simhash = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(2 ** j)).otherwise(F.lit(0))
        simhash = bit if simhash is None else simhash + bit
    return sums.select("doc_id", simhash.cast("long").alias("simhash"))


def simhash_bands_df(sh):
    """(doc_id, simhash) -> exploded (doc_id, simhash, band, bkey) with
    4 x 15-bit band keys."""
    w = SIMHASH_BAND_BITS
    return sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.expr(f"(simhash >> {w*b}) & {(1 << w) - 1}")
                     .alias("bkey"))
            for b in range(SIMHASH_N_BANDS)])).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bkey")


def q_dedup_simhash(spark, sf_dir):
    """60-bit SimHash near-dup pairs, hamming <= 6, blocked on 4
    15-bit bands and verified exactly by bit_count on candidates.

    Recall: a pair within hamming 3 shares >= 1 band by pigeonhole
    (4 bands, <= 3 differing bits) — that slice is EXACT. For hamming
    4-6 banding is a high-recall heuristic (~0.97/0.86/0.67 for
    h=4/5/6 with random bit placement); catching hamming <= 6 with a
    guarantee needs combination blocking (e.g. C(8,6) = 28 tables of
    6-of-8-block keys, Manku et al., WWW'07) — same join primitive,
    7x the band rows, not warranted for this operator's contract.

    Scale (round-3 fix): 15-bit bands give 32768 buckets per band
    (was 256 at 8 bits), so the within-bucket self-join is
    O(sum b_i^2) with E[b_i] = N/32768 — 128x fewer candidate pairs
    than 8-bit bands at the same N; tests/test_dedup.py asserts
    candidates-per-doc stays bounded as the corpus scales 4x."""
    sh = simhash_df(corpus_df(spark, sf_dir))
    bands = simhash_bands_df(sh)
    pairs = (bands.alias("a").join(
        bands.alias("b"),
        (F.col("a.band") == F.col("b.band")) &
        (F.col("a.bkey") == F.col("b.bkey")) &
        (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.simhash").alias("sha"),
                F.col("b.simhash").alias("shb"))
        .distinct()
        .withColumn("hamming",
                    F.expr("bit_count(sha ^ shb)").cast("int"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING))
    return pairs.select("doc_a", "doc_b", "hamming").orderBy(
        "doc_a", "doc_b")


_SIMSUM_SQL = ", ".join(
    f"sum(case when (h >> {j}) & 1 = 1 then 1 else -1 end) AS s{j}"
    for j in range(SIMHASH_BITS))
_SIMHASH_SQL = " + ".join(
    f"(case when s{j} > 0 then cast({2**j} as bigint) else 0 end)"
    for j in range(SIMHASH_BITS))
_SIMBAND_UNION = " UNION ALL ".join(
    f"SELECT doc_id, simhash, {b} AS band, "
    f"(simhash >> {SIMHASH_BAND_BITS*b}) & {(1 << SIMHASH_BAND_BITS) - 1} "
    f"AS bkey FROM sh" for b in range(SIMHASH_N_BANDS))
ORACLE_DEDUP_SIMHASH = f"""
WITH {CORPUS_SQL},
tok AS (
  SELECT doc_id, {hash60_sql('token')} AS h
  FROM (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS token
        FROM corpus)
),
sums AS (SELECT doc_id, {_SIMSUM_SQL} FROM tok GROUP BY doc_id),
sh AS (SELECT doc_id, {_SIMHASH_SQL} AS simhash FROM sums),
bands AS ({_SIMBAND_UNION}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sha, b.simhash AS shb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, cast(bit_count(xor(sha, shb)) as int) AS hamming
FROM pairs WHERE bit_count(xor(sha, shb)) <= {SIMHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_cross_corpus": q_dedup_cross_corpus,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_simhash": q_dedup_simhash,
    "dedup_clusters": q_dedup_clusters,
    "dedup_clusters_star": q_dedup_clusters_star,
}
ORACLES = {
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_minhash_lsh": ORACLE_DEDUP_MINHASH,
    "dedup_cross_corpus": ORACLE_DEDUP_CROSS_CORPUS,
    "dedup_ngram_jaccard": ORACLE_DEDUP_NGRAM,
    "dedup_simhash": ORACLE_DEDUP_SIMHASH,
    "dedup_clusters": ORACLE_DEDUP_CLUSTERS,
    "dedup_clusters_star": ORACLE_DEDUP_CLUSTERS,
}


# ---------------------------------------------------------------------------
# Cross-document boilerplate-line removal stats (the CCNet/RefinedWeb
# move: a "line" shared by >= K documents is boilerplate; report how
# much of each document survives). Runs over the injected-duplicate
# corpus (dedup.corpus_df) so shared lines genuinely exist. Scale
# shape: both aggregations key on the line string — the global
# document-frequency count reduces map-side (hot boilerplate lines
# collapse before the wire), and the boilerplate set is tiny relative
# to the corpus, so the rejoin broadcasts at any scale where the
# filter is selective (AQE decides); per-doc stats are one more
# partial-agg groupBy on doc_id.
LINE_TOKENS = 10
BOILERPLATE_MIN_DOCS = 3


def _line_table(spark, sf_dir):
    toks = corpus_df(spark, sf_dir).select(
        "doc_id", F.split(_norm(F.col("text")), " ").alias("t"))
    n = F.size("t")
    lines = F.transform(
        F.sequence(F.lit(0), F.ceil(n / LINE_TOKENS).cast("int") - 1),
        lambda i: F.concat_ws(
            " ", F.slice(F.col("t"), i * LINE_TOKENS + 1, LINE_TOKENS)))
    return toks.select("doc_id", F.explode(lines).alias("line"))


def q_corpus_boilerplate_stats(spark, sf_dir):
    """Per-document boilerplate-line stats: lines (non-overlapping
    {LINE_TOKENS}-token windows) occurring in >= {BOILERPLATE_MIN_DOCS}
    distinct documents are boilerplate; kept_ppm is the integer
    per-mille^2 of lines that survive the filter."""
    ld = _line_table(spark, sf_dir).cache()
    boiler = (ld.distinct()
              .groupBy("line").agg(F.count(F.lit(1)).alias("n_docs"))
              .filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
              .select("line"))
    totals = ld.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    dropped = (ld.join(boiler, "line")
               .groupBy("doc_id").agg(F.count(F.lit(1))
                                      .alias("n_boilerplate")))
    return (totals.join(dropped, "doc_id", "left")
            .select("doc_id", "n_lines",
                    F.coalesce("n_boilerplate", F.lit(0))
                    .alias("n_boilerplate"),
                    F.floor((F.col("n_lines") -
                             F.coalesce("n_boilerplate", F.lit(0)))
                            * F.lit(1000000) / F.col("n_lines"))
                    .cast("long").alias("kept_ppm"))
            .orderBy("doc_id"))


_LINES_SQL = f"""
lines AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, cast(ceil(len(string_split({_NORM_SQL}, ' '))
                              / {LINE_TOKENS}.0) as bigint)),
           i -> array_to_string(
             (string_split({_NORM_SQL}, ' '))
               [(i * {LINE_TOKENS} + 1):(i * {LINE_TOKENS} + {LINE_TOKENS})],
             ' '))) AS line
  FROM corpus
)"""

ORACLE_CORPUS_BOILERPLATE = f"""
WITH {CORPUS_SQL}, {_LINES_SQL},
boiler AS (
  SELECT line FROM (SELECT DISTINCT doc_id, line FROM lines)
  GROUP BY line HAVING count(*) >= {BOILERPLATE_MIN_DOCS}
),
totals AS (
  SELECT doc_id, cast(count(*) as bigint) AS n_lines
  FROM lines GROUP BY doc_id
),
dropped AS (
  SELECT doc_id, cast(count(*) as bigint) AS n_boilerplate
  FROM lines JOIN boiler USING (line) GROUP BY doc_id
)
SELECT t.doc_id, t.n_lines,
       cast(coalesce(d.n_boilerplate, 0) as bigint) AS n_boilerplate,
       cast(floor((t.n_lines - coalesce(d.n_boilerplate, 0)) * 1000000.0
                  / t.n_lines) as bigint) AS kept_ppm
FROM totals t LEFT JOIN dropped d ON t.doc_id = d.doc_id
ORDER BY t.doc_id
"""

QUERIES["corpus_boilerplate_stats"] = q_corpus_boilerplate_stats
ORACLES["corpus_boilerplate_stats"] = ORACLE_CORPUS_BOILERPLATE


# ---------------------------------------------------------------------------
# Exact substring-level dedup (duplicated-span removal): find maximal
# token spans shared VERBATIM by >= 2 distinct documents — the
# suffix-array / sorted-ngram pass of a standard training-data
# pipeline (boilerplate paragraphs, license headers), which whole-doc
# and near-dup ops cannot see and line-granular boilerplate stats only
# approximate. Round-3 verdict item 1.
#
# Algorithm (sorted-ngram / prefix-group, never all-pairs):
#   1. emit every positional K-token gram as (ghash, gram, doc_id, pos)
#   2. group by (ghash, gram): keep grams in >= 2 distinct docs.
#      The shuffle key is the uniform 60-bit hash; the gram text rides
#      the key so extent verification is EXACT (a hash collision lands
#      two different grams in one bucket but they aggregate apart).
#      At 10^12-gram scale swap hash60 for a 128-bit hash and drop the
#      text from the key (re-verify colliding buckets by a text join).
#   3. per doc, merge consecutive duplicated positions into maximal
#      runs (gaps-and-islands: pos - row_number over pos); a run
#      pos p..q covers tokens [p, q+K-1]. Any shared span of >= K
#      tokens is duplicated at every internal gram position, so the
#      reconstruction is exact and maximal.
#   4. cluster = hash60 of the exact covered text: docs whose maximal
#      spans are byte-identical share a cluster id.
#
# Scale shape: one explode (positions), one shuffle on the gram hash
# (uniform — the hot keys are true boilerplate, which collapse via
# partial countDistinct), one doc_id-partitioned window (bounded by
# document length), one doc_id join to rebuild span text. Candidate
# volume is the number of POSITIONS inside genuinely duplicated spans
# — linear in corpus size for fixed duplication rate (asserted by
# jobs/soak_substring.py at 4x corpus).

SUBSTR_K = 8  # seed gram width = minimum detectable span, in tokens
# planted cross-doc spans so the gated corpus genuinely contains
# duplicated paragraphs (reproduced verbatim by the DuckDB oracle):
SUBSTR_BOILER = ("this transcript is provided under the creative "
                 "commons attribution license version four point zero")
SUBSTR_TAIL = ("generated by the synthetic conversation pipeline "
               "for internal evaluation use only")


def substr_corpus_df(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    txt = F.concat(
        F.when(F.col("doc_id") % 7 == 0,
               F.lit(SUBSTR_BOILER + " ")).otherwise(F.lit("")),
        F.col("text"),
        F.when(F.col("doc_id") % 11 == 0,
               F.lit(" " + SUBSTR_TAIL)).otherwise(F.lit("")))
    return d.select("doc_id", txt.alias("text"))


SUBSTR_CORPUS_SQL = f"""
corpus_sub AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0 THEN '{SUBSTR_BOILER} ' || text
         ELSE text END ||
    CASE WHEN doc_id % 11 = 0 THEN ' {SUBSTR_TAIL}' ELSE '' END AS text
  FROM documents
)"""


def duplicated_spans(docs, k: int = SUBSTR_K):
    """(doc_id, text) DataFrame -> maximal cross-document duplicated
    spans (doc_id, span_start, span_end, span_tokens, cluster); token
    positions are 0-based over whitespace-normalized text."""
    from pyspark.sql.window import Window

    toks = docs.select("doc_id", F.split(_norm(F.col("text")), " ")
                       .alias("toks"))
    n = F.size("toks")
    grams = (toks.filter(n >= k)
             .select("doc_id", "toks",
                     F.explode(F.sequence(
                         F.lit(0).cast("long"),
                         (n - k).cast("long"))).alias("pos"))
             .select("doc_id", "pos",
                     F.concat_ws(" ", F.slice(
                         F.col("toks"), F.col("pos") + 1, k))
                     .alias("gram")))
    g2 = grams.select("doc_id", "pos", "gram",
                      hash60(F.col("gram")).alias("ghash"))
    dupg = (g2.groupBy("ghash", "gram")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2).select("ghash", "gram"))
    dpos = g2.join(dupg, ["ghash", "gram"]).select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = dpos.withColumn("rk", F.col("pos") - F.row_number().over(w))
    spans = (runs.groupBy("doc_id", "rk")
             .agg(F.min("pos").alias("span_start"),
                  (F.max("pos") + k - 1).alias("span_end"))
             .drop("rk"))
    span_len = (F.col("span_end") - F.col("span_start") + 1)
    return (spans.join(toks, "doc_id")
            .select("doc_id", "span_start", "span_end",
                    span_len.cast("long").alias("span_tokens"),
                    hash60(F.concat_ws(" ", F.slice(
                        F.col("toks"),
                        (F.col("span_start") + 1).cast("int"),
                        span_len.cast("int")))).alias("cluster")))


def q_dedup_substring(spark, sf_dir):
    """Maximal duplicated spans over the planted-span corpus (gate
    entry for `duplicated_spans`)."""
    return (duplicated_spans(substr_corpus_df(spark, sf_dir))
            .orderBy("doc_id", "span_start"))


_SUB_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
ORACLE_DEDUP_SUBSTRING = f"""
WITH {SUBSTR_CORPUS_SQL},
toks AS (
  SELECT doc_id, string_split({_SUB_NORM}, ' ') AS toks FROM corpus_sub
),
grams AS (
  SELECT doc_id, i AS pos,
         array_to_string(toks[i+1:i+{SUBSTR_K}], ' ') AS gram
  FROM toks, unnest(range(0, len(toks) - {SUBSTR_K - 1})) u(i)
),
g2 AS (SELECT doc_id, pos, gram, {hash60_sql('gram')} AS ghash
       FROM grams),
dupg AS (SELECT ghash, gram FROM g2
         GROUP BY 1, 2 HAVING count(distinct doc_id) >= 2),
dpos AS (SELECT g.doc_id, g.pos FROM g2 g
         JOIN dupg d ON g.ghash = d.ghash AND g.gram = d.gram),
runs AS (SELECT doc_id, pos,
                pos - row_number() OVER (PARTITION BY doc_id
                                         ORDER BY pos) AS rk
         FROM dpos),
spans AS (SELECT doc_id, min(pos) AS span_start,
                 max(pos) + {SUBSTR_K - 1} AS span_end
          FROM runs GROUP BY doc_id, rk)
SELECT s.doc_id, cast(s.span_start as bigint) AS span_start,
       cast(s.span_end as bigint) AS span_end,
       cast(s.span_end - s.span_start + 1 as bigint) AS span_tokens,
       {hash60_sql("array_to_string(t.toks[s.span_start+1:s.span_end+1], ' ')")}
         AS cluster
FROM spans s JOIN toks t ON s.doc_id = t.doc_id
ORDER BY s.doc_id, s.span_start
"""

QUERIES["dedup_substring"] = q_dedup_substring
ORACLES["dedup_substring"] = ORACLE_DEDUP_SUBSTRING


# ---------------------------------------------------------------------------
# Eval-set contamination check: flag training documents sharing a
# large fraction of an eval document's distinct 3-gram shingles —
# standard pre-training hygiene (round-3 verdict item 2). The eval
# side is TINY by construction (a held-out benchmark), so its exploded
# shingle table broadcasts; the training side streams through a
# broadcast-hash join with NO shuffle of the corpus. The per-pair
# count aggregation keys on (train doc, eval doc) — bounded by the
# broadcast side — and overlap is scored as integer ppm of the EVAL
# doc's shingles (floor; no float thresholds cross-engine).

CONTAM_OVERLAP_PPM_MIN = 500000  # >= 50% of the eval doc's shingles
CONTAM_EVAL_EVERY = 50           # eval set: every 50th document


def eval_set_df(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") % CONTAM_EVAL_EVERY == 0)
            .select(F.col("doc_id").alias("eval_doc_id"),
                    F.col("text")))


def contamination(train, eval_docs,
                  min_overlap_ppm: int = CONTAM_OVERLAP_PPM_MIN):
    """(doc_id, text) training corpus x (eval_doc_id, text) eval set ->
    (doc_id, eval_doc_id, n_shared, overlap_ppm) for pairs sharing
    >= min_overlap_ppm of the eval doc's distinct shingles."""
    ev = eval_docs.select(
        "eval_doc_id", shingles_col(F.col("text")).alias("sh"))
    ev_tot = ev.select("eval_doc_id",
                       F.size("sh").cast("long").alias("n_eval"))
    ev_sh = ev.select("eval_doc_id", F.explode("sh").alias("shingle"))
    tr_sh = train.select(
        "doc_id", F.explode(shingles_col(F.col("text"))).alias("shingle"))
    shared = (tr_sh.join(F.broadcast(ev_sh), "shingle")
              .filter(F.col("doc_id") != F.col("eval_doc_id"))
              .groupBy("doc_id", "eval_doc_id")
              .agg(F.count(F.lit(1)).alias("n_shared")))
    return (shared.join(F.broadcast(ev_tot), "eval_doc_id")
            .select("doc_id", "eval_doc_id", "n_shared",
                    F.floor(F.col("n_shared") * F.lit(1000000.0)
                            / F.col("n_eval")).cast("long")
                    .alias("overlap_ppm"))
            .filter(F.col("overlap_ppm") >= min_overlap_ppm))


def q_corpus_contamination(spark, sf_dir):
    """Contamination of the injected-duplicate training corpus against
    the every-{CONTAM_EVAL_EVERY}th-doc eval set: the corpus's exact
    (+200000) and near (+100000) copies of eval docs MUST be flagged
    (asserted by tests/test_dedup.py with planted contamination)."""
    return (contamination(corpus_df(spark, sf_dir),
                          eval_set_df(spark, sf_dir))
            .orderBy("doc_id", "eval_doc_id"))


ORACLE_CORPUS_CONTAMINATION = f"""
WITH {CORPUS_SQL},
ev AS (
  SELECT doc_id AS eval_doc_id, {SHINGLES_SQL} AS sh
  FROM documents WHERE doc_id % {CONTAM_EVAL_EVERY} = 0
),
ev_sh AS (SELECT eval_doc_id, unnest(sh) AS shingle FROM ev),
ev_tot AS (SELECT eval_doc_id, cast(len(sh) as bigint) AS n_eval FROM ev),
tr_sh AS (
  SELECT doc_id, unnest({SHINGLES_SQL}) AS shingle FROM corpus
),
shared AS (
  SELECT t.doc_id, e.eval_doc_id, cast(count(*) as bigint) AS n_shared
  FROM tr_sh t JOIN ev_sh e ON t.shingle = e.shingle
  WHERE t.doc_id != e.eval_doc_id
  GROUP BY 1, 2
)
SELECT s.doc_id, s.eval_doc_id, s.n_shared,
       cast(floor(s.n_shared * 1000000.0 / v.n_eval) as bigint)
         AS overlap_ppm
FROM shared s JOIN ev_tot v ON s.eval_doc_id = v.eval_doc_id
WHERE floor(s.n_shared * 1000000.0 / v.n_eval)
      >= {CONTAM_OVERLAP_PPM_MIN}
ORDER BY s.doc_id, s.eval_doc_id
"""

QUERIES["corpus_contamination"] = q_corpus_contamination
ORACLES["corpus_contamination"] = ORACLE_CORPUS_CONTAMINATION


# ---------------------------------------------------------------------------
# Duplicated-span SCRUB: close the detection -> curation loop for
# `duplicated_spans`. One occurrence of each byte-identical span
# cluster is kept (the canonical holder = smallest (doc_id,
# span_start) in the cluster); every other occurrence is excised from
# its document's token stream. Output is the scrubbed corpus plus
# per-doc removal stats — what a training-data pipeline actually
# feeds downstream after the substring pass.
#
# Scale shape: reuses the duplicated_spans plan (one gram shuffle, one
# doc-partitioned window), then ONE tiny window over the span rows
# (partitioned by cluster — bounded by duplication mass, not corpus
# size), a collect_list of kill spans per doc (spans per doc are few
# and disjoint by the gaps-and-islands construction), and a
# broadcast-shaped left join back onto the token table followed by a
# pure array-lambda filter — no per-row Python, no corpus re-shuffle
# beyond the doc_id join.

def scrub_duplicated_spans(docs, k: int = SUBSTR_K):
    """(doc_id, text) -> (doc_id, n_spans_scrubbed, n_tokens_removed,
    text) with every non-canonical duplicated span removed. Token
    positions/normalization identical to `duplicated_spans`.

    Semantic notes: clusters are keyed by the exact text of the
    MAXIMAL per-doc extent. The same shared paragraph embedded in
    different maximal extents (because neighbouring tokens are also
    duplicated in some docs) lands in different clusters, each keeping
    its own canonical copy — one scrub pass removes identical-extent
    repetition; iterate to fixpoint for stricter no-shared-span
    guarantees (each pass strictly shrinks total duplicated mass).
    Spans from different clusters may OVERLAP in token space within a
    doc (gram-position runs are disjoint, but the +K-1 extents can
    intersect); canonical extents win — a position inside a canonical
    span is never removed, so every kept copy survives verbatim."""
    from pyspark.sql.window import Window

    spans = duplicated_spans(docs, k)
    w = Window.partitionBy("cluster").orderBy("doc_id", "span_start")
    ranked = spans.withColumn("rn", F.row_number().over(w))
    span_struct = F.struct("span_start", "span_end")
    kills = (ranked.filter(F.col("rn") > 1)
             .groupBy("doc_id")
             .agg(F.collect_list(span_struct).alias("kills")))
    keeps = (ranked.filter(F.col("rn") == 1)
             .groupBy("doc_id")
             .agg(F.collect_list(span_struct).alias("keeps")))
    toks = docs.select(
        "doc_id", F.split(_norm(F.col("text")), " ").alias("toks"))
    joined = toks.join(kills, "doc_id", "left").join(keeps, "doc_id", "left")
    keeps_arr = F.coalesce(
        F.col("keeps"),
        F.array().cast("array<struct<span_start:long,span_end:long>>"))

    def _covered(arr, i):
        return F.exists(arr, lambda s: (i >= s["span_start"])
                        & (i <= s["span_end"]))

    kept = F.when(F.col("kills").isNull(), F.col("toks")).otherwise(
        F.filter(F.col("toks"),
                 lambda t, i: ~_covered(F.col("kills"), i)
                 | _covered(keeps_arr, i)))
    return joined.select(
        "doc_id",
        F.coalesce(F.size("kills"), F.lit(0)).cast("long")
        .alias("n_spans_scrubbed"),
        (F.size("toks") - F.size(kept)).cast("long")
        .alias("n_tokens_removed"),
        F.concat_ws(" ", kept).alias("text"))


def q_dedup_substring_scrub(spark, sf_dir):
    """Scrubbed planted-span corpus; text is returned as its portable
    60-bit hash so the gate compares full content compactly."""
    s = scrub_duplicated_spans(substr_corpus_df(spark, sf_dir))
    return (s.select("doc_id", "n_spans_scrubbed", "n_tokens_removed",
                     hash60(F.col("text")).alias("text_hash"))
            .orderBy("doc_id"))


ORACLE_DEDUP_SUBSTRING_SCRUB = f"""
WITH {SUBSTR_CORPUS_SQL},
toks AS (
  SELECT doc_id, string_split({_SUB_NORM}, ' ') AS toks FROM corpus_sub
),
grams AS (
  SELECT doc_id, i AS pos,
         array_to_string(toks[i+1:i+{SUBSTR_K}], ' ') AS gram
  FROM toks, unnest(range(0, len(toks) - {SUBSTR_K - 1})) u(i)
),
g2 AS (SELECT doc_id, pos, gram, {hash60_sql('gram')} AS ghash
       FROM grams),
dupg AS (SELECT ghash, gram FROM g2
         GROUP BY 1, 2 HAVING count(distinct doc_id) >= 2),
dpos AS (SELECT g.doc_id, g.pos FROM g2 g
         JOIN dupg d ON g.ghash = d.ghash AND g.gram = d.gram),
runs AS (SELECT doc_id, pos,
                pos - row_number() OVER (PARTITION BY doc_id
                                         ORDER BY pos) AS rk
         FROM dpos),
spans AS (SELECT doc_id, min(pos) AS span_start,
                 max(pos) + {SUBSTR_K - 1} AS span_end
          FROM runs GROUP BY doc_id, rk),
spans2 AS (
  SELECT s.doc_id, s.span_start, s.span_end,
         {hash60_sql("array_to_string(t.toks[s.span_start+1:s.span_end+1], ' ')")}
           AS cluster
  FROM spans s JOIN toks t ON s.doc_id = t.doc_id
),
ranked AS (SELECT *, row_number() OVER (
             PARTITION BY cluster ORDER BY doc_id, span_start) AS rn
           FROM spans2),
kills AS (SELECT doc_id, span_start, span_end FROM ranked WHERE rn > 1),
keeps AS (SELECT doc_id, span_start, span_end FROM ranked WHERE rn = 1),
pos AS (SELECT doc_id, i AS pos, toks[i+1] AS tok
        FROM toks, unnest(range(0, len(toks))) u(i)),
killed AS (SELECT DISTINCT p.doc_id, p.pos
           FROM pos p JOIN kills k ON p.doc_id = k.doc_id
             AND p.pos BETWEEN k.span_start AND k.span_end
           WHERE NOT EXISTS (
             SELECT 1 FROM keeps q WHERE q.doc_id = p.doc_id
               AND p.pos BETWEEN q.span_start AND q.span_end)),
kept AS (SELECT p.doc_id, p.pos, p.tok FROM pos p
         ANTI JOIN killed x ON p.doc_id = x.doc_id AND p.pos = x.pos),
kill_stats AS (SELECT doc_id, cast(count(*) as bigint) AS n_spans
               FROM kills GROUP BY doc_id),
removed AS (SELECT doc_id, cast(count(*) as bigint) AS n_removed
            FROM killed GROUP BY doc_id),
scrub AS (SELECT doc_id,
                 array_to_string(list(tok ORDER BY pos), ' ') AS text
          FROM kept GROUP BY doc_id)
SELECT t.doc_id,
       cast(coalesce(ks.n_spans, 0) as bigint) AS n_spans_scrubbed,
       cast(coalesce(r.n_removed, 0) as bigint) AS n_tokens_removed,
       {hash60_sql("coalesce(s.text, '')")} AS text_hash
FROM toks t
LEFT JOIN kill_stats ks ON t.doc_id = ks.doc_id
LEFT JOIN removed r ON t.doc_id = r.doc_id
LEFT JOIN scrub s ON t.doc_id = s.doc_id
ORDER BY t.doc_id
"""

QUERIES["dedup_substring_scrub"] = q_dedup_substring_scrub
ORACLES["dedup_substring_scrub"] = ORACLE_DEDUP_SUBSTRING_SCRUB


# ---------------------------------------------------------------------------
# Decontamination: the curation counterpart of `contamination` — drop
# every training document flagged against the eval set and return the
# clean corpus. The flag set is produced by the broadcast-shaped
# contamination join (eval side tiny by construction), so the only
# cost on top of detection is a left-anti join of the corpus against a
# small flagged-id set — broadcastable at any corpus scale.

def decontaminate(train, eval_docs,
                  min_overlap_ppm: int = CONTAM_OVERLAP_PPM_MIN):
    """Training corpus minus documents sharing >= min_overlap_ppm of
    any eval doc's distinct shingles."""
    flagged = (contamination(train, eval_docs, min_overlap_ppm)
               .select("doc_id").distinct())
    return train.join(F.broadcast(flagged), "doc_id", "left_anti")


def q_corpus_decontaminate(spark, sf_dir):
    """Clean corpus after dropping the planted eval contamination
    (exact +200000 and near +100000 copies of eval docs must vanish —
    asserted by tests/test_dedup.py)."""
    d = decontaminate(corpus_df(spark, sf_dir), eval_set_df(spark, sf_dir))
    return (d.select("doc_id", hash60(_norm(F.col("text")))
                     .alias("text_hash"))
            .orderBy("doc_id"))


ORACLE_CORPUS_DECONTAMINATE = f"""
WITH {CORPUS_SQL},
ev AS (
  SELECT doc_id AS eval_doc_id, {SHINGLES_SQL} AS sh
  FROM documents WHERE doc_id % {CONTAM_EVAL_EVERY} = 0
),
ev_sh AS (SELECT eval_doc_id, unnest(sh) AS shingle FROM ev),
ev_tot AS (SELECT eval_doc_id, cast(len(sh) as bigint) AS n_eval FROM ev),
tr_sh AS (
  SELECT doc_id, unnest({SHINGLES_SQL}) AS shingle FROM corpus
),
shared AS (
  SELECT t.doc_id, e.eval_doc_id, cast(count(*) as bigint) AS n_shared
  FROM tr_sh t JOIN ev_sh e ON t.shingle = e.shingle
  WHERE t.doc_id != e.eval_doc_id
  GROUP BY 1, 2
),
flagged AS (
  SELECT DISTINCT s.doc_id
  FROM shared s JOIN ev_tot v ON s.eval_doc_id = v.eval_doc_id
  WHERE floor(s.n_shared * 1000000.0 / v.n_eval)
        >= {CONTAM_OVERLAP_PPM_MIN}
)
SELECT c.doc_id,
       {hash60_sql(_NORM_SQL)} AS text_hash
FROM corpus c ANTI JOIN flagged f ON c.doc_id = f.doc_id
ORDER BY c.doc_id
"""

QUERIES["corpus_decontaminate"] = q_corpus_decontaminate
ORACLES["corpus_decontaminate"] = ORACLE_CORPUS_DECONTAMINATE


# ---------------------------------------------------------------------------
# quality-aware canonical selection: keep the BEST doc per near-dup
# cluster (the curation decision step between clustering and the drop
# list — real pipelines keep the highest-quality member, not the
# smallest id, so a cleaned original survives its boilerplate-padded
# mirror copies).

# winner key = score * SCALE - doc_id: one int64 encodes (max score,
# then MIN doc_id) so both engines argmax with identical tie-breaks
# and no float enters the decision. score_ppm <= 1.2e6 and
# SCALE = 1e9 keep the key < 1.2e15 (int64-safe); doc ids above 1e9
# need a wider SCALE or a struct-ordering max (Spark) / row-value max
# (DuckDB) — the encoding is for oracle portability, not a design
# limit.
KEEP_BEST_KEY_SCALE = 1_000_000_000


def keep_best(corpus, clusters):
    """(doc_id, text) corpus + (doc_id, cluster_id) near-dup clusters
    -> (doc_id, cluster_id, quality_score_ppm, keep): keep=1 for the
    highest-quality member of each cluster (ties -> smallest doc_id),
    keep=1 for every unclustered singleton.

    Scale: one corpus scan for the quality stats (pure column exprs),
    one doc_id-keyed left join against the (small) cluster table, and
    ONE Exchange — the window max over cluster_id. Singleton
    "partitions" are single rows; the only wide partition is a real
    mega-cluster, whose rows are 4 ints (a 10^9-member boilerplate
    cluster ~ 32 GB on one reducer — at that extreme swap the window
    for a two-phase groupBy(cluster) max + broadcast-back of the
    winner keys, which partial-aggregates map-side)."""
    from pyspark.sql.window import Window

    from .textstats import quality_frame

    q = quality_frame(corpus).select("doc_id", "quality_score_ppm")
    m = (q.join(clusters, "doc_id", "left")
         .select(q["doc_id"],
                 F.coalesce("cluster_id", q["doc_id"]).alias("cluster_id"),
                 "quality_score_ppm"))
    selkey = (F.col("quality_score_ppm") * F.lit(KEEP_BEST_KEY_SCALE)
              - F.col("doc_id"))
    wmax = F.max(selkey).over(Window.partitionBy("cluster_id"))
    return m.select(
        "doc_id", "cluster_id", "quality_score_ppm",
        (selkey == wmax).cast("long").alias("keep"))


def q_dedup_keep_best(spark, sf_dir):
    """Keep-best over the injected-duplicate corpus: MinHash near-dup
    pairs -> connected components -> quality-argmax survivor per
    cluster. Exact-copy clusters tie on score, so the base doc (min
    id) survives; near-copy clusters resolve by the quality stats."""
    cc = connected_components(_dup_edges(spark, sf_dir))
    return keep_best(corpus_df(spark, sf_dir), cc).orderBy("doc_id")


def _oracle_dedup_keep_best() -> str:
    from .textstats import quality_sql
    return f"""
WITH RECURSIVE {_MINHASH_CTES},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM dup_pairs
  UNION ALL SELECT doc_b, doc_a FROM dup_pairs
),
reach(doc, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc
),
cc AS (SELECT doc AS doc_id, min(r) AS cluster_id FROM reach GROUP BY doc),
q AS (SELECT doc_id, quality_score_ppm FROM ({quality_sql('corpus')}) qq),
m AS (
  SELECT q.doc_id,
         coalesce(cc.cluster_id, q.doc_id) AS cluster_id,
         q.quality_score_ppm,
         q.quality_score_ppm * {KEEP_BEST_KEY_SCALE} - q.doc_id AS selkey
  FROM q LEFT JOIN cc ON q.doc_id = cc.doc_id
)
SELECT doc_id, cluster_id, quality_score_ppm,
       cast(selkey = max(selkey) OVER (PARTITION BY cluster_id) as bigint)
         AS keep
FROM m ORDER BY doc_id
"""


ORACLE_DEDUP_KEEP_BEST = _oracle_dedup_keep_best()

QUERIES["dedup_keep_best"] = q_dedup_keep_best
ORACLES["dedup_keep_best"] = ORACLE_DEDUP_KEEP_BEST


# ---------------------------------------------------------------------------
# Line-level dedup SCRUB (CCNet / RefinedWeb boilerplate removal) —
# the excision sibling of q_corpus_boilerplate_stats above: where the
# stats op only COUNTS frequent lines, this one actually REMOVES them
# and emits the reconstructed document (as its 60-bit hash, so the
# gate compare stays cheap) plus exact token accounting. Same
# relationship as dedup_substring -> dedup_substring_scrub.
#
# The op itself consumes any (doc_id, text) frame whose text carries
# real newlines. The gated corpus is line-structured
# deterministically from `documents` (which has none): each doc's
# normalized text folded into LINE_TOKENS-token lines, a planted
# header line on every doc and a footer line on every 5th doc — so
# removal is non-trivial and the oracle reproduces it byte-for-byte.
#
# Scale shape (100 TB): explode to lines (one scan), shuffle ONCE on
# the 60-bit line hash for the distinct-doc count (partial map-side
# combine; the duplicated-line table is tiny relative to the corpus),
# hash-join the flags back, shuffle ONCE on doc_id to reassemble.
# Never all-pairs, no skew: line hashes are uniform, and the one hot
# key class (the ubiquitous boilerplate line itself) collapses
# map-side in the partial aggregate.

LINE_MIN_DOCS = 3
LINE_HEADER = "subscribe to our newsletter for daily updates and offers"
LINE_FOOTER = "all rights reserved contact the site administrator today"


def line_corpus_df(spark, sf_dir):
    """documents -> line-structured corpus (doc_id, text-with-\\n)."""
    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .select("doc_id", F.split(_norm(F.col("text")), " ")
                 .alias("toks")))
    body = F.expr(
        "concat_ws('\\n', transform(sequence(0, "
        f"(size(toks) + {LINE_TOKENS - 1}) div {LINE_TOKENS} - 1), "
        f"i -> concat_ws(' ', slice(toks, cast(i * {LINE_TOKENS} + 1 "
        f"as int), {LINE_TOKENS}))))")
    txt = F.concat_ws(
        "\n", F.lit(LINE_HEADER), body,
        F.when(F.col("doc_id") % 5 == 0, F.lit(LINE_FOOTER)))
    return d.select("doc_id", txt.alias("text"))


LINE_CORPUS_SQL = f"""
line_toks AS (
  SELECT doc_id, string_split({_SUB_NORM}, ' ') AS toks FROM documents
),
line_corpus AS (
  SELECT doc_id,
    '{LINE_HEADER}' || chr(10) ||
    array_to_string(list_transform(
      range(0, (len(toks) + {LINE_TOKENS - 1}) // {LINE_TOKENS}),
      i -> array_to_string(
        toks[i * {LINE_TOKENS} + 1 : i * {LINE_TOKENS} + {LINE_TOKENS}],
        ' ')), chr(10)) ||
    CASE WHEN doc_id % 5 = 0 THEN chr(10) || '{LINE_FOOTER}'
         ELSE '' END AS text
  FROM line_toks
)"""


def line_dedup_stats(docs, min_docs: int = LINE_MIN_DOCS):
    """(doc_id, text) with newline-separated lines -> per-doc line
    dedup accounting: (doc_id, n_lines, n_removed, tokens_removed,
    kept_hash) where kept_hash is the 60-bit hash of the document
    with every corpus-frequent line (>= min_docs distinct docs)
    excised, remaining lines rejoined by newline in original order.

    Join is on (hash, line) — exact, hash-collision-proof, same
    contract as duplicated_spans above.

    The exploded line frame feeds BOTH the dup-count agg and the
    join-back; Catalyst does not dedupe the shared subtree (see
    CLAUDE.md), so it is cached here like corpus_boilerplate_stats's
    line table. At cluster scale, where caching the corpus is not an
    option, drop the cache and accept the second columnar scan — the
    shuffle shapes are unchanged."""
    g = (docs.select(
            "doc_id",
            F.posexplode(F.split("text", "\n")).alias("line_idx", "line"))
         .withColumn("lhash", hash60(F.col("line")))
         .withColumn("ln", F.size(F.split("line", " ")))
         .cache())
    dup = (g.groupBy("lhash", "line")
           .agg(F.countDistinct("doc_id").alias("nd"))
           .filter(F.col("nd") >= min_docs)
           .select("lhash", "line", F.lit(1).alias("is_dup")))
    flagged = (g.join(dup, ["lhash", "line"], "left")
               .na.fill({"is_dup": 0}))
    arr = F.array_sort(
        F.collect_list(F.struct("line_idx", "line", "is_dup")))
    kept_txt = F.concat_ws(
        "\n", F.transform(
            F.filter(arr, lambda x: x["is_dup"] == F.lit(0)),
            lambda x: x["line"]))
    return (flagged.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum("is_dup").alias("n_removed"),
                 F.sum(F.when(F.col("is_dup") == 1, F.col("ln"))
                       .otherwise(0)).alias("tokens_removed"),
                 hash60(kept_txt).alias("kept_hash")))


def q_corpus_line_dedup(spark, sf_dir):
    """Line-level boilerplate removal over the line-structured
    corpus (gate entry for line_dedup_stats)."""
    return (line_dedup_stats(line_corpus_df(spark, sf_dir))
            .orderBy("doc_id"))


ORACLE_CORPUS_LINE_DEDUP = f"""
WITH {LINE_CORPUS_SQL},
lns AS (
  SELECT doc_id, string_split(text, chr(10)) AS lines FROM line_corpus
),
g AS (
  SELECT doc_id, i AS line_idx, lines[i + 1] AS line,
         len(string_split(lines[i + 1], ' ')) AS ln,
         {hash60_sql('lines[i + 1]')} AS lhash
  FROM lns, unnest(range(0, len(lines))) u(i)
),
dup AS (
  SELECT lhash, line FROM g GROUP BY 1, 2
  HAVING count(distinct doc_id) >= {LINE_MIN_DOCS}
),
flagged AS (
  SELECT g.doc_id, g.line_idx, g.line, g.ln,
         CASE WHEN d.lhash IS NOT NULL THEN 1 ELSE 0 END AS is_dup
  FROM g LEFT JOIN dup d ON g.lhash = d.lhash AND g.line = d.line
)
SELECT doc_id,
  cast(count(*) as bigint) AS n_lines,
  cast(sum(is_dup) as bigint) AS n_removed,
  cast(sum(CASE WHEN is_dup = 1 THEN ln ELSE 0 END) as bigint)
    AS tokens_removed,
  {hash60_sql("coalesce(array_to_string(list(line ORDER BY line_idx) "
              "FILTER (WHERE is_dup = 0), chr(10)), '')")} AS kept_hash
FROM flagged GROUP BY doc_id ORDER BY doc_id
"""

QUERIES["corpus_line_dedup"] = q_corpus_line_dedup
ORACLES["corpus_line_dedup"] = ORACLE_CORPUS_LINE_DEDUP
