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
SIMHASH_BITS = 32
SIMHASH_MAX_HAMMING = 6


# ---------------------------------------------------------------------------
# corpus with injected duplicates

def corpus_df(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
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
    norm = _norm(col)
    tokens = F.split(norm, " ")
    n = F.size(tokens)
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(0), n - 3),
        lambda i: F.concat_ws(
            " ", F.element_at(tokens, i + 1), F.element_at(tokens, i + 2),
            F.element_at(tokens, i + 3))))
    return F.when(n >= 3, grams).otherwise(F.array(norm))


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
def _with_shingles(spark, sf_dir):
    """Shingle table, cached: every dedup op self-joins it 2-3 times
    (signature build, candidate sides, verification) — one scan +
    in-memory columnar reuse instead of recomputing the corpus DAG
    per branch. At 100 TB the same role is played by materializing
    the shingle/signature table once per run."""
    return (corpus_df(spark, sf_dir)
            .select("doc_id", shingles_col(F.col("text")).alias("shingles"))
            .cache())


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash(8) + LSH(4 bands x 2 rows): shingle→minhash→band→
    bucket-join→exact-Jaccard verify (J >= 0.5).

    Scale path: band-key self-join is the only shuffle over candidates;
    signatures are 8 longs/doc (tiny); verification joins shingle
    arrays only for candidate pairs."""
    docs = _with_shingles(spark, sf_dir)
    sig = docs.select(
        "doc_id", "shingles",
        *[F.array_min(F.transform(
            F.col("shingles"),
            lambda s, h=h: hash60(F.concat(s, F.lit(f"|{h}")))))
          .alias(f"sig{h}") for h in range(N_MINHASH)])
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.md5(F.concat_ws(
                         "_", F.col(f"sig{2*b}").cast("string"),
                         F.col(f"sig{2*b+1}").cast("string")))
                     .alias("bkey"))
            for b in range(N_BANDS)])).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bkey")
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
    return verified.orderBy("doc_a", "doc_b")


_SIG_SQL = ", ".join(
    f"list_min(list_transform(shingles, s -> "
    f"{hash60_sql(f_expr)})) AS sig{h}"
    for h, f_expr in ((h, f"s || '|{h}'") for h in range(N_MINHASH)))
_BANDS_SQL = ", ".join(
    f"md5(cast(sig{2*b} as string) || '_' || cast(sig{2*b+1} as string))"
    f" AS bkey{b}" for b in range(N_BANDS))
_BAND_UNION = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, bkey{b} AS bkey FROM sigs"
    for b in range(N_BANDS))
ORACLE_DEDUP_MINHASH = f"""
WITH {CORPUS_SQL},
docs AS (SELECT doc_id, {SHINGLES_SQL} AS shingles FROM corpus),
sigs0 AS (SELECT doc_id, shingles, {_SIG_SQL} FROM docs),
sigs AS (SELECT *, {_BANDS_SQL} FROM sigs0),
bands AS ({_BAND_UNION}),
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
)
SELECT * FROM verified WHERE jaccard_ppm >= {JACCARD_PPM_MIN}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
def q_dedup_ngram_jaccard(spark, sf_dir):
    """EXACT n-gram Jaccard pairs (J >= 0.5) via prefix filtering: two
    docs with J >= t must share a shingle among the first
    floor((1-t)*|S|)+1 of any fixed total order of their shingles.
    Complete (no missed pairs), no cross join — the blocking join key
    is a single shingle string."""
    docs = _with_shingles(spark, sf_dir)
    sorted_sh = F.array_sort("shingles")
    prefix_len = (F.size("shingles") -
                  F.ceil(F.size("shingles") * F.lit(0.5)).cast("int") + 1)
    prefix = docs.select(
        "doc_id", F.explode(F.slice(sorted_sh, F.lit(1), prefix_len))
        .alias("shingle"))
    cand = (prefix.alias("a").join(
        prefix.alias("b"),
        (F.col("a.shingle") == F.col("b.shingle")) &
        (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b")).distinct())
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
prefixes AS (
  SELECT doc_id,
         unnest(list_sort(shingles)[1:
           (len(shingles) - cast(ceil(len(shingles) * 0.5e0) as int) + 1)])
           AS shingle
  FROM docs
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
def q_dedup_simhash(spark, sf_dir):
    """32-bit SimHash over token frequencies; near-dup pairs =
    hamming <= 6, blocked on 4x8-bit bands (a pair within hamming 3*?
    must agree on >= 1 band when <= 3 bits differ per pigeonhole; with
    6 allowed bits this is a high-recall heuristic, verified exactly
    by bit_count on candidates)."""
    c = corpus_df(spark, sf_dir)
    tok = c.select(
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
    sh = sums.select("doc_id", simhash.cast("long").alias("simhash"))
    bands = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.expr(f"(simhash >> {8*b}) & 255").alias("bkey"))
            for b in range(4)])).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bkey")
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
    f"SELECT doc_id, simhash, {b} AS band, (simhash >> {8*b}) & 255 AS bkey "
    f"FROM sh" for b in range(4))
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
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_simhash": q_dedup_simhash,
}
ORACLES = {
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_minhash_lsh": ORACLE_DEDUP_MINHASH,
    "dedup_ngram_jaccard": ORACLE_DEDUP_NGRAM,
    "dedup_simhash": ORACLE_DEDUP_SIMHASH,
}
