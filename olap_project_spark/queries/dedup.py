"""Deduplication operators over the ``documents`` table — the core
training-data pipeline surface (exact, n-gram Jaccard, MinHash+LSH,
SimHash). Each is a first-class query with a DuckDB oracle: the portable
48-bit md5-derived hash (functions.text.portable_hash48) makes even the
sketch-based dedups bit-identical across engines.

Scale design (the point of each operator at 100 TB):
- exact: shuffle 8-byte fingerprints, never documents.
- n-gram Jaccard: |shingle|-row explode → equi-join on shingle — the
  quadratic pair space is never materialized, only co-shingled pairs.
- MinHash LSH: k=32 permutations, 8 bands × 4 rows; candidate pairs
  come from band-key equality (a hash-partitioned groupBy), then exact
  Jaccard verifies candidates only. This is the sub-quadratic scale
  path: cost ~ O(docs · k + candidates).
- SimHash: 32-bit majority fingerprint per doc; byte-band blocking
  (pigeonhole over 4 bytes) replaces the all-pairs Hamming scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olap_project_spark.functions.text import (
    MERSENNE31,
    minhash_param,
    normalize_text,
    portable_hash48,
    tokens,
    word_shingles,
)
from olap_project_spark.queries import load, register, session_memo

N_PERM = 32          # minhash permutations
BAND_ROWS = 4        # rows per LSH band → 8 bands
JACCARD_THRESHOLD = 0.7
# The prefix filter needs ⌈t·n⌉ in INTEGER arithmetic on both engines,
# so the threshold is carried as an exact rational alongside the float:
# ⌈(JT_NUM·n)/JT_DEN⌉ = (JT_NUM·n + JT_DEN − 1) div JT_DEN. Derived
# from JACCARD_THRESHOLD so retuning the constant cannot silently
# break the lossless-prefix guarantee.
from fractions import Fraction as _Fraction

_JT = _Fraction(JACCARD_THRESHOLD).limit_denominator(1_000)
JT_NUM, JT_DEN = _JT.numerator, _JT.denominator
assert float(_JT) == JACCARD_THRESHOLD, "threshold must be exactly rational"

# Shared SQL fragments -------------------------------------------------------

_SQL_SHINGLES = """
    toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts
      FROM documents
    ),
    sh0 AS (
      SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
      FROM toks, UNNEST(range(1, len(ts) - 1)) AS t(i)
      WHERE len(ts) >= 3
    ),
    -- join/aggregate on the portable 48-bit hash: 8-byte keys shuffle
    -- and compare far faster than shingle strings, identically in both
    -- engines (collision odds ~|shingles|²/2^48 — negligible)
    sh AS (
      SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 12) AS BIGINT) AS shingle
      FROM sh0
    ),
    shc AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)
"""

# Stop-shingle document-frequency cap for the EXACT ngram paths
# (ngram_dup_pairs and its cluster/triangle/kNN/pagerank consumers,
# benchmark_contamination): a shingle present in more than
# NGRAM_MAX_DF documents is boilerplate (headers, licence blocks,
# navigation chrome) — it identifies nothing, and its posting list
# self-joins into df² candidate pairs, the one unbounded-skew hole in
# an otherwise bucketed plan. Production dedup pipelines drop such
# stop-shingles before joining (the GPT-3/CCNet decontamination
# convention); Jaccard/overlap are then computed over the FILTERED
# shingle universe on BOTH engines (n_sh counts capped shingles too),
# so the metric stays a true Jaccard of informative-shingle sets. The
# MinHash/LSH path keeps the uncapped universe — banding already
# bounds its candidate generation.
NGRAM_MAX_DF = 32

_SQL_SHINGLES_CAPPED = (
    _SQL_SHINGLES
    + f""",
    shdf AS (SELECT shingle FROM sh
             GROUP BY shingle HAVING COUNT(*) <= {NGRAM_MAX_DF}),
    shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN shdf USING (shingle)),
    shfc AS (SELECT doc_id, COUNT(*) AS n_sh FROM shf GROUP BY doc_id)
"""
)


def _shingle_df(spark: SparkSession, sf_dir: str, cache: bool = True) -> DataFrame:
    """(doc_id, shingle) — distinct 3-gram word shingles per doc.

    Cached by default: every consumer self-joins it (pairs need it 2-3
    times), and without persistence Spark re-runs the scan+tokenize+
    explode once per plan branch. The cached form is a few MB per 10⁴
    docs; at 100 TB you'd materialize it to a bucketed table instead."""
    if cache:
        return session_memo(
            spark, sf_dir, "shingles", lambda: _shingle_df(spark, sf_dir, False)
        )
    docs = load(spark, sf_dir, "documents")
    # A small corpus arrives as one parquet file = ONE partition; the
    # tokenize/shingle/hash projection is the expensive part, so spread
    # it across cores first (at 100 TB the scan is already parallel and
    # this repartition is a no-op cost-wise).
    par = spark.sparkContext.defaultParallelism
    sh = (
        docs.repartition(par, "doc_id")
        # materialize the token array BEFORE shingling: HOFs are
        # interpreted without common-subexpression elimination, so an
        # inlined split() would re-tokenize the text once per
        # element_at — O(len·shingles) instead of O(len)
        .select("doc_id", tokens(F.col("text")).alias("tok"))
        .select("doc_id", F.explode(word_shingles(F.col("tok"), 3)).alias("shingle_str"))
        .select("doc_id", portable_hash48(F.col("shingle_str")).alias("shingle"))
        # set semantics via codegen'd hash aggregate, not interpreted
        # per-array array_distinct (see word_shingles docstring)
        .distinct()
    )
    return sh


def _capped_shingle_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) restricted to shingles with document frequency
    ≤ NGRAM_MAX_DF — the stop-shingle-filtered universe the exact ngram
    paths join on (see NGRAM_MAX_DF). One hash aggregate over the
    memoized shingle frame + a semi-join-shaped equi-join; memoized
    because every exact-path consumer starts here."""
    def build() -> DataFrame:
        sh = _shingle_df(spark, sf_dir)
        keep = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= NGRAM_MAX_DF)
            .select("shingle")
        )
        return sh.join(keep, "shingle").select("doc_id", "shingle")

    return session_memo(spark, sf_dir, "shingles_capped", build)


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------
@register(
    "exact_dedup_summary",
    oracle="""
    WITH fp AS (
      SELECT source,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS f
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT f) AS n_unique,
           COUNT(*) - COUNT(DISTINCT f) AS n_dupes
    FROM fp GROUP BY source
    """,
)
def exact_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (hash) dedup accounting per source: documents whose
    whitespace-normalized md5 collides are duplicates.

    Scale: the shuffle carries (source, 16-byte md5); distinct-count is
    Spark's two-phase partial-distinct. To *materialize* the deduped set
    you'd groupBy(fingerprint).agg(min(doc_id)) — same shuffle shape."""
    docs = load(spark, sf_dir, "documents")
    fp = docs.select("source", F.md5(normalize_text(F.col("text"))).alias("f"))
    return fp.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("f").alias("n_unique"),
        (F.count("*") - F.countDistinct("f")).alias("n_dupes"),
    )


# --------------------------------------------------------------------------
# N-gram Jaccard near-dup pairs
# --------------------------------------------------------------------------
@register(
    "ngram_dup_pairs",
    oracle=f"""
    WITH {_SQL_SHINGLES_CAPPED},
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common), 6)
             AS jaccard
    FROM pairs
    JOIN shfc ca ON ca.doc_id = doc_a
    JOIN shfc cb ON cb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common)
          >= {JACCARD_THRESHOLD}
    """,
)
def ngram_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by exact 3-gram-shingle Jaccard ≥ 0.7,
    computed over the stop-shingle-filtered universe (document
    frequency ≤ NGRAM_MAX_DF — see the constant's rationale).

    Scale: explode-to-shingles then equi-join on the shingle — only
    co-shingled pairs reach the aggregate (never |docs|²). The df cap
    bounds every posting list at NGRAM_MAX_DF, so the self-join emits
    ≤ df²/2 pairs per shingle by construction — the boilerplate-
    shingle k² blowup cannot happen; AQE skew-split covers what
    residual imbalance remains, and the MinHash variant below is the
    sketch-based alternative at extreme corpus sizes.

    The verified pair set is memoized per (session, corpus): the
    clustering, triangle, and kNN-graph operators all consume it, and
    each would otherwise redo the shingle self-join."""
    return session_memo(
        spark, sf_dir, "ngram_pairs", lambda: _ngram_pairs_build(spark, sf_dir)
    )


def _ngram_pairs_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _capped_shingle_df(spark, sf_dir)
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    ca = cnt.alias("ca")
    cb = cnt.alias("cb")
    jac = F.col("n_common").cast("double") / (
        F.col("ca.n_sh") + F.col("cb.n_sh") - F.col("n_common")
    )
    return (
        pairs.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# Prefix-filtered set-similarity join (PPJoin-style, lossless)
# --------------------------------------------------------------------------
@register(
    "prefix_filtered_dup_pairs",
    oracle=f"""
    WITH {_SQL_SHINGLES_CAPPED},
    dfq AS (SELECT shingle, COUNT(*) AS dfreq FROM shf GROUP BY shingle),
    ordd AS (
      SELECT shf.doc_id, shf.shingle,
             row_number() OVER (PARTITION BY shf.doc_id
                                ORDER BY dfreq, shf.shingle) AS rn
      FROM shf JOIN dfq USING (shingle)
    ),
    pre AS (
      SELECT o.doc_id, o.shingle
      FROM ordd o JOIN shfc c USING (doc_id)
      WHERE o.rn <= c.n_sh - (({JT_NUM} * c.n_sh + {JT_DEN - 1}) // {JT_DEN}) + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM pre a JOIN pre b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
      FROM cand c
      JOIN shf a ON a.doc_id = c.doc_a
      JOIN shf b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT v.doc_a, v.doc_b,
           ROUND(CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common), 6)
             AS jaccard
    FROM verified v
    JOIN shfc ca ON ca.doc_id = v.doc_a
    JOIN shfc cb ON cb.doc_id = v.doc_b
    WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common)
          >= {JACCARD_THRESHOLD}
    """,
)
def prefix_filtered_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME near-dup pair set as ngram_dup_pairs, produced with the
    prefix-filtering candidate generator (Chaudhuri/Ganti/Kaushik "A
    primitive operator for similarity joins", ICDE 2006; the PPJoin
    family): order every document's shingles by ascending global
    document frequency, keep only the first |s| − ⌈t·|s|⌉ + 1 of them
    (integer arithmetic via the exact rational t = JT_NUM/JT_DEN,
    ⌈t·n⌉ = ``(JT_NUM·n + JT_DEN−1) div JT_DEN``), and join
    prefixes only — two sets with Jaccard ≥ t MUST share an element
    inside both prefixes under a shared total order, so the filter is
    LOSSLESS; survivors are verified against the full shingle sets.

    Why it matters at 100 TB: the full posting-list self-join touches
    every co-shingled pair; the prefix join touches only pairs that
    collide within ~30% of each doc's rarest shingles — orders of
    magnitude fewer candidates on natural corpora (rare shingles have
    df ≈ 1), with EXACTLY the ngram_dup_pairs result (pinned by test
    and by this oracle, which mirrors the prefix construction).

    Scale: df ranking is one hash aggregate + a per-doc window
    (partitioned by doc_id); the candidate join inherits the
    NGRAM_MAX_DF cap on top of the prefix filter; verification is two
    bounded equi-joins over candidate pairs only."""
    sh = _capped_shingle_df(spark, sf_dir)
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("dfreq"))
    w = Window.partitionBy("doc_id").orderBy("dfreq", "shingle")
    pre = (
        sh.join(dfreq, "shingle")
        .withColumn("rn", F.row_number().over(w))
        .join(cnt, "doc_id")
        .filter(
            F.col("rn")
            <= F.expr(
                f"n_sh - (({JT_NUM} * n_sh + {JT_DEN - 1}) div {JT_DEN}) + 1"
            )
        )
        .select("doc_id", "shingle")
    )
    cand = (
        pre.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(pre.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        verified.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dup pairs
# --------------------------------------------------------------------------
def _minhash_cand_cte() -> str:
    """CTE chain from documents to the LSH candidate pair set (shared
    by the pair oracle and the LSH-quality oracle: same text, provably
    the same candidate generation)."""
    min_exprs = ",\n             ".join(
        f"MIN(({minhash_param(k)[0]} * h + {minhash_param(k)[1]}) % {MERSENNE31}) AS mh{k}"
        for k in range(N_PERM)
    )
    band_selects = "\n      UNION ALL\n".join(
        f"""      SELECT doc_id, {b} AS band,
             md5({" || ',' || ".join(f"CAST(mh{k} AS VARCHAR)" for k in range(b * BAND_ROWS, (b + 1) * BAND_ROWS))})
               AS band_key FROM sig"""
        for b in range(N_PERM // BAND_ROWS)
    )
    return f"""{_SQL_SHINGLES},
    hashes AS (
      SELECT doc_id, shingle % {MERSENNE31} AS h
      FROM sh
    ),
    sig AS (
      SELECT doc_id,
             {min_exprs}
      FROM hashes
      GROUP BY doc_id
    ),
    bands AS (
{band_selects}
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id
    )"""


def _minhash_oracle() -> str:
    return f"""
    WITH {_minhash_cand_cte()},
    verified AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT v.doc_a, v.doc_b,
           ROUND(CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common), 6)
             AS jaccard
    FROM verified v
    JOIN shc ca ON ca.doc_id = v.doc_a
    JOIN shc cb ON cb.doc_id = v.doc_b
    WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common)
          >= {JACCARD_THRESHOLD}
    """


def _minhash_bands(sh: DataFrame) -> DataFrame:
    """(doc_id, band, band_key): the 8 LSH band keys per document from
    the MinHash(32) signature. All 32 permutation minima are computed
    as aggregate expressions in ONE (doc_id)-groupBy over the
    shingle-hash rows — no k× row blowup, fully map-side-combinable;
    banding is a per-row projection exploded to 8 rows/doc. Shared by
    the symmetric (corpus×corpus) and incremental (batch×corpus)
    dedup queries."""
    # shingle is already the uniform 48-bit hash — fold into the field
    hashes = sh.select("doc_id", (F.col("shingle") % MERSENNE31).alias("h"))
    sig = hashes.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(minhash_param(k)[0]) * F.col("h") + F.lit(minhash_param(k)[1]))
                % MERSENNE31
            ).alias(f"mh{k}")
            for k in range(N_PERM)
        ]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh{k}").cast("string")
                        for k in range(b * BAND_ROWS, (b + 1) * BAND_ROWS)
                    ],
                )
            ).alias("band_key"),
        )
        for b in range(N_PERM // BAND_ROWS)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select(
        "doc_id",
        F.col("bk.band").alias("band"),
        F.col("bk.band_key").alias("band_key"),
    )


def _lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The symmetric LSH candidate-pair set — the distinct
    (doc_a < doc_b) pairs sharing at least one (band, band_key) —
    memoized+persisted: ``minhash_dup_pairs`` (verification) and
    ``minhash_lsh_quality`` (precision/recall audit) consume the SAME
    self-join, so the band self-join + distinct runs once per
    (session, corpus) instead of once per consumer (at 100 TB: the
    candidate table a dedup pipeline materializes between its verify
    and audit stages)."""

    def build() -> DataFrame:
        sh = _shingle_df(spark, sf_dir)
        bands = session_memo(
            spark, sf_dir, "minhash_bands", lambda: _minhash_bands(sh)
        )
        x = bands.alias("x")
        y = bands.alias("y")
        return (
            x.join(
                y,
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.band_key") == F.col("y.band_key"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"),
            )
            .distinct()
        )

    return session_memo(spark, sf_dir, "minhash_cand", build)


@register("minhash_dup_pairs", oracle=_minhash_oracle)
def minhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(k=32) + LSH(8 bands × 4 rows) near-dup candidates,
    verified by exact Jaccard ≥ 0.7 — the sub-quadratic scale path for
    corpus dedup.

    The hash family is (a·h48 + b) mod 2^31-1 over the portable md5-
    derived shingle hash, so the DuckDB oracle reproduces the *exact*
    signatures, not just the final pairs.

    Scale: all 32 permutation minima are computed as 32 aggregate
    expressions in ONE (doc_id)-groupBy over the shingle-hash rows — no
    k× row blowup, fully map-side-combinable. Banding is a per-row
    projection exploded to 8 (band, key) rows/doc; candidate generation
    is an equi-join on (band, band_key) — hash-partitioned, no broadcast
    of the corpus. At ~0.7 similarity, P(candidate)=1-(1-s^4)^8 ≈ 0.93."""
    sh = _shingle_df(spark, sf_dir)
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # memoized: the quality audit consumes the same candidate set
    cand = _lsh_candidates(spark, sf_dir)
    a = sh.alias("a")
    b = sh.alias("b")
    verified = (
        cand.join(a, F.col("a.doc_id") == F.col("doc_a"))
        .join(
            b,
            (F.col("b.doc_id") == F.col("doc_b"))
            & (F.col("b.shingle") == F.col("a.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    ca = cnt.alias("ca")
    cb = cnt.alias("cb")
    jac = F.col("n_common").cast("double") / (
        F.col("ca.n_sh") + F.col("cb.n_sh") - F.col("n_common")
    )
    return (
        verified.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# SimHash fingerprints + close pairs
# --------------------------------------------------------------------------
SIMHASH_BITS = 32
HAMMING_MAX = 3


def _simhash_oracle() -> str:
    bit_sums = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(SIMHASH_BITS)
    )
    fp = " + ".join(f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(SIMHASH_BITS))
    return f"""
    WITH {_SQL_SHINGLES},
    hashes AS (
      SELECT doc_id, shingle AS h FROM sh
    ),
    bitsum AS (
      SELECT doc_id,
             {bit_sums}
      FROM hashes GROUP BY doc_id
    ),
    fp AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM bitsum),
    bands AS (
      SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS key
      FROM fp, UNNEST([0, 1, 2, 3]) AS t(band)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, x.simhash AS fa,
                      y.doc_id AS doc_b, y.simhash AS fb
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(fa, fb)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(fa, fb)) <= {HAMMING_MAX}
    """


@register("simhash_dup_pairs", oracle=_simhash_oracle)
def simhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(32-bit, distinct 3-gram-shingle features) near-dup pairs
    with Hamming distance ≤ 3. (Unigram features are useless on a
    small shared vocabulary — every doc's token *set* converges; the
    shingle feature space keeps fingerprints discriminative.)

    Scale: fingerprints are one explode + groupBy (32 conditional sums
    fused into one aggregate). Candidate pairs come from byte-band
    blocking — pigeonhole: a pair ≤3 bits apart over 4 bytes must share
    ≥1 exact byte, so an equi-join on (band, byte) finds every such
    pair without the |docs|² Hamming scan; the xor-popcount check then
    runs on candidates only. Band buckets grow linearly with corpus
    size (256 values/band) — at extreme scale widen bands to 16 bits
    (≤1-flip guarantee per half) or pre-partition by a fingerprint
    prefix."""
    sh = _shingle_df(spark, sf_dir)
    hashes = sh.select("doc_id", F.col("shingle").alias("h"))  # already hashed
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ]
    bitsum = hashes.groupBy("doc_id").agg(*bit_sums)
    fp_expr = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(0)
        fp_expr = term if fp_expr is None else fp_expr + term
    fp = bitsum.select("doc_id", fp_expr.cast("bigint").alias("simhash"))
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("band"),
    ).withColumn(
        # python-side F.shiftright needs a literal shift; SQL shiftright
        # accepts a column expression
        "key", F.expr("shiftright(simhash, band * 8) & 255")
    )
    x = bands.alias("x")
    y = bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("x.simhash").alias("fa"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("y.simhash").alias("fb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).cast("int")
    return (
        cand.filter(hamming <= HAMMING_MAX)
        .select("doc_a", "doc_b", hamming.alias("hamming"))
    )


# --------------------------------------------------------------------------
# Near-dup CLUSTERING — connected components over the dup-pair graph
# --------------------------------------------------------------------------
def _cluster_oracle() -> str:
    """Transitive closure by recursive CTE over the verified ngram dup
    pairs, then component id = min reachable doc_id. Closure size is
    bounded by sum(|component|²) — near-dup clusters are small, so this
    stays cheap for the oracle even though the Spark path uses the
    iterative formulation that scales."""
    from olap_project_spark.queries import QUERY_REGISTRY

    ngram_sql = QUERY_REGISTRY["ngram_dup_pairs"].oracle
    return f"""
    WITH RECURSIVE jp AS ({ngram_sql}),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM jp
      UNION ALL
      SELECT doc_b AS a, doc_a AS b FROM jp
    ),
    reach(a, b) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
    sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id)
    SELECT comp.doc_id, comp.cluster_id, sizes.cluster_size
    FROM comp JOIN sizes ON comp.cluster_id = sizes.cluster_id
    """


@register("near_dup_clusters", oracle=_cluster_oracle)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group near-duplicate PAIRS into CLUSTERS (connected components)
    — the step a real corpus-dedup pipeline runs after pair detection,
    so one canonical doc per cluster survives (keep doc_id ==
    cluster_id, drop the rest). Returns (doc_id, cluster_id,
    cluster_size) for every document that has at least one near-dup;
    cluster_id = min doc_id of the component.

    Spark-first formulation: iterative min-label propagation over
    DataFrame joins — label(x) ← min(label(x), min label of x's
    neighbors) until a fixpoint, converging in O(component diameter)
    rounds (near-dup clusters are tiny; 2-4 rounds in practice). Each
    round localCheckpoints to cut lineage (same driver-loop pattern as
    queries/iterative.py k-means).

    Scale: each round is one equi-join edges⋈labels + one groupBy —
    both partition on doc_id, no broadcast of the corpus, no driver-side
    graph. For planet-scale graphs you'd switch to the large-star/
    small-star variant (fewer rounds on high-diameter graphs); for
    dup-cluster graphs (diameter ~2-3) plain propagation is already
    optimal. The oracle checks the SAME answer via a recursive-CTE
    transitive closure — the formulation that does NOT scale but is
    exact at test size."""
    from olap_project_spark.functions.graph import connected_components

    def build_labels() -> DataFrame:
        edges = ngram_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
        return connected_components(edges, src="doc_a", dst="doc_b")

    # memoized: dedup_keep_best consumes the same component labels —
    # without this the iterative CC loop runs once per consumer
    labels = session_memo(spark, sf_dir, "near_dup_cc_labels", build_labels)
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select("doc_id", F.col("label").alias("cluster_id"), "cluster_size")
    )


# --------------------------------------------------------------------------
# Dedup materialization: per-cluster keeper selection by quality
# --------------------------------------------------------------------------
def _keep_best_oracle() -> str:
    from olap_project_spark.queries import QUERY_REGISTRY

    cluster_sql = QUERY_REGISTRY["near_dup_clusters"].oracle
    return f"""
    WITH comp AS ({cluster_sql}),
    scored AS (
      SELECT c.cluster_id, c.cluster_size, d.doc_id,
             length(d.text) AS quality,
             row_number() OVER (
               PARTITION BY c.cluster_id
               ORDER BY length(d.text) DESC, d.doc_id
             ) AS rn
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT cluster_id,
           doc_id AS kept_doc,
           quality AS kept_quality,
           CAST(cluster_size - 1 AS BIGINT) AS n_dropped
    FROM scored WHERE rn = 1
    """


@register("dedup_keep_best", oracle=_keep_best_oracle)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION, materialized: for every near-dup cluster,
    keep the highest-quality member (longest text; deterministic doc_id
    tie-break) and count what gets dropped — the step that turns pair/
    cluster detection into an actionable corpus delta. near_dup_clusters
    picks min-id keepers; this variant picks BY QUALITY, which is what
    production curation does (keep the best copy, not the first).

    Scale: clusters join back to documents on doc_id (hash-partitioned
    equi-join touching only clustered docs — a tiny fraction of the
    corpus), and the keeper choice is a per-cluster WindowGroupLimit,
    state bounded by cluster size. The full deduped corpus is then an
    anti-join of documents against the non-keepers — same shuffle
    shape, omitted here to keep the gate result compact."""
    clusters = near_dup_clusters(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("quality")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return (
        clusters.join(docs, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("kept_doc"),
            F.col("quality").alias("kept_quality"),
            (F.col("cluster_size") - 1).cast("bigint").alias("n_dropped"),
        )
    )


# --------------------------------------------------------------------------
# Fuzzy entity matching (blocked levenshtein join)
# --------------------------------------------------------------------------
@register(
    "fuzzy_part_name_pairs",
    oracle="""
    WITH names AS (
      SELECT DISTINCT p_name, string_split(p_name, ' ')[2] AS noun FROM part
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM names a
    JOIN names b ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: part-name pairs within edit distance 3,
    with candidate pairs BLOCKED on the shared noun token — the
    entity-resolution pattern (block on a cheap exact key, verify the
    expensive string metric only inside blocks). Spark and DuckDB both
    implement classic Levenshtein, so the metric is oracle-exact.

    Scale: levenshtein is O(|s|²) per pair — the blocking equi-join is
    what keeps the pair space linear-ish (never |names|²). At corpus
    scale, block on several redundant keys (first-k-chars, length
    bucket, phonetic code) and union candidates, same as the LSH
    band-union above."""
    part = load(spark, sf_dir, "part")
    names = part.select(
        "p_name", F.split("p_name", " ").getItem(1).alias("noun")
    ).distinct()
    a, b = names.alias("a"), names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(dist <= 3)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.cast("int").alias("edit_dist"),
        )
    )


# --------------------------------------------------------------------------
# Triangle enumeration over the near-dup graph
# --------------------------------------------------------------------------
def _triangle_oracle() -> str:
    """Triangles over the verified ngram dup-pair edge set (edges are
    stored once with doc_a < doc_b, so each triangle a<b<c is emitted
    exactly once)."""
    from olap_project_spark.queries import QUERY_REGISTRY

    ngram_sql = QUERY_REGISTRY["ngram_dup_pairs"].oracle
    return f"""
    WITH jp AS ({ngram_sql}),
    e AS (SELECT doc_a AS a, doc_b AS b FROM jp)
    SELECT e1.a AS doc_a, e1.b AS doc_b, e2.b AS doc_c
    FROM e e1
    JOIN e e2 ON e2.a = e1.b
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """


@register("dup_triangles", oracle=_triangle_oracle)
def dup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration on the near-duplicate graph — the graph
    analytics primitive behind clustering-coefficient / community
    checks on dedup output (a triangle means three docs are mutually
    near-dups: strong evidence of a template family rather than a
    chance pair). Ordered-edge self-join emits each triangle once.

    Scale: the standard distributed triangle algorithm (edges oriented
    low→high, two-path join + closing-edge semi-join) — cost is
    O(Σ deg²) on the ORIENTED graph, which skew-caps at high-degree
    nodes; near-dup graphs are sparse so the two-path frontier stays
    small. The edge set (the memoized, persisted ngram pair set) is
    computed once and reused across all three join branches."""
    edges = ngram_dup_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    return (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .select(
            F.col("e1.a").alias("doc_a"),
            F.col("e1.b").alias("doc_b"),
            F.col("e2.b").alias("doc_c"),
        )
    )


# --------------------------------------------------------------------------
# kNN similarity graph (top-3 neighbors per document)
# --------------------------------------------------------------------------
def _knn_oracle() -> str:
    from olap_project_spark.queries import QUERY_REGISTRY

    ngram_sql = QUERY_REGISTRY["ngram_dup_pairs"].oracle
    return f"""
    WITH jp AS ({ngram_sql}),
    sym AS (
      SELECT doc_a AS doc_id, doc_b AS neighbor_id, jaccard FROM jp
      UNION ALL
      SELECT doc_b AS doc_id, doc_a AS neighbor_id, jaccard FROM jp
    )
    SELECT doc_id, neighbor_id, jaccard,
           CAST(rn AS INTEGER) AS neighbor_rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY doc_id
            ORDER BY jaccard DESC, neighbor_id) AS rn
          FROM sym)
    WHERE rn <= 3
    """


@register("doc_knn_graph", oracle=_knn_oracle)
def doc_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN similarity graph: each document's top-3 most similar
    neighbors (by shingle Jaccard), ranked — the graph-construction
    step ahead of graph-based clustering / semi-supervised label
    propagation, and the per-doc view of the same pair set the
    clustering and triangle operators consume. Symmetrize the oriented
    pair list (each undirected pair serves both endpoints), then a
    per-doc WindowGroupLimit keeps the k best.

    Scale: the candidate pairs are already sub-quadratic (shingle
    equi-join); symmetrizing doubles them, and the rank-≤-k window
    prunes per partition before any global work. No all-pairs stage
    anywhere."""
    jp = ngram_dup_pairs(spark, sf_dir)
    sym = jp.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("neighbor_id"),
        "jaccard",
    ).unionByName(
        jp.select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("neighbor_id"),
            "jaccard",
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.desc("jaccard"), F.asc("neighbor_id")
        )
    )
    return (
        sym.withColumn("rn", rn)
        .filter(F.col("rn") <= 3)
        .select(
            "doc_id",
            "neighbor_id",
            "jaccard",
            F.col("rn").cast("int").alias("neighbor_rank"),
        )
    )


# --------------------------------------------------------------------------
# Integer fixed-point PageRank over the near-dup graph
# --------------------------------------------------------------------------
PR_SCALE = 10**12
PR_ITERATIONS = 3


def _pagerank_oracle() -> str:
    """Unrolled 3-iteration PageRank in pure integer arithmetic.

    Floating-point PageRank is NOT hash-comparable across engines (the
    per-node contribution sum is addition-order dependent), so ranks are
    BIGINT fixed-point at scale 10¹²: contribution = rank // outdeg,
    update = 0.15·SCALE + (85·Σcontrib) // 100 — every step exact
    integer math, identical on both engines. The oracle unrolls the loop
    as chained CTEs (r0 → r1 → r2 → r3): no recursive CTE needed, and
    each stage is the same join+group the Spark loop runs."""
    from olap_project_spark.queries import QUERY_REGISTRY

    ngram_sql = QUERY_REGISTRY["ngram_dup_pairs"].oracle
    base = 15 * PR_SCALE // 100
    its = []
    for i in range(1, PR_ITERATIONS + 1):
        its.append(f"""
    r{i} AS (
      SELECT d.node,
             CAST({base} + (85 * COALESCE(s.c, 0)) // 100 AS BIGINT) AS rank
      FROM deg d LEFT JOIN (
        SELECT ed.dst AS node, SUM(r.rank // ed.outdeg) AS c
        FROM ed JOIN r{i - 1} r ON ed.src = r.node
        GROUP BY ed.dst
      ) s ON s.node = d.node
    )""")
    return f"""
    WITH jp AS ({ngram_sql}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM jp
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM jp
    ),
    deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
    ed AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d ON d.node = e.src),
    r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank FROM deg),
    {",".join(its)}
    SELECT node AS doc_id, rank AS pagerank
    FROM r{PR_ITERATIONS}
    ORDER BY rank DESC, node
    LIMIT 100
    """


@register("pagerank_canonical_docs", oracle=_pagerank_oracle)
def pagerank_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the near-duplicate graph (damping 0.85,
    3 iterations, uniform init) — ranking candidate CANONICAL documents:
    inside a dup cluster the highest-centrality doc is the best keeper
    (most corroborated by near-copies), a standard corpus-dedup
    refinement over near_dup_clusters' min-id choice. Top 100 by rank.

    All arithmetic is BIGINT fixed-point (scale 10¹²) so the result is
    bit-exact and order-independent — see _pagerank_oracle. An iterative
    algorithm through the full value-hash gate, not the weaker
    rows-only check k-means gets.

    Scale: per iteration one equi-join (edges ⋈ ranks, both partitioned
    on the src key) + one groupBy(dst) — the standard distributed
    PageRank shape; ranks/degrees are |V|-sized, edges never leave their
    partitions' shuffle. The edge set (with outdeg attached) is
    persisted across iterations; 3 rounds ≈ near-dup graph diameter."""
    pairs = ngram_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ed = edges.join(deg, "src").persist()
    base = 15 * PR_SCALE // 100
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(PR_SCALE).cast("bigint").alias("rank")
    )
    nodes = deg.select(F.col("src").alias("node"))
    for _ in range(PR_ITERATIONS):
        msgs = (
            ed.join(ranks, ed.src == ranks.node)
            .select(F.col("dst").alias("node"), F.expr("rank div outdeg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(msgs, "node", "left").select(
            "node",
            (F.lit(base) + F.expr("(85 * coalesce(c, 0)) div 100"))
            .cast("bigint")
            .alias("rank"),
        )
    return (
        ranks.orderBy(F.desc("rank"), F.col("node"))
        .limit(100)
        .select(F.col("node").alias("doc_id"), F.col("rank").alias("pagerank"))
    )


# --------------------------------------------------------------------------
# Benchmark contamination detection (train/eval n-gram overlap)
# --------------------------------------------------------------------------
# Deterministic stand-in for the benchmark corpus: every 20th doc plays
# the eval set. In production the eval side is a real benchmark table.
CONTAM_EVAL_MOD = 20
CONTAM_MIN_OVERLAP = 0.3  # fraction of the eval doc's shingles found in train


@register(
    "benchmark_contamination",
    oracle=f"""
    WITH {_SQL_SHINGLES_CAPPED},
    ev AS (SELECT doc_id AS eval_doc, shingle FROM shf
           WHERE doc_id % {CONTAM_EVAL_MOD} = 0),
    tr AS (SELECT doc_id AS train_doc, shingle FROM shf
           WHERE doc_id % {CONTAM_EVAL_MOD} <> 0),
    hits AS (
      SELECT train_doc, eval_doc, COUNT(*) AS n_common
      FROM tr JOIN ev USING (shingle)
      GROUP BY 1, 2
    )
    SELECT train_doc, eval_doc, n_common,
           ROUND(CAST(n_common AS DOUBLE) / c.n_sh, 6) AS overlap_frac
    FROM hits JOIN shfc c ON c.doc_id = eval_doc
    WHERE CAST(n_common AS DOUBLE) / c.n_sh >= {CONTAM_MIN_OVERLAP}
    """,
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination detection — the LLM-curation step that
    finds training documents leaking benchmark content: for each
    (train doc, eval doc) pair sharing 3-gram word shingles, report the
    fraction of the EVAL doc's shingles present in the training doc;
    pairs at ≥ 30% overlap are contamination candidates (n-gram overlap
    is the standard decontamination criterion, cf. GPT-3/PaLM appendix
    methodology).

    Scale: candidates come from the shingle equi-join (hash-partitioned,
    never |train|×|eval|) over the stop-shingle-filtered universe
    (df ≤ NGRAM_MAX_DF — a boilerplate shingle shared by k docs would
    otherwise emit k² candidates; decontamination conventionally drops
    them, and the overlap fraction is computed over the same filtered
    universe on both engines). A real benchmark set is tiny and fixed,
    so at 100 TB the eval side collapses to a broadcast and the
    scan-side join filters training shards at read speed; here the eval
    slice derives from the corpus (scales with SF), so no broadcast
    hint — AQE decides (lint rule E3).
    """
    sh = _capped_shingle_df(spark, sf_dir)
    is_eval = F.col("doc_id") % CONTAM_EVAL_MOD == 0
    ev = sh.filter(is_eval).select(
        F.col("doc_id").alias("eval_doc"), "shingle"
    )
    tr = sh.filter(~is_eval).select(
        F.col("doc_id").alias("train_doc"), "shingle"
    )
    ev_sizes = ev.groupBy("eval_doc").agg(F.count("*").alias("n_sh"))
    hits = (
        tr.join(ev, "shingle")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count("*").alias("n_common"))
    )
    frac = F.col("n_common").cast("double") / F.col("n_sh")
    return (
        hits.join(ev_sizes, "eval_doc")
        .filter(frac >= CONTAM_MIN_OVERLAP)
        .select(
            "train_doc",
            "eval_doc",
            "n_common",
            F.round(frac, 6).alias("overlap_frac"),
        )
    )


# --------------------------------------------------------------------------
# Incremental-ingest dedup (new batch vs existing corpus)
# --------------------------------------------------------------------------
INCR_MOD = 10
INCR_REM = 9  # doc_id % 10 == 9 plays the "incoming batch" role


def _incremental_oracle() -> str:
    min_exprs = ",\n             ".join(
        f"MIN(({minhash_param(k)[0]} * h + {minhash_param(k)[1]}) % {MERSENNE31}) AS mh{k}"
        for k in range(N_PERM)
    )
    band_selects = "\n      UNION ALL\n".join(
        f"""      SELECT doc_id, {b} AS band,
             md5({" || ',' || ".join(f"CAST(mh{k} AS VARCHAR)" for k in range(b * BAND_ROWS, (b + 1) * BAND_ROWS))})
               AS band_key FROM sig"""
        for b in range(N_PERM // BAND_ROWS)
    )
    return f"""
    WITH {_SQL_SHINGLES},
    hashes AS (
      SELECT doc_id, shingle % {MERSENNE31} AS h
      FROM sh
    ),
    sig AS (
      SELECT doc_id,
             {min_exprs}
      FROM hashes
      GROUP BY doc_id
    ),
    bands AS (
{band_selects}
    ),
    cand AS (
      SELECT DISTINCT y.doc_id AS new_doc, x.doc_id AS dup_of
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.band_key = y.band_key
       AND x.doc_id % {INCR_MOD} <> {INCR_REM}
       AND y.doc_id % {INCR_MOD} = {INCR_REM}
    ),
    verified AS (
      SELECT c.new_doc, c.dup_of, COUNT(*) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.new_doc
      JOIN sh b ON b.doc_id = c.dup_of AND b.shingle = a.shingle
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT v.new_doc, v.dup_of,
             CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) AS jac
      FROM verified v
      JOIN shc ca ON ca.doc_id = v.new_doc
      JOIN shc cb ON cb.doc_id = v.dup_of
    ),
    best AS (
      SELECT new_doc, dup_of, jac,
             row_number() OVER (PARTITION BY new_doc
                                ORDER BY jac DESC, dup_of) AS rn
      FROM scored WHERE jac >= {JACCARD_THRESHOLD}
    )
    SELECT new_doc, dup_of, ROUND(jac, 6) AS jaccard
    FROM best WHERE rn = 1
    """


@register("incremental_dedup_matches", oracle=_incremental_oracle)
def incremental_dedup_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: every INCOMING document (batch role:
    doc_id % 10 == 9) that near-duplicates some EXISTING corpus
    document, with its best match (highest exact Jaccard ≥ 0.7, ties
    to the smallest corpus id). This is the production shape corpus
    dedup actually runs day-to-day — the nightly batch is deduped
    AGAINST the corpus without recomparing the corpus to itself, so
    cost is O(batch·bands + candidates), not O(corpus²).

    Scale: reuses the memoized shingle frame and the shared MinHash
    band builder (_minhash_bands); the candidate join keys on
    (band, band_key) with the batch/corpus role split as join-side
    predicates — at 100 TB the corpus side's bands are a materialized
    index you append to, and only the batch side is computed fresh.
    Verification (exact Jaccard) touches candidates only; the best
    match is a per-new-doc window over candidate matches."""
    sh = _shingle_df(spark, sf_dir)
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    bands = session_memo(
        spark, sf_dir, "minhash_bands", lambda: _minhash_bands(sh)
    )
    x = bands.filter(F.col("doc_id") % INCR_MOD != INCR_REM).alias("x")
    y = bands.filter(F.col("doc_id") % INCR_MOD == INCR_REM).alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_key") == F.col("y.band_key")),
        )
        .select(
            F.col("y.doc_id").alias("new_doc"), F.col("x.doc_id").alias("dup_of")
        )
        .distinct()
    )
    a = sh.alias("a")
    b = sh.alias("b")
    verified = (
        cand.join(a, F.col("a.doc_id") == F.col("new_doc"))
        .join(
            b,
            (F.col("b.doc_id") == F.col("dup_of"))
            & (F.col("b.shingle") == F.col("a.shingle")),
        )
        .groupBy("new_doc", "dup_of")
        .agg(F.count("*").alias("n_common"))
    )
    ca = cnt.alias("ca")
    cb = cnt.alias("cb")
    jac = F.col("n_common").cast("double") / (
        F.col("ca.n_sh") + F.col("cb.n_sh") - F.col("n_common")
    )
    w = Window.partitionBy("new_doc").orderBy(F.desc("jac"), F.asc("dup_of"))
    return (
        verified.join(ca, F.col("new_doc") == F.col("ca.doc_id"))
        .join(cb, F.col("dup_of") == F.col("cb.doc_id"))
        .select("new_doc", "dup_of", jac.alias("jac"))
        .filter(F.col("jac") >= JACCARD_THRESHOLD)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("new_doc", "dup_of", F.round("jac", 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# Leakage-safe train/val/test split (split by near-dup GROUP, not doc)
# --------------------------------------------------------------------------
SPLIT_MOD = 10  # buckets 0-7 train, 8 val, 9 test


def _leakage_safe_oracle() -> str:
    from olap_project_spark.queries import QUERY_REGISTRY

    cluster_sql = QUERY_REGISTRY["near_dup_clusters"].oracle
    return f"""
    WITH comp AS ({cluster_sql}),
    g AS (
      SELECT d.doc_id,
             COALESCE(c.cluster_id, d.doc_id) AS gid,
             CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END AS clustered
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    s AS (
      SELECT doc_id, gid, clustered,
             CAST('0x' || substr(md5(CAST(gid AS VARCHAR)), 1, 12) AS BIGINT)
               % {SPLIT_MOD} AS b
      FROM g
    )
    SELECT CASE WHEN b <= 7 THEN 'train'
                WHEN b = 8 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT gid) AS n_groups,
           CAST(SUM(clustered) AS BIGINT) AS n_clustered_docs
    FROM s GROUP BY 1
    """


@register("leakage_safe_split_stats", oracle=_leakage_safe_oracle)
def leakage_safe_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment hashed on the NEAR-DUP GROUP, not the
    document: all members of a near-dup cluster land in the same split
    (singletons group as themselves), so no evaluation example has a
    near-duplicate in training — the leakage mode a plain per-doc hash
    split (doc_split_assignment, queries/text.py) cannot prevent, and
    the reason production pipelines split AFTER dedup clustering.
    Buckets: md5(group) mod 10 → 0-7 train / 8 val / 9 test.

    Scale: one left equi-join of the corpus against the (memoized,
    tiny) cluster labels, then a hash split identical in cost to the
    per-doc one. The within-one-split invariant for every verified
    near-dup pair is asserted in tests/test_training_ops.py."""
    clusters = near_dup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    docs = load(spark, sf_dir, "documents").select("doc_id")
    g = docs.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("gid"),
        F.col("cluster_id").isNotNull().cast("bigint").alias("clustered"),
    )
    b = portable_hash48(F.col("gid").cast("string")) % SPLIT_MOD
    s = g.select(
        "doc_id",
        "gid",
        "clustered",
        F.when(b <= 7, "train").when(b == 8, "val").otherwise("test").alias("split"),
    )
    return s.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("gid").alias("n_groups"),
        F.sum("clustered").cast("bigint").alias("n_clustered_docs"),
    )


# --------------------------------------------------------------------------
# Entity resolution end-to-end: fuzzy pairs → components → canonical name
# --------------------------------------------------------------------------
def _entity_cluster_oracle() -> str:
    from olap_project_spark.queries import QUERY_REGISTRY

    fuzzy_sql = QUERY_REGISTRY["fuzzy_part_name_pairs"].oracle
    return f"""
    WITH RECURSIVE fp AS ({fuzzy_sql}),
    ids AS (SELECT p_name, MIN(p_partkey) AS nid FROM part GROUP BY p_name),
    pe AS (
      SELECT na.nid AS a, nb.nid AS b
      FROM fp
      JOIN ids na ON na.p_name = fp.name_a
      JOIN ids nb ON nb.p_name = fp.name_b
    ),
    edges AS (
      SELECT a, b FROM pe UNION ALL SELECT b AS a, a AS b FROM pe
    ),
    reach(a, b) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (SELECT a AS nid, MIN(b) AS cluster_id FROM reach GROUP BY a)
    SELECT c.cluster_id,
           COUNT(*) AS n_names,
           MIN(canon.p_name) AS canonical_name
    FROM comp c
    JOIN ids canon ON canon.nid = c.cluster_id
    GROUP BY c.cluster_id
    """


@register("part_entity_clusters", oracle=_entity_cluster_oracle)
def part_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution END-TO-END on the part dimension: the blocked
    Levenshtein pairs (fuzzy_part_name_pairs) become an undirected
    match graph, connected components merge transitive matches
    ("almond antique blue" ~ "almond antique blues" ~ "almond antiqu
    blues"), and each entity gets a deterministic canonical name (the
    name owning the cluster's smallest part key). This is the master-
    data-management shape: pairwise matchers over-segment without the
    transitive-closure step, and a canonical survivor is what downstream
    joins actually need. Exercises the CC primitive on a SECOND domain
    (string entities via stable integer ids) beyond document dedup.

    Scale: names map to integer ids by a groupBy (min part key); the
    component loop is the same O(diameter)-round label propagation as
    near_dup_clusters — entity-match graphs are shallow (diameter
    ~2-3). The oracle replays it as a recursive-CTE closure."""
    part = load(spark, sf_dir, "part")
    ids = part.groupBy("p_name").agg(F.min("p_partkey").alias("nid"))
    fp = fuzzy_part_name_pairs(spark, sf_dir)
    na = ids.select(F.col("p_name").alias("name_a"), F.col("nid").alias("a"))
    nb = ids.select(F.col("p_name").alias("name_b"), F.col("nid").alias("b"))
    edges = fp.join(na, "name_a").join(nb, "name_b").select("a", "b")
    from olap_project_spark.functions.graph import connected_components

    labels = connected_components(edges, src="a", dst="b")
    canon = ids.select(
        F.col("nid").alias("cluster_id"), F.col("p_name").alias("canonical_name")
    )
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("n_names"))
        .select(F.col("label").alias("cluster_id"), "n_names")
        .join(canon, "cluster_id")
        .groupBy("cluster_id", "n_names")
        .agg(F.min("canonical_name").alias("canonical_name"))
    )


# --------------------------------------------------------------------------
# LSH quality: precision/recall of the banding vs exact Jaccard truth
# --------------------------------------------------------------------------
def _lsh_quality_oracle() -> str:
    return f"""
    WITH {_minhash_cand_cte()},
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT doc_a, doc_b FROM p
      JOIN shc ca ON ca.doc_id = doc_a
      JOIN shc cb ON cb.doc_id = doc_b
      WHERE CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common)
            >= {JACCARD_THRESHOLD}
    ),
    counts AS (
      SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
             (SELECT COUNT(*) FROM truth) AS n_truth,
             (SELECT COUNT(*) FROM cand c
              JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
               AS n_tp,
             (SELECT COUNT(*) FROM shc) AS n_docs
    )
    SELECT n_candidates, n_truth, n_tp, n_docs,
           ROUND(CAST(n_tp AS DOUBLE) / n_candidates, 6) AS precision_lsh,
           ROUND(CAST(n_tp AS DOUBLE) / n_truth, 6) AS recall_lsh,
           ROUND(CAST(n_candidates AS DOUBLE)
                 / (n_docs * (n_docs - 1) / 2), 6) AS candidate_frac
    FROM counts
    """


@register("minhash_lsh_quality", oracle=_lsh_quality_oracle)
def minhash_lsh_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding QUALITY report: precision and recall of the
    MinHash(32)/8×4-band candidate pairs against the exact-Jaccard
    truth set (ngram_dup_pairs — complete, since any pair with J>0
    shares a shingle and survives the shingle equi-join), plus the
    candidate fraction of all |docs|² pairs — the number that proves
    the blocking is sub-quadratic, hash-pinned every round rather than
    quoted from a paper.

    At the 0.7 threshold with 8 bands × 4 rows, P(candidate) =
    1−(1−s⁴)⁸ ≈ 0.93 at s=0.7 and →1 above; recall_lsh measures the
    realized value on THIS corpus.

    Scale: reuses the memoized band index and verified-pair
    intermediates (zero extra passes over the corpus when the dedup
    family runs together); the counts are three small-frame aggregates
    broadcast into one row."""
    truth = ngram_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sh = _shingle_df(spark, sf_dir)
    # memoized: the same candidate set minhash_dup_pairs verifies
    cand = _lsh_candidates(spark, sf_dir)
    tp = cand.join(truth, ["doc_a", "doc_b"], "left_semi")
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    n_truth = truth.agg(F.count("*").alias("n_truth"))
    n_tp = tp.agg(F.count("*").alias("n_tp"))
    n_docs = (
        sh.select("doc_id").distinct().agg(F.count("*").alias("n_docs"))
    )
    return (
        n_cand.join(F.broadcast(n_truth))
        .join(F.broadcast(n_tp))
        .join(F.broadcast(n_docs))
        .select(
            "n_candidates",
            "n_truth",
            "n_tp",
            "n_docs",
            F.round(F.col("n_tp") / F.col("n_candidates"), 6).alias(
                "precision_lsh"
            ),
            F.round(F.col("n_tp") / F.col("n_truth"), 6).alias("recall_lsh"),
            F.round(
                F.col("n_candidates")
                / (F.col("n_docs") * (F.col("n_docs") - 1) / 2),
                6,
            ).alias("candidate_frac"),
        )
    )


# --------------------------------------------------------------------------
# BFS hop distance over the kNN similarity graph
# --------------------------------------------------------------------------
BFS_MAX_HOPS = 3
BFS_SEED_MOD = 97


def _bfs_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The symmetrized kNN edge list, memoized+persisted: every BFS
    level (and the recursive-CTE twin) joins the SAME edge table, so
    cache it once instead of re-inlining the whole kNN lineage into
    each consumer's plan (at scale: the materialized edge list any
    graph engine keeps between supersteps)."""

    def build() -> DataFrame:
        knn = doc_knn_graph(spark, sf_dir).select("doc_id", "neighbor_id")
        return (
            knn.select(
                F.col("doc_id").alias("src"), F.col("neighbor_id").alias("dst")
            )
            .union(
                knn.select(
                    F.col("neighbor_id").alias("src"),
                    F.col("doc_id").alias("dst"),
                )
            )
            .distinct()
        )

    return session_memo(spark, sf_dir, "knn_bfs_edges", build)


def _bfs_oracle() -> str:
    """Unrolled breadth-first search: the recursive frontier loop as
    chained CTEs (v0 → f1 → f2 → f3), each stage exactly the
    join + dedup + not-yet-visited anti-join the Spark loop runs."""
    from olap_project_spark.queries import QUERY_REGISTRY

    knn_sql = QUERY_REGISTRY["doc_knn_graph"].oracle
    stages, visited = [], ["v0"]
    for i in range(1, BFS_MAX_HOPS + 1):
        prev = f"f{i - 1}" if i > 1 else "v0"
        seen = " UNION ALL ".join(f"SELECT doc_id FROM {v}" for v in visited)
        stages.append(f"""
    f{i} AS (
      SELECT DISTINCT e.dst AS doc_id
      FROM ed e JOIN {prev} p ON e.src = p.doc_id
      WHERE NOT EXISTS (SELECT 1 FROM ({seen}) s
                        WHERE s.doc_id = e.dst)
    )""")
        visited.append(f"f{i}")
    hops_union = "\n    UNION ALL ".join(
        f"SELECT doc_id, {h} AS hops FROM {v}"
        for h, v in enumerate(visited)
    )
    return f"""
    WITH knn AS ({knn_sql}),
    ed AS (
      SELECT doc_id AS src, neighbor_id AS dst FROM knn
      UNION
      SELECT neighbor_id AS src, doc_id AS dst FROM knn
    ),
    v0 AS (SELECT doc_id FROM documents
           WHERE doc_id % {BFS_SEED_MOD} = 0),{",".join(stages)}
    SELECT doc_id, CAST(hops AS INTEGER) AS hops
    FROM ({hops_union})
    """


@register("knn_bfs_hops", oracle=_bfs_oracle)
def knn_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first hop distance from a deterministic seed set
    (doc_id ≡ 0 mod {BFS_SEED_MOD}) over the symmetrized kNN
    similarity graph, out to {BFS_MAX_HOPS} hops — the graph-traversal
    primitive behind "expand a curated seed set to its similarity
    neighborhood" (semi-supervised label spreading, contamination
    blast-radius queries). Each document gets its MINIMUM hop count;
    unreached documents are absent.

    Scale: the textbook distributed BFS — per level one equi-join of
    the CURRENT FRONTIER (shrinking) against the edge list, a distinct,
    and an anti-join against the visited set; no driver-side state, no
    collect. Each level's frontier is MATERIALIZED with an eager
    ``localCheckpoint`` before the next level consumes it — the
    Pregel-style superstep barrier every graph engine runs. Without it
    the lazy plan re-derives level k−1 TWICE inside level k (once via
    the frontier join, once via the visited anti-join), compounding
    per level; with it each level is one shuffle-on-key of
    frontier-sized data, never corpus-sized, and the lineage stays
    one level deep regardless of hop count."""
    edges = _bfs_edges(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    seeds = docs.filter(F.col("doc_id") % BFS_SEED_MOD == 0).select("doc_id")
    visited = seeds.withColumn("hops", F.lit(0))
    frontier = seeds
    for hop in range(1, BFS_MAX_HOPS + 1):
        # superstep barrier: materialize the level and truncate its
        # lineage so later levels (the next frontier join AND every
        # visited anti-join) read stored blocks instead of re-deriving
        # this level — measured 8.6s → ~1.7s at sf0.1
        nxt = _bfs_level(frontier, edges, visited).localCheckpoint(eager=True)
        visited = visited.union(nxt.withColumn("hops", F.lit(hop)))
        frontier = nxt
    return visited.select("doc_id", F.col("hops").cast("int").alias("hops"))


def _bfs_level(
    frontier: DataFrame, edges: DataFrame, visited: DataFrame
) -> DataFrame:
    """One BFS superstep: frontier ⋈ edges (equi-join on src), dedup,
    minus already-visited (anti-join). Factored out so the plan-shape
    test can assert the per-level plan (the checkpoint barrier in
    knn_bfs_hops truncates it out of the final lineage)."""
    return (
        frontier.join(edges, frontier["doc_id"] == edges["src"])
        .select(F.col("dst").alias("doc_id"))
        .distinct()
        .join(visited.select("doc_id"), "doc_id", "left_anti")
    )


# --------------------------------------------------------------------------
# Dedup token accounting: per-source corpus-size delta
# --------------------------------------------------------------------------
def _token_savings_oracle() -> str:
    from olap_project_spark.queries import QUERY_REGISTRY

    cluster_sql = QUERY_REGISTRY["near_dup_clusters"].oracle
    return f"""
    WITH comp AS ({cluster_sql}),
    scored AS (
      SELECT c.cluster_id, d.doc_id,
             row_number() OVER (
               PARTITION BY c.cluster_id
               ORDER BY length(d.text) DESC, d.doc_id
             ) AS rn
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    ),
    dropped AS (SELECT doc_id FROM scored WHERE rn > 1),
    tok AS (
      SELECT doc_id, source,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+'))
             END AS n_tok
      FROM documents
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN dropped.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_before,
           CAST(SUM(CASE WHEN dropped.doc_id IS NULL THEN n_tok ELSE 0 END)
                AS BIGINT) AS tokens_after,
           ROUND(CAST(SUM(CASE WHEN dropped.doc_id IS NOT NULL
                               THEN n_tok ELSE 0 END) AS DOUBLE)
                 / SUM(n_tok), 6) AS savings
    FROM tok LEFT JOIN dropped USING (doc_id)
    GROUP BY source ORDER BY source
    """


@register("dedup_token_savings", oracle=_token_savings_oracle)
def dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup BUDGET ledger: per source, the whitespace-token count
    before and after near-dup keep-best dedup (drop every cluster
    member except the quality keeper) — the number a pretraining run
    actually budgets by. Composes the memoized cluster labels
    (near_dup_clusters) with the keeper rule of dedup_keep_best, so
    the expensive pair/cluster work runs once per session across all
    three consumers.

    Scale: the keeper window is per-cluster (bounded state); the
    ledger is one left anti-ish join of the corpus against the
    dropped set (a tiny fraction) plus a per-source hash aggregate —
    exact integer token sums throughout."""
    from olap_project_spark.functions.text import token_count

    clusters = near_dup_clusters(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    dropped = (
        clusters.join(
            docs.select("doc_id", F.length("text").alias("quality")),
            "doc_id",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("doc_id", F.lit(1).alias("is_dropped"))
    )
    tok = docs.select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tok")
    )
    j = tok.join(dropped, "doc_id", "left")
    is_drop = F.col("is_dropped").isNotNull()
    return (
        j.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(is_drop.cast("bigint")).cast("bigint").alias("n_dropped"),
            F.sum("n_tok").cast("bigint").alias("tokens_before"),
            F.sum(F.when(~is_drop, F.col("n_tok")).otherwise(0))
            .cast("bigint")
            .alias("tokens_after"),
            F.round(
                F.sum(F.when(is_drop, F.col("n_tok")).otherwise(0)).cast(
                    "double"
                )
                / F.sum("n_tok"),
                6,
            ).alias("savings"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Cross-source duplication matrix (who copies from whom)
# --------------------------------------------------------------------------
def _cross_source_oracle() -> str:
    from olap_project_spark.queries import QUERY_REGISTRY

    ngram_sql = QUERY_REGISTRY["ngram_dup_pairs"].oracle
    return f"""
    WITH jp AS ({ngram_sql}),
    lab AS (
      SELECT jp.doc_a, jp.doc_b,
             LEAST(da.source, db.source) AS source_a,
             GREATEST(da.source, db.source) AS source_b
      FROM jp
      JOIN documents da ON da.doc_id = jp.doc_a
      JOIN documents db ON db.doc_id = jp.doc_b
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM lab)
    SELECT source_a, source_b,
           CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
           (source_a = source_b) AS within_source,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(n_total), 6) AS share
    FROM lab CROSS JOIN tot
    GROUP BY 1, 2 ORDER BY 1, 2
    """


@register("cross_source_dup_matrix", oracle=_cross_source_oracle)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup PROVENANCE matrix: verified near-dup pairs
    (ngram_dup_pairs, memoized) bucketed by the unordered pair of
    their documents' sources — the curation question behind it is
    "which sources syndicate/copy from each other, and how much of
    my duplication is within-source boilerplate vs cross-source
    mirroring". Cross-source mass is what makes per-source dedup
    insufficient and global dedup necessary; this query measures
    exactly that mass.

    Scale: the pair frame is the memoized verified-pair set (tiny
    relative to the corpus); two hash equi-joins attach sources; the
    matrix is ≤ |sources|² rows."""
    pairs = ngram_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    da = src.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
    )
    db = src.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
    )
    lab = (
        pairs.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
    )
    tot = lab.agg(F.count("*").cast("bigint").alias("n_total"))
    return (
        lab.groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_dup_pairs"))
        .join(F.broadcast(tot))
        .select(
            "source_a",
            "source_b",
            "n_dup_pairs",
            (F.col("source_a") == F.col("source_b")).alias("within_source"),
            F.round(
                F.col("n_dup_pairs").cast("double") / F.col("n_total"), 6
            ).alias("share"),
        )
        .orderBy("source_a", "source_b")
    )


# --------------------------------------------------------------------------
# Bloom-filter membership prefilter — the broadcastable anti-join for
# incremental ingest at 100 TB
# --------------------------------------------------------------------------
BLOOM_BITS = 1 << 16  # m: filter positions (8 KB of bits)
BLOOM_K = 3           # hash functions per key


def _bloom_positions(fp: DataFrame) -> DataFrame:
    """(doc_id, f) → one row per (doc_id, f, bloom position). The K
    positions come from the same exact-integer universal family the
    MinHash permutations use — ((a·(f mod M31) + b) mod M31) mod m —
    offset to permutation slots 100.. so they are independent of the
    32 MinHash coefficients. Both engines reproduce them bit-for-bit."""
    h = F.col("f") % MERSENNE31
    pos_cols = []
    for j in range(BLOOM_K):
        a, b = minhash_param(100 + j)
        pos_cols.append(
            ((F.lit(a) * h + F.lit(b)) % MERSENNE31 % BLOOM_BITS).cast("bigint")
        )
    return fp.select("doc_id", "f", F.explode(F.array(*pos_cols)).alias("pos"))


def _bloom_params_cte() -> str:
    rows = ", ".join(
        "(%d, %d)" % minhash_param(100 + j) for j in range(BLOOM_K)
    )
    return f"params(a, b) AS (SELECT * FROM (VALUES {rows}))"


@register(
    "bloom_prefilter_stats",
    oracle=lambda: f"""
    WITH fp AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(lower(trim(
                 regexp_replace(text, '\\s+', ' ', 'g')))), 1, 12)
               AS BIGINT) AS f
      FROM documents
    ),
    h AS (SELECT doc_id, f, f % {MERSENNE31} AS hm FROM fp),
    corpus AS (SELECT * FROM h WHERE doc_id % 10 < 7),
    {_bloom_params_cte()},
    filter_pos AS (
      SELECT DISTINCT ((p.a * c.hm + p.b) % {MERSENNE31}) % {BLOOM_BITS} AS pos
      FROM corpus c, params p
    ),
    probe AS (
      SELECT hh.doc_id, hh.f,
             ((p.a * hh.hm + p.b) % {MERSENNE31}) % {BLOOM_BITS} AS pos
      FROM h hh, params p
    ),
    hits AS (
      SELECT pr.doc_id, pr.f, COUNT(fpos.pos) AS n_hit
      FROM probe pr LEFT JOIN filter_pos fpos ON pr.pos = fpos.pos
      GROUP BY pr.doc_id, pr.f
    ),
    member AS (
      SELECT ht.doc_id, ht.n_hit,
             EXISTS(SELECT 1 FROM corpus c WHERE c.f = ht.f) AS is_member
      FROM hits ht
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_batch,
           CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_members,
           CAST(SUM(CASE WHEN n_hit = {BLOOM_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_pass,
           CAST(SUM(CASE WHEN n_hit = {BLOOM_K} AND NOT is_member
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           ROUND(CAST(SUM(CASE WHEN n_hit = {BLOOM_K} AND NOT is_member
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN NOT is_member THEN 1 ELSE 0 END), 0),
                 6) AS fp_rate
    FROM member
    """,
)
def bloom_prefilter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership prefilter for incremental exact dedup:
    a 70% corpus split builds an m={BLOOM_BITS}-position / K={BLOOM_K}
    filter over content fingerprints; the full table then probes it,
    and the query reports batch size, exact member count, bloom-pass
    count, false positives, and the measured false-positive rate —
    Bloom's no-false-negative guarantee makes n_bloom_pass ≥ n_members
    an invariant the oracle hash-checks.

    This is the scale path Spark's builtin runtime bloom join takes
    implicitly, made EXPLICIT and cross-engine-verifiable: positions
    are exact-integer universal hashes (no engine-private bloom
    layout), and the filter materializes as ≤{BLOOM_BITS} distinct
    position rows — a bounded broadcast, like broadcasting the bitmap.

    Scale: the filter build is one map + dedup over 8-byte positions;
    probing is a narrow explode(K) + broadcast hash join — the 100-TB
    increment never shuffles against the corpus. Only the AUDIT leg
    (exact is_member for the fp-rate measurement) pays a fingerprint
    semi-join; production drops it and shuffles just the bloom-passed
    survivors (here {BLOOM_K}/10 of a disjoint batch at this m/K/n)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", portable_hash48(normalize_text(F.col("text"))).alias("f")
    )
    corpus = docs.filter(F.col("doc_id") % 10 < 7)
    filter_pos = (
        _bloom_positions(corpus).select("pos").distinct()
        .withColumn("present", F.lit(1))
    )
    hits = (
        _bloom_positions(docs)
        .join(F.broadcast(filter_pos), "pos", "left")
        .groupBy("doc_id", "f")
        .agg(F.sum(F.coalesce(F.col("present"), F.lit(0))).alias("n_hit"))
    )
    corp_f = corpus.select("f").distinct().withColumn("is_m", F.lit(1))
    member = hits.join(corp_f, "f", "left").select(
        "doc_id",
        "n_hit",
        F.col("is_m").isNotNull().alias("is_member"),
    )
    is_m = F.col("is_member")
    passed = F.col("n_hit") == BLOOM_K
    fp_cnt = F.sum(F.when(passed & ~is_m, 1).otherwise(0))
    non_members = F.sum(F.when(~is_m, 1).otherwise(0))
    return member.agg(
        F.count("*").cast("bigint").alias("n_batch"),
        F.sum(F.when(is_m, 1).otherwise(0)).cast("bigint").alias("n_members"),
        F.sum(F.when(passed, 1).otherwise(0)).cast("bigint").alias("n_bloom_pass"),
        fp_cnt.cast("bigint").alias("n_false_pos"),
        F.round(
            fp_cnt.cast("double") / F.nullif(non_members.cast("double"), F.lit(0.0)),
            6,
        ).alias("fp_rate"),
    )


@register(
    "sql_recursive_bfs_hops",
    # identical result contract to the iterative Pregel-style BFS — the
    # oracle is shared verbatim, so the driver hash-pins both execution
    # paths to the same answer
    oracle=lambda: __import__(
        "olap_project_spark.queries", fromlist=["QUERY_REGISTRY"]
    ).QUERY_REGISTRY["knn_bfs_hops"].oracle,
)
def sql_recursive_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BFS hop query expressed through Spark 4's native
    ``WITH RECURSIVE`` SQL front end — the declarative twin of
    ``knn_bfs_hops``'s hand-rolled superstep loop, over the same
    memoized symmetrized kNN edge table and seed rule, returning the
    same (doc_id, min hops) contract; the two paths share one oracle,
    so the driver hash-pins them to each other.

    Scale: the recursive plan unions path extensions level by level
    (each iteration one equi-join of the previous level against the
    edge list — the same join the loop runs), with the depth guard
    bounding work at {BFS_MAX_HOPS} expansions; the closing MIN/GROUP
    BY collapses multiple walks to the shortest. The loop variant
    stays the production choice where per-level dedup matters (the
    recursive form re-extends duplicate paths within the bound); this
    query pins that BOTH express the same semantics."""
    import uuid as _uuid

    tag = _uuid.uuid4().hex[:8]
    edges_view = f"bfs_edges_{tag}"
    seeds_view = f"bfs_seeds_{tag}"
    _bfs_edges(spark, sf_dir).createOrReplaceTempView(edges_view)
    docs = load(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") % BFS_SEED_MOD == 0).select(
        "doc_id"
    ).createOrReplaceTempView(seeds_view)
    return spark.sql(
        f"""
        WITH RECURSIVE walk(doc_id, hops) AS (
          SELECT doc_id, 0 FROM {seeds_view}
          UNION ALL
          SELECT e.dst, w.hops + 1
          FROM walk w JOIN {edges_view} e ON w.doc_id = e.src
          WHERE w.hops < {BFS_MAX_HOPS}
        )
        SELECT doc_id, CAST(MIN(hops) AS INT) AS hops
        FROM walk
        GROUP BY doc_id
        """
    )
