"""Corpus-curation operators over the ``documents`` table — the
repetition-quality, boilerplate-coverage, shard-assignment, and
data-mixture surface of a training-data pipeline (task brief "beyond
the reference"; the reference itself has no document corpus — these
compose the same Spark-first primitives as queries/text.py).

Determinism contract (shared with the whole registry): every reported
ratio is a quotient of EXACT integer aggregates (never an AVG over
per-row doubles — FP summation order differs across engines), every
per-row flag is integer arithmetic (``top*5 > total``, not
``top/total > 0.2``), and grouping keys are the portable 48-bit md5
hash both engines compute identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_project_spark.functions.text import (
    portable_hash48,
    token_count,
    tokens,
    word_shingles,
)
from olap_project_spark.queries import load, register, session_memo

# Gopher-style repetition thresholds (integer-arithmetic form below):
# a document is repetition-flagged when its most frequent bigram covers
# > 1/5 of all bigram positions, or when > 1/2 of bigram positions are
# repeats of an earlier bigram.
_TOP_FRAC_DEN = 5     # top_count * 5 > total  ⇔  top/total > 0.2
_DUP_FRAC_DEN = 2     # dup_count * 2 > total  ⇔  dup/total > 0.5

N_SHARDS = 16


# --------------------------------------------------------------------------
# Within-document repetition (Gopher-style quality rules)
# --------------------------------------------------------------------------
@register(
    "repetition_quality_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, string_split_regex(lower(trim(text)), '\\s+') AS ts
      FROM documents
    ),
    bg AS (
      SELECT doc_id, source,
             CAST('0x' || substr(md5(ts[i] || ' ' || ts[i+1]), 1, 12) AS BIGINT) AS h
      FROM toks, UNNEST(range(1, len(ts))) AS t(i)
      WHERE len(ts) >= 2
    ),
    cnts AS (
      SELECT doc_id, source, h, COUNT(*) AS cnt FROM bg GROUP BY 1, 2, 3
    ),
    per_doc AS (
      SELECT doc_id, source,
             SUM(cnt) AS total, COUNT(*) AS n_distinct, MAX(cnt) AS top
      FROM cnts GROUP BY 1, 2
    )
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(top) AS DOUBLE) / SUM(total), 6)
             AS pooled_top_bigram_frac,
           ROUND(CAST(SUM(total - n_distinct) AS DOUBLE) / SUM(total), 6)
             AS pooled_dup_bigram_frac,
           CAST(SUM(CASE WHEN top * {_TOP_FRAC_DEN} > total
                           OR (total - n_distinct) * {_DUP_FRAC_DEN} > total
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
    FROM per_doc GROUP BY source
    """,
)
def repetition_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals per source — the Gopher
    repetition rules (top-n-gram fraction, duplicate-n-gram fraction)
    that catch boilerplate/spam documents n-gram dedup won't (they are
    self-similar, not similar to OTHER documents). Documents with < 2
    tokens have no bigrams and are excluded.

    Scale: explode to bigrams → two hash aggregates (doc×bigram, then
    doc) → one per-source aggregate. The bigram shuffle carries 8-byte
    hashes, not strings; everything map-side combines. The flags are
    integer arithmetic so the result is bit-stable across engines and
    partitionings — the pooled fractions divide exact integer sums."""
    docs = load(spark, sf_dir, "documents")
    bg = (
        docs.select("doc_id", "source", tokens(F.col("text")).alias("tok"))
        .filter(F.size("tok") >= 2)
        .select(
            "doc_id",
            "source",
            F.explode(word_shingles(F.col("tok"), 2)).alias("bigram"),
        )
        .select("doc_id", "source", portable_hash48(F.col("bigram")).alias("h"))
    )
    per_doc = (
        bg.groupBy("doc_id", "source", "h")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id", "source")
        .agg(
            F.sum("cnt").alias("total"),
            F.count("*").alias("n_distinct"),
            F.max("cnt").alias("top"),
        )
    )
    flagged = (F.col("top") * _TOP_FRAC_DEN > F.col("total")) | (
        (F.col("total") - F.col("n_distinct")) * _DUP_FRAC_DEN > F.col("total")
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.sum("top").cast("double") / F.sum("total"), 6).alias(
            "pooled_top_bigram_frac"
        ),
        F.round(
            (F.sum(F.col("total") - F.col("n_distinct"))).cast("double")
            / F.sum("total"),
            6,
        ).alias("pooled_dup_bigram_frac"),
        F.sum(flagged.cast("bigint")).cast("bigint").alias("n_flagged"),
    )


# --------------------------------------------------------------------------
# Cross-document boilerplate coverage
# --------------------------------------------------------------------------
@register(
    "boilerplate_coverage_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts
      FROM documents
    ),
    sh0 AS (
      SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
      FROM toks, UNNEST(range(1, len(ts) - 1)) AS t(i)
      WHERE len(ts) >= 3
    ),
    sh AS (
      SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 12) AS BIGINT) AS shingle
      FROM sh0
    ),
    nd AS (SELECT shingle, COUNT(*) AS ndocs FROM sh GROUP BY 1),
    per_doc AS (
      SELECT sh.doc_id,
             COUNT(*) AS n_sh,
             SUM(CASE WHEN nd.ndocs > 1 THEN 1 ELSE 0 END) AS n_shared
      FROM sh JOIN nd USING (shingle)
      GROUP BY 1
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(p.n_shared) AS DOUBLE) / SUM(p.n_sh), 6)
             AS pooled_shared_frac,
           CAST(SUM(CASE WHEN p.n_shared * 2 > p.n_sh THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_mostly_shared
    FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
    GROUP BY d.source
    """,
)
def boilerplate_coverage_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-shingle coverage per source — the
    exact-substring-dedup SIGNAL (RefinedWeb-style): what fraction of
    each document's distinct 3-gram shingles also occur in some other
    document, and how many documents are mostly (> 1/2) shared
    material. Pair-based dedup reports WHO matches whom; this reports
    HOW MUCH of the corpus is cross-document duplication — the number
    that decides whether substring-level dedup is worth running.

    Scale: reuses the memoized (doc_id, shingle-hash) intermediate the
    LSH family already built (one corpus-wide groupBy(shingle) — the
    document-frequency aggregate — then an equi-join back on the
    8-byte hash). No pair space, no strings in the shuffle. Docs with
    < 3 tokens have no shingles and are excluded."""
    from olap_project_spark.queries.dedup import _shingle_df

    sh = _shingle_df(spark, sf_dir)
    nd = sh.groupBy("shingle").agg(F.count("*").alias("ndocs"))
    per_doc = (
        sh.join(nd, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sh"),
            F.sum((F.col("ndocs") > 1).cast("bigint")).alias("n_shared"),
        )
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        per_doc.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum("n_shared").cast("double") / F.sum("n_sh"), 6).alias(
                "pooled_shared_frac"
            ),
            F.sum((F.col("n_shared") * 2 > F.col("n_sh")).cast("bigint"))
            .cast("bigint")
            .alias("n_docs_mostly_shared"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic training-shard assignment
# --------------------------------------------------------------------------
@register(
    "training_shard_stats",
    oracle=f"""
    WITH sharded AS (
      SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT)
               % {N_SHARDS} AS shard,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
             source, lang
      FROM documents
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT source) AS n_sources,
           COUNT(DISTINCT lang) AS n_langs
    FROM sharded GROUP BY shard
    """,
)
def training_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-shard assignment (md5(doc_id) mod 16) with
    per-shard document/token/source/language accounting — the "write
    training shards" operator: shard membership must be a pure function
    of the document id (reproducible across runs and engines, no RNG),
    and the accounting verifies the hash spreads sources and languages
    evenly instead of clumping (a skewed shard starves data-parallel
    trainers).

    Scale: one narrow projection plus one 16-key hash aggregate — at
    100 TB this is the same plan, followed by
    ``df.write.partitionBy("shard")`` (or ``repartition(N, "shard")``
    for exactly-N output files) which shuffles each document once to
    its shard writer."""
    docs = load(spark, sf_dir, "documents")
    sharded = docs.select(
        (portable_hash48(F.col("doc_id").cast("string")) % N_SHARDS).alias("shard"),
        token_count(F.col("text")).alias("n_tokens"),
        "source",
        "lang",
    )
    return sharded.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
    )


# --------------------------------------------------------------------------
# Source-mixture planning (uniform-target sampling weights)
# --------------------------------------------------------------------------
@register(
    "source_mixture_plan",
    oracle="""
    WITH per_src AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                           ELSE len(string_split_regex(trim(text), '\\s+')) END)
                  AS BIGINT) AS total_tokens
      FROM documents GROUP BY source
    ),
    corpus AS (
      SELECT CAST(SUM(total_tokens) AS BIGINT) AS corpus_tokens,
             COUNT(*) AS n_sources
      FROM per_src
    )
    SELECT p.source, p.n_docs, p.total_tokens,
           ROUND(CAST(p.total_tokens AS DOUBLE) / c.corpus_tokens, 6)
             AS actual_share,
           ROUND(CAST(c.corpus_tokens AS DOUBLE)
                 / (c.n_sources * p.total_tokens), 6) AS sampling_weight,
           (p.total_tokens * c.n_sources < c.corpus_tokens) AS oversample
    FROM per_src p, corpus c
    """,
)
def source_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture plan: each source's token share of the corpus and
    the sampling weight (= epochs over that source) that would flatten
    the mixture to uniform at constant total token budget — the
    source-weighting step every pretraining run decides before shard
    writing. ``oversample`` marks sources below uniform share (weight
    > 1 ⇒ repeat; < 1 ⇒ subsample), computed in exact integer
    arithmetic (``tokens·n_sources < corpus_tokens``).

    Scale: a per-source aggregate joined with a ONE-ROW corpus total —
    the 1-row side broadcasts (an aggregated frame, lint rule E3's
    sanctioned shape), so no shuffle beyond the source groupBy. The
    weights feed `weighted_doc_sample` (queries/text.py), which
    executes such a plan."""
    docs = load(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("bigint").alias("total_tokens"),
    )
    corpus = per_src.agg(
        F.sum("total_tokens").cast("bigint").alias("corpus_tokens"),
        F.count("*").alias("n_sources"),
    )
    return per_src.join(F.broadcast(corpus)).select(
        "source",
        "n_docs",
        "total_tokens",
        F.round(
            F.col("total_tokens").cast("double") / F.col("corpus_tokens"), 6
        ).alias("actual_share"),
        F.round(
            F.col("corpus_tokens").cast("double")
            / (F.col("n_sources") * F.col("total_tokens")),
            6,
        ).alias("sampling_weight"),
        (F.col("total_tokens") * F.col("n_sources") < F.col("corpus_tokens")).alias(
            "oversample"
        ),
    )


# --------------------------------------------------------------------------
# Unigram-LM quality proxy (integer-exact)
# --------------------------------------------------------------------------
@register(
    "token_frequency_quality",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split_regex(lower(trim(text)), '\\s+') AS ts
      FROM documents
    ),
    occ AS (
      SELECT doc_id, source,
             CAST('0x' || substr(md5(tok), 1, 12) AS BIGINT) AS h
      FROM toks, UNNEST(ts) AS u(tok)
      WHERE len(ts) >= 1 AND ts <> ['']
    ),
    uni AS (SELECT h, COUNT(*) AS cnt FROM occ GROUP BY h),
    per_doc AS (
      SELECT occ.doc_id, occ.source,
             COUNT(*) AS n_tokens,
             SUM(uni.cnt) AS freq_sum
      FROM occ JOIN uni USING (h)
      GROUP BY 1, 2
    ),
    corpus AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS corpus_tokens,
             CAST(SUM(freq_sum) AS BIGINT) AS corpus_freq
      FROM per_doc
    )
    SELECT p.source,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(p.freq_sum) AS DOUBLE) / SUM(p.n_tokens), 6)
             AS mean_token_freq,
           CAST(SUM(CASE WHEN p.freq_sum * c.corpus_tokens
                              > c.corpus_freq * p.n_tokens
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_above_corpus_mean
    FROM per_doc p, corpus c
    GROUP BY p.source
    """,
)
def token_frequency_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality proxy per source: the mean corpus-frequency of
    each document's tokens — the integer-exact stand-in for unigram
    log-likelihood scoring (docs of very common tokens ⇒ boilerplate;
    docs of very rare tokens ⇒ noise/garbled). True logprob sums are
    FP-order-fragile across engines; frequency sums are exact integers,
    and the above-corpus-mean flag cross-multiplies integers
    (``freq_sum·corpus_tokens > corpus_freq·n_tokens``) so no ratio is
    ever compared in floating point.

    Scale: two hash aggregates (the unigram LM, then per-doc) linked by
    an 8-byte-key equi-join, then the per-source rollup against a 1-row
    corpus aggregate. The LM table is |vocab| rows — tiny relative to
    the corpus — and every aggregate map-side combines. (The integer
    cross-product pair fits int64 up to ~10^9-token corpora per doc
    pair; beyond that, scale both sides down by a common constant.)"""
    # The tokenize+explode pass is the expensive leg and this plan uses
    # it on two branches (the unigram LM and the per-doc join); without
    # persistence Catalyst re-runs it per branch (no common-subplan
    # elimination). Memoized per (session, corpus) — at 100 TB you'd
    # materialize it once as a bucketed table.
    def build_occ() -> DataFrame:
        docs = load(spark, sf_dir, "documents")
        return (
            docs.select("doc_id", "source", tokens(F.col("text")).alias("tok"))
            .filter((F.size("tok") >= 1) & (F.col("tok") != F.array(F.lit(""))))
            .select("doc_id", "source", F.explode("tok").alias("t"))
            .select("doc_id", "source", portable_hash48(F.col("t")).alias("h"))
        )

    occ = session_memo(spark, sf_dir, "unigram_occ", build_occ)
    uni = occ.groupBy("h").agg(F.count("*").alias("cnt"))
    per_doc = (
        occ.join(uni, "h")
        .groupBy("doc_id", "source")
        .agg(F.count("*").alias("n_tokens"), F.sum("cnt").alias("freq_sum"))
    )
    corpus = per_doc.agg(
        F.sum("n_tokens").cast("bigint").alias("corpus_tokens"),
        F.sum("freq_sum").cast("bigint").alias("corpus_freq"),
    )
    return (
        per_doc.join(F.broadcast(corpus))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum("freq_sum").cast("double") / F.sum("n_tokens"), 6).alias(
                "mean_token_freq"
            ),
            F.sum(
                (
                    F.col("freq_sum") * F.col("corpus_tokens")
                    > F.col("corpus_freq") * F.col("n_tokens")
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("n_above_corpus_mean"),
        )
    )


# --------------------------------------------------------------------------
# Exact-quota stratified sampling (deterministic per-stratum reservoir)
# --------------------------------------------------------------------------
SAMPLE_QUOTA_DEN = 10  # keep ceil(n/10) docs per source


@register(
    "stratified_sample_stats",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY CAST('0x' || substr(md5('strat#' ||
                              CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT),
                        doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n_docs
      FROM documents
    )
    SELECT source,
           CAST(MAX(n_docs) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN rn * {SAMPLE_QUOTA_DEN}
                                <= n_docs + {SAMPLE_QUOTA_DEN} - 1
                           THEN 1 END) AS BIGINT) AS n_sampled,
           CAST(SUM(CASE WHEN rn * {SAMPLE_QUOTA_DEN}
                              <= n_docs + {SAMPLE_QUOTA_DEN} - 1
                         THEN n_chars ELSE 0 END) AS BIGINT)
             AS sampled_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM ranked
    GROUP BY source
    """,
)
def stratified_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sampling: every source stratum
    contributes EXACTLY ceil(n/{SAMPLE_QUOTA_DEN}) documents, chosen by
    ranking the stratum on a salted md5 of the doc id — a deterministic
    per-group reservoir. This is the eval-set/holdout carve a training
    pipeline wants when Bernoulli sampling's quota variance is
    unacceptable (a 25-doc stratum must yield exactly 3 docs, not
    0-7): hash_sampled_value_stats is the Bernoulli form, this is the
    exact-quota form.

    Determinism contract: the rank key is the portable 48-bit md5 both
    engines compute identically (doc_id as tiebreak), and membership is
    the integer comparison ``rn·{SAMPLE_QUOTA_DEN} ≤ n + {SAMPLE_QUOTA_DEN} − 1``
    (⇔ rn ≤ ceil(n/{SAMPLE_QUOTA_DEN}) without float division).

    Scale: one window PARTITIONED BY the stratum (each source sorts
    independently — no global order), one hash aggregate. At extreme
    per-stratum cardinality the full sort is avoidable with a two-pass
    threshold select (approx kth-hash cutpoint + exact trim), same
    contract."""
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    from olap_project_spark.functions.text import portable_hash48

    key = portable_hash48(
        F.concat(F.lit("strat#"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    wc = Window.partitionBy("source")
    ranked = docs.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n_docs"),
    )
    in_sample = (
        F.col("rn") * SAMPLE_QUOTA_DEN
        <= F.col("n_docs") + SAMPLE_QUOTA_DEN - 1
    )
    return ranked.groupBy("source").agg(
        F.max("n_docs").cast("bigint").alias("n_docs"),
        F.count(F.when(in_sample, F.lit(1))).cast("bigint").alias("n_sampled"),
        F.sum(F.when(in_sample, F.col("n_chars")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("sampled_chars"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# Temperature-scaled mixture (share^(1/T), T = 2)
# --------------------------------------------------------------------------
@register(
    "temperature_mixture_plan",
    oracle="""
    WITH per_src AS (
      SELECT source,
             CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                           ELSE len(string_split_regex(trim(text), '\\s+'))
                      END) AS BIGINT) AS total_tokens
      FROM documents GROUP BY source
    ),
    corpus AS (
      SELECT CAST(SUM(total_tokens) AS BIGINT) AS corpus_tokens FROM per_src
    ),
    w AS (
      SELECT source, total_tokens, corpus_tokens,
             CAST(ROUND(sqrt(CAST(total_tokens AS DOUBLE) / corpus_tokens)
                        * 1000000000) AS BIGINT) AS w_nano
      FROM per_src, corpus
    ),
    tw AS (SELECT CAST(SUM(w_nano) AS BIGINT) AS w_tot FROM w)
    SELECT source, total_tokens,
           ROUND(CAST(total_tokens AS DOUBLE) / corpus_tokens, 6)
             AS actual_share,
           ROUND(CAST(w_nano AS DOUBLE) / w_tot, 6) AS temp_share,
           ROUND((CAST(w_nano AS DOUBLE) / w_tot)
                 / (CAST(total_tokens AS DOUBLE) / corpus_tokens), 6)
             AS temp_weight
    FROM w CROSS JOIN tw ORDER BY source
    """,
)
def temperature_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture — the practical midpoint
    between proportional and uniform sampling (GPT-3/PaLM convention):
    each source's sampling share ∝ (token share)^(1/T) with T = 2, so
    small high-quality sources are upweighted without the full
    flattening of source_mixture_plan's uniform target.
    ``temp_weight`` (> 1 ⇒ oversample) is the epoch multiplier the
    shard writer applies.

    Determinism: sqrt IS exactly rounded under IEEE-754 (unlike
    ln/exp), but the normalizer Σ√share would still be an
    order-dependent double sum — so per-source weights round once to
    nano units and the normalizer is an EXACT bigint sum; both final
    ratios divide exact integers.

    Scale: identical plan to source_mixture_plan — one per-source
    aggregate plus two 1-row broadcasts."""
    docs = load(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum(token_count(F.col("text"))).cast("bigint").alias(
            "total_tokens"
        )
    )
    corpus = per_src.agg(
        F.sum("total_tokens").cast("bigint").alias("corpus_tokens")
    )
    w = per_src.join(F.broadcast(corpus)).withColumn(
        "w_nano",
        F.round(
            F.sqrt(
                F.col("total_tokens").cast("double")
                / F.col("corpus_tokens")
            )
            * 1_000_000_000
        ).cast("bigint"),
    )
    tw = w.agg(F.sum("w_nano").cast("bigint").alias("w_tot"))
    actual = F.col("total_tokens").cast("double") / F.col("corpus_tokens")
    temp = F.col("w_nano").cast("double") / F.col("w_tot")
    return (
        w.join(F.broadcast(tw))
        .select(
            "source",
            "total_tokens",
            F.round(actual, 6).alias("actual_share"),
            F.round(temp, 6).alias("temp_share"),
            F.round(temp / actual, 6).alias("temp_weight"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Mixture diversity (Shannon entropy / effective source count)
# --------------------------------------------------------------------------
@register(
    "mixture_diversity_stats",
    oracle="""
    WITH per_src AS (
      SELECT source,
             CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                           ELSE len(string_split_regex(trim(text), '\\s+'))
                      END) AS BIGINT) AS t
      FROM documents GROUP BY source
    ),
    corpus AS (SELECT CAST(SUM(t) AS BIGINT) AS n FROM per_src),
    terms AS (
      SELECT t, n,
             CAST(ROUND((CAST(t AS DOUBLE) / n)
                        * ln(CAST(t AS DOUBLE) / n)
                        * 1000000000) AS BIGINT) AS h_nano,
             CAST(ROUND((CAST(t AS DOUBLE) / n)
                        * (CAST(t AS DOUBLE) / n)
                        * 1000000000) AS BIGINT) AS p2_nano
      FROM per_src, corpus
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
             CAST(SUM(h_nano) AS BIGINT) AS hsum,
             CAST(SUM(p2_nano) AS BIGINT) AS p2sum
      FROM terms
    )
    SELECT n_sources,
           ROUND(-CAST(hsum AS DOUBLE) / 1000000000, 6) AS shannon_entropy,
           ROUND(exp(-CAST(hsum AS DOUBLE) / 1000000000), 6)
             AS effective_sources,
           ROUND(1 - CAST(p2sum AS DOUBLE) / 1000000000, 6)
             AS gini_simpson
    FROM agg
    """,
)
def mixture_diversity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity of the token mixture across sources — the one-row
    health card of a pretraining blend: Shannon entropy H of the
    source token shares, the effective source count exp(H) (how many
    equally-sized sources the mixture behaves like — the number that
    drops when one crawl dominates), and the Gini-Simpson index
    1 − Σp². Read alongside temperature_mixture_plan: reweighting
    should push effective_sources toward n_sources.

    Determinism: per-source p·ln p and p² terms round once to
    nano units and sum as exact bigints (order-free); exp of the
    exact-ratio cast is one final transcendental, rounded once.

    Scale: one per-source aggregate plus a 1-row reduction."""
    docs = load(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum(token_count(F.col("text"))).cast("bigint").alias("t")
    )
    corpus = per_src.agg(F.sum("t").cast("bigint").alias("n"))
    p = F.col("t").cast("double") / F.col("n")
    terms = per_src.join(F.broadcast(corpus)).select(
        F.round(p * F.log(p) * 1_000_000_000).cast("bigint").alias("h_nano"),
        F.round(p * p * 1_000_000_000).cast("bigint").alias("p2_nano"),
    )
    agg = terms.agg(
        F.count("*").cast("bigint").alias("n_sources"),
        F.sum("h_nano").cast("bigint").alias("hsum"),
        F.sum("p2_nano").cast("bigint").alias("p2sum"),
    )
    h = -F.col("hsum").cast("double") / 1_000_000_000
    return agg.select(
        "n_sources",
        F.round(h, 6).alias("shannon_entropy"),
        F.round(F.exp(h), 6).alias("effective_sources"),
        F.round(
            1 - F.col("p2sum").cast("double") / 1_000_000_000, 6
        ).alias("gini_simpson"),
    )


# --------------------------------------------------------------------------
# Curriculum schedule: quality-ordered staged token budgets
# --------------------------------------------------------------------------
N_STAGES = 3


@register(
    "curriculum_schedule_plan",
    oracle=f"""
    WITH feat AS (
      SELECT source,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END
               AS n_tok,
             length(text) AS n_chars,
             (length(text) - length(regexp_replace(text,
                 '[.,;:!?''\"()\\-]', '', 'g'))) AS n_punct
      FROM documents
    ),
    per_source AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN n_tok >= 20 AND n_punct * 10 < n_chars
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
      FROM feat GROUP BY source
    ),
    ranked AS (
      SELECT source, n_docs, n_tokens,
             n_keep * 1000 // n_docs AS keep_permille,
             SUM(n_tokens) OVER (
               ORDER BY n_keep * 1000 // n_docs DESC, source ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tokens,
             SUM(n_tokens) OVER () AS total_tokens
      FROM per_source
    )
    SELECT CAST(1 + (cum_tokens - n_tokens)
                    // ((total_tokens + {N_STAGES} - 1) // {N_STAGES})
                AS INTEGER) AS stage,
           source,
           n_docs,
           n_tokens,
           CAST(keep_permille AS BIGINT) AS keep_permille,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM ranked
    """,
)
def curriculum_schedule_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum construction for staged pre-training: sources are
    ordered cleanest-first by an exact-integer quality proxy (the
    per-mille of docs passing the length+punctuation keep rule of
    ``doc_quality_scores``), the token ledger accumulates over that
    order, and each source lands in the training stage whose equal
    token budget (total//{N_STAGES}, ceil) its PRECEDING cumulative
    tokens fall into — clean data early, noisier data later, the
    standard data-curriculum recipe, with every boundary an integer
    computation both engines replicate.

    Scale: one map-side-combinable per-source aggregate over the scan;
    the schedule itself is a window over the AGGREGATED source rows (a
    bounded dimension — dozens of sources at 100 TB, never the fact),
    so the unpartitioned window is safe by construction."""
    from olap_project_spark.functions.text import punct_count
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    feat = docs.select(
        "source",
        token_count(F.col("text")).alias("n_tok"),
        F.length("text").cast("bigint").alias("n_chars"),
        punct_count(F.col("text")).alias("n_punct"),
    )
    per_source = feat.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.sum(
            F.when((F.col("n_tok") >= 20) & (F.col("n_punct") * 10 < F.col("n_chars")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_keep"),
    )
    keep_pm = (
        (F.col("n_keep") * 1000 - F.pmod(F.col("n_keep") * 1000, F.col("n_docs")))
        / F.col("n_docs")
    ).cast("bigint")
    ranked = per_source.select(
        "source", "n_docs", "n_tokens", keep_pm.alias("keep_permille")
    )
    order_w = (
        Window.orderBy(F.desc("keep_permille"), F.asc("source"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total_w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    with_cum = ranked.select(
        "*",
        F.sum("n_tokens").over(order_w).alias("cum_tokens"),
        F.sum("n_tokens").over(total_w).alias("total_tokens"),
    )
    budget = (
        (F.col("total_tokens") + F.lit(N_STAGES - 1))
        - F.pmod(F.col("total_tokens") + F.lit(N_STAGES - 1), F.lit(N_STAGES))
    ) / F.lit(N_STAGES)
    before = F.col("cum_tokens") - F.col("n_tokens")
    stage = (
        F.lit(1) + ((before - F.pmod(before, budget)) / budget)
    ).cast("int")
    return with_cum.select(
        stage.alias("stage"),
        "source",
        "n_docs",
        "n_tokens",
        "keep_permille",
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
    )


# --------------------------------------------------------------------------
# Hashing-trick linear quality classifier — fastText-shaped inference
# --------------------------------------------------------------------------
# The weight table is IMPLICIT: weight(token) = hash48(token) % 2001 −
# 1000, i.e. a deterministic stand-in for a trained vector indexed by
# feature hash. That keeps the op oracle-checkable while exercising the
# exact plan a real classifier uses (explode → hash-indexed weight
# lookup → per-doc sum-pool → threshold).
_W_MOD = 2001    # weights take values −1000..1000
_W_OFF = 1000
_CONF_MILLI = 200  # "confident" when |mean weight| > 0.2 (integer form)


@register(
    "quality_classifier_scores",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS tk
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source,
             COUNT(*) AS n_tok,
             SUM(CAST('0x' || substr(md5(tk), 1, 12) AS BIGINT)
                 % {_W_MOD} - {_W_OFF}) AS sum_w
      FROM tok GROUP BY 1, 2
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN sum_w > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_positive,
           CAST(SUM(CASE WHEN abs(sum_w) > n_tok * {_CONF_MILLI}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_confident,
           ROUND(CAST(SUM(sum_w) AS DOUBLE) / SUM(n_tok), 6)
             AS pooled_mean_weight
    FROM scored GROUP BY source
    """,
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier inference at corpus scale — the
    fastText shape every web-scale curation pipeline runs (CCNet /
    FineWeb quality filters): tokenize, look each token's weight up by
    FEATURE HASH (hashing trick — no vocabulary table to build or
    broadcast), mean-pool per document, and threshold. Reported per
    source: docs, positive-score docs, confidently-scored docs
    (|mean| > 0.2, integer arithmetic), and the pooled mean weight
    (quotient of exact integer sums).

    Scale: explode → per-doc hash aggregate → per-source aggregate,
    all map-side combinable; the "model" travels as an expression, so
    there is no join at all — the degenerate-but-dominant case of
    hash-bucketed weight lookup. With a REAL trained weight table the
    same plan adds one broadcast join from hash-id to weight shard;
    nothing else changes. Shuffles carry (doc_id, bigint) pairs, never
    text."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("tk")
    )
    weight = portable_hash48(F.col("tk")) % _W_MOD - _W_OFF
    scored = tok.groupBy("doc_id", "source").agg(
        F.count("*").alias("n_tok"),
        F.sum(weight).alias("sum_w"),
    )
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("sum_w") > 0).cast("bigint")).cast("bigint").alias(
            "n_positive"
        ),
        F.sum(
            (F.abs(F.col("sum_w")) > F.col("n_tok") * _CONF_MILLI).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("n_confident"),
        F.round(
            F.sum("sum_w").cast("double") / F.sum("n_tok"), 6
        ).alias("pooled_mean_weight"),
    )


# --------------------------------------------------------------------------
# quality_classifier_calibration: the reliability table for the hashed
# linear classifier — binned score vs an INDEPENDENT lexical-diversity
# label. The audit a curation pipeline runs before trusting a filter
# threshold on 100 TB.
# --------------------------------------------------------------------------
_CAL_HALF_MILLI = 200  # calibration axis clamps to ±200 milli (mean weight)
_CAL_BINS = 10


@register(
    "quality_classifier_calibration",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS tk
      FROM documents
    ),
    scored AS (
      SELECT doc_id, COUNT(*) AS n_tok, COUNT(DISTINCT tk) AS n_uniq,
             SUM(CAST('0x' || substr(md5(tk), 1, 12) AS BIGINT)
                 % {_W_MOD} - {_W_OFF}) AS sum_w
      FROM tok GROUP BY 1
    ),
    binned AS (
      SELECT *,
             LEAST(GREATEST(sum_w + {_CAL_HALF_MILLI} * n_tok, 0),
                   {2 * _CAL_HALF_MILLI} * n_tok) AS num
      FROM scored
    ),
    b2 AS (
      SELECT *,
             LEAST(num * {_CAL_BINS} // ({2 * _CAL_HALF_MILLI} * n_tok),
                   {_CAL_BINS - 1}) AS score_bin
      FROM binned
    )
    SELECT CAST(score_bin AS INTEGER) AS score_bin,
           CAST(-{_CAL_HALF_MILLI}
                + {2 * _CAL_HALF_MILLI // _CAL_BINS} * score_bin
                AS INTEGER) AS bin_lo_milli,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN 2 * n_uniq >= n_tok THEN 1 ELSE 0 END)
                AS BIGINT) AS n_high_ttr,
           ROUND(CAST(SUM(CASE WHEN 2 * n_uniq >= n_tok THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS high_ttr_rate,
           ROUND(CAST(SUM(sum_w) AS DOUBLE) / SUM(n_tok), 6)
             AS pooled_score_milli
    FROM b2 GROUP BY score_bin
    """,
)
def quality_classifier_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability table for ``quality_classifier_scores``: per-doc
    mean hashed weight (the classifier score, an exact rational
    sum_w/n_tok) is clamped to ±0.2 and binned into 10 equal cells —
    WITHOUT evaluating the rational: the bin index is
    ``min(num·B div (range·n_tok), B−1)`` on the shifted nonnegative
    numerator, so truncating and flooring division agree across
    engines. Each bin reports its doc count, how many docs an
    INDEPENDENT label marks high-quality (type-token ratio ≥ 0.5 —
    exact: 2·distinct ≥ total), the empirical label rate, and the
    pooled mean score. A trustworthy filter shows the label rate
    rising monotonically with the score bin; a hashed random-init
    model (this one) shows a flat band — exactly what the audit is
    for before a threshold sweeps a 100-TB corpus.

    Scale: one explode + two hash aggregates; the distinct-count
    rides the same per-doc shuffle key as the token count; bins are
    ≤10 groups. No joins, no windows; shuffles carry (doc_id, ints),
    never text."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tk")
    )
    weight = portable_hash48(F.col("tk")) % _W_MOD - _W_OFF
    scored = tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.countDistinct("tk").alias("n_uniq"),
        F.sum(weight).alias("sum_w"),
    )
    rng = 2 * _CAL_HALF_MILLI
    num = F.least(
        F.greatest(
            F.col("sum_w") + _CAL_HALF_MILLI * F.col("n_tok"), F.lit(0)
        ),
        rng * F.col("n_tok"),
    )
    binned = scored.withColumn("num", num).withColumn(
        "score_bin",
        F.least(
            F.expr(f"num * {_CAL_BINS} DIV ({rng} * n_tok)"),
            F.lit(_CAL_BINS - 1),
        ),
    )
    pos = (2 * F.col("n_uniq") >= F.col("n_tok")).cast("bigint")
    return (
        binned.groupBy("score_bin")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(pos).cast("bigint").alias("n_high_ttr"),
            F.sum("sum_w").alias("t_w"),
            F.sum("n_tok").alias("t_tok"),
        )
        .select(
            F.col("score_bin").cast("int").alias("score_bin"),
            (
                -_CAL_HALF_MILLI
                + (rng // _CAL_BINS) * F.col("score_bin")
            )
            .cast("int")
            .alias("bin_lo_milli"),
            "n_docs",
            "n_high_ttr",
            F.round(
                F.col("n_high_ttr").cast("double") / F.col("n_docs"), 6
            ).alias("high_ttr_rate"),
            F.round(
                F.col("t_w").cast("double") / F.col("t_tok"), 6
            ).alias("pooled_score_milli"),
        )
    )


# --------------------------------------------------------------------------
# epoch_shuffle_quality: the dataloader-order audit — are two epochs'
# deterministic shuffles actually decorrelated?
# --------------------------------------------------------------------------
@register(
    "epoch_shuffle_quality",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('epoch1:' || CAST(doc_id AS VARCHAR)),
                                 1, 12) AS BIGINT) AS h1,
             CAST('0x' || substr(md5('epoch2:' || CAST(doc_id AS VARCHAR)),
                                 1, 12) AS BIGINT) AS h2
      FROM documents
    ),
    r AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY h1, doc_id) AS r1,
             ROW_NUMBER() OVER (ORDER BY h2, doc_id) AS r2
      FROM h
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST((r1 - r2) * (r1 - r2) AS HUGEINT)) AS sdd,
             SUM(ABS(r1 - r2)) AS sad,
             MAX(ABS(r1 - r2)) AS mad
      FROM r
    )
    SELECT n AS n_docs,
           ROUND(1 - 6 * CAST(sdd AS DOUBLE)
                 / (CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1)), 6)
             AS spearman_rho,
           CAST(mad AS BIGINT) AS max_abs_disp,
           ROUND(CAST(sad AS DOUBLE) / n, 6) AS mean_abs_disp,
           ROUND(3 * CAST(sad AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1), 6)
             AS disp_vs_ideal
    FROM s
    """,
)
def epoch_shuffle_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataloader-order audit: multi-epoch training shuffles each
    epoch with a different seed — if the orderings correlate, the
    model sees near-identical batch neighborhoods every epoch. Both
    epoch orders are deterministic hash sorts (seeded by the epoch
    tag); each doc's GLOBAL position per epoch comes from the
    range-partitioned two-pass ranking primitive
    (functions/scale.global_order_stats) — never a single-task
    ``Window.orderBy``. Reported: Spearman rank correlation between
    the two epochs (≈0 for a sound shuffle), the worst and mean
    absolute rank displacement, and the mean displacement as a
    fraction of a uniform permutation's expectation ((n²−1)/3n, →1
    when the shuffle is genuinely uniform).

    Exactness: ranks are exact integers; Σd² accumulates in
    decimal(38,0) (d² alone would overflow int64 past ~3e9 docs);
    the rho/displacement expressions divide once at the edge from
    identical operands.

    Scale: two range exchanges + per-range parallel sorts (the
    documented global_order_stats contract) and one final scalar
    aggregate; nothing ever funnels through one task and no text is
    shuffled — only (doc_id, hash, rank) triples."""
    from olap_project_spark.functions.scale import global_order_stats

    docs = load(spark, sf_dir, "documents").select("doc_id")
    tagged = docs.select(
        "doc_id",
        portable_hash48(
            F.concat(F.lit("epoch1:"), F.col("doc_id").cast("string"))
        ).alias("h1"),
        portable_hash48(
            F.concat(F.lit("epoch2:"), F.col("doc_id").cast("string"))
        ).alias("h2"),
    )
    r1 = global_order_stats(
        tagged, [F.col("h1").asc(), F.col("doc_id").asc()], rank_col="r1"
    )
    r2 = global_order_stats(
        r1, [F.col("h2").asc(), F.col("doc_id").asc()], rank_col="r2"
    )
    d = F.col("r1") - F.col("r2")
    dd = d.cast("decimal(19,0)") * d.cast("decimal(19,0)")
    s = r2.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(dd).alias("sdd"),
        F.sum(F.abs(d)).alias("sad"),
        F.max(F.abs(d)).alias("mad"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        F.col("n").alias("n_docs"),
        F.round(
            1
            - 6 * F.col("sdd").cast("double") / (nd * (nd * nd - 1)),
            6,
        ).alias("spearman_rho"),
        F.col("mad").cast("bigint").alias("max_abs_disp"),
        F.round(F.col("sad").cast("double") / F.col("n"), 6).alias(
            "mean_abs_disp"
        ),
        F.round(
            3 * F.col("sad").cast("double") / (nd * nd - 1), 6
        ).alias("disp_vs_ideal"),
    )


# --------------------------------------------------------------------------
# Threshold-free classifier evaluation: exact tie-aware ROC-AUC
# --------------------------------------------------------------------------
@register(
    "classifier_auc_roc",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS tk
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, COUNT(*) AS n_tok,
             SUM(CAST('0x' || substr(md5(tk), 1, 12) AS BIGINT)
                 % {_W_MOD} - {_W_OFF}) AS sum_w
      FROM tok GROUP BY doc_id, lang
    ),
    binned AS (
      SELECT CAST(((sum_w + n_tok * {_W_OFF}) * 4096)
                  // (n_tok * {2 * _W_OFF}) AS BIGINT) AS bin,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM scored
    ),
    g AS (
      SELECT bin, CAST(SUM(y) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS n0
      FROM binned GROUP BY bin
    ),
    c AS (
      SELECT n1, n0,
             CAST(COALESCE(SUM(n0) OVER (ORDER BY bin
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_n0
      FROM g
    )
    SELECT CAST(SUM(n1) AS BIGINT) AS n_pos,
           CAST(SUM(n0) AS BIGINT) AS n_neg,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(n1 * (2 * cum_n0 + n0)) AS BIGINT) AS twice_u,
           ROUND(CAST(SUM(n1 * (2 * cum_n0 + n0)) AS DOUBLE)
                 / (2.0 * SUM(n1) * SUM(n0)), 6) AS auc
    FROM c
    """,
)
def classifier_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-free classifier evaluation at corpus scale — the
    exact tie-aware ROC-AUC of the hashed linear quality score against
    the is-English label, via the rank-sum identity AUC = U/(N₁N₀)
    with ties contributing half (the Mann-Whitney U the A/B test
    already uses, reframed as the ranking metric every quality-filter
    paper reports). Scores are binned to a FIXED 4096-step resolution
    by integer arithmetic (shifted-nonnegative numerator, truncating
    DIV — both engines agree for nonnegative operands), so 2U is an
    exact integer (hash-pinned) and the cumulative window runs over at
    most 4097 bin rows — a constant-size frame regardless of corpus
    size, never an entity-scale global sort. AUC ≈ 0.5 here (random
    weights carry no language signal) — the pinned value is the
    metric's exactness, not the classifier's skill.

    Scale: explode → per-doc hash aggregate → 4096-row bin table;
    every aggregate map-side combines; the only window is over the
    constant bin domain. The same plan evaluates any real classifier:
    swap the score expression, keep the metric."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tk")
    )
    weight = portable_hash48(F.col("tk")) % _W_MOD - _W_OFF
    scored = tok.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_tok"), F.sum(weight).alias("sum_w")
    )
    binned = scored.select(
        F.expr(
            f"CAST(((sum_w + n_tok * {_W_OFF}) * 4096) "
            f"DIV (n_tok * {2 * _W_OFF}) AS BIGINT)"
        ).alias("bin"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    g = binned.groupBy("bin").agg(
        F.sum("y").cast("bigint").alias("n1"),
        (F.count("*") - F.sum("y")).cast("bigint").alias("n0"),
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = g.select(
        "n1",
        "n0",
        F.coalesce(F.sum("n0").over(w), F.lit(0))
        .cast("bigint")
        .alias("cum_n0"),
    )
    twice_u = F.sum(
        F.col("n1") * (2 * F.col("cum_n0") + F.col("n0"))
    ).cast("bigint")
    return c.agg(
        F.sum("n1").cast("bigint").alias("n_pos"),
        F.sum("n0").cast("bigint").alias("n_neg"),
        F.count("*").cast("bigint").alias("n_bins"),
        twice_u.alias("twice_u"),
        F.round(
            twice_u.cast("double")
            / (2.0 * F.sum("n1") * F.sum("n0")),
            6,
        ).alias("auc"),
    )
