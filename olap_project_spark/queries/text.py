"""Text-analysis queries over the ``documents`` table — the language-ID /
quality-scoring / token-counting / fingerprinting surface a training-data
pipeline needs (task brief "text analysis"; beyond the reference's own
operators).

All expressions are JVM-native (functions.text); each query carries a
DuckDB oracle exercising the identical semantics, so tokenization and
regex behavior are pinned cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olap_project_spark.functions.text import (
    LANG_STOPWORDS,
    normalize_text,
    punct_count,
    sql_stopword_pattern,
    stopword_hits,
    token_count,
    tokens,
)
from olap_project_spark.functions.localframe import local_frame
from olap_project_spark.queries import load, register, session_memo


# --------------------------------------------------------------------------
# Token counting
# --------------------------------------------------------------------------
@register(
    "token_stats_by_source",
    oracle="""
    WITH toks AS (
      SELECT source,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
             length(text) AS n_chars
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) AS avg_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tokens), 6) AS chars_per_token
    FROM toks
    GROUP BY source
    """,
)
def token_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token statistics per source — the sizing pass every
    training-data pipeline runs first (token budget accounting).

    Scale: tokenization is a codegen'd split (no UDF); one partial-agg
    shuffle on the source key. At 100 TB this is scan-bound — exactly
    what you want."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            token_count(F.col("text")).alias("n_tokens"),
            F.length("text").cast("bigint").alias("n_chars"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.sum("n_tokens").cast("double") / F.count("*"), 6).alias("avg_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.round(F.sum("n_chars").cast("double") / F.sum("n_tokens"), 6).alias(
                "chars_per_token"
            ),
        )
    )


# --------------------------------------------------------------------------
# Quality scoring
# --------------------------------------------------------------------------
_PUNCT_SQL = "length(text) - length(regexp_replace(text, '[.,;:!?''\"()\\-]', '', 'g'))"

@register(
    "doc_quality_scores",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
             length(text) AS n_chars,
             {_PUNCT_SQL} AS n_punct
      FROM documents
    )
    SELECT doc_id, n_tokens,
           ROUND(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
           ROUND(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS avg_token_len,
           CASE WHEN n_tokens >= 20 AND CAST(n_punct AS DOUBLE) / n_chars < 0.1
                THEN 'keep' ELSE 'drop' END AS quality_bucket
    FROM feat
    WHERE n_tokens > 0 AND n_chars > 0
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + keep/drop bucket (length and
    punctuation-density heuristics — the C4/Gopher-style filter shape).

    Scale: pure per-row expressions; at 100 TB this pipelines with the
    scan and writes back out — no shuffle at all."""
    docs = load(spark, sf_dir, "documents")
    feat = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        punct_count(F.col("text")).alias("n_punct"),
    ).filter((F.col("n_tokens") > 0) & (F.col("n_chars") > 0))
    punct_ratio = F.col("n_punct").cast("double") / F.col("n_chars")
    return feat.select(
        "doc_id",
        "n_tokens",
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(F.col("n_chars").cast("double") / F.col("n_tokens"), 6).alias(
            "avg_token_len"
        ),
        F.when((F.col("n_tokens") >= 20) & (punct_ratio < 0.1), "keep")
        .otherwise("drop")
        .alias("quality_bucket"),
    )


# --------------------------------------------------------------------------
# Language identification (stopword-hit argmax)
# --------------------------------------------------------------------------
def _lang_id_oracle() -> str:
    hit_cols = ",\n             ".join(
        f"len(regexp_extract_all(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), "
        f"'{sql_stopword_pattern(lang)}')) AS hits_{lang}"
        for lang in LANG_STOPWORDS
    )
    # deterministic argmax: first language (in dict order) reaching the max
    order = list(LANG_STOPWORDS)
    pred = "CASE "
    for lang in order:
        others = [f"hits_{o}" for o in order if o != lang]
        pred += (
            f"WHEN hits_{lang} >= greatest({', '.join(others)}) THEN '{lang}' "
        )
    pred += "END"
    return f"""
    WITH hits AS (
      SELECT doc_id, lang,
             {hit_cols}
      FROM documents
    ), pred AS (
      SELECT doc_id, lang, {pred} AS pred_lang FROM hits
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           ROUND(CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS accuracy
    FROM pred
    GROUP BY lang
    """


@register("lang_id_accuracy", oracle=_lang_id_oracle)
def lang_id_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language-ID heuristic scored against the table's
    ground-truth ``lang`` label: per-language doc count and accuracy.

    The classifier is argmax over per-language stopword hit counts with
    a fixed tie order (en>de>es>fr>zh) — fully declarative, no UDF.

    Scale: 5 regex counts per row, fused into the scan stage; the
    aggregate is 5 groups."""
    docs = load(spark, sf_dir, "documents")
    hits = docs.select(
        "doc_id",
        "lang",
        *[stopword_hits(F.col("text"), lang).alias(f"hits_{lang}") for lang in LANG_STOPWORDS],
    )
    order = list(LANG_STOPWORDS)
    pred = None
    for lang in order:
        others = [F.col(f"hits_{o}") for o in order if o != lang]
        cond = F.col(f"hits_{lang}") >= F.greatest(*others)
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    correct = F.when(pred == F.col("lang"), 1).otherwise(0)
    return (
        hits.select("lang", correct.alias("ok"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ok").cast("bigint").alias("n_correct"),
            F.round(F.sum("ok").cast("double") / F.count("*"), 6).alias("accuracy"),
        )
    )


# --------------------------------------------------------------------------
# BPE-ish regex tokenization (sub-word-ready token accounting)
# --------------------------------------------------------------------------
# Letter runs | digit runs | single non-alnum marks — the pre-merge
# word-splitting pass of a BPE tokenizer. Identical semantics in Java
# regex (Spark) and RE2 (DuckDB): no lookarounds, no unicode classes.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]"


@register(
    "bpe_token_stats",
    oracle=f"""
    WITH toks AS (
      SELECT source,
             len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_ws
      FROM documents
    )
    SELECT source,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(n_ws) AS BIGINT) AS total_ws_tokens,
           ROUND(CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_ws), 6) AS bpe_per_word
    FROM toks
    GROUP BY source
    """,
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting under a BPE-style regex pre-tokenizer (letter
    runs / digit runs / punctuation marks) vs whitespace words — the
    fertility ratio a training-data pipeline tracks per source.

    Scale: two regex counts per row fused into the scan; tiny
    aggregate."""
    docs = load(spark, sf_dir, "documents")
    n_bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0)))
    return (
        docs.select("source", n_bpe.alias("n_bpe"), token_count(F.col("text")).alias("n_ws"))
        .groupBy("source")
        .agg(
            F.sum("n_bpe").cast("bigint").alias("total_bpe_tokens"),
            F.sum("n_ws").cast("bigint").alias("total_ws_tokens"),
            F.round(F.sum("n_bpe").cast("double") / F.sum("n_ws"), 6).alias("bpe_per_word"),
        )
    )


# --------------------------------------------------------------------------
# Tokenizer fertility by language (the per-language cost audit)
# --------------------------------------------------------------------------
@register(
    "lang_fertility_stats",
    oracle=f"""
    WITH toks AS (
      SELECT lang,
             length(text) AS n_chars,
             len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_ws
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(n_ws) AS BIGINT) AS total_ws_tokens,
           ROUND(CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_ws), 6) AS fertility,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_bpe), 6)
             AS chars_per_token
    FROM toks
    GROUP BY lang
    """,
)
def lang_fertility_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER FERTILITY per language: BPE-style tokens per
    whitespace word and characters per token, by the corpus's declared
    language — the per-language cost audit every multilingual training
    run does (a language whose fertility is 2× pays 2× the context
    budget per word; chars/token tells you whether the tokenizer's
    merges fit that script at all). The language axis complements
    ``bpe_token_stats``' per-source ledger.

    Scale: two regex counts + a length fused into the scan, one
    lang-keyed map-side-combinable aggregate; ratios are quotients of
    exact bigint sums."""
    docs = load(spark, sf_dir, "documents")
    n_bpe = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0))
    )
    return (
        docs.select(
            "lang",
            F.length("text").alias("n_chars"),
            n_bpe.alias("n_bpe"),
            token_count(F.col("text")).alias("n_ws"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_bpe").cast("bigint").alias("total_bpe_tokens"),
            F.sum("n_ws").cast("bigint").alias("total_ws_tokens"),
            F.round(F.sum("n_bpe").cast("double") / F.sum("n_ws"), 6).alias(
                "fertility"
            ),
            F.round(
                F.sum("n_chars").cast("double") / F.sum("n_bpe"), 6
            ).alias("chars_per_token"),
        )
    )


# --------------------------------------------------------------------------
# Vocabulary: top tokens by document frequency
# --------------------------------------------------------------------------
@register(
    "top_tokens_by_doc_freq",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, tok
      FROM (SELECT doc_id,
                   UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS tok
            FROM documents)
      WHERE tok <> ''
    )
    SELECT tok AS token, COUNT(*) AS doc_freq
    FROM tok
    GROUP BY tok
    ORDER BY doc_freq DESC, token
    LIMIT 50
    """,
)
def top_tokens_by_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head: top-50 tokens by document frequency — the
    vocab/stopword-construction pass of a corpus pipeline.

    Scale: explode → per-doc distinct → count; the distinct is the
    shuffle (token,doc) — at 100 TB pre-aggregate per partition
    (map-side distinct) which Spark's two-phase distinct already does;
    top-k is TakeOrderedAndProject."""
    from olap_project_spark.functions.text import tokens

    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    return (
        tok.groupBy("token")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("token"))
        .limit(50)
    )


# --------------------------------------------------------------------------
# Document fingerprinting
# --------------------------------------------------------------------------
ROLLING_MOD = 1_000_000_007
ROLLING_BASE = 31


@register(
    "doc_rolling_hash",
    oracle=f"""
    WITH chars AS (
      SELECT doc_id,
             list_transform(
               string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ''),
               c -> unicode(c)) AS cs
      FROM documents
    )
    SELECT doc_id,
           CAST(list_reduce(cs,
                (acc, x) -> (CAST(acc AS BIGINT) * {ROLLING_BASE} + x) % {ROLLING_MOD})
             AS BIGINT) AS rolling_hash,
           CAST(len(cs) AS BIGINT) AS n_chars
    FROM chars
    WHERE len(cs) > 0
    """,
)
def doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash content fingerprint
    (h = Σ c·31^i mod 1e9+7 over normalized codepoints) — the
    Rabin-Karp-style fingerprint the brief names; unlike md5 it extends
    incrementally, which is what makes streaming/windowed fingerprints
    of document prefixes cheap.

    Cross-engine: Spark's per-char ascii() and DuckDB's unicode() agree
    on full Unicode codepoints (CJK included); the fold is
    left-to-right on both sides, with DuckDB's first-element-as-seed
    reduce semantics replicated via slice+element_at."""
    docs = load(spark, sf_dir, "documents")
    chars = F.transform(
        F.split(normalize_text(F.col("text")), ""), lambda c: F.ascii(c)
    )
    df = docs.select("doc_id", chars.alias("cs")).filter(F.size("cs") > 0)
    # DuckDB list_reduce seeds with element 1 and folds from element 2.
    rolling = F.aggregate(
        F.slice(F.col("cs"), 2, F.size("cs") - 1),
        F.element_at(F.col("cs"), 1).cast("long"),
        lambda acc, x: (acc * ROLLING_BASE + x) % ROLLING_MOD,
    )
    return df.select(
        "doc_id",
        rolling.cast("bigint").alias("rolling_hash"),
        F.size("cs").cast("bigint").alias("n_chars"),
    )


@register(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
           CAST('0x' || substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 12)
                AS BIGINT) AS fp48
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-normalized content fingerprints: full md5 plus the
    portable 48-bit integer form used as the join/dedup key elsewhere
    (functions.text.portable_hash48).

    Scale: per-row hash in codegen; fingerprints are the currency of
    exact dedup at 100 TB (shuffle 8-byte keys, not documents)."""
    from olap_project_spark.functions.text import portable_hash48

    docs = load(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        portable_hash48(norm).alias("fp48"),
    )


# --------------------------------------------------------------------------
# LLM-training chunking — fixed-size overlapping token windows per doc
# --------------------------------------------------------------------------
CHUNK_TOKENS = 50
CHUNK_STRIDE = 40  # 10-token overlap between consecutive chunks


@register(
    "doc_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts
      FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST((i - 1) / {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
             ts[i : i + {CHUNK_TOKENS - 1}] AS chunk
      FROM toks, UNNEST(range(1, len(ts) + 1, {CHUNK_STRIDE})) AS t(i)
    )
    SELECT doc_id, chunk_idx,
           CAST(len(chunk) AS INTEGER) AS n_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_hash
    FROM chunks
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into fixed-size OVERLAPPING token chunks
    ({CHUNK_TOKENS} tokens, stride {CHUNK_STRIDE}) — the standard
    pre-tokenization step of an LLM training pipeline. Returns one row
    per chunk with its token count and content hash (the hash stands in
    for the chunk text to keep gate results compact; production would
    carry the text).

    Scale: pure narrow ops — tokenize once, explode the stride
    positions per doc (sequence), slice the token array per position.
    No shuffle at all until a downstream consumer groups; at 100 TB
    this runs scan-speed and writes chunk files partition-parallel.
    The chunk explosion multiplies rows by ~len/stride but each output
    row is bounded (≤{CHUNK_TOKENS} tokens)."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", tokens(F.col("text")).alias("ts"))
    chunks = tok.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("ts"), F.lit(1)), F.lit(CHUNK_STRIDE))
        ).alias("i"),
        "ts",
    ).select(
        "doc_id",
        (((F.col("i") - 1) / CHUNK_STRIDE).cast("int")).alias("chunk_idx"),
        F.slice(F.col("ts"), F.col("i"), F.lit(CHUNK_TOKENS)).alias("chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size("chunk").cast("int").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.col("chunk"))).alias("chunk_hash"),
    )


@register(
    "repeated_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, ts[i : i + {CHUNK_TOKENS - 1}] AS chunk
      FROM toks, UNNEST(range(1, len(ts) + 1, {CHUNK_STRIDE})) AS t(i)
    ),
    full_chunks AS (
      SELECT doc_id, md5(array_to_string(chunk, ' ')) AS chunk_hash
      FROM chunks WHERE len(chunk) = {CHUNK_TOKENS}
    )
    SELECT chunk_hash,
           COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs,
           MIN(doc_id) AS first_doc
    FROM full_chunks
    GROUP BY chunk_hash
    HAVING COUNT(DISTINCT doc_id) > 1
    """,
)
def repeated_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level exact dedup: fixed-size token windows appearing
    in MORE THAN ONE document — the passage-granular form of corpus
    dedup (repeated boilerplate/licenses/templates survive doc-level
    dedup; window-hash collision finds them). Full windows only:
    tail fragments would alias short docs together.

    Scale: the shuffle carries (16-byte hash, doc_id) — never text; the
    aggregate is map-side combinable. This is the scalable core of
    suffix-style substring dedup: window hashing approximates the
    suffix-array approach at a fraction of the cost, with the stride
    trading recall for volume."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", tokens(F.col("text")).alias("ts"))
    full_chunks = (
        tok.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.size("ts"), F.lit(1)), F.lit(CHUNK_STRIDE)
                )
            ).alias("i"),
            "ts",
        )
        .select(
            "doc_id", F.slice(F.col("ts"), F.col("i"), F.lit(CHUNK_TOKENS)).alias("chunk")
        )
        .filter(F.size("chunk") == CHUNK_TOKENS)
        .select("doc_id", F.md5(F.concat_ws(" ", F.col("chunk"))).alias("chunk_hash"))
    )
    return (
        full_chunks.groupBy("chunk_hash")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


# --------------------------------------------------------------------------
# Maximal repeated-substring spans (exact substring-dedup artifact)
# --------------------------------------------------------------------------
SPAN_K = 8  # k-gram width: the minimum repeated run worth removing

# Shared CTE chain documents → maximal repeated spans (used by the
# span oracle and the savings oracle: same text, provably the same
# span derivation).
_SQL_SPANS = f"""toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts
      FROM documents WHERE length(trim(text)) > 0
    ),
    grams AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(list_slice(ts, i + 1, i + {SPAN_K}), ' '))
               AS gram
      FROM toks, UNNEST(range(0, len(ts) - {SPAN_K} + 1)) AS t(i)
      WHERE len(ts) >= {SPAN_K}
    ),
    rep AS (
      SELECT gram FROM grams
      GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hits AS (
      SELECT g.doc_id, g.pos,
             g.pos - row_number() OVER (
               PARTITION BY g.doc_id ORDER BY g.pos) AS grp
      FROM grams g JOIN rep USING (gram)
    ),
    spans AS (
      SELECT doc_id,
             CAST(MIN(pos) AS INTEGER) AS span_start,
             CAST(MAX(pos) + {SPAN_K} - MIN(pos) AS INTEGER) AS span_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_grams
      FROM hits
      GROUP BY doc_id, grp
    )"""


def _substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, span_start, span_tokens, n_grams) — memoized: the
    savings accounting consumes the same span set."""

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents").filter(
            F.length(F.trim("text")) > 0
        )
        tok = docs.select("doc_id", tokens(F.col("text")).alias("ts")).filter(
            F.size("ts") >= SPAN_K
        )
        grams = tok.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("ts") - SPAN_K),
                    lambda i: F.md5(
                        F.concat_ws(" ", F.slice(F.col("ts"), i + 1, SPAN_K))
                    ),
                )
            ).alias("pos", "gram"),
        )
        rep = (
            grams.groupBy("gram")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2)
            .select("gram")
        )
        w = Window.partitionBy("doc_id").orderBy("pos")
        hits = grams.join(rep, "gram").withColumn(
            "grp", F.col("pos") - F.row_number().over(w)
        )
        return (
            hits.groupBy("doc_id", "grp")
            .agg(
                F.min("pos").cast("int").alias("span_start"),
                (F.max("pos") + SPAN_K - F.min("pos"))
                .cast("int")
                .alias("span_tokens"),
                F.count("*").alias("n_grams"),
            )
            .drop("grp")
        )

    return session_memo(spark, sf_dir, "substring_spans", build)


@register(
    "repeated_substring_spans",
    oracle=f"""
    WITH {_SQL_SPANS}
    SELECT doc_id, span_start, span_tokens, n_grams FROM spans
    """,
)
def repeated_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL cross-document repeated substring spans — the artifact
    substring-level exact dedup actually removes (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better": the
    suffix-array pipeline's output, here via distributed k-gram rolling
    windows). Every token position opens a {SPAN_K}-gram; grams seen in
    ≥2 distinct documents mark their positions "repeated"; RUNS of
    consecutive repeated positions merge into maximal spans
    (gaps-and-islands: pos − row_number is constant within a run). A
    span row is (doc_id, span_start, span_tokens, n_grams) — the exact
    byte ranges a substring-dedup pass would cut, where
    ``repeated_chunks`` only reports which strided windows recur.

    Scale: grams shuffle as (16-byte md5, doc_id, pos) — never text;
    the repeated-gram filter is one map-side-combinable aggregate; the
    island window partitions per doc_id (entity-keyed, bounded by doc
    length). The stride-1 gram count is ~tokens — the same volume a
    suffix array indexes, in plain hash aggregates."""
    return _substring_spans(spark, sf_dir).select(
        "doc_id", "span_start", "span_tokens", "n_grams"
    )


@register(
    "substring_dedup_savings",
    oracle=f"""
    WITH {_SQL_SPANS},
    iv AS (
      SELECT doc_id, span_start AS s,
             span_start + span_tokens - 1 AS e
      FROM spans
    ),
    ordd AS (
      SELECT doc_id, s, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pmax
      FROM iv
    ),
    isl AS (
      SELECT doc_id, s, e,
             SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS isl_id
      FROM ordd
    ),
    merged AS (
      SELECT doc_id, MIN(s) AS ms, MAX(e) AS me
      FROM isl GROUP BY doc_id, isl_id
    ),
    cov AS (
      SELECT doc_id, CAST(SUM(me - ms + 1) AS BIGINT) AS covered
      FROM merged GROUP BY doc_id
    ),
    tok AS (
      SELECT doc_id, source,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+'))
             END AS n_tok
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
           CAST(SUM(COALESCE(covered, 0)) AS BIGINT) AS tokens_covered,
           ROUND(CAST(SUM(COALESCE(covered, 0)) AS DOUBLE)
                 / SUM(n_tok), 6) AS substring_savings
    FROM tok LEFT JOIN cov USING (doc_id)
    GROUP BY source
    """,
)
def substring_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token accounting for SUBSTRING-level dedup: how many
    tokens sit inside cross-document repeated spans. Span intervals
    from distinct islands can overlap in token coverage when the
    position gap is under SPAN_K, so intervals are merged first (the
    running-max sweep: a row opens a new merged interval iff its start
    exceeds the max end of every earlier row) and only then counted.
    The complement to ``dedup_token_savings``' doc-level ledger:
    together they bound what doc-dedup vs substring-dedup each buys
    per source.

    Scale: spans come from the memoized span frame (built once); the
    interval-merge windows partition per doc_id over span rows
    (bounded by doc length); the ledger is one source-keyed hash
    aggregate; savings is a quotient of exact bigint sums."""
    from olap_project_spark.functions.text import token_count

    spans = _substring_spans(spark, sf_dir)
    iv = spans.select(
        "doc_id",
        F.col("span_start").alias("s"),
        (F.col("span_start") + F.col("span_tokens") - 1).alias("e"),
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = iv.withColumn("pmax", F.max("e").over(w_prev)).withColumn(
        "isl_id",
        F.sum(
            F.when(
                F.col("pmax").isNull() | (F.col("s") > F.col("pmax")), 1
            ).otherwise(0)
        ).over(w_run),
    )
    cov = (
        isl.groupBy("doc_id", "isl_id")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("me") - F.col("ms") + 1)
            .cast("bigint")
            .alias("covered")
        )
    )
    tok = load(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tok")
    )
    return (
        tok.join(cov, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("tokens_total"),
            F.sum(F.coalesce(F.col("covered"), F.lit(0)))
            .cast("bigint")
            .alias("tokens_covered"),
            F.round(
                F.sum(F.coalesce(F.col("covered"), F.lit(0))).cast("double")
                / F.sum("n_tok"),
                6,
            ).alias("substring_savings"),
        )
    )


# --------------------------------------------------------------------------
# TF-IDF term weighting (top-3 characteristic terms per document)
# --------------------------------------------------------------------------
@register(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, tok AS token
      FROM (SELECT doc_id,
                   UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS tok
            FROM documents)
      WHERE tok <> ''
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf,
             tf.tf * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS w
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tf, ROUND(w, 6) AS tfidf
    FROM (SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY w DESC, token) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: weight each (doc, token) by tf · ln(N/df) and keep each
    document's top-3 most characteristic terms — the classic corpus
    keyword extraction / relevance-weighting pass. All inputs to the
    double math are integers (tf, df, N), so the weight — and therefore
    the rank order — is bit-identical cross-engine; ties break on the
    token string.

    Scale: tf is a (doc,token) aggregate, df a token aggregate on the
    same exploded input (one explode feeding both via a persisted
    intermediate at real scale), the N is a broadcast 1-row aggregate,
    and the top-3 is WindowGroupLimit-pruned per doc — nothing touches
    |docs|·|vocab|."""
    from olap_project_spark.functions.text import tokens
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    w = F.col("tf") * F.log(
        F.col("n_docs").cast("double") / F.col("df").cast("double")
    )
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "token", "tf", w.alias("w"))
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("w"), F.asc("token"))
    )
    return (
        scored.withColumn("rn", rn)
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "tf", F.round("w", 6).alias("tfidf"))
    )


# --------------------------------------------------------------------------
# Reproducible train/val/test split (hash-based assignment)
# --------------------------------------------------------------------------
@register(
    "doc_split_assignment",
    oracle="""
    WITH assigned AS (
      SELECT CASE
               WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                    AS BIGINT) % 100 < 80 THEN 'train'
               WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                    AS BIGINT) % 100 < 90 THEN 'val'
               ELSE 'test'
             END AS split,
             n_chars
      FROM documents
    )
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars
    FROM assigned
    GROUP BY split
    """,
)
def doc_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/val/test split by hashing the
    document id: assignment is a pure function of the id (stable across
    runs, machines, and engine versions — unlike rand() or TABLESAMPLE),
    so adding documents never reshuffles existing ones across splits.
    Uses the portable 48-bit md5 hash both engines compute identically.
    Note: a per-DOC hash can still place near-duplicates on both sides
    of the split — ``leakage_safe_split_stats`` (queries/dedup.py) is
    the group-keyed variant that closes that leak.

    Scale: a stateless projection — no shuffle at all for the
    assignment; downstream writers partition by split. This is also the
    deterministic-sampling primitive (`h % 100 < k` = reproducible k%
    sample) for eval subsets."""
    from olap_project_spark.functions.text import portable_hash48

    docs = load(spark, sf_dir, "documents")
    bucket = portable_hash48(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.round(
                F.sum("n_chars").cast("double") / F.count("*"), 6
            ).alias("avg_chars"),
        )
    )


# --------------------------------------------------------------------------
# Weighted sampling (Efraimidis–Spirakis A-ES) — probability ∝ size
# --------------------------------------------------------------------------
SAMPLE_K = 50

@register(
    "weighted_doc_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             -ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                       AS BIGINT) + 1) / CAST({2**48} AS DOUBLE))
             / GREATEST(n_chars, 1) AS k
      FROM documents
    )
    SELECT doc_id, ROUND(k * 1000000, 6) AS priority_key
    FROM keyed
    ORDER BY k, doc_id
    LIMIT {SAMPLE_K}
    """,
)
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample WITHOUT replacement, inclusion probability ∝
    document size: the Efraimidis–Spirakis A-ES scheme ("Weighted random
    sampling with a reservoir", IPL 2006) with the randomness
    DERANDOMIZED — u = (portable_hash48(doc_id)+1)/2⁴⁸ ∈ (0,1] instead
    of rand(), so the sample is a pure function of the corpus
    (reproducible across runs/engines, the training-data requirement
    doc_split_assignment already establishes for splits). Each doc gets
    an exponential key −ln(u)/w (w = n_chars); the k smallest keys ARE
    the weighted sample.

    Cross-engine note: ln() is the only transcendental — sub-ulp
    accurate in both JVM and libm, and keys are rounded to 6 dp of a
    ×10⁶-scaled value, far above ulp noise; selection boundaries are
    ~1e-3 apart, so the top-k set is stable.

    Scale: a stateless projection + distributed top-k
    (TakeOrderedAndProject): each partition keeps its k best, the
    driver merges k·n_partitions keys — no global sort, no shuffle of
    the corpus. This is THE one-pass "sample 50 docs ∝ length from
    100 TB" plan."""
    from olap_project_spark.functions.text import portable_hash48

    docs = load(spark, sf_dir, "documents")
    u = (portable_hash48(F.col("doc_id").cast("string")) + 1) / F.lit(
        float(2**48)
    )
    key = -F.log(u) / F.greatest(F.col("n_chars"), F.lit(1))
    return (
        docs.select("doc_id", key.alias("k"))
        .orderBy("k", "doc_id")
        .limit(SAMPLE_K)
        .select("doc_id", F.round(F.col("k") * 1000000, 6).alias("priority_key"))
    )


# --------------------------------------------------------------------------
# The full curation pipeline as ONE dataflow (flagship composition)
# --------------------------------------------------------------------------
@register(
    "corpus_curation_report",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, source, text,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS f,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
             length(text) AS n_chars,
             {_PUNCT_SQL} AS n_punct
      FROM documents
    ),
    dedup AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rn
        FROM fp
      ) WHERE rn = 1
    ),
    qual AS (
      SELECT * FROM dedup
      WHERE n_tokens >= 20 AND n_chars > 0
        AND CAST(n_punct AS DOUBLE) / n_chars < 0.1
    ),
    split AS (
      SELECT *, CASE WHEN h % 100 < 80 THEN 'train'
                     WHEN h % 100 < 90 THEN 'val'
                     ELSE 'test' END AS split
      FROM (SELECT *, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                           AS BIGINT) AS h
            FROM qual)
    ),
    raw_s AS (SELECT source, COUNT(*) AS n_raw FROM fp GROUP BY source),
    dedup_s AS (SELECT source, COUNT(*) AS n_dedup FROM dedup GROUP BY source),
    qual_s AS (SELECT source, COUNT(*) AS n_quality FROM qual GROUP BY source),
    split_s AS (
      SELECT source,
             CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
             CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
             CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN split = 'train' THEN n_tokens ELSE 0 END) AS BIGINT)
               AS train_tokens
      FROM split GROUP BY source
    )
    SELECT r.source, r.n_raw,
           COALESCE(d.n_dedup, 0) AS n_dedup,
           COALESCE(q.n_quality, 0) AS n_quality,
           COALESCE(s.n_train, 0) AS n_train,
           COALESCE(s.n_val, 0) AS n_val,
           COALESCE(s.n_test, 0) AS n_test,
           COALESCE(s.train_tokens, 0) AS train_tokens
    FROM raw_s r
    LEFT JOIN dedup_s d ON d.source = r.source
    LEFT JOIN qual_s q ON q.source = r.source
    LEFT JOIN split_s s ON s.source = r.source
    """,
)
def corpus_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation funnel as one dataflow — what a
    training-data team actually runs nightly: exact dedup (canonical
    survivor = min doc_id per normalized-text fingerprint, so
    cross-source duplicates resolve deterministically) → quality gate
    (length + punctuation-density) → reproducible hash split → per-
    source funnel accounting with train-token budget. Composes the
    operators doc_fingerprints / doc_quality_scores /
    doc_split_assignment prove individually; this query proves they
    compose in one plan.

    Scale: one scan computes fingerprint+features; dedup is a single
    row_number window on the fingerprint key; every later stage is a
    narrow filter/projection on that flow, and the three stage
    summaries are tiny per-source aggregates broadcast-joined at the
    end. The fact is scanned ONCE."""
    from olap_project_spark.functions.text import (
        normalize_text as _norm,
        portable_hash48 as _h48,
        punct_count as _punct,
        token_count as _ntok,
    )

    docs = load(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        "source",
        F.md5(_norm(F.col("text"))).alias("f"),
        _ntok(F.col("text")).alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        _punct(F.col("text")).alias("n_punct"),
    )
    from pyspark.sql.window import Window

    rn = F.row_number().over(Window.partitionBy("f").orderBy("doc_id"))
    dedup = fp.withColumn("rn", rn).filter(F.col("rn") == 1)
    qual = dedup.filter(
        (F.col("n_tokens") >= 20)
        & (F.col("n_chars") > 0)
        & (F.col("n_punct").cast("double") / F.col("n_chars") < 0.1)
    )
    bucket = _h48(F.col("doc_id").cast("string")) % 100
    split = qual.withColumn(
        "split",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"),
    )
    raw_s = fp.groupBy("source").agg(F.count("*").alias("n_raw"))
    dedup_s = dedup.groupBy("source").agg(F.count("*").alias("n_dedup"))
    qual_s = qual.groupBy("source").agg(F.count("*").alias("n_quality"))
    flag = lambda name: F.sum(  # noqa: E731
        F.when(F.col("split") == name, 1).otherwise(0)
    ).cast("bigint")
    split_s = split.groupBy("source").agg(
        flag("train").alias("n_train"),
        flag("val").alias("n_val"),
        flag("test").alias("n_test"),
        F.sum(F.when(F.col("split") == "train", F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("train_tokens"),
    )
    out = (
        raw_s.join(dedup_s, "source", "left")
        .join(qual_s, "source", "left")
        .join(split_s, "source", "left")
    )
    fill = lambda c: F.coalesce(F.col(c), F.lit(0)).alias(c)  # noqa: E731
    return out.select(
        "source",
        "n_raw",
        fill("n_dedup"),
        fill("n_quality"),
        fill("n_train"),
        fill("n_val"),
        fill("n_test"),
        fill("train_tokens"),
    )


# --------------------------------------------------------------------------
# PII redaction — scrub-before-training, cross-engine-verified
# --------------------------------------------------------------------------
def _pii_oracle() -> str:
    from olap_project_spark.functions.text import (
        CCN_PATTERN,
        EMAIL_PATTERN,
        PHONE_PATTERN,
    )

    seeded = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com call +1-555-'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
        " || ' card 4000-1234-5678-'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    )
    redacted = (
        f"regexp_replace(regexp_replace(regexp_replace(txt,"
        f" '{CCN_PATTERN}', '<CCN>', 'g'),"
        f" '{EMAIL_PATTERN}', '<EMAIL>', 'g'),"
        f" '{PHONE_PATTERN}', '<PHONE>', 'g')"
    )
    return f"""
    WITH seeded AS (
      SELECT source, {seeded} AS txt
      FROM documents
    ),
    red AS (SELECT source, txt, {redacted} AS redacted FROM seeded)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(txt, '{EMAIL_PATTERN}'))) AS BIGINT) AS emails_found,
           CAST(SUM(len(regexp_extract_all(txt, '{PHONE_PATTERN}'))) AS BIGINT) AS phones_found,
           CAST(SUM(len(regexp_extract_all(txt, '{CCN_PATTERN}'))) AS BIGINT) AS cards_found,
           CAST(SUM(length(txt) - length(redacted)) AS BIGINT) AS chars_removed,
           CAST(SUM(CAST('0x' || substr(md5(redacted), 1, 12) AS BIGINT)) AS BIGINT) AS redacted_hash_sum,
           CAST(SUM(CASE WHEN regexp_matches(redacted, '{EMAIL_PATTERN}')
                          OR regexp_matches(redacted, '{PHONE_PATTERN}')
                          OR regexp_matches(redacted, '{CCN_PATTERN}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS docs_leaking
    FROM red
    GROUP BY source
    """


@register("pii_redaction_stats", oracle=_pii_oracle)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: emails / phone numbers /
    card numbers replaced by typed tags (functions.text.redact_pii —
    three chained JVM-native regexp_replace, no Python). The synthetic
    corpus carries no real PII, so the query SEEDS deterministic PII
    derived from doc_id on both engines, then redacts and verifies:
    per-source match counts, the redacted-text length delta, a
    portable 48-bit content hash over every redacted document (pins
    the redacted text byte-for-byte across engines), and a
    docs_leaking count the oracle independently recomputes — 0 means
    no seeded identifier survived redaction.

    Scale: one narrow projection pass — regex work is per-row,
    partition-parallel, no shuffle before the per-source rollup;
    the hash-sum aggregates map-side. At 100 TB this runs at scan
    speed, which is exactly what a scrub pass must do."""
    from olap_project_spark.functions.text import (
        CCN_PATTERN,
        EMAIL_PATTERN,
        PHONE_PATTERN,
        portable_hash48,
        redact_pii,
    )

    seeded = load(spark, sf_dir, "documents").select(
        "source",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" card 4000-1234-5678-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("txt"),
    )
    red = seeded.withColumn("redacted", redact_pii(F.col("txt")))
    leak = (
        F.col("redacted").rlike(EMAIL_PATTERN)
        | F.col("redacted").rlike(PHONE_PATTERN)
        | F.col("redacted").rlike(CCN_PATTERN)
    )
    return red.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.regexp_count(F.col("txt"), F.lit(EMAIL_PATTERN)))
        .cast("bigint")
        .alias("emails_found"),
        F.sum(F.regexp_count(F.col("txt"), F.lit(PHONE_PATTERN)))
        .cast("bigint")
        .alias("phones_found"),
        F.sum(F.regexp_count(F.col("txt"), F.lit(CCN_PATTERN)))
        .cast("bigint")
        .alias("cards_found"),
        F.sum(F.length("txt") - F.length("redacted"))
        .cast("bigint")
        .alias("chars_removed"),
        F.sum(portable_hash48(F.col("redacted")))
        .cast("bigint")
        .alias("redacted_hash_sum"),
        F.sum(F.when(leak, 1).otherwise(0)).cast("bigint").alias("docs_leaking"),
    )


# --------------------------------------------------------------------------
# Context-window packing — concatenate-and-chunk sequence assembly
# --------------------------------------------------------------------------
PACK_BUDGET = 512  # tokens per context window (gate-scale; a knob)

_SQL_NTOK = (
    "CASE WHEN trim(text)='' THEN 0"
    " ELSE len(string_split_regex(trim(text), '\\s+')) END"
)


@register(
    "context_packing_stats",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id, {_SQL_NTOK} AS n_tokens FROM documents
    ),
    packed AS (
      SELECT source, doc_id, n_tokens,
             CAST(FLOOR(
               (SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS bin
      FROM toks
    )
    SELECT source, bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM packed
    GROUP BY source, bin
    """,
)
def context_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing for LM training: documents are
    concatenated in deterministic (source, doc_id) order and chunked
    into PACK_BUDGET(=512)-token windows; each document lands in the bin
    where its starting token offset falls (the concatenate-and-chunk
    recipe — the per-window rollup reports how many docs and tokens
    each training sequence draws).

    Spark-first shape: the running token offset is ONE window cumsum
    partitioned by source (state scales out with sources; never a
    global single-partition order), followed by a map-side-combinable
    rollup. At 100 TB this is a single shuffle by source + bin.
    """
    toks = load(spark, sf_dir, "documents").select(
        "source", "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    from pyspark.sql.window import Window as W

    cum = F.sum("n_tokens").over(
        W.partitionBy("source").orderBy("doc_id").rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
    )
    packed = toks.withColumn(
        "bin",
        F.floor((cum - F.col("n_tokens")) / float(PACK_BUDGET)).cast("bigint"),
    )
    return packed.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
        F.max("doc_id").cast("bigint").alias("last_doc"),
    )


# --------------------------------------------------------------------------
# BM25 retrieval (the IR scoring function behind every search sidecar)
# --------------------------------------------------------------------------
BM25_TERMS = ("hash", "join", "vector")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents WHERE trim(text) != ''
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    g AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      WHERE tok IN ({terms}) GROUP BY 1, 2
    ),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
             ln((g.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({BM25_K1} + 1.0)
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * dl.dl / g.avgdl)) AS w
      FROM tf
      JOIN dl ON dl.doc_id = tf.doc_id
      JOIN df ON df.tok = tf.tok
      CROSS JOIN g
    ),
    total AS (
      SELECT doc_id, ROUND(SUM(w), 6) AS bm25 FROM scored GROUP BY 1
    )
    SELECT doc_id, bm25
    FROM total ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOP_K}
    """


@register("bm25_retrieval_topk", oracle=_bm25_oracle)
def bm25_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval over the corpus for a fixed query
    ({terms}): the Okapi scoring function — IDF·tf·(k1+1)/(tf +
    k1·(1−b+b·dl/avgdl)) with k1=1.2, b=0.75 — summed over query
    terms, top-10 by score with doc_id tiebreak. The lexical-retrieval
    operator that pairs with the ANN family's dense retrieval
    (similarity.py) for hybrid search.

    Scale: tokens explode ONCE and filter to the query's terms BEFORE
    the tf aggregate (the explode output that survives is O(matches),
    not O(corpus tokens)); doc length and the global (N, avgdl) row are
    broadcast back; the final ranking is a TakeOrderedAndProject. At
    100 TB the tf/df frames are the inverted index you'd materialize
    once and reuse across queries.

    Cross-engine: ln() is the only transcendental (sub-ulp libm drift
    absorbed by round 6, the tfidf/weighted-sample precedent)."""
    docs = load(spark, sf_dir, "documents").filter(F.trim("text") != "")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    g = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("tok").isin(*BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    w = (
        idf
        * F.col("tf")
        * (BM25_K1 + 1.0)
        / (
            F.col("tf")
            + BM25_K1
            * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "tok")
        .join(F.broadcast(g))
        .select("doc_id", w.alias("w"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("w"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(BM25_TOP_K)
    )


# --------------------------------------------------------------------------
# Tokenizer vocabulary coverage / OOV rate
# --------------------------------------------------------------------------
VOCAB_K = 500


@register(
    "vocab_oov_rate",
    oracle=f"""
    WITH tok AS (
      SELECT source, t AS tok
      FROM documents,
           UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS u(t)
      WHERE t <> ''
    ),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, row_number() OVER (
                 ORDER BY COUNT(*) DESC, tok) AS rn
        FROM tok GROUP BY tok
      ) WHERE rn <= {VOCAB_K}
    )
    SELECT source,
           COUNT(*) AS n_positions,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           COUNT(DISTINCT CASE WHEN v.tok IS NULL THEN tok.tok END)
             AS n_distinct_oov,
           ROUND(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS oov_rate
    FROM tok LEFT JOIN vocab v ON tok.tok = v.tok
    GROUP BY source
    """,
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: fix the vocabulary to the corpus's
    top-{VOCAB_K} tokens (frequency-ranked, token-ascending tiebreak so
    the cut is engine-independent), then report each source's
    out-of-vocabulary token-position rate — the coverage statistic that
    drives tokenizer retraining / source-mixture decisions in an LLM
    data pipeline.

    Scale: one explode → one hash-aggregate for the frequency table;
    the {VOCAB_K}-row cut is a distributed top-k (TakeOrderedAndProject
    — per-partition heaps, never a global sort), and the membership
    probe is a broadcast left join against the exploded positions (no
    shuffle of the big side). The OOV rate divides exact integer
    sums."""
    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
    )
    vocab = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(VOCAB_K)
        .select(F.col("tok").alias("vtok"))
    )
    probed = tok.join(
        F.broadcast(vocab), tok["tok"] == vocab["vtok"], "left"
    )
    is_oov = F.col("vtok").isNull()
    return probed.groupBy("source").agg(
        F.count("*").alias("n_positions"),
        F.sum(is_oov.cast("bigint")).cast("bigint").alias("n_oov"),
        F.count_distinct(F.when(is_oov, F.col("tok"))).alias("n_distinct_oov"),
        F.round(
            F.sum(is_oov.cast("bigint")).cast("double") / F.count("*"), 6
        ).alias("oov_rate"),
    )


# --------------------------------------------------------------------------
# Bigram language-model perplexity filter (CCNet-style quality scoring)
# --------------------------------------------------------------------------
LM_NLL_BUCKET_MICRO = 50_000  # 0.05-nat histogram buckets
LM_NLL_PER_NAT = 1_000_000 // LM_NLL_BUCKET_MICRO  # buckets per nat (20)


@register(
    "lm_perplexity_buckets",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts
      FROM documents WHERE trim(text) <> ''
    ),
    tok AS (SELECT unnest(ts) AS tok FROM d),
    v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab FROM tok),
    bg AS (
      SELECT doc_id, ts[i] AS w1, ts[i] || ' ' || ts[i + 1] AS big
      FROM d, UNNEST(range(1, len(ts))) AS t(i)
    ),
    c12 AS (SELECT w1, big, COUNT(*) AS n12 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS n1 FROM bg GROUP BY 1),
    lp AS (
      SELECT c12.big,
             CAST(ROUND(ln(CAST(n12 + 1 AS DOUBLE) / (n1 + vocab)) * 1000000)
                  AS BIGINT) AS lp_micro
      FROM c12 JOIN c1 USING (w1) CROSS JOIN v
    ),
    doc AS (
      SELECT bg.doc_id, SUM(lp_micro) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM bg JOIN lp USING (big) GROUP BY 1
    ),
    bucketed AS (
      SELECT CAST((-s * {LM_NLL_PER_NAT}) // (n * 1000000) AS BIGINT)
               AS nll_bucket
      FROM doc
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM bucketed)
    SELECT nll_bucket,
           ROUND(CAST(nll_bucket AS DOUBLE) * 0.05, 2) AS nll_lo,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(n_total), 6) AS share
    FROM bucketed CROSS JOIN tot
    GROUP BY 1, 2 ORDER BY 1
    """,
)
def lm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity histogram over the corpus — the CCNet-style
    quality filter: train a Laplace-smoothed bigram model on the corpus
    itself (p(w2|w1) = (c12+1)/(c1+V)), score each document by its
    average per-bigram negative log-likelihood, and histogram the
    corpus in 0.05-nat buckets. High-NLL tails are the
    boilerplate/garbled docs a pretraining pipeline drops; the bucket
    table is the threshold-picking artifact.

    Determinism: per-bigram log-probs round once to integer micro-nats
    (sub-ulp libm drift absorbed, the bm25/tfidf precedent); per-doc
    totals are then EXACT bigint sums (order-independent — the repo's
    integer-cents convention), and the bucket index is exact integer
    division on both engines (positive operands, so DuckDB `//`
    truncation == Spark `div`).

    Scale: two hash aggregates build the model (bigram and context
    counts, the shuffles); scoring is one equi-join of bigram
    instances against the distinct-bigram table; vocab and the doc
    total are 1-row broadcasts. No windows, no driver loops — the
    model IS a DataFrame, so at 100 TB it materializes once and
    scores any number of corpora incrementally.

    Beyond-reference surface (task brief "text analysis" / quality
    scoring); complements doc_quality_scores' heuristic features with
    a statistical LM score."""
    from olap_project_spark.functions.text import word_shingles

    docs = load(spark, sf_dir, "documents").filter(F.trim("text") != "")
    ts = docs.select("doc_id", tokens(F.col("text")).alias("ts"))
    tok = ts.select(F.explode("ts").alias("tok"))
    vocab = tok.agg(F.count_distinct("tok").cast("bigint").alias("vocab"))
    bg = ts.select(
        "doc_id", F.explode(word_shingles(F.col("ts"), 2)).alias("big")
    ).withColumn("w1", F.substring_index("big", " ", 1))
    c12 = bg.groupBy("w1", "big").agg(F.count("*").alias("n12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("n1"))
    lp = (
        c12.join(c1, "w1")
        .join(F.broadcast(vocab))
        .select(
            "big",
            F.round(
                F.log(
                    (F.col("n12") + 1).cast("double")
                    / (F.col("n1") + F.col("vocab"))
                )
                * 1_000_000
            )
            .cast("bigint")
            .alias("lp_micro"),
        )
    )
    doc = (
        bg.join(lp, "big")
        .groupBy("doc_id")
        .agg(
            F.sum("lp_micro").alias("s"),
            F.count("*").cast("bigint").alias("n"),
        )
    )
    bucketed = doc.select(
        F.expr(f"(-s * {LM_NLL_PER_NAT}) div (n * 1000000)")
        .cast("bigint")
        .alias("nll_bucket")
    )
    tot = bucketed.agg(F.count("*").cast("bigint").alias("n_total"))
    return (
        bucketed.groupBy("nll_bucket")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .join(F.broadcast(tot))
        .select(
            "nll_bucket",
            F.round(F.col("nll_bucket").cast("double") * 0.05, 2).alias(
                "nll_lo"
            ),
            "n_docs",
            F.round(
                F.col("n_docs").cast("double") / F.col("n_total"), 6
            ).alias("share"),
        )
        .orderBy("nll_bucket")
    )


# --------------------------------------------------------------------------
# Cross-source vocabulary divergence (corpus drift monitoring)
# --------------------------------------------------------------------------
JS_NANO = 1_000_000_000  # per-term JS contributions round to nano-nats


@register(
    "source_vocab_divergence",
    oracle=f"""
    WITH tok AS (
      SELECT source,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents WHERE trim(text) <> ''
    ),
    ct AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
    tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM ct GROUP BY 1),
    shared AS (
      SELECT a.source AS sa, b.source AS sb, a.tok, a.c AS ca, b.c AS cb
      FROM ct a JOIN ct b ON a.tok = b.tok AND a.source < b.source
    ),
    terms AS (
      SELECT sa, sb, ca, cb,
             CAST(ROUND((CAST(ca AS DOUBLE) / na.n)
                  * ln((2 * CAST(ca AS DOUBLE) / na.n)
                       / (CAST(ca AS DOUBLE) / na.n
                          + CAST(cb AS DOUBLE) / nb.n))
                  * {JS_NANO}) AS BIGINT) AS t1,
             CAST(ROUND((CAST(cb AS DOUBLE) / nb.n)
                  * ln((2 * CAST(cb AS DOUBLE) / nb.n)
                       / (CAST(ca AS DOUBLE) / na.n
                          + CAST(cb AS DOUBLE) / nb.n))
                  * {JS_NANO}) AS BIGINT) AS t2
      FROM shared JOIN tot na ON na.source = shared.sa
                  JOIN tot nb ON nb.source = shared.sb
    ),
    agg AS (
      SELECT sa, sb, SUM(t1) AS s1, SUM(t2) AS s2,
             CAST(SUM(ca) AS BIGINT) AS csa, CAST(SUM(cb) AS BIGINT) AS csb,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM terms GROUP BY 1, 2
    )
    SELECT sa AS source_a, sb AS source_b, n_shared AS n_shared_tokens,
           ROUND(0.5 * CAST(s1 + s2 AS DOUBLE) / {JS_NANO}
                 + 0.5 * ln(2) * (2 - CAST(csa AS DOUBLE) / na.n
                                    - CAST(csb AS DOUBLE) / nb.n), 6)
             AS js_divergence
    FROM agg JOIN tot na ON na.source = agg.sa
             JOIN tot nb ON nb.source = agg.sb
    ORDER BY 1, 2
    """,
)
def source_vocab_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the unigram token
    distributions of every source pair — the corpus drift/mixture
    monitor: a source whose vocabulary diverges from the rest is a
    domain shift (new crawl snapshot, changed boilerplate, different
    language mix) that the mixture plan should reweight for, and JS
    (symmetric, bounded by ln 2) is the standard comparison metric.

    Decomposition for scale: JS needs the token UNION per pair, but
    tokens private to one source contribute exactly p·ln2 — so the
    query joins only SHARED tokens (an equi-join on token, never a
    per-pair outer join) and applies the closed-form
    ln2·(1 − Σ_shared p) correction from exact integer count sums.

    Determinism: per-token JS terms round once to nano-nats then sum
    as exact bigints (order-free, the repo's fixed-point convention);
    the correction term's probability masses are quotients of exact
    integer sums; one final 6-dp round.

    Scale: token counts are two hash aggregates; the pair join fans
    out each token row to at most n_sources² pairs (vocab-bounded,
    corpus-size-independent frames); result is |pairs| rows."""
    docs = load(spark, sf_dir, "documents").filter(F.trim("text") != "")
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    )
    ct = tok.groupBy("source", "tok").agg(
        F.count("*").cast("bigint").alias("c")
    )
    tot = ct.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    a = ct.select(
        F.col("source").alias("sa"), "tok", F.col("c").alias("ca")
    )
    b = ct.select(
        F.col("source").alias("sb"), F.col("tok").alias("tok_b"),
        F.col("c").alias("cb"),
    )
    shared = a.join(
        b, (F.col("tok") == F.col("tok_b")) & (F.col("sa") < F.col("sb"))
    )
    na = tot.select(F.col("source").alias("sa"), F.col("n").alias("n_a"))
    nb = tot.select(F.col("source").alias("sb"), F.col("n").alias("n_b"))
    p = F.col("ca").cast("double") / F.col("n_a")
    q = F.col("cb").cast("double") / F.col("n_b")
    t1 = F.round(p * F.log(2 * p / (p + q)) * JS_NANO).cast("bigint")
    t2 = F.round(q * F.log(2 * q / (p + q)) * JS_NANO).cast("bigint")
    terms = (
        shared.join(na, "sa")
        .join(nb, "sb")
        .select("sa", "sb", "ca", "cb", t1.alias("t1"), t2.alias("t2"))
    )
    agg = terms.groupBy("sa", "sb").agg(
        F.sum("t1").alias("s1"),
        F.sum("t2").alias("s2"),
        F.sum("ca").cast("bigint").alias("csa"),
        F.sum("cb").cast("bigint").alias("csb"),
        F.count("*").cast("bigint").alias("n_shared"),
    )
    ln2 = F.log(F.lit(2.0))
    js = F.round(
        0.5 * (F.col("s1") + F.col("s2")).cast("double") / JS_NANO
        + 0.5
        * ln2
        * (
            2
            - F.col("csa").cast("double") / F.col("n_a")
            - F.col("csb").cast("double") / F.col("n_b")
        ),
        6,
    )
    return (
        agg.join(na, "sa")
        .join(nb, "sb")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            F.col("n_shared").alias("n_shared_tokens"),
            js.alias("js_divergence"),
        )
        .orderBy("source_a", "source_b")
    )


# --------------------------------------------------------------------------
# Character-entropy gibberish filter
# --------------------------------------------------------------------------
ENTROPY_BUCKET_NANO = 100_000_000  # 0.1-nat histogram buckets


@register(
    "char_entropy_buckets",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lower(trim(text)) AS t
      FROM documents WHERE trim(text) <> ''
    ),
    ch AS (
      SELECT doc_id, unnest(string_split(t, '')) AS c FROM d
    ),
    cc AS (SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS n
           FROM ch WHERE c <> '' GROUP BY 1, 2),
    dn AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS total FROM cc GROUP BY 1),
    terms AS (
      SELECT cc.doc_id,
             CAST(ROUND((CAST(n AS DOUBLE) / total)
                  * ln(CAST(n AS DOUBLE) / total) * 1000000000) AS BIGINT)
               AS t
      FROM cc JOIN dn USING (doc_id)
    ),
    ent AS (
      SELECT doc_id, CAST((-SUM(t)) // {ENTROPY_BUCKET_NANO} AS BIGINT)
               AS bucket
      FROM terms GROUP BY doc_id
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM ent)
    SELECT bucket AS entropy_bucket,
           ROUND(CAST(bucket AS DOUBLE) * 0.1, 1) AS entropy_lo,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(n_total), 6) AS share
    FROM ent CROSS JOIN tot
    GROUP BY 1, 2 ORDER BY 1
    """,
)
def char_entropy_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy, histogrammed in
    0.1-nat buckets — the gibberish/junk detector that complements
    the LM perplexity filter: binary blobs and encoding garbage land
    in the HIGH-entropy tail, templated/repeated filler in the LOW
    tail, while natural language clusters in a narrow band. Standard
    corpus-curation signal alongside doc_quality_scores'
    length/punct/stopword heuristics.

    Determinism: per-character terms p·ln p round once to nano-nats;
    the per-doc entropy is then an EXACT bigint sum over ≤ |alphabet|
    terms (order-free), and the bucket index is exact integer
    division of positive operands (DuckDB `//` == Spark `div`).

    Scale: the char explode is linear in corpus bytes and fuses with
    the scan; both aggregates are hash aggregates keyed by
    (doc_id[, char]) — no windows, no skew (per-doc alphabet is
    bounded). At 100 TB the explode trades bytes for rows 1:1; a
    mapInPandas char-histogram (one Arrow batch per task, no
    explode) is the constant-factor alternative the multimodal
    family already demonstrates."""
    docs = load(spark, sf_dir, "documents").filter(F.trim("text") != "")
    d = docs.select("doc_id", F.lower(F.trim("text")).alias("t"))
    ch = d.select("doc_id", F.explode(F.split("t", "")).alias("c")).filter(
        F.col("c") != ""
    )
    cc = ch.groupBy("doc_id", "c").agg(F.count("*").cast("bigint").alias("n"))
    dn = cc.groupBy("doc_id").agg(F.sum("n").cast("bigint").alias("total"))
    p = F.col("n").cast("double") / F.col("total")
    terms = cc.join(dn, "doc_id").select(
        "doc_id",
        F.round(p * F.log(p) * 1_000_000_000).cast("bigint").alias("t"),
    )
    ent = terms.groupBy("doc_id").agg(
        F.expr(f"(-sum(t)) div {ENTROPY_BUCKET_NANO}")
        .cast("bigint")
        .alias("bucket")
    )
    tot = ent.agg(F.count("*").cast("bigint").alias("n_total"))
    return (
        ent.groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .join(F.broadcast(tot))
        .select(
            F.col("bucket").alias("entropy_bucket"),
            F.round(F.col("bucket").cast("double") * 0.1, 1).alias(
                "entropy_lo"
            ),
            "n_docs",
            F.round(
                F.col("n_docs").cast("double") / F.col("n_total"), 6
            ).alias("share"),
        )
        .orderBy("entropy_bucket")
    )


# --------------------------------------------------------------------------
# BPE merge-candidate mining (tokenizer-training iteration 0)
# --------------------------------------------------------------------------
BPE_MERGE_TOP_K = 20


@register(
    "bpe_merge_candidates",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
      FROM documents WHERE trim(text) <> ''
    ),
    wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY w),
    pairs AS (
      SELECT w, n, substr(w, i, 1) || '+' || substr(w, i + 1, 1) AS pair
      FROM wc, UNNEST(range(1, len(w))) AS t(i)
    ),
    agg AS (
      SELECT pair, CAST(SUM(n) AS BIGINT) AS n_occurrences,
             CAST(COUNT(DISTINCT w) AS BIGINT) AS n_distinct_words
      FROM pairs GROUP BY pair
    )
    SELECT pair, n_occurrences, n_distinct_words
    FROM agg ORDER BY n_occurrences DESC, pair LIMIT {BPE_MERGE_TOP_K}
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first iteration of BPE tokenizer TRAINING (Sennrich et al.
    2016): count adjacent character-pair frequencies across the
    corpus, weighted by word frequency, and report the top
    {BPE_MERGE_TOP_K} merge candidates — the pair the algorithm would
    merge first, plus the runners-up. Complements bpe_token_stats
    (which APPLIES a fixed pre-tokenizer) with the training side; the
    word-frequency pre-aggregation is the standard trick that makes
    BPE training corpus-size-independent after one pass.

    Scale: the heavy reduction is the word-count hash aggregate
    (corpus tokens → |vocab| rows); pair explosion then runs over
    the VOCABULARY (bounded), not the corpus; top-k is a
    TakeOrderedAndProject. Exact integer counts — no FP anywhere."""
    docs = load(spark, sf_dir, "documents").filter(F.trim("text") != "")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("w"))
    wc = tok.groupBy("w").agg(F.count("*").cast("bigint").alias("n"))
    # guard: sequence(1, 0) would DESCEND for 1-char words
    pair_arr = F.when(
        F.length("w") >= 2,
        F.expr(
            "transform(sequence(1, length(w) - 1),"
            " i -> concat(substr(w, i, 1), '+', substr(w, i + 1, 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = wc.select("w", "n", F.explode(pair_arr).alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("n").cast("bigint").alias("n_occurrences"),
            F.count_distinct("w").cast("bigint").alias("n_distinct_words"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(BPE_MERGE_TOP_K)
    )


# --------------------------------------------------------------------------
# Readability scoring (Flesch reading ease, per source)
# --------------------------------------------------------------------------
@register(
    "readability_scores",
    oracle="""
    WITH d AS (
      SELECT source, lower(trim(text)) AS t
      FROM documents WHERE trim(text) <> ''
    ),
    counts AS (
      SELECT source,
             CAST(len(string_split_regex(t, '\\s+')) AS BIGINT) AS n_words,
             CAST(GREATEST(len(regexp_extract_all(t, '[.!?]+')), 1)
                  AS BIGINT) AS n_sents,
             CAST(GREATEST(len(regexp_extract_all(t, '[aeiouy]+')), 1)
                  AS BIGINT) AS n_syll
      FROM d
    ),
    agg AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_words) AS BIGINT) AS words,
             CAST(SUM(n_sents) AS BIGINT) AS sents,
             CAST(SUM(n_syll) AS BIGINT) AS sylls
      FROM counts GROUP BY source
    )
    SELECT source, n_docs, words, sents, sylls,
           ROUND(206.835 - 1.015 * (CAST(words AS DOUBLE) / sents)
                         - 84.6 * (CAST(sylls AS DOUBLE) / words), 6)
             AS flesch_ease
    FROM agg ORDER BY source
    """,
)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source — the classic readability
    quality signal (Flesch 1948; the DeepMind Gopher/MassiveText
    filters use the same word/sentence/syllable statistics): 206.835
    − 1.015·(words/sentences) − 84.6·(syllables/words), with
    syllables approximated by vowel-group runs and sentences by
    terminal-punctuation runs (both clamped to ≥ 1 per doc so
    unpunctuated docs score as one long sentence instead of dividing
    by zero).

    The per-source score derives from EXACT integer corpus totals
    (Σwords, Σsentences, Σsyllables) — never an average of per-doc
    doubles — so the two divisions and the final formula are one
    deterministic expression tree per source row.

    Scale: three regexp counts fused into the scan projection, one
    per-source hash aggregate — no joins, no windows."""
    docs = load(spark, sf_dir, "documents").filter(F.trim("text") != "")
    t = F.lower(F.trim("text"))
    counts = docs.select(
        "source",
        F.size(F.split(t, r"\s+")).cast("bigint").alias("n_words"),
        F.greatest(
            F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), F.lit(0))),
            F.lit(1),
        )
        .cast("bigint")
        .alias("n_sents"),
        F.greatest(
            F.size(F.regexp_extract_all(t, F.lit(r"[aeiouy]+"), F.lit(0))),
            F.lit(1),
        )
        .cast("bigint")
        .alias("n_syll"),
    )
    agg = counts.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("words"),
        F.sum("n_sents").cast("bigint").alias("sents"),
        F.sum("n_syll").cast("bigint").alias("sylls"),
    )
    flesch = (
        206.835
        - 1.015 * (F.col("words").cast("double") / F.col("sents"))
        - 84.6 * (F.col("sylls").cast("double") / F.col("words"))
    )
    return agg.select(
        "source",
        "n_docs",
        "words",
        "sents",
        "sylls",
        F.round(flesch, 6).alias("flesch_ease"),
    ).orderBy("source")


# --------------------------------------------------------------------------
# Zipf-law fit of the token frequency distribution
# --------------------------------------------------------------------------
@register(
    "zipf_law_fit",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents WHERE trim(text) <> ''
    ),
    tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY tok),
    ranked AS (
      SELECT tok, f, row_number() OVER (ORDER BY f DESC, tok) AS r
      FROM tf
    ),
    pts AS (
      SELECT CAST(ROUND(ln(CAST(r AS DOUBLE)) * 10000) AS BIGINT) AS x,
             CAST(ROUND(ln(CAST(f AS DOUBLE)) * 10000) AS BIGINT) AS y
      FROM ranked
    ),
    m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM pts
    )
    SELECT CAST(nd AS BIGINT) AS vocab_size,
           ROUND(-(((nd * sxy) - (sx * sy)) / ((nd * sxx) - (sx * sx))), 6)
             AS zipf_exponent,
           ROUND(((nd * sxy) - (sx * sy)) * ((nd * sxy) - (sx * sy))
                 / (((nd * sxx) - (sx * sx)) * ((nd * syy) - (sy * sy))), 6)
             AS r2
    FROM m
    """,
)
def zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus token frequency distribution: OLS
    slope of ln(frequency) against ln(rank) — the canonical corpus
    health statistic (natural language sits near exponent 1; a flat
    exponent flags templated/synthetic text, which this corpus's
    ≈0.18 honestly reveals; a steep one flags vocabulary collapse).

    The frequency ranking is the scale-safe range-partitioned
    two-pass row_number (functions/scale.global_order_stats) — the
    vocabulary is an unbounded dimension, so no single-task sort;
    ln points round once to 0.1-milli fixed-point bigints, the OLS
    moments are exact integer sums (products bounded well inside
    int64 at any realistic vocabulary), and the slope/r² divide
    double casts of those exact moments in identical expression
    trees (the price_quantity_regression convention).

    Scale: one token hash aggregate (corpus → vocab), one range
    exchange for the rank, one 1-row moment aggregate."""
    from olap_project_spark.functions.scale import global_order_stats

    docs = load(spark, sf_dir, "documents").filter(F.trim("text") != "")
    tok = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    tf = tok.groupBy("tok").agg(F.count("*").cast("bigint").alias("f"))
    ranked = global_order_stats(
        tf, order_by=[F.desc("f"), F.asc("tok")], rank_col="r"
    )
    pts = ranked.select(
        F.round(F.log(F.col("r").cast("double")) * 10_000)
        .cast("bigint")
        .alias("x"),
        F.round(F.log(F.col("f").cast("double")) * 10_000)
        .cast("bigint")
        .alias("y"),
    )
    m = pts.agg(
        F.count("*").cast("double").alias("nd"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    num = (F.col("nd") * F.col("sxy")) - (F.col("sx") * F.col("sy"))
    den_x = (F.col("nd") * F.col("sxx")) - (F.col("sx") * F.col("sx"))
    den_y = (F.col("nd") * F.col("syy")) - (F.col("sy") * F.col("sy"))
    return m.select(
        F.col("nd").cast("bigint").alias("vocab_size"),
        F.round(-(num / den_x), 6).alias("zipf_exponent"),
        F.round(num * num / (den_x * den_y), 6).alias("r2"),
    )


# --------------------------------------------------------------------------
# Packing-efficiency curve: the context-length ablation — one offsets
# pass, a 4-row L ladder, exact padding/straddle accounting per L.
# --------------------------------------------------------------------------
PACK_LADDER = (256, 512, 1024, 2048)


def _packing_curve_oracle() -> str:
    ls = ", ".join(str(x) for x in PACK_LADDER)
    return f"""
    WITH toks AS (
      SELECT source, doc_id, {_SQL_NTOK} AS n_tokens FROM documents
    ),
    offs AS (
      SELECT source, doc_id, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS off
      FROM toks
    ),
    ls AS (SELECT UNNEST([{ls}]) AS l),
    tagged AS (
      SELECT l.l, o.source, o.n_tokens,
             CASE WHEN o.n_tokens >= 1
                       AND o.off // l.l <> (o.off + o.n_tokens - 1) // l.l
                  THEN 1 ELSE 0 END AS straddles
      FROM offs o CROSS JOIN ls l
    ),
    per_source AS (
      SELECT l, source,
             SUM(n_tokens) AS tot,
             SUM(straddles) AS n_split,
             COUNT(*) AS n_docs
      FROM tagged GROUP BY 1, 2
    )
    SELECT CAST(l AS INTEGER) AS context_len,
           CAST(SUM(tot) AS BIGINT) AS total_tokens,
           CAST(SUM((tot + l - 1) // l) AS BIGINT) AS n_windows,
           CAST(SUM((tot + l - 1) // l * l - tot) AS BIGINT) AS pad_tokens,
           ROUND(CAST(SUM((tot + l - 1) // l * l - tot) AS DOUBLE)
                 / SUM((tot + l - 1) // l * l), 6) AS pad_frac,
           CAST(SUM(n_split) AS BIGINT) AS n_split_docs,
           ROUND(CAST(SUM(n_split) AS DOUBLE) / SUM(n_docs), 6)
             AS split_frac
    FROM per_source GROUP BY l
    """


@register("packing_efficiency_curve", oracle=_packing_curve_oracle)
def packing_efficiency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The context-length ablation behind every LM data decision: for
    each window size on the ladder (256/512/1024/2048), exact
    concatenate-and-chunk accounting — window count, tail-padding
    tokens and fraction (each source's last window pads), and how many
    documents STRADDLE a window boundary (the docs that need
    cross-window attention masking, or get their context split). Long
    contexts waste fewer pad tokens but split more documents; this
    query measures the trade-off instead of guessing it.

    Exactness: offsets come from one per-source integer cumsum; the
    straddle test and the ceil arithmetic are integer DIV on
    nonnegative operands (both engines agree); the two fractions
    divide once at the edge.

    Scale: ONE window pass over the corpus (per-source cumsum — the
    same shuffle ``context_packing_stats`` pays), a 4-row broadcast
    ladder, and two bounded aggregates. The ablation costs no more
    than a single packing run."""
    toks = load(spark, sf_dir, "documents").select(
        "source", "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    from pyspark.sql.window import Window as W

    cum = F.sum("n_tokens").over(
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offs = toks.withColumn("off", cum - F.col("n_tokens"))
    ls = local_frame(spark, [(x,) for x in PACK_LADDER], "l long")
    straddle = (
        (F.col("n_tokens") >= 1)
        & (
            F.expr("off DIV l")
            != F.expr("(off + n_tokens - 1) DIV l")
        )
    ).cast("long")
    per_source = (
        offs.crossJoin(F.broadcast(ls))
        .groupBy("l", "source")
        .agg(
            F.sum("n_tokens").alias("tot"),
            F.sum(straddle).alias("n_split"),
            F.count("*").alias("n_docs"),
        )
    )
    n_win = F.expr("(tot + l - 1) DIV l")
    return per_source.groupBy("l").agg(
        F.sum("tot").cast("bigint").alias("total_tokens"),
        F.sum(n_win).cast("bigint").alias("n_windows"),
        F.sum(n_win * F.col("l") - F.col("tot"))
        .cast("bigint")
        .alias("pad_tokens"),
        F.round(
            F.sum(n_win * F.col("l") - F.col("tot")).cast("double")
            / F.sum(n_win * F.col("l")),
            6,
        ).alias("pad_frac"),
        F.sum("n_split").cast("bigint").alias("n_split_docs"),
        F.round(
            F.sum("n_split").cast("double") / F.sum("n_docs"), 6
        ).alias("split_frac"),
    ).select(
        F.col("l").cast("int").alias("context_len"),
        "total_tokens",
        "n_windows",
        "pad_tokens",
        "pad_frac",
        "n_split_docs",
        "split_frac",
    )


# --------------------------------------------------------------------------
# BPE tokenizer training (first merge rounds)
# --------------------------------------------------------------------------
_BPE_TOPK = 5


def _bpe_oracle() -> str:
    return f"""
    WITH words AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents) t
      WHERE w <> '' GROUP BY w
    ),
    r1 AS (
      SELECT substr(w, i, 1) AS lhs,
             substr(w, i + 1, 1) AS rhs,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT w, freq,
                   CAST(unnest(range(1, length(w))) AS INTEGER) AS i
            FROM words) t
      GROUP BY 1, 2
    ),
    top1 AS (SELECT lhs, rhs FROM r1 ORDER BY cnt DESC, lhs, rhs LIMIT 1),
    merged AS (
      SELECT regexp_replace(
               regexp_replace(w, '(.)', '·\\1', 'g'),
               '·' || (SELECT lhs FROM top1)
                 || '·' || (SELECT rhs FROM top1),
               '·' || (SELECT lhs FROM top1) || (SELECT rhs FROM top1),
               'g') AS rep,
             freq
      FROM words
    ),
    syms AS (
      SELECT list_filter(string_split(rep, '·'), x -> x <> '') AS ss,
             freq
      FROM merged
    ),
    r2 AS (
      SELECT ss[i] AS lhs,
             ss[i + 1] AS rhs,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT ss, freq,
                   CAST(unnest(range(1, len(ss))) AS INTEGER) AS i
            FROM syms) t
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT 1 AS round, lhs, rhs, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, lhs, rhs) AS rnk
      FROM r1
      UNION ALL
      SELECT 2 AS round, lhs, rhs, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, lhs, rhs) AS rnk
      FROM r2
    )
    SELECT CAST(round AS INTEGER) AS round,
           CAST(rnk AS INTEGER) AS rnk,
           lhs, rhs,
           cnt AS pair_count
    FROM ranked WHERE rnk <= {_BPE_TOPK}
    ORDER BY round, rnk
    """


@register("bpe_merge_pair_counts", oracle=_bpe_oracle)
def bpe_merge_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, first two merge rounds, exactly as
    Sennrich et al.'s algorithm runs them: count adjacent symbol pairs
    weighted by corpus word frequency, pick the most frequent pair
    (ties lexicographic), apply the merge with left-to-right
    non-overlapping replacement, and recount. The result carries the
    top-{_BPE_TOPK} pair table of each round — the start of the merge
    ledger a tokenizer-training pipeline materializes.

    The merge is applied with a boundary-marker representation
    ('·a·b·c': a marker BEFORE each symbol) so one global regex replace
    is exactly the non-overlapping left-to-right merge — no lookarounds
    (RE2-safe) and no shared-separator miss on consecutive pairs
    ('·a·b·a·b' → '·ab·ab' in one pass).

    Scale: pair counting shuffles (symbol, symbol, count) rows —
    bounded by the symbol-vocabulary square, not the corpus; the merge
    itself is a map over the DISTINCT-WORD table (vocabulary-sized,
    Zipf-bounded), never the raw text. Per-round cost is one
    vocab-sized map + one tiny shuffle; real trainers run thousands of
    rounds of exactly this shape, keeping the word table cached."""
    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    pairs1 = (
        words.select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1), "
                    "i -> struct(substring(w, i, 1) AS lhs, "
                    "substring(w, i + 1, 1) AS rhs))"
                )
            ).alias("p"),
        )
        .groupBy("p.lhs", "p.rhs")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )
    top1 = pairs1.orderBy(
        F.desc("cnt"), F.asc("lhs"), F.asc("rhs")
    ).limit(1)
    merged = words.join(F.broadcast(top1)).select(
        F.expr(
            "regexp_replace("
            "  regexp_replace(w, '(.)', '·$1'),"
            "  concat('·', lhs, '·', rhs),"
            "  concat('·', lhs, rhs))"
        ).alias("rep"),
        "freq",
    )
    pairs2 = (
        merged.select(
            "freq",
            F.expr(
                "filter(split(rep, '·'), x -> x != '')"
            ).alias("ss"),
        )
        .select(
            "freq",
            F.explode(
                F.expr(
                    "CASE WHEN size(ss) >= 2 THEN transform("
                    "sequence(0, size(ss) - 2), "
                    "i -> struct(ss[i] AS lhs, ss[i + 1] AS rhs)) "
                    "ELSE array() END"
                )
            ).alias("p"),
        )
        .groupBy("p.lhs", "p.rhs")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )

    def topk(df: DataFrame, rnd: int) -> DataFrame:
        # TakeOrderedAndProject picks the k rows; the rank window then
        # runs over ONLY those k rows (bounded), mirroring the
        # hybrid_rrf_retrieval pattern
        lim = df.orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs")).limit(
            _BPE_TOPK
        )
        return lim.select(
            F.lit(rnd).cast("int").alias("round"),
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs")))
            .cast("int")
            .alias("rnk"),
            "lhs",
            "rhs",
            F.col("cnt").alias("pair_count"),
        )

    return (
        topk(pairs1, 1)
        .unionByName(topk(pairs2, 2))
        .orderBy("round", "rnk")
    )


# --------------------------------------------------------------------------
# Span-corruption (T5 denoising objective) accounting
# --------------------------------------------------------------------------
SPAN_RATE_PCT = 15  # corrupt ~15% of tokens
SPAN_LEN = 3  # mean span length (fixed here: deterministic spans)


@register(
    "span_corruption_stats",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS n
      FROM documents
    ),
    plan AS (
      SELECT source, doc_id, n,
             GREATEST(1, (n * {SPAN_RATE_PCT}) // 100 // {SPAN_LEN})
               AS n_spans
      FROM toks WHERE n > 0
    ),
    spans AS (
      SELECT source, doc_id, n, n_spans,
             (CAST(k AS BIGINT) * n) // n_spans AS s
      FROM (SELECT source, doc_id, n, n_spans,
                   unnest(range(0, n_spans)) AS k
            FROM plan) t
    ),
    masked_pos AS (
      SELECT DISTINCT source, doc_id, n, n_spans,
             s + CAST(j AS BIGINT) AS pos
      FROM (SELECT source, doc_id, n, n_spans, s,
                   unnest(range(0, {SPAN_LEN})) AS j
            FROM spans) t
      WHERE s + CAST(j AS BIGINT) < n
    ),
    per_doc AS (
      SELECT source, doc_id, MAX(n) AS n, MAX(n_spans) AS n_spans,
             CAST(COUNT(*) AS BIGINT) AS masked
      FROM masked_pos GROUP BY source, doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(SUM(masked) AS BIGINT) AS masked_tokens,
           CAST(SUM(n_spans) AS BIGINT) AS sentinels,
           CAST(SUM(n - masked + n_spans) AS BIGINT) AS input_tokens,
           CAST(SUM(masked + n_spans) AS BIGINT) AS target_tokens,
           ROUND(CAST(SUM(masked) AS DOUBLE) / SUM(n), 6)
             AS corruption_rate
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def span_corruption_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN CORRUPTION accounting — the denoising-objective data prep
    behind T5/UL2 pretraining (Raffel et al., JMLR 2020): each document
    masks ~{SPAN_RATE_PCT}% of its whitespace tokens in
    length-{SPAN_LEN} spans replaced by sentinels; the query computes,
    per source, the exact input/target sequence-length ledger that
    sizing a denoising run requires (masked tokens, sentinel count,
    encoder input length n − masked + sentinels, decoder target length
    masked + sentinels).

    Spans are placed DETERMINISTICALLY at evenly-spaced starts
    s_k = ⌊k·n / n_spans⌋ (no RNG — reproducible across engines and
    runs); overlap and document-tail clipping are handled EXACTLY by
    counting distinct masked positions, not by closed-form arithmetic
    that would over-count short documents.

    Scale: pure sequence/explode algebra over per-doc token counts —
    the explode emits n_spans·{SPAN_LEN} position rows per document
    (≈ the corruption budget, a constant fraction of corpus tokens),
    then one partial-agg shuffle keyed by (source, doc)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", "doc_id", token_count(F.col("text")).alias("n")
    ).filter(F.col("n") > 0)
    plan = toks.withColumn(
        "n_spans",
        F.greatest(
            F.lit(1),
            F.expr(f"(n * {SPAN_RATE_PCT}) DIV 100 DIV {SPAN_LEN}"),
        ).cast("bigint"),
    )
    masked_pos = (
        plan.select(
            "source",
            "doc_id",
            "n",
            "n_spans",
            F.explode(F.expr("sequence(0, n_spans - 1)")).alias("k"),
        )
        .select(
            "source",
            "doc_id",
            "n",
            "n_spans",
            F.expr("(k * n) DIV n_spans").alias("s"),
        )
        .select(
            "source",
            "doc_id",
            "n",
            "n_spans",
            F.explode(F.expr(f"sequence(s, s + {SPAN_LEN - 1})")).alias(
                "pos"
            ),
        )
        .filter(F.col("pos") < F.col("n"))
        .dropDuplicates(["source", "doc_id", "pos"])
    )
    per_doc = masked_pos.groupBy("source", "doc_id").agg(
        F.max("n").alias("n"),
        F.max("n_spans").alias("n_spans"),
        F.count("*").cast("bigint").alias("masked"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("total_tokens"),
            F.sum("masked").cast("bigint").alias("masked_tokens"),
            F.sum("n_spans").cast("bigint").alias("sentinels"),
            F.sum(F.col("n") - F.col("masked") + F.col("n_spans"))
            .cast("bigint")
            .alias("input_tokens"),
            F.sum(F.col("masked") + F.col("n_spans"))
            .cast("bigint")
            .alias("target_tokens"),
            F.round(
                F.sum("masked").cast("double") / F.sum("n"), 6
            ).alias("corruption_rate"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# FIM (fill-in-the-middle) training transform — deterministic span split,
# PSM/SPM formats, exact reconstruction accounting
# --------------------------------------------------------------------------
@register(
    "fim_transform_stats",
    oracle="""
    WITH d AS (
      SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                  AS BIGINT) AS h,
             COALESCE(text, '') AS text,
             len(COALESCE(text, '')) AS L
      FROM documents
    ),
    splits AS (
      SELECT h, text, L,
             1 + (h % (L - 2)) AS s1
      FROM d WHERE L >= 4
    ),
    splits2 AS (
      SELECT *,
             s1 + 1 + (CAST(FLOOR(h / 4096) AS BIGINT) % (L - s1)) AS s2
      FROM splits
    ),
    parts AS (
      SELECT CASE WHEN h % 2 = 0 THEN 'PSM' ELSE 'SPM' END AS mode,
             substr(text, 1, CAST(s1 AS INTEGER)) AS prefix,
             substr(text, CAST(s1 + 1 AS INTEGER),
                    CAST(s2 - s1 AS INTEGER)) AS middle,
             substr(text, CAST(s2 + 1 AS INTEGER)) AS suffix,
             text
      FROM splits2
    ),
    formatted AS (
      SELECT mode, prefix, middle, suffix,
             CASE WHEN mode = 'PSM'
                  THEN '<PRE>' || prefix || '<SUF>' || suffix
                       || '<MID>' || middle
                  ELSE '<SUF>' || suffix || '<PRE>' || prefix
                       || '<MID>' || middle END AS fim_doc,
             (prefix || middle || suffix = text) AS exact
      FROM parts
      UNION ALL
      SELECT 'RAW', '', '', '', text, TRUE FROM d WHERE L < 4
    )
    SELECT mode,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(prefix)) AS BIGINT) AS sum_prefix_chars,
           CAST(SUM(len(middle)) AS BIGINT) AS sum_middle_chars,
           CAST(SUM(len(suffix)) AS BIGINT) AS sum_suffix_chars,
           CAST(SUM(CAST('0x' || substr(md5(fim_doc), 1, 12) AS BIGINT))
                AS BIGINT) AS fim_checksum,
           CAST(SUM(CASE WHEN exact THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact
    FROM formatted GROUP BY mode
    """,
)
def fim_transform_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILL-IN-THE-MIDDLE training transform (the FIM data
    augmentation for code/infilling models): each document is split
    at two DETERMINISTIC positions — pure functions of the 48-bit
    portable md5 hash of its id, so the transform is reproducible
    across runs AND engines with no RNG — into (prefix, middle,
    suffix), then reassembled in PSM (``<PRE>p<SUF>s<MID>m``) or SPM
    order by the hash's parity, the half/half mode mixture the FIM
    recipe prescribes. Documents shorter than 4 chars pass through
    untagged (mode RAW).

    The per-mode accounting is the training-pipeline contract:
    document counts, exact character budgets of each part (prefix +
    middle + suffix always reconstructs the source — ``n_exact`` ==
    ``n_docs`` row-for-row), and a 48-bit content CHECKSUM over the
    fully formatted FIM strings — DuckDB recomputes the same
    transform from scratch, so one character out of place anywhere
    in either engine flips the hash.

    Scale: one narrow projection, no shuffle until the 3-key
    aggregate — the transform itself is whole-stage-codegen string
    algebra (substr/concat/md5), exactly what runs ahead of the
    tokenizer at 100 TB. No UDFs anywhere.

    Reference analogue: none — the reference has no training-data
    surface; this extends the engine's corpus-transform family
    (span corruption, packing, chunking)."""
    from olap_project_spark.functions.text import portable_hash48

    d = load(spark, sf_dir, "documents").select(
        portable_hash48(F.col("doc_id").cast("string")).alias("h"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast(
            "bigint"
        ).alias("L"),
    )
    fim = (
        d.filter("L >= 4")
        .withColumn("s1", F.expr("1 + (h % (L - 2))"))
        .withColumn(
            "s2",
            F.expr(
                "s1 + 1 + (CAST(FLOOR(h / 4096) AS BIGINT) % (L - s1))"
            ),
        )
        .withColumn(
            "mode",
            F.expr("CASE WHEN h % 2 = 0 THEN 'PSM' ELSE 'SPM' END"),
        )
        .withColumn("prefix", F.expr("substr(text, 1, CAST(s1 AS INT))"))
        .withColumn(
            "middle",
            F.expr(
                "substr(text, CAST(s1 + 1 AS INT), CAST(s2 - s1 AS INT))"
            ),
        )
        .withColumn("suffix", F.expr("substr(text, CAST(s2 + 1 AS INT))"))
        .withColumn(
            "fim_doc",
            F.expr(
                "CASE WHEN mode = 'PSM' THEN concat('<PRE>', prefix, "
                "'<SUF>', suffix, '<MID>', middle) ELSE "
                "concat('<SUF>', suffix, '<PRE>', prefix, '<MID>', "
                "middle) END"
            ),
        )
        .withColumn(
            "exact", F.expr("concat(prefix, middle, suffix) = text")
        )
        .select("mode", "prefix", "middle", "suffix", "fim_doc", "exact")
    )
    raw = d.filter("L < 4").select(
        F.lit("RAW").alias("mode"),
        F.lit("").alias("prefix"),
        F.lit("").alias("middle"),
        F.lit("").alias("suffix"),
        F.col("text").alias("fim_doc"),
        F.lit(True).alias("exact"),
    )
    return (
        fim.unionByName(raw)
        .groupBy("mode")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.length("prefix")).cast("bigint").alias(
                "sum_prefix_chars"
            ),
            F.sum(F.length("middle")).cast("bigint").alias(
                "sum_middle_chars"
            ),
            F.sum(F.length("suffix")).cast("bigint").alias(
                "sum_suffix_chars"
            ),
            F.sum(portable_hash48(F.col("fim_doc")))
            .cast("bigint")
            .alias("fim_checksum"),
            F.sum(F.when(F.col("exact"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact"),
        )
    )


# --------------------------------------------------------------------------
# SFT chat-template formatting — deterministic prompt/response split,
# loss-mask (trainable-span) accounting, checksum-pinned rendering
# --------------------------------------------------------------------------
@register(
    "sft_format_stats",
    oracle="""
    WITH d AS (
      SELECT source,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                  AS BIGINT) AS h,
             COALESCE(text, '') AS text,
             len(COALESCE(text, '')) AS L
      FROM documents
    ),
    ex AS (
      SELECT source, h, text, L,
             1 + (h % (L - 2)) AS s
      FROM d WHERE L >= 10
    ),
    parts AS (
      SELECT source,
             substr(text, 1, CAST(s AS INTEGER)) AS prompt,
             substr(text, CAST(s + 1 AS INTEGER)) AS response
      FROM ex
    ),
    rendered AS (
      SELECT source, prompt, response,
             '<|system|>You are a helpful assistant.<|user|>'
               || prompt || '<|assistant|>' || response || '<|end|>'
               AS example
      FROM parts
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_examples,
           CAST(SUM(len(prompt)) AS BIGINT) AS sum_prompt_chars,
           CAST(SUM(len(response) + len('<|end|>')) AS BIGINT)
             AS sum_trainable_chars,
           CAST(SUM(len(example)) AS BIGINT) AS sum_rendered_chars,
           CAST(SUM(CAST('0x' || substr(md5(example), 1, 12) AS BIGINT))
                AS BIGINT) AS template_checksum
    FROM rendered GROUP BY source
    """,
)
def sft_format_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT CHAT-TEMPLATE formatting — the supervised-fine-tuning data
    prep stage: each document becomes a (prompt, response) example at
    a DETERMINISTIC split point (a pure function of the portable
    48-bit doc hash — reproducible across runs and engines, no RNG),
    rendered through a chat template (``<|system|>…<|user|>prompt
    <|assistant|>response<|end|>``), with LOSS-MASK accounting: the
    trainable span is exactly the assistant response plus the end
    token — the per-source ``sum_trainable_chars`` /
    ``sum_rendered_chars`` ratio is the masked-token budget every SFT
    run plans around (too low and compute is wasted re-reading
    prompts; the accounting makes it a measured quantity, not a
    guess). Documents under 10 chars are skipped (no meaningful
    split).

    ``template_checksum`` is a 48-bit content hash over the FULLY
    rendered examples — DuckDB re-renders the template from scratch,
    so one character out of place in either engine (a lost delimiter,
    an off-by-one split) flips the hash.

    Scale: one narrow projection of whole-stage-codegen string
    algebra (md5/substr/concat), no shuffle until the per-source
    aggregate — the same plan ahead of the tokenizer at 100 TB. No
    UDFs.

    Reference analogue: none — extends the corpus-transform family
    (FIM, span corruption, packing, chunking)."""
    from olap_project_spark.functions.text import portable_hash48

    d = load(spark, sf_dir, "documents").select(
        "source",
        portable_hash48(F.col("doc_id").cast("string")).alias("h"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast(
            "bigint"
        ).alias("L"),
    )
    rendered = (
        d.filter("L >= 10")
        .withColumn("s", F.expr("1 + (h % (L - 2))"))
        .withColumn("prompt", F.expr("substr(text, 1, CAST(s AS INT))"))
        .withColumn("response", F.expr("substr(text, CAST(s + 1 AS INT))"))
        .withColumn(
            "example",
            F.expr(
                "concat('<|system|>You are a helpful assistant."
                "<|user|>', prompt, '<|assistant|>', response, "
                "'<|end|>')"
            ),
        )
    )
    return rendered.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_examples"),
        F.sum(F.length("prompt")).cast("bigint").alias(
            "sum_prompt_chars"
        ),
        F.sum(F.length("response") + F.lit(len("<|end|>")))
        .cast("bigint")
        .alias("sum_trainable_chars"),
        F.sum(F.length("example")).cast("bigint").alias(
            "sum_rendered_chars"
        ),
        F.sum(portable_hash48(F.col("example")))
        .cast("bigint")
        .alias("template_checksum"),
    )
