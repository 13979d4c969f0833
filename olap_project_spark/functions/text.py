"""Text-analysis building blocks for the training-data pipeline, as
native Spark expressions (SURVEY.md "beyond the reference" surface).

Portability contract: every function here has an exact DuckDB-SQL
equivalent (documented per function) so the dedup/text queries can be
oracle-checked. That rules out engine-specific hashes (xxhash64,
murmur) — the portable 48-bit hash routes through md5, which both
engines implement identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: (a*h+b) mod P stays within int64 for
# a,b,h < 2^31 — safe in both engines' BIGINT arithmetic.
MERSENNE31 = 2_147_483_647


def normalize_text(col: Column) -> Column:
    """Lowercase + whitespace-collapse + trim.
    DuckDB: ``lower(trim(regexp_replace(x, '\\s+', ' ', 'g')))``."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def tokens(col: Column) -> Column:
    """Whitespace tokenization of normalized text → array<string>.
    DuckDB: ``string_split_regex(lower(trim(x)), '\\s+')``.
    Empty input would yield [''] on both engines — callers filter."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def word_shingles(tok: Column, n: int = 3, distinct: bool = False) -> Column:
    """N-gram word shingles (space-joined) from a token array.
    Guarded for size < n (Spark's ``sequence(1, 0)`` would *descend*).
    DuckDB: ``ts[i] || ' ' || ts[i+1] || ... FROM UNNEST(range(1, len-n+2))``.

    ``distinct=False`` by default: higher-order functions run
    interpreted (no codegen), so per-array ``array_distinct`` is an
    O(n²) interpreted loop — dedup at the DataFrame level instead
    (hash aggregate, codegen'd) when you need set semantics."""
    expr = F.when(
        F.size(tok) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tok) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tok, i + k) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(expr) if distinct else expr


def portable_hash48(col: Column) -> Column:
    """48-bit integer hash both engines compute identically:
    first 12 hex chars of md5 → BIGINT.
    DuckDB: ``CAST('0x' || substr(md5(x), 1, 12) AS BIGINT)``.
    Spark: ``conv(substr(md5(x), 1, 12), 16, 10)`` cast to bigint."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


def minhash_param(k: int) -> tuple[int, int]:
    """Deterministic (a, b) coefficients for permutation ``k`` of the
    universal hash family ((a·h + b) mod 2^31-1). Derived from a fixed
    LCG so Spark, DuckDB SQL generation, and tests agree exactly."""
    # Park-Miller sequence seeded per k; plain Python ints (exact).
    a = (16807 * (k * 2 + 1)) % MERSENNE31
    b = (48271 * (k * 2 + 2)) % MERSENNE31
    return (a or 1), b


def token_count(col: Column) -> Column:
    """Token count of raw text; 0 for blank, null for null (explicit
    guard — non-ANSI Spark's ``size(null)`` is -1, not null).
    DuckDB: ``CASE WHEN trim(x)='' THEN 0 ELSE len(string_split_regex(trim(x),'\\s+')) END``."""
    return (
        F.when(col.isNull(), F.lit(None))
        .when(F.trim(col) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(col), r"\s+")))
        .cast("bigint")
    )


# Stopword inventories for the n-gram language-ID heuristic. Small,
# high-frequency function words; the heuristic is argmax of hit counts
# (deterministic tie order: en > de > es > fr > zh).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "por", "con"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "des", "est", "dans"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "人", "这"],
}


def stopword_hits(col: Column, lang: str) -> Column:
    """Number of occurrences of ``lang``'s stopwords in the text.
    DuckDB: ``len(regexp_extract_all(lower(x), '(^| )(w1|w2|...)( |$)'))``
    — note the pattern must match on both engines; we use explicit
    space/anchor alternation instead of \\b (identical RE2/Java
    semantics), counting non-overlapping hits."""
    pat = "(^| )(" + "|".join(LANG_STOPWORDS[lang]) + ")( |$)"
    return F.size(F.regexp_extract_all(normalize_text(col), F.lit(pat), F.lit(0))).cast(
        "bigint"
    )


def sql_stopword_pattern(lang: str) -> str:
    """The DuckDB-side regex for ``stopword_hits``."""
    return "(^| )(" + "|".join(LANG_STOPWORDS[lang]) + ")( |$)"


def punct_count(col: Column) -> Column:
    """Count of punctuation characters.
    DuckDB: ``length(x) - length(regexp_replace(x, pat, '', 'g'))``."""
    return (
        F.length(col) - F.length(F.regexp_replace(col, r"[.,;:!?'\"()\-]", ""))
    ).cast("bigint")


# --------------------------------------------------------------------------
# PII redaction (training-data scrubbing)
# --------------------------------------------------------------------------
# One pattern string per PII class, shared verbatim with the DuckDB
# oracle SQL — both engines' regex dialects (Java util.regex / RE2)
# agree on this conservative subset (char classes, +/*/{m,}, no
# backrefs or lookaround).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}(-[0-9]{3,4})?"
CCN_PATTERN = r"[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}"


def redact_pii(col: Column) -> Column:
    """Replace emails, international-format phone numbers, and
    dash-grouped card numbers with typed placeholder tags — the
    scrub-before-training operator, JVM-native (three chained
    ``regexp_replace``; no Python in the hot path). Order matters:
    the card pattern must run before the phone pattern, which would
    otherwise eat a 4-4-4-4 digit group as a phone prefix.
    DuckDB: the same three ``regexp_replace(x, pat, tag, 'g')`` calls
    (DuckDB replaces first-match-only without the 'g' flag; Spark is
    always global)."""
    out = F.regexp_replace(col, CCN_PATTERN, "<CCN>")
    out = F.regexp_replace(out, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(out, PHONE_PATTERN, "<PHONE>")
