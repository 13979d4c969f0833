"""Python UDTF extension point (§2.10 completeness: UDF → native
expressions, UDAF → Arrow grouped-agg (functions/udafs.py), UDTF →
here). A UDTF is the escape hatch for one-row → many-rows transforms
whose logic genuinely can't be expressed with explode/sequence/slice —
e.g. a real BPE tokenizer or a format-aware document splitter.

The demo UDTF re-implements the token chunker so tests can pin its
output against the NATIVE chunking path (queries/text.py doc_chunks):
the escape hatch must agree with the fast path on the common subset.

Scale: Python UDTFs are row-at-a-time (pickled rows both ways) — 10-
100× slower than the native formulation, same as any Python UDF. Use
only when the logic needs arbitrary Python (stateful parsers, external
libraries); the engine's hot paths never call one (enforced by
tests/test_plans.py no-Python assertions).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: int, n_tokens: int, chunk_text: string")
class ChunkTokens:
    """Yield (chunk_idx, n_tokens, chunk_text) windows of ``size``
    whitespace tokens with ``stride`` between starts — the UDTF twin of
    the native doc_chunks query (whose slice/sequence formulation is
    the production path)."""

    def eval(self, text: str, size: int = 50, stride: int = 40):
        if text is None:
            return
        toks = text.strip().lower().split()
        if not toks:
            toks = [""]  # match F.split semantics on empty input
        for idx, start in enumerate(range(0, len(toks), stride)):
            window = toks[start : start + size]
            yield idx, len(window), " ".join(window)


def register_udtfs(spark) -> None:
    """Register the UDTF surface for SQL use:
    ``SELECT * FROM chunk_tokens('some text', 50, 40)`` /
    ``SELECT * FROM parse_delimited('1|2', 'a|b', '|')``."""
    spark.udtf.register("chunk_tokens", ChunkTokens)
    spark.udtf.register("parse_delimited", _parse_delimited_udtf())


def _parse_delimited_udtf():
    """Build the polymorphic ParseDelimited UDTF (deferred so importing
    this module never fails on an older API surface)."""
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import StringType, StructType

    @udtf
    class ParseDelimited:
        """POLYMORPHIC UDTF (Spark 4 ``analyze`` API): output schema is
        computed at QUERY-ANALYSIS time from the literal header
        argument — ``parse_delimited(line, 'user|card|amount', '|')``
        yields columns (user, card, amount). This is the API for
        format-aware splitters whose shape isn't known until the call
        site; the engine's fixed-shape splitters (from_csv, the chunker
        above) stay on static schemas.

        Values beyond the header are dropped, missing ones null-fill —
        the lenient posture of the reference's CSV handling
        (SURVEY.md §1.2)."""

        @staticmethod
        def analyze(
            line: AnalyzeArgument,
            header: AnalyzeArgument,
            sep: AnalyzeArgument,
        ) -> AnalyzeResult:
            if header.value is None:
                raise ValueError("parse_delimited: header must be a literal")
            sep_v = sep.value if sep.value is not None else "|"
            schema = StructType()
            for name in str(header.value).split(sep_v):
                schema = schema.add(name.strip(), StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, line: str, header: str, sep: str = "|"):
            n = len(header.split(sep))
            if line is None:
                yield tuple([None] * n)
                return
            parts = line.split(sep)
            yield tuple((parts[i] if i < len(parts) else None) for i in range(n))

    return ParseDelimited
