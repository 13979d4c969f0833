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
    ``SELECT * FROM chunk_tokens('some text', 50, 40)``."""
    spark.udtf.register("chunk_tokens", ChunkTokens)
