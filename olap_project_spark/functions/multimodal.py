"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
(never row-at-a-time Python).

The decode is REAL for uncompressed BMP and WAV payloads (pure-stdlib
struct parsing, functions/media_codecs.py) and a deterministic fake
for compressed formats — this container has no JPEG/MP3/H.264 codecs.
Everything Spark-side is real and tested either way: the binary
column, the output schema contract, the Arrow batch shape, and the
partitioning (decode is a narrow map — no shuffle; at 100 TB you
repartition by size beforehand so each Arrow batch holds ~a few
hundred MB of media). Swap the fallback for PIL/ffmpeg to extend the
real path to compressed formats.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def decode_bytes(data: bytes) -> tuple[int, int, int]:
    """Decode media bytes → (width, height, n_frames).

    REAL for the two uncompressed containers this environment can
    parse without codec libraries (functions/media_codecs.py):
    - BMP (24-bpp BI_RGB) → (width, height, 1);
    - WAV (16-bit mono PCM) → (sample_rate, n_samples, 1) — the
      audio analog of spatial dims, documented as such.
    Compressed formats (no JPEG/MP3/H.264 codecs here) fall back to
    the deterministic fake: metadata derived from the byte length so
    the pipeline (binary column → Arrow batch → decoded metadata)
    still runs and is verifiable end-to-end."""
    from olap_project_spark.functions.media_codecs import (
        parse_bmp,
        parse_wav,
        sniff_media,
    )

    kind = sniff_media(data)
    if kind == "bmp":
        width, height, _bpp, _pix_sum = parse_bmp(data)
        return width, height, 1
    if kind == "wav":
        rate, n_samples, _ssum, _sumsq = parse_wav(data)
        return rate, n_samples, 1
    n = len(data)
    return 64 + n % 577, 64 + (n * 31) % 353, 1 + n % 7


def with_media_column(docs: DataFrame) -> DataFrame:
    """Attach an opaque media payload to each document row. Stand-in for
    a real binary column (e.g. image bytes read from object storage):
    the UTF-8 encoding of the text, typed ``binary``."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("media_bytes"),
        F.lit("image/fake").alias("media_type"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_bytes", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_offset_bytes", LongType()),
    ]
)

FEATURE_DIM = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature_norm", LongType()),
    ]
)


def resize_media(media: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize stub: real impl would decode → PIL/opencv resize →
    re-encode. The fake computes the post-resize byte size
    deterministically from the target box (3 bytes/pixel) so the
    pipeline shape (binary in → binary-metadata out, narrow map) is
    real and testable."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [target_w] * n,
                    "height": [target_h] * n,
                    "resized_bytes": [target_w * target_h * 3] * n,
                }
            )

    return media.mapInPandas(resize, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 100) -> DataFrame:
    """Frame-sampling stub (video → every Nth frame): emits one output
    row per sampled 'frame', i.e. a one-to-MANY mapInPandas — the shape
    that matters for video pipelines (output cardinality ≫ input).
    Deterministic fake: a frame boundary every ``every_n_bytes``."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf["doc_id"], pdf["media_bytes"]):
                n_frames = max(1, len(data) // every_n_bytes)
                rows.extend(
                    (doc_id, i, i * every_n_bytes) for i in range(n_frames)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_index", "frame_offset_bytes"]
            )

    return media.mapInPandas(sample, schema=FRAME_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Feature-extraction stub (media → embedding): real impl runs a
    vision/audio model over Arrow batches. The fake folds the payload
    bytes into a deterministic scalar 'feature norm' so downstream
    similarity plumbing can be exercised end-to-end."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            norms = [
                sum(data[:: max(1, len(data) // FEATURE_DIM)]) % 1_000_000_007
                for data in pdf["media_bytes"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature_norm": norms})

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def decode_media(media: DataFrame) -> DataFrame:
    """mapInPandas decode: each Arrow batch arrives as a pandas
    DataFrame with the raw bytes; the stub extracts metadata. Narrow
    transformation — preserves partitioning, no shuffle."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sizes = pdf["media_bytes"].map(len)
            decoded = pdf["media_bytes"].map(decode_bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": sizes.astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


# --------------------------------------------------------------------------
# Perceptual (average) hash for media near-dup — exact-integer contract
# --------------------------------------------------------------------------
AHASH_CELLS = 64
AHASH_BANDS = 4
AHASH_BAND_BITS = AHASH_CELLS // AHASH_BANDS  # 16 bits per band key


def ahash_band_keys(data: bytes) -> tuple[int, ...]:
    """Average-hash (aHash) of a media byte stream, returned as
    {AHASH_BANDS} integer band keys of {AHASH_BAND_BITS} bits each —
    the LSH-bandable form of the 64-bit perceptual fingerprint.

    EXACT-INTEGER contract (so a SQL engine reproduces it bit-for-bit
    on ASCII payloads, where byte value == code point):
      cell of 0-based byte p (n bytes total):
          c = (64·(p+1) + n − 1) // n − 1        (the inverse of the
          lo_c = c·n // 64 partition — verified exhaustively in tests)
      bit_c = 1  iff  cell_sum_c · n > total_sum · cell_len_c
          (cell mean > global mean, cross-multiplied — no division)
      band b (0..3) packs bits 16b..16b+15 big-endian.

    A real image pipeline would decode → grayscale → 8×8 downsample →
    mean threshold; this operates on the raw byte stream (the decode
    is stubbed, functions/multimodal.py:41-52) with identical
    plumbing, batch shape, and banding."""
    import numpy as np

    v = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    n = int(v.size)
    if n == 0:
        return tuple(0 for _ in range(AHASH_BANDS))
    p = np.arange(n, dtype=np.int64)
    c = (AHASH_CELLS * (p + 1) + n - 1) // n - 1
    # bincount with weights returns float; sum exactly via add.at
    cell_sum = np.zeros(AHASH_CELLS, dtype=np.int64)
    np.add.at(cell_sum, c, v)
    cell_len = np.bincount(c, minlength=AHASH_CELLS).astype(np.int64)
    total = int(v.sum())
    bits = (cell_sum * n > total * cell_len).astype(np.int64)
    keys = []
    for b in range(AHASH_BANDS):
        k = 0
        for j in range(AHASH_BAND_BITS):
            k = (k << 1) | int(bits[b * AHASH_BAND_BITS + j])
        keys.append(k)
    return tuple(keys)
