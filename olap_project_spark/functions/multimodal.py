"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
(never row-at-a-time Python).

The decode itself is STUBBED — this container has no image/audio codecs
— but everything Spark-side is real and tested: the binary column,
the output schema contract, the Arrow batch shape, and the partitioning
(decode is a narrow map — no shuffle; at 100 TB you repartition by
size beforehand so each Arrow batch holds ~a few hundred MB of media).

Swap ``_decode_stub`` for a real decoder (PIL/ffmpeg) by implementing
``decode_bytes``; the deterministic fake keeps the pipeline testable
and oracle-checkable (its outputs are pure arithmetic on byte length).
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

    STUB: no codec libraries in this environment. The deterministic
    fake below derives plausible metadata from the byte length so the
    full pipeline (binary column → Arrow batch → decoded metadata) runs
    and is verifiable end-to-end. A real implementation would be:

        raise NotImplementedError("install PIL/av and decode here")
    """
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
