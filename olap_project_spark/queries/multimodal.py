"""Multimodal pipeline query: binary media column → Arrow-batched
mapInPandas decode → metadata aggregate. The decode stub is pure
arithmetic on byte length (functions.multimodal), which makes the whole
Pandas-UDF pipeline oracle-checkable in SQL — the point is to verify
the *plumbing* (binary column, Arrow batches, schema contract), not a
codec."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_project_spark.functions.multimodal import decode_media, with_media_column
from olap_project_spark.functions.localframe import local_frame
from olap_project_spark.queries import load, register


@register(
    "multimodal_decode_stats",
    oracle="""
    WITH decoded AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             64 + octet_length(encode(text)) % 577 AS width,
             64 + (octet_length(encode(text)) * 31) % 353 AS height,
             1 + octet_length(encode(text)) % 7 AS n_frames
      FROM documents
    )
    SELECT CAST(n_frames AS INTEGER) AS n_frames,
           COUNT(*) AS n_docs,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(MAX(width) AS INTEGER) AS max_width,
           CAST(MAX(height) AS INTEGER) AS max_height
    FROM decoded
    GROUP BY 1
    """,
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media metadata profile via the mapInPandas decode pipeline:
    binary payload → Arrow batch → (width, height, n_frames) → aggregate.

    Scale: decode is a narrow map over Arrow batches (the only Python
    in the hot path, amortized per-batch); the aggregate shuffles 7
    groups. At 100 TB, repartition by target batch size first so
    decode memory is bounded."""
    docs = load(spark, sf_dir, "documents")
    decoded = decode_media(with_media_column(docs))
    return decoded.groupBy(F.col("n_frames").cast("int").alias("n_frames")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.max("width").cast("int").alias("max_width"),
        F.max("height").cast("int").alias("max_height"),
    )


@register(
    "frame_sample_stats",
    oracle="""
    SELECT doc_id,
           CAST(greatest(octet_length(encode(text)) // 100, 1) AS BIGINT) AS n_frames,
           CAST((greatest(octet_length(encode(text)) // 100, 1) - 1) * 100 AS BIGINT)
             AS last_offset
    FROM documents
    """,
)
def frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: the one-to-MANY mapInPandas shape
    (each media payload explodes into one row per sampled frame), then
    re-aggregated per document. The stub samples a 'frame' every 100
    bytes; the oracle replays that arithmetic relationally.

    Scale: output cardinality ≫ input is the defining property of video
    pipelines — mapInPandas streams frames out per Arrow batch without
    materializing a per-doc frame array, and the aggregate shuffles
    (doc_id, count) only."""
    from olap_project_spark.functions.multimodal import sample_frames

    docs = load(spark, sf_dir, "documents")
    frames = sample_frames(with_media_column(docs), every_n_bytes=100)
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.max("frame_offset_bytes").cast("bigint").alias("last_offset"),
    )


# --------------------------------------------------------------------------
# Cross-modal join: text metadata ⋈ embedding index
# --------------------------------------------------------------------------
@register(
    "doc_embedding_join_stats",
    oracle="""
    WITH n AS (
      SELECT vec_id, label,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    )
    SELECT n.label,
           COUNT(*) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(d.n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
           ROUND(MIN(n.nrm), 6) AS min_norm,
           ROUND(MAX(n.nrm), 6) AS max_norm
    FROM documents d JOIN n ON n.vec_id = d.doc_id
    GROUP BY n.label
    """,
)
def doc_embedding_join_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal equi-join: the text corpus joined to its embedding
    index (doc_id = vec_id) with per-cluster-label profile — the
    canonical multimodal-pipeline step of reuniting a modality table
    with a derived feature/index table (same pattern for image ⋈
    caption, audio ⋈ transcript). Aggregates stay order-independent:
    integer sums, counts, and min/max of the (deterministic
    sequential-fold) vector norms — never a sum of doubles.

    Scale: both sides hash-partition on the id — at 100 TB bucket both
    tables by the id and the join is shuffle-free; the per-label
    aggregate is map-side combinable."""
    from olap_project_spark.queries.similarity import _emb, dot

    docs = load(spark, sf_dir, "documents")
    emb = _emb(spark, sf_dir)
    n = emb.select(
        "vec_id",
        "label",
        F.sqrt(dot(F.col("emb"), F.col("emb"))).alias("nrm"),
    )
    return (
        docs.join(n, docs.doc_id == n.vec_id)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.round(F.sum("n_chars").cast("double") / F.count("*"), 6).alias(
                "avg_chars"
            ),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
    )


# --------------------------------------------------------------------------
# Feature extraction + resize — the remaining mapInPandas legs, gate-checked
# --------------------------------------------------------------------------
@register(
    "media_feature_stats",
    oracle="""
    WITH m AS (SELECT doc_id, text, length(text) AS n FROM documents
               WHERE octet_length(encode(text)) = length(text)),
    feat AS (
      SELECT doc_id,
             CAST(SUM(ord(substr(text, CAST(i AS INTEGER), 1)))
                  % 1000000007 AS BIGINT) AS feature_norm
      FROM m, UNNEST(range(1, n + 1, greatest(n // 8, 1))) AS t(i)
      GROUP BY doc_id
    )
    SELECT doc_id, feature_norm,
           CAST(224 AS INTEGER) AS width,
           CAST(224 AS INTEGER) AS height,
           CAST(224 * 224 * 3 AS BIGINT) AS resized_bytes
    FROM feat
    """,
)
def media_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining two multimodal mapInPandas legs — feature
    extraction (media bytes → deterministic feature norm; the stand-in
    for an Arrow-batched vision/audio model) and resize (fixed 224×224
    target box) — joined per document and pinned by the gate. The
    oracle replays the stub's strided byte-sum relationally (the corpus
    is ASCII, so DuckDB's ``ord(substr(...))`` reads the same bytes the
    Python UDF sees), which verifies the exact Arrow payload handed to
    the UDF, not just row counts.

    Scale: both legs are narrow Arrow-batched maps over the same scan
    (no shuffle until the doc_id equi-join, which disappears if both
    are computed in ONE mapInPandas in production); a real model swap
    changes only the per-batch function body."""
    from olap_project_spark.functions.multimodal import (
        extract_features,
        resize_media,
        with_media_column,
    )

    # ASCII guard, mirrored in the oracle: the SQL replay reads bytes
    # via ord(substr(...)), which equals the UDF's byte view only when
    # char == byte. Non-ASCII docs (none in current corpora) are
    # excluded on BOTH sides rather than silently hash-diverging.
    docs = load(spark, sf_dir, "documents").filter(
        F.octet_length("text") == F.length("text")
    )
    media = with_media_column(docs)
    feat = extract_features(media)
    resized = resize_media(media).select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("resized_bytes").cast("bigint").alias("resized_bytes"),
    )
    return feat.join(resized, "doc_id").select(
        "doc_id", "feature_norm", "width", "height", "resized_bytes"
    )


# --------------------------------------------------------------------------
# Cross-modal cluster labeling: top terms per IVF cell
# --------------------------------------------------------------------------
CLUSTER_TOP_TERMS = 3
_STOP_MIN_LEN = 4  # crude stopword gate: terms shorter than this skipped


def _cluster_terms_oracle() -> str:
    from olap_project_spark.queries.similarity import N_CENTROIDS

    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    cent AS (SELECT vec_id AS cid, emb AS cemb FROM e
             WHERE vec_id < {N_CENTROIDS}),
    scored AS (
      SELECT e.vec_id, cent.cid,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_dot_product(e.emb, cent.cemb)
                        / (sqrt(list_dot_product(e.emb, e.emb))
                           * sqrt(list_dot_product(cent.cemb, cent.cemb))) DESC,
                        cent.cid) AS rn
      FROM e, cent
    ),
    assign AS (SELECT vec_id, cid FROM scored WHERE rn = 1),
    tok AS (
      SELECT a.cid, t AS term
      FROM documents d
      JOIN assign a ON a.vec_id = d.doc_id,
      UNNEST(string_split_regex(lower(trim(d.text)), '\\s+')) AS u(t)
      WHERE len(t) >= {_STOP_MIN_LEN}
    ),
    counts AS (
      SELECT cid, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    )
    SELECT cid, term, tf, CAST(rn AS INTEGER) AS term_rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY cid ORDER BY tf DESC, term) AS rn
          FROM counts)
    WHERE rn <= {CLUSTER_TOP_TERMS}
    """


@register("cluster_top_terms", oracle=_cluster_terms_oracle)
def cluster_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal cluster LABELING: each IVF cell of the embedding
    index named by the top-{CLUSTER_TOP_TERMS} terms of the documents
    assigned to it (doc_id = vec_id) — how a pipeline turns an opaque
    vector clustering into something a human can audit ("cell 7 is
    the legal boilerplate cluster"). Terms shorter than
    {_STOP_MIN_LEN} chars are skipped as a crude function-word gate.

    Scale: the assignment is the memoized broadcast-centroid pass
    shared with every IVF consumer; the text side is one explode →
    (cell × term) hash-aggregate; the per-cell top-k prunes with
    WindowGroupLimit before anything global. Cross-modal traffic is
    one equi-join on the id — bucket both tables by it at 100 TB and
    the join is shuffle-free."""
    from olap_project_spark.functions.text import tokens
    from olap_project_spark.queries.similarity import _ivf_ranked
    from pyspark.sql.window import Window

    assign = (
        _ivf_ranked(spark, sf_dir)
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.join(assign, docs.doc_id == assign.vec_id)
        .select("cid", F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.length("term") >= _STOP_MIN_LEN)
    )
    counts = tok.groupBy("cid", "term").agg(F.count("*").alias("tf"))
    w = Window.partitionBy("cid").orderBy(F.desc("tf"), F.asc("term"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= CLUSTER_TOP_TERMS)
        .select("cid", "term", "tf", F.col("rn").cast("int").alias("term_rank"))
    )


# --------------------------------------------------------------------------
# Perceptual-hash (aHash) media near-dup — multimodal dedup leg
# --------------------------------------------------------------------------
AHASH_HAM_T = 6  # bits of 64; candidates at or under are duplicates


@register(
    "media_phash_dup_pairs",
    oracle=f"""
    WITH d AS (SELECT doc_id, text AS t FROM documents
               WHERE length(text) > 0
                 AND strlen(text) = length(text)),
    codes AS (
      SELECT doc_id, i - 1 AS p, unicode(substr(t, i, 1)) AS v,
             length(t) AS n
      FROM d, UNNEST(range(1, length(t) + 1)) AS r(i)
    ),
    cells AS (
      SELECT doc_id, (64 * p + 64 + n - 1) // n - 1 AS c,
             CAST(SUM(v) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS l,
             MAX(n) AS n
      FROM codes GROUP BY 1, 2
    ),
    tots AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS total
             FROM cells GROUP BY 1),
    bits AS (
      SELECT cells.doc_id, c,
             CASE WHEN s * n > total * l THEN 1 ELSE 0 END AS bit
      FROM cells JOIN tots USING (doc_id)
    ),
    bands AS (
      SELECT doc_id, CAST(c // 16 AS INTEGER) AS band,
             CAST(SUM(bit * (1 << CAST(15 - c % 16 AS INTEGER)))
                  AS BIGINT) AS key
      FROM bits GROUP BY 1, 2
    ),
    keys AS (
      SELECT doc_id,
             MAX(CASE WHEN band = 0 THEN key ELSE 0 END) AS k0,
             MAX(CASE WHEN band = 1 THEN key ELSE 0 END) AS k1,
             MAX(CASE WHEN band = 2 THEN key ELSE 0 END) AS k2,
             MAX(CASE WHEN band = 3 THEN key ELSE 0 END) AS k3
      FROM bands GROUP BY doc_id
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(ka.k0, kb.k0)) + bit_count(xor(ka.k1, kb.k1))
                + bit_count(xor(ka.k2, kb.k2))
                + bit_count(xor(ka.k3, kb.k3)) AS BIGINT) AS hamming,
           CAST(CASE WHEN bit_count(xor(ka.k0, kb.k0))
                          + bit_count(xor(ka.k1, kb.k1))
                          + bit_count(xor(ka.k2, kb.k2))
                          + bit_count(xor(ka.k3, kb.k3)) <= {AHASH_HAM_T}
                     THEN 1 ELSE 0 END AS INTEGER) AS is_dup
    FROM cand
    JOIN keys ka ON ka.doc_id = doc_a
    JOIN keys kb ON kb.doc_id = doc_b
    ORDER BY doc_a, doc_b
    """,
)
def media_phash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIMODAL near-dup detection: a perceptual average-hash
    (aHash) of each media payload computed in the Arrow-batched
    mapInPandas path, banded 4×16 bits for LSH candidate generation,
    candidates verified by Hamming distance — the image-dedup leg of
    the dedup family (text: minhash_dup_pairs; embeddings:
    embedding_near_dup_pairs). Reports every banded candidate pair
    with its Hamming distance and the ≤{AHASH_HAM_T}-bit duplicate
    verdict, i.e. the tuning curve AND the match set in one artifact.

    The hash is an exact-integer contract (cell mean vs global mean
    by cross-multiplication, no FP — functions/multimodal.py
    ahash_band_keys), so the DuckDB oracle reproduces the Python
    fingerprint bit-for-bit from character codes. The byte == code
    point identity only holds for ASCII, so the hash path ENFORCES
    the contract — both engines filter to payloads whose UTF-8 byte
    length equals their character length (true iff pure ASCII) —
    rather than assuming the corpus stays ASCII. A real deployment swaps the byte stream for
    decoded 8×8 grayscale intensities (where the contract is moot);
    banding, verify join, and batch shape are unchanged.

    Scale: hashing is a narrow Arrow map (no shuffle); candidates
    come from 4 band-key equi-joins (each band key bounds its
    posting list like an LSH band — never all-pairs); the verify is
    a 4-int broadcast-sized projection per doc joined twice. At
    100 TB this is the standard pHash dedup plan over an image lake."""
    import pandas as pd

    from collections.abc import Iterator

    from pyspark.sql.types import LongType, StructField, StructType

    from olap_project_spark.functions.multimodal import (
        AHASH_BANDS,
        ahash_band_keys,
    )

    schema = StructType(
        [StructField("doc_id", LongType())]
        + [StructField(f"k{b}", LongType()) for b in range(AHASH_BANDS)]
    )

    def hash_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = [ahash_band_keys(b) for b in pdf["media_bytes"]]
            out = {"doc_id": pdf["doc_id"]}
            for b in range(AHASH_BANDS):
                out[f"k{b}"] = [k[b] for k in keys]
            yield pd.DataFrame(out)

    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        # byte == code point parity contract: ASCII only (see docstring).
        # UTF-8 byte count equals char count iff the string is pure
        # ASCII — two native length calls, no per-char regex.
        .filter(F.octet_length("text") == F.length("text"))
    )
    media = with_media_column(docs)
    keys = media.mapInPandas(hash_batches, schema=schema)
    bands = keys.unpivot(
        "doc_id",
        [f"k{b}" for b in range(AHASH_BANDS)],
        "band",
        "key",
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    ka = keys.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"k{b}").alias(f"ka{b}") for b in range(AHASH_BANDS)],
    )
    kb = keys.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"k{b}").alias(f"kb{b}") for b in range(AHASH_BANDS)],
    )
    hamming = sum(
        F.bit_count(F.col(f"ka{b}").bitwiseXOR(F.col(f"kb{b}")))
        for b in range(AHASH_BANDS)
    )
    return (
        cand.join(ka, "doc_a")
        .join(kb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            hamming.cast("bigint").alias("hamming"),
            (hamming <= AHASH_HAM_T).cast("int").alias("is_dup"),
        )
        .orderBy("doc_a", "doc_b")
    )


# media_codec_decode_stats: each payload is a pure function of
# (kind, i) — laws in functions/media_codecs.py — so the DuckDB oracle
# re-derives every pixel/sample from the law while Spark goes the long
# way around: generate → ENCODE to real container bytes → DECODE by
# struct-parsing → aggregate. Any framing bug (row padding, bottom-up
# order, chunk alignment, endianness) breaks the match.
N_MEDIA = 24


def _media_ids(spark: SparkSession, kind: str) -> DataFrame:
    """Id frame for the codec legs, partitioned to match the work.

    ``spark.range(N_MEDIA)`` defaults to ``defaultParallelism``
    partitions — at 24 items on local[32] that is 32 mostly-empty
    tasks, and every task (empty or not) pays the Python-worker
    round-trip for EACH chained mapInPandas eval downstream (two legs
    → 2× tasks × worker setup; measured: 64 tasks, ~12 s of pure
    boundary overhead for 48 tiny payloads). Sizing partitions from
    the item count (≥8 items per task, capped at the core count so a
    large corpus still fills the cluster) keeps the boundary crossings
    proportional to the data."""
    n_parts = max(
        1, min(spark.sparkContext.defaultParallelism, N_MEDIA // 8)
    )
    return spark.range(N_MEDIA, numPartitions=n_parts).select(
        F.col("id").alias("item_id"), F.lit(kind).alias("kind")
    )


@register(
    "media_codec_decode_stats",
    oracle=f"""
    WITH bmp_dims AS (
      SELECT i, 8 + i % 5 AS w, 6 + i % 4 AS h
      FROM (SELECT UNNEST(range(0, {N_MEDIA})) AS i)
    ),
    bmp_stats AS (
      SELECT d.i, d.w, d.h,
             SUM((7*d.i + 3*xs.x + 5*ys.y) % 256) AS pix_sum
      FROM bmp_dims d,
           UNNEST(range(0, d.w)) xs(x),
           UNNEST(range(0, d.h)) ys(y)
      GROUP BY d.i, d.w, d.h
    ),
    wav_dims AS (
      SELECT i, 8000 + 100 * (i % 3) AS rate, 400 + 40 * (i % 5) AS n
      FROM (SELECT UNNEST(range(0, {N_MEDIA})) AS i)
    ),
    wav_stats AS (
      SELECT d.i, d.rate, d.n,
             SUM(((31*d.i + 17*ts.t) % 201 - 100)
                 * ((31*d.i + 17*ts.t) % 201 - 100)) AS sumsq
      FROM wav_dims d, UNNEST(range(0, d.n)) ts(t)
      GROUP BY d.i, d.rate, d.n
    )
    SELECT 'bmp' AS kind,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(w * h) AS BIGINT) AS total_units,
           CAST(SUM(pix_sum) AS BIGINT) AS total_checksum,
           CAST(SUM(1000 * w + h) AS BIGINT) AS total_meta
    FROM bmp_stats
    UNION ALL
    SELECT 'wav',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n) AS BIGINT),
           CAST(SUM(sumsq) AS BIGINT),
           CAST(SUM(n * 1000 // rate) AS BIGINT)
    FROM wav_stats
    """,
)
def media_codec_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL media decode leg through the gate: deterministic
    grayscale BMPs (24-bpp BI_RGB — every 4-byte row-padding case) and
    16-bit mono PCM WAVs are ENCODED to genuine container bytes and
    DECODED back by pure-stdlib struct parsing
    (functions/media_codecs.py), both inside Arrow-batched mapInPandas
    legs; the aggregate reports per kind: item count, total units
    (pixels | samples), an exact content checksum (gray pixel sum |
    sample sum-of-squares), and a metadata sum (packed dims |
    duration_ms). The DuckDB oracle re-derives every pixel and sample
    from the generation law — so a framing bug anywhere in the
    encoder or parser (padding, bottom-up rows, chunk alignment,
    endianness) breaks the hash, making this content-checked, not
    shape-checked.

    Scale: both legs are narrow maps over binary columns (no shuffle
    until the final 2-group aggregate); parsing is one
    numpy-frombuffer + slice per payload — the vectorized form a real
    100-TB decode stage needs. Replaces nothing: the compressed-format
    fake (functions/multimodal.py decode_bytes fallback) still covers
    codec-less containers."""
    from olap_project_spark.functions.media_codecs import (
        codec_demo_decode,
        codec_demo_encode,
    )

    ids = _media_ids(spark, "bmp").unionByName(_media_ids(spark, "wav"))
    media = ids.mapInPandas(
        codec_demo_encode, schema="item_id long, media_bytes binary"
    )
    decoded = media.mapInPandas(
        codec_demo_decode,
        schema="item_id long, kind string, units bigint, checksum bigint, meta bigint",
    )
    return decoded.groupBy("kind").agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.sum("units").cast("bigint").alias("total_units"),
        F.sum("checksum").cast("bigint").alias("total_checksum"),
        F.sum("meta").cast("bigint").alias("total_meta"),
    )


# --------------------------------------------------------------------------
# media_energy_segments: the VAD-shaped audio operator — decode → fixed
# 50-sample frame energies → threshold → gaps-and-islands segmentation.
# Content-checked end-to-end: the oracle re-derives every sample from
# the wav_sample_law, so a framing bug in the codec OR an off-by-one in
# the island arithmetic breaks the hash.
# --------------------------------------------------------------------------
ACTIVE_SUMSQ = 165_000  # frame is "speech" when Σs² over 50 samples exceeds this


@register(
    "media_energy_segments",
    oracle=f"""
    WITH dims AS (
      SELECT i, 400 + 40 * (i % 5) AS n
      FROM (SELECT UNNEST(range(0, {N_MEDIA})) AS i)
    ),
    samp AS (
      SELECT d.i, ts.t // 50 AS win_idx,
             ((31*d.i + 17*ts.t) % 201 - 100)
               * ((31*d.i + 17*ts.t) % 201 - 100) AS sq
      FROM dims d, UNNEST(range(0, d.n)) ts(t)
    ),
    win AS (
      SELECT i, win_idx, SUM(sq) AS sumsq
      FROM samp GROUP BY 1, 2
    ),
    act AS (
      SELECT i, win_idx,
             win_idx - row_number() OVER (PARTITION BY i ORDER BY win_idx)
               AS grp
      FROM win WHERE sumsq > {ACTIVE_SUMSQ}
    ),
    seg AS (SELECT i, grp, COUNT(*) AS seg_len FROM act GROUP BY 1, 2),
    per_seg AS (
      SELECT i, CAST(COUNT(*) AS BIGINT) AS n_segments,
             CAST(MAX(seg_len) AS BIGINT) AS longest_run
      FROM seg GROUP BY 1
    )
    SELECT w.i AS item_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN w.sumsq > {ACTIVE_SUMSQ} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_active,
           COALESCE(MAX(p.n_segments), 0) AS n_segments,
           COALESCE(MAX(p.longest_run), 0) AS longest_run,
           CAST(SUM(w.sumsq) AS BIGINT) AS total_energy
    FROM win w LEFT JOIN per_seg p ON p.i = w.i
    GROUP BY w.i
    """,
)
def media_energy_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio activity segmentation over the REAL WAV codec — the
    voice-activity-detection shape of a speech-corpus pipeline: encode
    the deterministic 16-bit PCM fixtures to genuine RIFF bytes,
    decode to exact per-frame energies (Σs² over fixed 50-sample
    frames, trailing partial frame kept) in one Arrow-batched
    mapInPandas leg (functions/media_codecs.py wav_window_energy),
    threshold into active frames, and count contiguous active runs per
    item with the gaps-and-islands idiom (win_idx − row_number is
    constant within a run). Reports per item: frame count, active
    frames, segment count, longest run, exact total energy.

    Scale: the decode leg is a narrow map — PCM bytes never shuffle;
    only bounded (item, frame, energy) rows do. The island window is
    PARTITIONED by item (entity-keyed, frames-per-item bounded by
    clip length), and the final rollup is one hash aggregate. The
    same plan segments a 100-TB audio corpus: per-clip state only,
    no global order anywhere."""
    from olap_project_spark.functions.media_codecs import (
        codec_demo_encode,
        wav_window_energy,
    )
    from pyspark.sql.window import Window

    ids = _media_ids(spark, "wav")
    media = ids.mapInPandas(
        codec_demo_encode, schema="item_id long, media_bytes binary"
    )
    win = media.mapInPandas(
        wav_window_energy,
        schema="item_id long, win_idx long, n_samples long, sumsq long",
    )
    wfun = Window.partitionBy("item_id").orderBy("win_idx")
    seg = (
        win.filter(F.col("sumsq") > ACTIVE_SUMSQ)
        .withColumn("grp", F.col("win_idx") - F.row_number().over(wfun))
        .groupBy("item_id", "grp")
        .agg(F.count("*").alias("seg_len"))
    )
    per_seg = seg.groupBy("item_id").agg(
        F.count("*").cast("bigint").alias("n_segments"),
        F.max("seg_len").cast("bigint").alias("longest_run"),
    )
    base = win.groupBy("item_id").agg(
        F.count("*").cast("bigint").alias("n_windows"),
        F.sum((F.col("sumsq") > ACTIVE_SUMSQ).cast("bigint"))
        .cast("bigint")
        .alias("n_active"),
        F.sum("sumsq").cast("bigint").alias("total_energy"),
    )
    return base.join(per_seg, "item_id", "left").select(
        "item_id",
        "n_windows",
        "n_active",
        F.coalesce("n_segments", F.lit(0).cast("bigint")).alias("n_segments"),
        F.coalesce("longest_run", F.lit(0).cast("bigint")).alias("longest_run"),
        "total_energy",
    )


# --------------------------------------------------------------------------
# media_aspect_bucket_batches: aspect-ratio bucketing for multimodal
# training batches — decode REAL BMP headers, assign each image to the
# nearest ratio bucket by EXACT rational comparison, account crop loss,
# and count fixed-size batches per bucket.
# --------------------------------------------------------------------------
ASPECT_BUCKETS = [  # (idx, bw, bh, label) — the SDXL-style ratio ladder
    (0, 1, 1, "1:1"),
    (1, 4, 3, "4:3"),
    (2, 3, 4, "3:4"),
    (3, 16, 9, "16:9"),
    (4, 2, 1, "2:1"),
]
_BUCKET_K = 1
for _, _bw, _bh, _ in ASPECT_BUCKETS:
    _BUCKET_K *= _bw * _bh
ASPECT_BATCH = 4  # images per training batch within a bucket


def _aspect_oracle() -> str:
    vals = ", ".join(
        f"({i}, {bw}::BIGINT, {bh}::BIGINT, "
        f"{_BUCKET_K // (bw * bh)}::BIGINT, '{lab}')"
        for i, bw, bh, lab in ASPECT_BUCKETS
    )
    return f"""
    WITH dims AS (
      SELECT i, CAST(8 + i % 5 AS BIGINT) AS w, CAST(6 + i % 4 AS BIGINT) AS h
      FROM (SELECT UNNEST(range(0, {N_MEDIA})) AS i)
    ),
    buckets(b_idx, bw, bh, kf, ratio) AS (VALUES {vals}),
    scored AS (
      SELECT d.i, d.w, d.h, b.b_idx, b.bw, b.bh, b.ratio,
             ROW_NUMBER() OVER (
               PARTITION BY d.i
               ORDER BY ABS(d.w * b.bh - d.h * b.bw) * b.kf ASC,
                        b.b_idx ASC) AS rn
      FROM dims d CROSS JOIN buckets b
    ),
    loss AS (
      SELECT *,
             ABS(w * bh - h * bw)
               * (CASE WHEN w * bh - h * bw > 0
                       THEN h * bw ELSE w * bh END) AS loss_num
      FROM scored WHERE rn = 1
    )
    SELECT ratio AS bucket_ratio,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(COUNT(*) // {ASPECT_BATCH} AS BIGINT) AS n_full_batches,
           CAST(COUNT(*) % {ASPECT_BATCH} AS BIGINT) AS n_leftover,
           CAST(SUM(w * h) AS BIGINT) AS total_pixels,
           ROUND(CAST(SUM(loss_num) AS DOUBLE) / (MAX(bw) * MAX(bh)), 6)
             AS crop_loss_px
    FROM loss GROUP BY ratio
    """


@register("media_aspect_bucket_batches", oracle=_aspect_oracle)
def media_aspect_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing — the batching strategy multimodal
    trainers (SDXL-style) use so every batch shares one shape: decode
    REAL BMP container bytes (the genuine struct-parse leg,
    functions/media_codecs.py), assign each image to the nearest
    ratio bucket on a fixed ladder, account the pixels a
    resize-and-center-crop to that ratio would discard, and report
    per bucket how many full fixed-size batches the corpus yields.

    Exactness: "nearest ratio" never touches floats — the distance
    |w/h − bw/bh| is compared across buckets by scaling each
    |w·bh − h·bw| with K/(bw·bh) (K = Π bw·bh), an integer
    cross-multiplication; ties break on bucket index. Crop loss per
    image is the exact rational |d|·(h·bw | w·bh)/(bw·bh) — the
    bucket-constant denominator divides ONCE at the edge. The oracle
    re-derives dimensions from the generation law, so a header-parse
    bug (row padding, bottom-up rows) shifts a bucket and breaks the
    hash.

    Scale: decode is a narrow Arrow map (bytes never shuffle); the
    5-row bucket ladder broadcasts; assignment is a struct-min hash
    aggregate keyed by item — no window, no sort; the result is one
    more hash aggregate over ≤|buckets| groups. Batch counts are
    n DIV B / n MOD B — the deterministic equivalent of a packing
    pass, with leftovers surfaced rather than silently dropped."""
    from olap_project_spark.functions.media_codecs import (
        codec_demo_decode,
        codec_demo_encode,
    )

    ids = _media_ids(spark, "bmp")
    media = ids.mapInPandas(
        codec_demo_encode, schema="item_id long, media_bytes binary"
    )
    decoded = media.mapInPandas(
        codec_demo_decode,
        schema="item_id long, kind string, units bigint, checksum bigint, meta bigint",
    )
    img = decoded.filter(F.col("kind") == "bmp").select(
        "item_id",
        (F.col("meta") / 1000).cast("bigint").alias("w"),
        (F.col("meta") % 1000).alias("h"),
    )
    bdf = local_frame(spark, 
        [
            (i, bw, bh, _BUCKET_K // (bw * bh), lab)
            for i, bw, bh, lab in ASPECT_BUCKETS
        ],
        "b_idx int, bw long, bh long, kf long, ratio string",
    )
    d = F.col("w") * F.col("bh") - F.col("h") * F.col("bw")
    scored = img.crossJoin(F.broadcast(bdf)).select(
        "item_id",
        "w",
        "h",
        F.struct(
            (F.abs(d) * F.col("kf")).alias("ds"),
            F.col("b_idx"),
            F.col("bw"),
            F.col("bh"),
            F.col("ratio"),
        ).alias("cand"),
    )
    chosen = scored.groupBy("item_id", "w", "h").agg(
        F.min("cand").alias("c")
    )
    dd = F.col("w") * F.col("c.bh") - F.col("h") * F.col("c.bw")
    loss_num = F.abs(dd) * F.when(
        dd > 0, F.col("h") * F.col("c.bw")
    ).otherwise(F.col("w") * F.col("c.bh"))
    return (
        chosen.select(
            F.col("c.ratio").alias("bucket_ratio"),
            F.col("c.bw").alias("bw"),
            F.col("c.bh").alias("bh"),
            (F.col("w") * F.col("h")).alias("px"),
            loss_num.alias("loss_num"),
        )
        .groupBy("bucket_ratio", "bw", "bh")
        .agg(
            F.count("*").cast("bigint").alias("n_images"),
            F.sum("px").cast("bigint").alias("total_pixels"),
            F.sum("loss_num").alias("sum_loss"),
        )
        .select(
            "bucket_ratio",
            "n_images",
            F.expr(f"n_images DIV {ASPECT_BATCH}").alias("n_full_batches"),
            (F.col("n_images") % ASPECT_BATCH).alias("n_leftover"),
            "total_pixels",
            F.round(
                F.col("sum_loss").cast("double")
                / (F.col("bw") * F.col("bh")),
                6,
            ).alias("crop_loss_px"),
        )
    )


# --------------------------------------------------------------------------
# media_resample_stats: decimate-by-2 audio resampling with a full
# encode→decimate→re-encode→re-decode codec round trip, content-checked
# against the generation law sampled at even indices.
# --------------------------------------------------------------------------
@register(
    "media_resample_stats",
    oracle=f"""
    WITH wav_dims AS (
      SELECT i, 8000 + 100 * (i % 3) AS rate, 400 + 40 * (i % 5) AS n
      FROM (SELECT UNNEST(range(0, {N_MEDIA})) AS i)
    ),
    dec AS (
      SELECT d.i, d.rate // 2 AS rate_out,
             (d.n + 1) // 2 AS n_out,
             SUM((31 * d.i + 17 * ts.t) % 201 - 100) AS sum_out,
             SUM(((31 * d.i + 17 * ts.t) % 201 - 100)
                 * ((31 * d.i + 17 * ts.t) % 201 - 100)) AS sumsq_out
      FROM wav_dims d, UNNEST(range(0, d.n, 2)) ts(t)
      GROUP BY d.i, d.rate, d.n
    )
    SELECT i AS item_id,
           CAST(rate_out AS INTEGER) AS rate_out,
           CAST(n_out AS BIGINT) AS n_out,
           CAST(sum_out AS BIGINT) AS sum_out,
           CAST(sumsq_out AS BIGINT) AS sumsq_out,
           CAST(n_out * 1000 // rate_out AS BIGINT) AS duration_ms_out
    FROM dec
    """,
)
def media_resample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio resampling through the REAL codec, both directions:
    deterministic 16-bit PCM WAVs are encoded to genuine RIFF bytes,
    parsed back, decimated by 2 (every second sample), RE-ENCODED at
    half the rate to genuine WAV bytes, and re-decoded — the emitted
    moments come from the second decode, so a framing bug in either
    codec direction OR an off-by-one in the decimation breaks the
    hash. The oracle re-derives every surviving sample from the
    generation law at even indices (``range(0, n, 2)``).

    This is the downsample leg a speech-corpus pipeline runs (48 kHz
    field audio → 16 kHz training audio); the plumbing — binary
    columns, Arrow batching, narrow map, re-encoded binary output —
    is exactly what a real polyphase resampler would ride.

    Scale: two narrow Arrow maps (encode, decimate-roundtrip); bytes
    never shuffle; per-item output is four ints + the final project
    adds the integer duration."""
    from olap_project_spark.functions.media_codecs import (
        codec_demo_encode,
        wav_decimate_roundtrip,
    )

    ids = _media_ids(spark, "wav")
    media = ids.mapInPandas(
        codec_demo_encode, schema="item_id long, media_bytes binary"
    )
    dec = media.mapInPandas(
        wav_decimate_roundtrip,
        schema=(
            "item_id long, rate_out int, n_out bigint, "
            "sum_out bigint, sumsq_out bigint"
        ),
    )
    return dec.select(
        "item_id",
        "rate_out",
        "n_out",
        "sum_out",
        "sumsq_out",
        F.expr("n_out * 1000 DIV rate_out").alias("duration_ms_out"),
    )
