"""Pure-stdlib codecs for two UNCOMPRESSED media containers: BMP
(24-bpp BI_RGB, bottom-up, 4-byte row padding) and WAV (RIFF, 16-bit
mono little-endian PCM).

This is the REAL decode leg of the multimodal pipeline (SURVEY.md §2's
media plumbing; the reference treats media as opaque payloads end to
end): no codec libraries exist in this environment, but these two
formats are plain ``struct`` framing over raw samples, so encode and
decode are implementable — and verifiable — from the published file
layouts alone. Compressed formats (JPEG/MP3/H.264) remain behind the
deterministic fake in ``functions.multimodal.decode_bytes``.

Both directions are numpy-vectorized over the sample/pixel array (an
Arrow batch's payload decodes as one ``frombuffer`` + slice and encodes
as one broadcast + ``tobytes`` — no per-pixel Python anywhere in the
module), the same shape a real cluster media leg needs at 100 TB.
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_FILE_HEADER = "<2sIHHI"  # magic, file size, res1, res2, pixel offset
_BMP_INFO_HEADER = "<IiiHHIIiiII"  # BITMAPINFOHEADER


def bmp_row_stride(width: int) -> int:
    """Bytes per stored row: 3 bytes/pixel padded up to 4-byte words."""
    return (3 * width + 3) // 4 * 4


def make_bmp(width: int, height: int, pixel) -> bytes:
    """Encode a grayscale image as 24-bpp BI_RGB BMP. ``pixel`` is
    either a ``(height, width)`` array-like of gray values with y=0
    the TOP row, or a callable ``pixel(x, y)`` evaluated ONCE on
    broadcast integer coordinate grids — like the decoder, the encoder
    is numpy-vectorized end to end (no per-pixel Python). BMP stores
    rows bottom-up, which the encoder handles."""
    stride = bmp_row_stride(width)
    img_size = stride * height
    offset = 14 + 40
    header = struct.pack(_BMP_FILE_HEADER, b"BM", offset + img_size, 0, 0, offset)
    info = struct.pack(
        _BMP_INFO_HEADER, 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    if callable(pixel):
        ys, xs = np.mgrid[0:height, 0:width]
        vals = np.asarray(pixel(xs, ys))
    else:
        vals = np.asarray(pixel)
    vals = (
        np.broadcast_to(vals, (height, width)).astype(np.int64) & 0xFF
    ).astype(np.uint8)
    body = np.zeros((height, stride), dtype=np.uint8)  # zeros = row padding
    for ch in range(3):  # gray: B == G == R
        body[:, ch : 3 * width : 3] = vals
    return header + info + body[::-1].tobytes()  # bottom-up storage order


def parse_bmp(data: bytes) -> tuple[int, int, int, int]:
    """Decode a 24-bpp BMP → (width, height, bpp, gray_pixel_sum).

    The pixel sum is over the blue channel (== the gray value for
    grayscale payloads), computed vectorized: one frombuffer, reshape
    to (height, stride), slice off the padding, stride-3 the channel.
    """
    magic, _file_size, _r1, _r2, offset = struct.unpack_from(_BMP_FILE_HEADER, data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _hsz, width, height, _planes, bpp = struct.unpack_from("<IiiHH", data, 14)
    if bpp != 24:
        raise ValueError(f"unsupported BMP bpp {bpp} (24-bpp BI_RGB only)")
    if height <= 0 or width <= 0:
        raise ValueError("top-down or degenerate BMP not supported")
    stride = bmp_row_stride(width)
    arr = np.frombuffer(data, dtype=np.uint8, offset=offset, count=stride * height)
    pixels = arr.reshape(height, stride)[:, 0 : 3 * width : 3]  # blue channel
    return width, height, bpp, int(pixels.astype(np.int64).sum())


def make_wav(sample_rate: int, samples) -> bytes:
    """Encode 16-bit mono PCM as a RIFF/WAVE byte stream. ``samples``
    is any int array-like; values must fit int16 (checked explicitly —
    numpy would otherwise wrap silently where ``struct`` raised)."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.size and (arr.min() < -(2**15) or arr.max() >= 2**15):
        raise ValueError("sample out of int16 range")
    pcm = arr.astype("<i2").tobytes()
    fmt_body = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )  # PCM, mono, rate, byte rate, block align, bits
    fmt = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    data_chunk = b"data" + struct.pack("<I", len(pcm)) + pcm
    payload = b"WAVE" + fmt + data_chunk
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def parse_wav(data: bytes) -> tuple[int, int, int, int]:
    """Decode 16-bit mono PCM WAV → (sample_rate, n_samples,
    sample_sum, sample_sum_of_squares). Walks the RIFF chunk list (any
    chunk order, word-aligned sizes) rather than assuming fixed
    offsets; sums are exact int64 (numpy-vectorized)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    rate = None
    n = ssum = sumsq = 0
    while pos + 8 <= len(data):
        chunk_id = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body_at = pos + 8
        if chunk_id == b"fmt ":
            fmt_tag, channels, rate = struct.unpack_from("<HHI", data, body_at)
            if fmt_tag != 1 or channels != 1:
                raise ValueError("16-bit mono PCM only")
        elif chunk_id == b"data":
            n = size // 2
            s = np.frombuffer(data, dtype="<i2", offset=body_at, count=n).astype(
                np.int64
            )
            ssum = int(s.sum())
            sumsq = int((s * s).sum())
        pos = body_at + size + (size & 1)  # chunks are word-aligned
    if rate is None:
        raise ValueError("WAV missing fmt chunk")
    return rate, n, ssum, sumsq


def sniff_media(data: bytes) -> str:
    """'bmp' | 'wav' | 'unknown' by magic bytes."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return "unknown"


# ---------------------------------------------------------------------------
# Deterministic fixture laws + Arrow-batched encode/decode legs for the
# media_codec_decode_stats gate query. They live HERE (not in the query
# module) so cloudpickle serializes them by reference to a module whose
# import is side-effect-free on executors — the query registry never
# imports on a worker.
# ---------------------------------------------------------------------------
def bmp_dims(i: int) -> tuple[int, int]:
    """Widths 8..12 sweep every 4-byte row-padding case (0..3 bytes)."""
    return 8 + i % 5, 6 + i % 4


def wav_dims(i: int) -> tuple[int, int]:
    return 8000 + 100 * (i % 3), 400 + 40 * (i % 5)  # (rate, n_samples)


def bmp_pixel_law(i: int, x: int, y: int) -> int:
    return (7 * i + 3 * x + 5 * y) % 256


def wav_sample_law(i: int, t: int) -> int:
    return ((31 * i + 17 * t) % 201) - 100


def codec_demo_encode(batches):
    """(item_id, kind) → (item_id, media_bytes): genuine container
    bytes from the fixture laws."""
    import pandas as pd

    for pdf in batches:
        payloads = []
        for i, kind in zip(pdf["item_id"], pdf["kind"]):
            i = int(i)
            if kind == "bmp":
                w, h = bmp_dims(i)
                # the fixture laws are affine mod-arithmetic, so they
                # broadcast over the encoder's coordinate grids as-is
                payloads.append(make_bmp(w, h, lambda x, y, i=i: bmp_pixel_law(i, x, y)))
            else:
                rate, n = wav_dims(i)
                payloads.append(make_wav(rate, wav_sample_law(i, np.arange(n))))
        yield pd.DataFrame({"item_id": pdf["item_id"], "media_bytes": payloads})


def codec_demo_decode(batches):
    """(item_id, media_bytes) → per-item decoded stats, format sniffed
    by magic bytes (the metadata column is not trusted)."""
    import pandas as pd

    for pdf in batches:
        rows = []
        for i, data in zip(pdf["item_id"], pdf["media_bytes"]):
            data = bytes(data)
            kind = sniff_media(data)
            if kind == "bmp":
                w, h, _bpp, pix_sum = parse_bmp(data)
                rows.append((int(i), "bmp", w * h, pix_sum, 1000 * w + h))
            elif kind == "wav":
                rate, n, _ssum, sumsq = parse_wav(data)
                rows.append((int(i), "wav", n, sumsq, n * 1000 // rate))
        yield pd.DataFrame(
            rows, columns=["item_id", "kind", "units", "checksum", "meta"]
        )


ENERGY_WINDOW = 50  # samples per energy window (fixed analysis frame)


def wav_window_energy(batches):
    """(item_id, media_bytes) → one row per fixed 50-sample analysis
    window: (item_id, win_idx, n_samples, sumsq). The vectorized VAD
    front-end: decode the PCM once (numpy frombuffer), reshape into
    frames, and emit exact int64 per-frame energies. The trailing
    partial frame is kept (with its true n_samples) — energy is a sum,
    not a mean, so no padding bias is introduced.

    A narrow map: each payload expands to ceil(n/50) bounded rows, so
    a 100-TB audio corpus streams through without shuffling bytes —
    only the tiny (item, window, energy) rows reach the segmentation
    window function downstream."""
    import pandas as pd

    for pdf in batches:
        rows = []
        for i, data in zip(pdf["item_id"], pdf["media_bytes"]):
            data = bytes(data)
            if sniff_media(data) != "wav":
                continue
            pos = 12
            samples = None
            while pos + 8 <= len(data):
                chunk_id = data[pos : pos + 4]
                size = struct.unpack_from("<I", data, pos + 4)[0]
                if chunk_id == b"data":
                    samples = np.frombuffer(
                        data, dtype="<i2", offset=pos + 8, count=size // 2
                    ).astype(np.int64)
                pos = pos + 8 + size + (size & 1)
            if samples is None:
                continue
            sq = samples * samples
            for w in range(0, len(samples), ENERGY_WINDOW):
                chunk = sq[w : w + ENERGY_WINDOW]
                rows.append(
                    (int(i), w // ENERGY_WINDOW, int(chunk.size), int(chunk.sum()))
                )
        yield pd.DataFrame(
            rows, columns=["item_id", "win_idx", "n_samples", "sumsq"]
        )


def parse_wav_samples(data: bytes) -> tuple[int, "np.ndarray"]:
    """Decode 16-bit mono PCM WAV → (sample_rate, int16-as-int64
    sample array). Same RIFF chunk walk as parse_wav, but returns the
    raw samples for transforms (resampling, segmentation) that need
    more than the summary moments."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    rate = None
    samples = None
    while pos + 8 <= len(data):
        chunk_id = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body_at = pos + 8
        if chunk_id == b"fmt ":
            fmt_tag, channels, rate = struct.unpack_from("<HHI", data, body_at)
            if fmt_tag != 1 or channels != 1:
                raise ValueError("16-bit mono PCM only")
        elif chunk_id == b"data":
            samples = np.frombuffer(
                data, dtype="<i2", offset=body_at, count=size // 2
            ).astype(np.int64)
        pos = body_at + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, samples


def wav_decimate_roundtrip(batches):
    """(item_id, media_bytes) → decimate-by-2 resample with a FULL
    codec round trip: parse the real RIFF bytes, keep every second
    sample, RE-ENCODE at half the rate to genuine WAV bytes, re-parse
    those, and emit the re-decoded summary (rate_out, n_out, sum_out,
    sumsq_out). Any framing bug in either direction of the codec — or
    an off-by-one in the decimation — lands in the emitted moments.

    A narrow Arrow map: bytes in, four ints out per item; nothing
    shuffles until the consumer aggregates."""
    import pandas as pd

    for pdf in batches:
        rows = []
        for i, data in zip(pdf["item_id"], pdf["media_bytes"]):
            data = bytes(data)
            if sniff_media(data) != "wav":
                continue
            rate, samples = parse_wav_samples(data)
            rebytes = make_wav(rate // 2, samples[::2])
            rate2, n2, ssum2, sumsq2 = parse_wav(rebytes)
            rows.append((int(i), rate2, n2, ssum2, sumsq2))
        yield pd.DataFrame(
            rows,
            columns=["item_id", "rate_out", "n_out", "sum_out", "sumsq_out"],
        )
