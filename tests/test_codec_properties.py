"""Property tests for the pure-stdlib media codecs (BMP / WAV): the
encode→parse round-trip must be exact for EVERY dimension, padding
case, pixel law, sample count, and sample range — no Spark involved,
so hypothesis can run many examples."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from olap_project_spark.functions.media_codecs import (
    bmp_row_stride,
    make_bmp,
    make_wav,
    parse_bmp,
    parse_wav,
    sniff_media,
)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    a=st.integers(min_value=0, max_value=255),
    b=st.integers(min_value=0, max_value=17),
    c=st.integers(min_value=0, max_value=23),
)
def test_bmp_roundtrip_exact(w, h, a, b, c):
    pixel = lambda x, y: (a + b * x + c * y) % 256  # noqa: E731
    data = make_bmp(w, h, pixel)
    expected = sum(pixel(x, y) for x in range(w) for y in range(h))
    assert sniff_media(data) == "bmp"
    assert parse_bmp(data) == (w, h, 24, expected)
    assert len(data) == 54 + bmp_row_stride(w) * h


@settings(max_examples=60, deadline=None)
@given(
    rate=st.integers(min_value=1, max_value=96_000),
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=600
    ),
)
def test_wav_roundtrip_exact(rate, samples):
    data = make_wav(rate, samples)
    assert sniff_media(data) == "wav"
    got_rate, n, ssum, sumsq = parse_wav(data)
    assert (got_rate, n) == (rate, len(samples))
    assert ssum == sum(samples)
    assert sumsq == sum(s * s for s in samples)


@settings(max_examples=30, deadline=None)
@given(junk=st.binary(min_size=0, max_size=64))
def test_sniff_rejects_non_containers(junk):
    # a random blob only sniffs as a container if it actually carries
    # the magic bytes
    kind = sniff_media(junk)
    if kind == "bmp":
        assert junk[:2] == b"BM"
    elif kind == "wav":
        assert junk[:4] == b"RIFF" and junk[8:12] == b"WAVE"


@settings(max_examples=60, deadline=None)
@given(
    rate=st.integers(min_value=2, max_value=96_000),
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=400,
    ),
)
def test_wav_decimate_roundtrip_exact(rate, samples):
    """Decimation-by-2 through the full codec round trip: parse →
    samples[::2] → re-encode at rate//2 → re-parse must equal the
    directly-computed moments of the surviving samples, for every
    sample count parity and value range."""
    from olap_project_spark.functions.media_codecs import parse_wav_samples

    data = make_wav(rate, samples)
    r, parsed = parse_wav_samples(data)
    assert r == rate and parsed.tolist() == samples
    kept = samples[::2]
    redata = make_wav(rate // 2, [int(s) for s in parsed[::2]])
    assert parse_wav(redata) == (
        rate // 2,
        len(kept),
        sum(kept),
        sum(s * s for s in kept),
    )


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=25),
    h=st.integers(min_value=1, max_value=20),
    a=st.integers(min_value=0, max_value=255),
    b=st.integers(min_value=0, max_value=17),
    c=st.integers(min_value=0, max_value=23),
)
def test_vectorized_bmp_encode_is_byte_identical(w, h, a, b, c):
    """The numpy-vectorized encoder must produce EXACTLY the bytes of
    the straightforward per-pixel reference construction (header,
    bottom-up row order, BGR triplication, zero row padding)."""
    import struct

    pixel = lambda x, y: (a + b * x + c * y) % 256  # noqa: E731
    stride = bmp_row_stride(w)
    offset = 54
    ref = bytearray(
        struct.pack("<2sIHHI", b"BM", offset + stride * h, 0, 0, offset)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
        )
    )
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(w):
            v = pixel(x, y) & 0xFF
            row += bytes((v, v, v))
        row += b"\x00" * (stride - len(row))
        ref += row
    assert make_bmp(w, h, pixel) == bytes(ref)


def test_vectorized_bmp_encode_accepts_array():
    import numpy as np

    arr = np.arange(12, dtype=np.int64).reshape(3, 4)  # (h=3, w=4)
    data = make_bmp(4, 3, arr)
    assert parse_bmp(data) == (4, 3, 24, int(arr.sum()))


def test_make_wav_rejects_out_of_range_samples():
    import pytest

    with pytest.raises(ValueError, match="int16"):
        make_wav(8000, [0, 40_000])
