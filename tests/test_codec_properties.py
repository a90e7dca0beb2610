"""Property tests for the pure-numpy media codecs: every encoder/parser
pair must roundtrip ARBITRARY valid rasters/tracks bit-exactly, and the
parsers must reject (never crash on, never silently accept) arbitrary
byte mutations — the tolerant-load contract the mapInPandas extractors
rely on."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from atlassian_confluence_data_pipeline_spark.functions.audio import (
    FP_WINDOWS,
    decode_wav,
    encode_wav,
    energy_fingerprint64,
)
from atlassian_confluence_data_pipeline_spark.functions.imaging import (
    decode_bmp,
    decode_png,
    decode_ppm,
    dhash64,
    encode_bmp,
    encode_png,
    encode_ppm,
)


@st.composite
def rasters(draw):
    h = draw(st.integers(min_value=1, max_value=12))
    w = draw(st.integers(min_value=1, max_value=12))
    data = draw(
        st.lists(
            st.integers(min_value=0, max_value=255),
            min_size=h * w * 3,
            max_size=h * w * 3,
        )
    )
    return np.array(data, dtype=np.uint8).reshape(h, w, 3)


@st.composite
def tracks(draw):
    n = draw(st.integers(min_value=1, max_value=600))
    data = draw(
        st.lists(
            st.integers(min_value=0, max_value=255), min_size=n, max_size=n
        )
    )
    return np.array(data, dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(px=rasters())
def test_bmp_roundtrip_any_raster(px):
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@settings(max_examples=40, deadline=None)
@given(px=rasters())
def test_ppm_roundtrip_any_raster(px):
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


@settings(max_examples=40, deadline=None)
@given(px=rasters())
def test_png_roundtrip_any_raster(px):
    assert np.array_equal(decode_png(encode_png(px)), px)


@settings(max_examples=40, deadline=None)
@given(s=tracks(), rate=st.integers(min_value=1, max_value=192000))
def test_wav_roundtrip_any_track(s, rate):
    back_rate, back = decode_wav(encode_wav(s, sample_rate=rate))
    assert back_rate == rate
    assert np.array_equal(back, s)


@settings(max_examples=60, deadline=None)
@given(
    s=tracks(),
    pos=st.integers(min_value=0, max_value=500),
    byte=st.integers(min_value=0, max_value=255),
)
def test_wav_header_mutation_never_crashes(s, pos, byte):
    """Flipping any byte in the 44-byte header either still parses to
    the SAME payload (the byte was redundant only if it equals the
    original) or raises ValueError — never a crash, never garbage."""
    data = bytearray(encode_wav(s))
    pos = pos % 44
    original = data[pos]
    data[pos] = byte
    try:
        rate, back = decode_wav(bytes(data))
    except ValueError:
        return
    # accepted: either the mutation was a no-op, or it hit the sample-
    # rate field (offsets 24-27; rate is carried, not cross-validated —
    # byte rate at 28-31 must still agree, which decode_wav checks)
    if byte != original:
        assert 24 <= pos <= 27 or np.array_equal(back, s)


@settings(max_examples=40, deadline=None)
@given(s=tracks(), cut=st.integers(min_value=0, max_value=600))
def test_wav_truncation_rejected(s, cut):
    data = encode_wav(s)
    if cut >= len(data):
        return
    with pytest.raises(ValueError):
        decode_wav(data[: cut if cut < len(data) else len(data) - 1])


@settings(max_examples=30, deadline=None)
@given(s=tracks())
def test_fingerprint_total_function_on_valid_tracks(s):
    """energy_fingerprint64 is total on every track >= 65 samples and
    always lands in signed-64 range."""
    if s.size < FP_WINDOWS:
        with pytest.raises(ValueError):
            energy_fingerprint64(s)
    else:
        v = energy_fingerprint64(s)
        assert -(1 << 63) <= v < (1 << 63)


@settings(max_examples=30, deadline=None)
@given(px=rasters())
def test_dhash_container_agnostic(px):
    """The same raster must hash identically through all three codecs
    (the property that makes the near-dup chain container-agnostic)."""
    h = dhash64(px)
    assert dhash64(decode_bmp(encode_bmp(px))) == h
    assert dhash64(decode_ppm(encode_ppm(px))) == h
    assert dhash64(decode_png(encode_png(px))) == h
