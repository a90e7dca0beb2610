"""Audio modality (functions/audio.py, plans/multimodal3.py): WAV codec
roundtrip + real header validation, fingerprint semantics on crafted
tracks, and planted-duplicate recovery through the banded Hamming join."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from atlassian_confluence_data_pipeline_spark.functions.audio import (
    FP_WINDOWS,
    audio_features,
    decode_wav,
    encode_wav,
    energy_fingerprint64,
)
from atlassian_confluence_data_pipeline_spark.operators.lsh import simhash_near_pairs
from atlassian_confluence_data_pipeline_spark.sources.binary import (
    audio_attachments_from_documents,
    extract_audio_features,
    fingerprint_audio,
)


def _track(seed: int, n: int = 400) -> np.ndarray:
    """Envelope-on-carrier track: smooth per-window amplitude, same
    construction family as the fixtures."""
    t = np.arange(n, dtype=np.int64)
    ww = (t * FP_WINDOWS) // n
    amp = ((seed % 41) * ww * ww + (seed % 29) * ww + seed) % 73 + 8
    carrier = np.where(t % 2 == 0, 1, -1)
    return (128 + carrier * amp).astype(np.uint8)


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------


def test_wav_roundtrip_exact():
    s = _track(7)
    rate, back = decode_wav(encode_wav(s, sample_rate=16000))
    assert rate == 16000
    assert np.array_equal(back, s)


def test_wav_header_is_canonical_44_bytes():
    s = _track(3, n=100)
    data = encode_wav(s)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert len(data) == 44 + 100


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: d[:20],  # truncated header
        lambda d: b"JUNK" + d[4:],  # bad RIFF magic
        lambda d: d[:22] + b"\x02" + d[23:],  # stereo
        lambda d: d[:34] + b"\x10" + d[35:],  # 16-bit
        lambda d: d[:-10],  # payload shorter than declared
    ],
)
def test_wav_decode_rejects_malformed(mutate):
    data = mutate(encode_wav(_track(5)))
    with pytest.raises(ValueError):
        decode_wav(data)


def test_audio_features_exact_integers():
    s = np.array([128, 255, 0, 128, 192], dtype=np.uint8)
    n, peak, energy, loud = audio_features(s)
    assert (n, peak) == (5, 128)
    assert energy == 0 + 127 * 127 + 128 * 128 + 0 + 64 * 64
    assert loud == 3  # |dev| >= 64: 127, 128, 64


# ---------------------------------------------------------------------------
# fingerprint semantics
# ---------------------------------------------------------------------------


def test_fingerprint_deterministic_and_signed():
    vals = [energy_fingerprint64(_track(s)) for s in range(30)]
    assert vals == [energy_fingerprint64(_track(s)) for s in range(30)]
    assert all(-(1 << 63) <= v < (1 << 63) for v in vals)
    assert len(set(vals)) > 20


def test_fingerprint_invariant_to_carrier_sign():
    """The fold squares deviations, so flipping every sample around the
    midpoint (phase inversion) must not change a single bit."""
    s = _track(11)
    flipped = (256 - s.astype(np.int64)) % 256
    # keep exact mirror only where it stays in range (128+-amp always is)
    assert energy_fingerprint64(s) == energy_fingerprint64(
        flipped.astype(np.uint8)
    )


def test_fingerprint_localized_edit_small_hamming():
    """Boosting a 6-window loudness band (the fixture's planted edit)
    flips only the bits whose adjacent-compare window pair touches the
    band — far fewer than the ~32 of an unrelated track."""
    s = _track(13, n=455)  # 7 samples per window exactly
    t = np.arange(455, dtype=np.int64)
    ww = (t * FP_WINDOWS) // 455
    dev = s.astype(np.int64) - 128
    band = (ww >= 20) & (ww < 26)
    edited = (128 + np.sign(dev) * (np.abs(dev) + 40 * band)).astype(np.uint8)
    a, b = energy_fingerprint64(s), energy_fingerprint64(edited)
    ham = bin((a ^ b) & ((1 << 64) - 1)).count("1")
    other = energy_fingerprint64(_track(14, n=455))
    ham_other = bin((a ^ other) & ((1 << 64) - 1)).count("1")
    assert ham <= 8 < ham_other


def test_fingerprint_rejects_too_short():
    with pytest.raises(ValueError):
        energy_fingerprint64(np.full(FP_WINDOWS - 1, 128, dtype=np.uint8))


# ---------------------------------------------------------------------------
# Spark plumbing (tolerant load + planted-duplicate recovery)
# ---------------------------------------------------------------------------


def test_extract_audio_features_tolerant_err_rows(spark):
    good = encode_wav(_track(1))
    rows = [
        (1, "a.wav", bytearray(good)),
        (2, "b.mp3", bytearray(b"ID3\x04junk-compressed-payload")),
    ]
    att = spark.createDataFrame(
        rows, "owner_id bigint, filename string, content binary"
    )
    out = {r["owner_id"]: r for r in extract_audio_features(att).collect()}
    assert out[1]["err"] is None and out[1]["n_samples"] == 400
    assert out[2]["err"] is not None and out[2]["energy"] is None


def test_planted_audio_duplicates_recovered(spark):
    """The fixture plants groups of 4 variants; the fingerprint+banding
    chain must pair up variants within a group at threshold 14."""
    from atlassian_confluence_data_pipeline_spark.plans.multimodal3 import (
        AFP_CHUNKS,
        AFP_MAX_HAMMING,
    )

    # a representative id window (tiny group ids make degenerate flat
    # envelopes: g % 37 == 0/1 leaves little structure to fingerprint)
    docs = spark.range(1000, 1080).select(F.col("id").alias("doc_id"))
    fp = fingerprint_audio(audio_attachments_from_documents(docs)).select(
        F.col("owner_id").alias("doc_id"), F.col("afp").alias("simhash")
    )
    pairs = simhash_near_pairs(
        fp, "doc_id", max_hamming=AFP_MAX_HAMMING, chunks=AFP_CHUNKS
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    same_group = {p for p in got if p[0] // 4 == p[1] // 4}
    # every group contributes pairs; recall over the 20 groups x 6 pairs
    assert len(same_group) >= 100
    # cross-group contamination stays a small minority
    assert len(got - same_group) <= len(same_group) // 4
