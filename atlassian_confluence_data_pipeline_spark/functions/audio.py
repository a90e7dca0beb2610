"""Pure stdlib+numpy WAV codec and audio-feature primitives (X5 audio).

The multimodal contract (sources/binary.py) treats media as opaque
BINARY columns decoded inside Arrow batches. Images got real BMP/PPM/
PNG codecs (functions/imaging.py); this module is the audio sibling:
a real RIFF/WAVE encoder+parser for 8-bit unsigned mono PCM — the one
uncompressed layout that needs no external codec — plus the integer
feature folds (energy, peak deviation, loud-sample count) and the
65-window energy-envelope fingerprint the audio near-dup path banding
consumes (plans/multimodal3.py).

Everything here is exact integer arithmetic on decoded samples, so the
DuckDB oracle can re-derive every feature and every fingerprint bit
symbolically from the fixture's doc_id arithmetic — a byte-level bug in
the header layout, the sample parse, or the window index math breaks
the value hash.

Reference analog: attachment byte handling
(api_client/confluence_client.py:601-633) generalized to the audio
modality; transform-coded audio (MP3/AAC/FLAC) remains the documented
external-library path and surfaces as tolerant-load ``err`` rows.
"""

from __future__ import annotations

import struct

import numpy as np

#: fingerprint windowing: 65 energy windows -> 64 adjacent-compare bits
FP_WINDOWS = 65

_RIFF_FMT = "<4sI4s4sIHHIIHH4sI"
_HEADER_LEN = struct.calcsize(_RIFF_FMT)  # 44 bytes


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode 8-bit unsigned mono PCM as a canonical 44-byte-header
    RIFF/WAVE file. ``samples`` must be uint8 (one byte per sample)."""
    if samples.dtype != np.uint8 or samples.ndim != 1:
        raise ValueError("encode_wav expects a 1-D uint8 array")
    n = int(samples.size)
    header = struct.pack(
        _RIFF_FMT,
        b"RIFF",
        36 + n,  # chunk size: 4 ("WAVE") + (8+16) fmt + (8+n) data
        b"WAVE",
        b"fmt ",
        16,  # PCM fmt chunk length
        1,  # audio format: PCM
        1,  # channels: mono
        sample_rate,
        sample_rate,  # byte rate = rate * channels * bits/8
        1,  # block align
        8,  # bits per sample
        b"data",
        n,
    )
    return header + samples.tobytes()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE payload back to (sample_rate, uint8 samples).

    Real validation, not a trusting slice: magic tags, PCM format, mono
    8-bit layout, and declared sizes are all checked; anything else
    raises ValueError (the tolerant-load paths convert that to an
    ``err`` row)."""
    if len(data) < _HEADER_LEN:
        raise ValueError("wav: truncated header")
    (
        riff,
        chunk_size,
        wave,
        fmt_tag,
        fmt_len,
        audio_fmt,
        channels,
        rate,
        byte_rate,
        block_align,
        bits,
        data_tag,
        n,
    ) = struct.unpack(_RIFF_FMT, data[:_HEADER_LEN])
    if riff != b"RIFF" or wave != b"WAVE" or fmt_tag != b"fmt ":
        raise ValueError("wav: bad RIFF/WAVE magic")
    if data_tag != b"data":
        raise ValueError("wav: expected canonical 44-byte header")
    if fmt_len != 16 or audio_fmt != 1:
        raise ValueError("wav: only uncompressed PCM supported")
    if channels != 1 or bits != 8:
        raise ValueError("wav: only 8-bit mono supported")
    if byte_rate != rate or block_align != 1:
        raise ValueError("wav: inconsistent PCM layout fields")
    if len(data) < _HEADER_LEN + n or chunk_size != 36 + n:
        raise ValueError("wav: declared sizes disagree with payload")
    samples = np.frombuffer(data, dtype=np.uint8, count=n, offset=_HEADER_LEN)
    return rate, samples


def audio_features(samples: np.ndarray) -> tuple[int, int, int, int]:
    """Exact integer features over unsigned 8-bit samples:
    (n_samples, peak_dev, energy, n_loud) where dev = s - 128,
    energy = sum(dev^2) and n_loud counts |dev| >= 64."""
    dev = samples.astype(np.int64) - 128
    return (
        int(samples.size),
        int(np.abs(dev).max(initial=0)),
        int((dev * dev).sum()),
        int((np.abs(dev) >= 64).sum()),
    )


def energy_fingerprint64(samples: np.ndarray) -> int:
    """65-window energy-envelope fingerprint: assign sample t to window
    ww = (t * 65) // n (the same index-math rule everywhere — fixture,
    this fold, and the SQL oracle's GROUP BY), fold each window to its
    exact integer energy sum((s-128)^2), and pack 64 adjacent-compare
    bits (bit i = 1 iff E[i+1] > E[i]) — the audio analogue of dHash's
    adjacent-gray compares, stable under global gain-free edits and
    localized under band edits. Returns a SIGNED 64-bit int (bit 63
    lands in the sign bit, same convention as simhash/dhash)."""
    n = int(samples.size)
    if n < FP_WINDOWS:
        raise ValueError(f"audio fingerprint needs >= {FP_WINDOWS} samples")
    dev = samples.astype(np.int64) - 128
    sq = dev * dev
    ww = (np.arange(n, dtype=np.int64) * FP_WINDOWS) // n
    e = np.zeros(FP_WINDOWS, dtype=np.int64)
    np.add.at(e, ww, sq)
    bits = 0
    for i in range(FP_WINDOWS - 1):
        if e[i + 1] > e[i]:
            bits |= 1 << i
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits
