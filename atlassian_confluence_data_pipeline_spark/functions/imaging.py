"""Pure-numpy image codecs for the multimodal binary columns (X5).

No media library exists in this container, so the engine carries its
own dependency-free decoders for the two uncompressed formats a
from-scratch implementation can honestly support: 24-bit BI_RGB BMP
and binary PPM (P6). That makes the decode contract of
``sources/binary.py`` (reference analog: attachment byte handling,
api_client/confluence_client.py:601-633) EXECUTABLE — real width/
height/pixel values, not a stub — while compressed formats (PNG/JPEG)
remain the documented external-library path.

Everything operates on ``uint8`` RGB arrays of shape (h, w, 3) and is
deterministic, so Spark-side tests can assert exact round-trips.
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_HEADER = 14
_BMP_DIB = 40


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP (bottom-up rows,
    BGR byte order, rows padded to 4 bytes — the classic layout)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    pad = (4 - (w * 3) % 4) % 4
    img_size = (w * 3 + pad) * h
    offset = _BMP_HEADER + _BMP_DIB
    header = b"BM" + struct.pack("<IHHI", offset + img_size, 0, 0, offset)
    dib = struct.pack(
        "<IiiHHIIiiII", _BMP_DIB, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    bgr = px[:, :, ::-1]
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += bgr[y].tobytes() + b"\x00" * pad
    return header + dib + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (h, w, 3) uint8 RGB. Handles both
    bottom-up (positive height) and top-down rows."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    w = struct.unpack_from("<i", data, 18)[0]
    h_raw = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    h = abs(h_raw)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(data, np.uint8, stride * h, offset).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if h_raw > 0:  # bottom-up storage
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6, maxval 255)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8 RGB. Tolerates comment lines
    and arbitrary whitespace in the header, per the spec."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return (
        np.frombuffer(data, np.uint8, w * h * 3, pos).reshape(h, w, 3).copy()
    )


def decode_image_bytes(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes: BMP or PPM -> (h, w, 3) uint8 RGB."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    raise ValueError("unsupported image format (supported: 24-bit BMP, P6 PPM)")


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize to (height, width, 3) — pure index math,
    deterministic (the pixel at output (y, x) is input
    (floor(y*h/height), floor(x*w/width)))."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return px[ys][:, xs].copy()
