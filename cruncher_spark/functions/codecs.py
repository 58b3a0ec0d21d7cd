"""Pure-stdlib media codecs: real PNG and WAV encode/decode.

The container has no PIL/soundfile/libav, but uncompressed formats do not
need them: PNG is zlib + per-scanline filters + CRC-chunked framing
(RFC 2083), WAV is RIFF framing the stdlib ``wave`` module speaks. These
codecs make the multimodal decode path REAL for images and audio —
``cruncher_spark.operators.multimodal`` plugs them into its
``mapInPandas`` batch loop, so a user can round-trip actual media bytes.
Video stays honestly stubbed (inter-frame codecs genuinely require
libav).

Encoders are deterministic (fixed zlib level, filter 0) so payload bytes
are reproducible across runs and engines.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode an (H, W) uint8 grayscale array as a valid PNG (color type
    0, bit depth 8, filter 0 per scanline, fixed zlib level 6)."""
    if pixels.ndim != 2 or pixels.dtype != np.uint8:
        raise ValueError("png_encode expects an (H, W) uint8 array")
    h, w = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + row.tobytes() for row in pixels)
    idat = zlib.compress(raw, 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Decode a grayscale 8-bit PNG to an (H, W) uint8 array. Supports
    scanline filters 0 (None), 1 (Sub) and 2 (Up) — a superset of what
    :func:`png_encode` emits."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or color != 0 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced grayscale supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(idat)
    stride = w + 1
    out = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        filt, scan = row[0], np.frombuffer(row[1:], dtype=np.uint8).copy()
        if filt == 0:
            line = scan
        elif filt == 1:  # Sub: add left neighbor
            line = scan
            for x in range(1, w):
                line[x] = (int(line[x]) + int(line[x - 1])) & 0xFF
        elif filt == 2:  # Up: add the row above
            line = (scan.astype(np.int16) + prev.astype(np.int16)).astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter {filt}")
        out[y] = line
        prev = out[y]
    return out


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode a 1-D int16 array as a mono 16-bit PCM WAV."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("wav_encode expects a 1-D int16 array")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a mono 16-bit PCM WAV → (sample_rate, int16 samples)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("only mono 16-bit PCM supported")
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    return rate, np.frombuffer(frames, dtype=np.int16)


def resize_nearest(pixels: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resample of an (H, W) uint8 image."""
    h, w = pixels.shape
    ys = (np.arange(new_h) * h // new_h).clip(0, h - 1)
    xs = (np.arange(new_w) * w // new_w).clip(0, w - 1)
    return pixels[np.ix_(ys, xs)]
