"""Pure-stdlib media codecs: real PNG, WAV and AVI encode/decode.

The container has no PIL/soundfile/libav, but uncompressed formats do not
need them: PNG is zlib + per-scanline filters + CRC-chunked framing
(RFC 2083), WAV is RIFF framing the stdlib ``wave`` module speaks, and
VIDEO is RIFF AVI holding uncompressed 8-bit grayscale DIB frames
(``00db`` chunks + the ``idx1`` frame index — the classic pre-codec AVI
form, fully specified by the public RIFF/AVI and BITMAPINFOHEADER
layouts). These codecs make the multimodal decode path REAL for all
three kinds — ``cruncher_spark.operators.multimodal`` plugs them into
its ``mapInPandas`` batch loop, so a user can round-trip actual media
bytes, and frame sampling can read the real container index instead of
slicing synthetic byte ranges. Compressed INTRA-frame video is real too:
:func:`avi_encode_mjpeg` wraps per-frame baseline JPEGs
(:mod:`cruncher_spark.functions.jpeg` — real DCT/quantization/Huffman)
as a Motion-JPEG AVI, and :func:`avi_decode` dispatches on the stream
codec. Inter-frame video (H.264 etc.) genuinely requires libav and stays
out of scope.

Encoders are deterministic (fixed zlib level, filter 0, fixed header
fields) so payload bytes are reproducible across runs and engines.
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
    # filter-0 scanlines assembled as one (h, w+1) array with a zero
    # filter-byte column — same bytes as the per-row join, no Python loop
    fl = np.zeros((h, w + 1), dtype=np.uint8)
    fl[:, 1:] = pixels
    idat = zlib.compress(fl.tobytes(), 6)
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
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    filts = arr[:, 0]
    scans = arr[:, 1:]
    if not filts.any():
        # all filter 0 (what png_encode emits): the scanline matrix IS the
        # image — one reshape+slice, no per-row Python loop
        return np.ascontiguousarray(scans)
    bad = np.setdiff1d(np.unique(filts), [0, 1, 2])
    if bad.size:
        raise ValueError(f"unsupported PNG filter {bad[0]}")
    out = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        filt, scan = filts[y], scans[y]
        if filt == 0:
            line = scan
        elif filt == 1:  # Sub: add left neighbor == modular prefix sum
            line = (np.cumsum(scan, dtype=np.int64) & 0xFF).astype(np.uint8)
        else:  # Up: add the row above
            line = (scan.astype(np.int16) + prev.astype(np.int16)).astype(np.uint8)
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


# ---------------------------------------------------------------------------
# AVI: RIFF container, uncompressed 8-bit grayscale DIB frames + idx1 index
# ---------------------------------------------------------------------------

_AVIIF_KEYFRAME = 0x10


def _dib_row_stride(w: int) -> int:
    return (w + 3) & ~3  # DIB scanlines pad to 4-byte boundaries


def _frame_to_dib(frame: np.ndarray) -> bytes:
    """(H, W) uint8 → bottom-up, 4-byte-row-padded DIB pixel data."""
    h, w = frame.shape
    stride = _dib_row_stride(w)
    buf = np.zeros((h, stride), dtype=np.uint8)
    buf[:, :w] = frame[::-1]
    return buf.tobytes()


def _dib_to_frame(data: bytes, w: int, h: int) -> np.ndarray:
    stride = _dib_row_stride(w)
    arr = np.frombuffer(data, dtype=np.uint8, count=stride * h).reshape(h, stride)
    return np.ascontiguousarray(arr[::-1, :w])  # bottom-up → top-down


def avi_encode(frames: np.ndarray, fps: int) -> bytes:
    """Encode an (N, H, W) uint8 stack as an AVI with uncompressed 8-bit
    grayscale DIB frames ('DIB ' fourcc, BI_RGB, 256-entry gray palette)
    and an ``idx1`` index chunk."""
    if frames.ndim != 3 or frames.dtype != np.uint8:
        raise ValueError("avi_encode expects an (N, H, W) uint8 array")
    if fps < 1:
        raise ValueError(f"fps must be >= 1, got {fps}")
    n, h, w = frames.shape
    frame_bytes = _dib_row_stride(w) * h

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n, 0, 1,  # dwTotalFrames, dwInitialFrames, dwStreams
        frame_bytes,  # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<10I4h",
            0, 0, 0,  # dwFlags, wPriority+wLanguage, dwInitialFrames
            1, fps,  # dwScale, dwRate → fps frames/sec
            0, n,  # dwStart, dwLength
            frame_bytes, 0xFFFFFFFF, 0,  # buf size, quality, sample size
            0, 0, w, h,  # rcFrame
        )
    )
    palette = b"".join(struct.pack("<BBBB", g, g, g, 0) for g in range(256))
    strf = (
        struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, frame_bytes, 0, 0, 256, 0)
        + palette
    )
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) + b"strl" \
        + b"strh" + struct.pack("<I", len(strh)) + strh \
        + b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl_body = b"avih" + struct.pack("<I", len(avih)) + avih + strl
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl_body)) + b"hdrl" + hdrl_body

    movi_chunks, index, off = [], [], 4  # offsets relative to 'movi' fourcc
    for i in range(n):
        data = _frame_to_dib(frames[i])
        movi_chunks.append(b"00db" + struct.pack("<I", len(data)) + data)
        index.append(struct.pack("<4sIII", b"00db", _AVIIF_KEYFRAME, off, len(data)))
        off += 8 + len(data)
        if len(data) % 2:  # RIFF chunks pad to even length
            movi_chunks.append(b"\x00")
            off += 1
    movi_body = b"".join(movi_chunks)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    idx1 = b"idx1" + struct.pack("<I", 16 * n) + b"".join(index)

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def avi_encode_mjpeg(frames: np.ndarray, fps: int, quality: int = 85) -> bytes:
    """Encode an (N, H, W) uint8 stack as a REAL Motion-JPEG AVI: each
    frame is an independently-decodable baseline JPEG
    (:mod:`cruncher_spark.functions.jpeg` — actual DCT/quantization/
    Huffman entropy coding, not a byte-slice fake) in a ``00dc`` chunk,
    fourcc ``MJPG``, with the same ``idx1`` index so frame extraction
    seeks without scanning. This is the intra-only compressed-video form;
    inter-frame codecs (H.264 etc.) remain out of scope."""
    from cruncher_spark.functions.jpeg import jpeg_encode_stack

    if frames.ndim != 3 or frames.dtype != np.uint8:
        raise ValueError("avi_encode_mjpeg expects an (N, H, W) uint8 array")
    if fps < 1:
        raise ValueError(f"fps must be >= 1, got {fps}")
    n, h, w = frames.shape
    # one batched DCT/quantization pass over every block of every frame
    # (frames in a stack share dimensions); streams identical per frame
    payloads = jpeg_encode_stack(frames, quality)
    max_bytes = max(len(p) for p in payloads)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps, max_bytes * fps, 0, 0x10,
        n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack(
            "<10I4h", 0, 0, 0, 1, fps, 0, n, max_bytes, 0xFFFFFFFF, 0,
            0, 0, w, h,
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 8,
        int.from_bytes(b"MJPG", "little"),  # biCompression fourcc
        max_bytes, 0, 0, 0, 0,
    )
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) + b"strl" \
        + b"strh" + struct.pack("<I", len(strh)) + strh \
        + b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl_body = b"avih" + struct.pack("<I", len(avih)) + avih + strl
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl_body)) + b"hdrl" + hdrl_body

    movi_chunks, index, off = [], [], 4
    for p in payloads:
        movi_chunks.append(b"00dc" + struct.pack("<I", len(p)) + p)
        index.append(struct.pack("<4sIII", b"00dc", _AVIIF_KEYFRAME, off, len(p)))
        off += 8 + len(p)
        if len(p) % 2:
            movi_chunks.append(b"\x00")
            off += 1
    movi_body = b"".join(movi_chunks)
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    idx1 = b"idx1" + struct.pack("<I", 16 * n) + b"".join(index)
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def avi_index(data: bytes) -> dict:
    """Parse an AVI's headers + ``idx1`` WITHOUT touching frame data.

    Returns ``{width, height, fps, n_frames, frames: [(abs_offset,
    size), ...]}`` where ``abs_offset`` addresses the first frame-data
    byte in ``data`` — so a caller can slice individual frames out of the
    payload (the container analog of seeking by index instead of
    scanning)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF signature)")
    w = h = fps = n = None
    codec = b"DIB "
    movi_pos = None
    entries: list[tuple[int, int]] = []
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body_at = pos + 8
        if tag == b"LIST":
            kind = data[body_at : body_at + 4]
            if kind == b"movi":
                movi_pos = body_at  # position of the 'movi' fourcc
            else:  # descend into hdrl/strl
                inner, end = body_at + 4, body_at + length
                while inner + 8 <= end:
                    itag = data[inner : inner + 4]
                    (ilen,) = struct.unpack("<I", data[inner + 4 : inner + 8])
                    ib = inner + 8
                    if itag == b"avih":
                        vals = struct.unpack("<14I", data[ib : ib + 56])
                        n = vals[4]
                        w, h = vals[8], vals[9]
                    elif itag == b"strh" and data[ib : ib + 4] == b"vids":
                        codec = data[ib + 4 : ib + 8]
                        scale, rate = struct.unpack("<2I", data[ib + 20 : ib + 28])
                        fps = rate // max(scale, 1)
                    elif itag == b"LIST":
                        # nested strl: step INTO it rather than over
                        inner = ib + 4
                        continue
                    inner = ib + ilen + (ilen % 2)
        elif tag == b"idx1":
            for e in range(length // 16):
                ckid, _flags, off, size = struct.unpack(
                    "<4sIII", data[body_at + 16 * e : body_at + 16 * e + 16]
                )
                # 00db = uncompressed DIB, 00dc = "compressed" stream tag
                # that BI_RGB writers also use for raw frames
                if ckid in (b"00db", b"00dc"):
                    entries.append((ckid, off, size))
        pos = body_at + length + (length % 2)
    if w is None or movi_pos is None:
        raise ValueError("AVI missing avih header or movi list")
    # idx1 offsets come in two conventions in the wild: relative to the
    # 'movi' fourcc (what avi_encode writes) or absolute file offsets
    # (VirtualDub, some ffmpeg muxes). Disambiguate the way players do:
    # probe where the first entry's chunk header actually is.
    frames: list[tuple[int, int]] = []
    if entries:
        ckid0, off0, _ = entries[0]
        if data[movi_pos + off0 : movi_pos + off0 + 4] == ckid0:
            base = movi_pos
        elif data[off0 : off0 + 4] == ckid0:
            base = 0
        else:
            raise ValueError("idx1 offsets match neither movi-relative nor absolute convention")
        frames = [(base + off + 8, size) for _ckid, off, size in entries]
    return {
        "width": w, "height": h,
        "fps": fps if fps is not None else 0,
        "n_frames": n if n is not None else len(frames),
        "frames": frames,
        "codec": codec.decode("ascii", "replace").strip("\x00 ") or "DIB",
    }


def avi_decode(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a grayscale AVI → (fps, (N, H, W) uint8), dispatching on
    the stream codec: uncompressed DIB frames or Motion-JPEG (each
    ``00dc`` chunk a baseline JPEG run through the real entropy
    decoder)."""
    idx = avi_index(data)
    w, h = idx["width"], idx["height"]
    out = np.empty((len(idx["frames"]), h, w), dtype=np.uint8)
    if idx["codec"] == "MJPG":
        from cruncher_spark.functions.jpeg import jpeg_decode

        for i, (off, size) in enumerate(idx["frames"]):
            out[i] = jpeg_decode(data[off : off + size])
    else:
        for i, (off, size) in enumerate(idx["frames"]):
            out[i] = _dib_to_frame(data[off : off + size], w, h)
    return idx["fps"], out


def resize_nearest(pixels: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resample of an (H, W) uint8 image."""
    h, w = pixels.shape
    ys = (np.arange(new_h) * h // new_h).clip(0, h - 1)
    xs = (np.arange(new_w) * w // new_w).clip(0, w - 1)
    return pixels[np.ix_(ys, xs)]
