"""Multimodal column operators: binary payloads + typed metadata.

A large-scale training-data pipeline stores image/audio/video as opaque
``binary`` columns beside typed metadata, and runs decode / feature
extraction / resize / frame sampling as Arrow-batched Pandas UDFs. This
module implements that plumbing — schemas, JVM-side metadata derivation,
``mapInPandas`` batch shapes, frame explosion — with TWO codec tiers:

- REAL codecs for images, audio AND video via the pure-stdlib PNG/WAV/
  AVI implementations in :mod:`cruncher_spark.functions.codecs`:
  ``attach_media(real_payloads=True)`` emits valid PNG/WAV/AVI bytes,
  :func:`decode_features_real` actually parses them back (dimensions,
  sample rate, sample counts, frame counts, fps, pixel stats),
  :func:`resize_image_real` decodes → nearest-neighbor rescales →
  re-encodes, and :func:`frame_sample_real` reads the AVI ``idx1``
  container index and extracts every-Nth REAL frame — all inside the
  same Arrow batch loop. Video frames are thumbnail-scale
  (metadata width/8 × height/8) uncompressed grayscale DIB — the
  container parsing and frame decode are real; inter-frame *compressed*
  codecs (H.264) genuinely require libav and raise at the call site.
- the original deterministic fake-feature path remains the default so
  the DuckDB oracle can verify the plumbing with plain SQL.

Scale notes:
- metadata derivation and frame slicing are pure JVM expressions
  (whole-stage codegen, no Python);
- the decode path is ``mapInPandas`` — one Arrow batch in, one out, no
  shuffle; it pipelines behind the scan and parallelizes per partition;
- frame sampling explodes JVM-side via ``sequence``+``transform``; at
  100 TB the explode multiplies rows before any shuffle, so downstream
  aggregations should be partial-agg friendly (sums/counts), which these
  are.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: media kinds, assigned round-robin by doc_id (deterministic)
KINDS = ("image", "audio", "video")
FORMATS = {"image": "png", "audio": "wav", "video": "avi"}

#: real video payloads use thumbnail-scale frames (metadata w/8 × h/8 —
#: exact ints given the 16+(id%k)*16 metadata formulas) so AVI bytes stay
#: bounded: ~2 KB/frame instead of ~100 KB at full metadata dims
VIDEO_DIM_DIV = 8

DECODE_SCHEMA = (
    "media_id long, kind string, f_hash string, size_bytes long,"
    " width int, height int"
)
RESIZE_SCHEMA = "media_id long, kind string, payload binary, width int, height int"


def attach_media(docs: DataFrame, real_payloads: bool = False) -> DataFrame:
    """documents → media table: typed metadata derived JVM-side, payload
    a binary column. Columns: media_id, kind, payload, fmt, width,
    height, sample_rate, n_samples, n_frames.

    Default payloads are utf-8 bytes of ``text`` (the oracle-checkable
    stand-in). ``real_payloads=True`` replaces payloads with VALID
    PNG/WAV/AVI bytes generated deterministically from the row's own
    metadata (gradient pixels ``(media_id+x+y) % 256``; int16 samples
    ``((media_id*31 + i*7) % 65536) - 32768`` at the row's sample_rate;
    AVI frames of ``(media_id + 7*frame + x + y) % 256`` pixels at
    width/8 × height/8, fps ``10 + media_id % 20``, ``n_frames``
    frames), via the same Arrow batch loop real ingestion would use.
    """
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    fmt_map = F.create_map(
        *[x for k, v in FORMATS.items() for x in (F.lit(k), F.lit(v))]
    )
    payload = F.encode(F.col("text"), "utf-8")
    nbytes = F.octet_length(payload)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.element_at(fmt_map, kind).alias("fmt"),
        (F.lit(16) + (F.col("doc_id") % 24) * 16).cast("int").alias("width"),
        (F.lit(16) + (F.col("doc_id") % 18) * 16).cast("int").alias("height"),
        F.when(kind == "audio", F.lit(8000) + (F.col("doc_id") % 5) * 4000)
        .cast("int")
        .alias("sample_rate"),
        F.when(kind == "audio", F.col("n_chars"))
        .cast("long")
        .alias("n_samples"),
        F.when(kind == "video", F.floor(nbytes / 256) + 1)
        .cast("int")
        .alias("n_frames"),
    )
    if not real_payloads:
        return media

    schema = (
        "media_id long, kind string, payload binary, fmt string,"
        " width int, height int, sample_rate int, n_samples long,"
        " n_frames int"
    )

    def encode_batches(batches):
        import numpy as np
        import pandas as pd

        from cruncher_spark.functions.codecs import (
            avi_encode,
            png_encode,
            wav_encode,
        )

        for pdf in batches:
            payloads = []
            for r in pdf.itertuples(index=False):
                if r.kind == "image":
                    y = np.arange(int(r.height), dtype=np.int64)[:, None]
                    x = np.arange(int(r.width), dtype=np.int64)[None, :]
                    payloads.append(
                        png_encode(((int(r.media_id) + x + y) % 256).astype(np.uint8))
                    )
                elif r.kind == "audio":
                    i = np.arange(int(r.n_samples), dtype=np.int64)
                    samples = ((int(r.media_id) * 31 + i * 7) % 65536 - 32768).astype(
                        np.int16
                    )
                    payloads.append(wav_encode(samples, int(r.sample_rate)))
                else:  # video: real AVI, thumbnail-scale gradient frames
                    m = int(r.media_id)
                    vw = int(r.width) // VIDEO_DIM_DIV
                    vh = int(r.height) // VIDEO_DIM_DIV
                    f = np.arange(int(r.n_frames), dtype=np.int64)[:, None, None]
                    y = np.arange(vh, dtype=np.int64)[None, :, None]
                    x = np.arange(vw, dtype=np.int64)[None, None, :]
                    frames = ((m + 7 * f + x + y) % 256).astype(np.uint8)
                    payloads.append(avi_encode(frames, 10 + m % 20))
            out = pd.DataFrame(pdf)
            out["payload"] = payloads
            yield out

    return media.mapInPandas(encode_batches, schema)


def decode_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    The default computes deterministic fake features (md5 fingerprint of
    the payload bytes, byte size) so the full Spark plumbing — schema,
    batch iteration, column access — runs and is oracle-checkable.
    ``real_decode=True`` marks where PIL/soundfile/av decoding plugs in.
    """

    def decode_batches(batches):
        import pandas as pd

        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "external-library decoding (PIL/soundfile/av) is not "
                    "available in this environment; use "
                    "decode_features_real for the REAL pure-Python "
                    "PNG/WAV/AVI path and mjpeg_roundtrip for REAL "
                    "Motion-JPEG video (functions/jpeg.py). Inter-frame "
                    "codecs (H.264/MP3) genuinely require libav and "
                    "remain out of scope."
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "f_hash": [
                        hashlib.md5(bytes(b)).hexdigest() for b in payloads
                    ],
                    "size_bytes": [len(b) for b in payloads],
                    "width": pdf["width"],
                    "height": pdf["height"],
                }
            )

    return media.mapInPandas(decode_batches, DECODE_SCHEMA)


REAL_DECODE_SCHEMA = (
    "media_id long, kind string, width int, height int,"
    " sample_rate int, n_samples long, n_frames int, fps int,"
    " px_sum long"
)


def decode_features_real(media: DataFrame) -> DataFrame:
    """REAL decode via the stdlib codecs: parse actual PNG/WAV/AVI
    payload bytes back into dimensions / rates / counts / content stats.

    Image rows report (width, height) from the decoded pixel array;
    audio rows report (sample_rate, n_samples) from the WAV
    header/frames; video rows report (width, height) of the container's
    frames plus (n_frames, fps) from the AVI headers and ``px_sum`` =
    exact integer sum of every decoded pixel across all frames — an
    integer-exact content check the oracle reproduces analytically. Run
    on ``attach_media(real_payloads=True)`` output, or any table whose
    payloads are real PNG/WAV/AVI bytes.
    """

    def decode_batches(batches):
        import pandas as pd

        from cruncher_spark.functions.codecs import (
            avi_decode,
            png_decode,
            wav_decode,
        )

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind == "image":
                    arr = png_decode(bytes(r.payload))
                    rows.append(
                        (r.media_id, r.kind, arr.shape[1], arr.shape[0],
                         None, None, None, None, int(arr.sum(dtype="int64")))
                    )
                elif r.kind == "audio":
                    rate, samples = wav_decode(bytes(r.payload))
                    rows.append(
                        (r.media_id, r.kind, None, None, rate,
                         len(samples), None, None, None)
                    )
                else:  # video: full container decode
                    fps, frames = avi_decode(bytes(r.payload))
                    rows.append(
                        (r.media_id, r.kind, frames.shape[2], frames.shape[1],
                         None, None, frames.shape[0], fps,
                         int(frames.sum(dtype="int64")))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height",
                    "sample_rate", "n_samples", "n_frames", "fps", "px_sum",
                ],
            )

    return media.mapInPandas(decode_batches, REAL_DECODE_SCHEMA)


def frame_sample_real(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video frame sampling: read the AVI ``idx1`` container index,
    slice out every ``every_n``-th frame's bytes by (offset, size), and
    decode ONLY those frames — the container analog of index-seeking
    instead of scanning, and exactly what a libav-backed sampler does
    with compressed streams.

    Output: media_id, frame_no (position in the video), frame_w,
    frame_h, px_sum (exact integer pixel sum of that frame). One Arrow
    batch in → one out, no shuffle.
    """

    def sample_batches(batches):
        import pandas as pd

        from cruncher_spark.functions.codecs import _dib_to_frame, avi_index

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                data = bytes(r.payload)
                idx = avi_index(data)
                w, h = idx["width"], idx["height"]
                for fno in range(0, len(idx["frames"]), every_n):
                    off, size = idx["frames"][fno]
                    frame = _dib_to_frame(data[off : off + size], w, h)
                    rows.append(
                        (r.media_id, fno, w, h, int(frame.sum(dtype="int64")))
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_no", "frame_w", "frame_h", "px_sum"],
            )

    return media.where(F.col("kind") == "video").mapInPandas(
        sample_batches,
        "media_id long, frame_no int, frame_w int, frame_h int, px_sum long",
    )


def resize_image_real(media: DataFrame, factor: int = 2) -> DataFrame:
    """REAL image resize: decode PNG → nearest-neighbor downscale by
    ``factor`` → re-encode, in one Arrow batch loop. Output dimensions
    come from re-decoding the resized payload (round-trip proof).
    Columns: media_id, width, height, payload."""

    def resize_batches(batches):
        import pandas as pd

        from cruncher_spark.functions.codecs import (
            png_decode,
            png_encode,
            resize_nearest,
        )

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = png_decode(bytes(r.payload))
                out = png_encode(
                    resize_nearest(
                        arr, max(arr.shape[1] // factor, 1), max(arr.shape[0] // factor, 1)
                    )
                )
                back = png_decode(out)
                rows.append((r.media_id, back.shape[1], back.shape[0], out))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "payload"]
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        resize_batches, "media_id long, width int, height int, payload binary"
    )


def resize_media(media: DataFrame, max_bytes: int) -> DataFrame:
    """'Resize' = deterministic byte truncation to ``max_bytes`` via
    ``mapInPandas`` (a real resample would decode/scale/re-encode in the
    same batch loop). Truncate-only, no padding, so output sizes stay
    data-dependent (min(orig, max_bytes)) and oracle-checkable."""

    def resize_batches(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": [bytes(b)[:max_bytes] for b in pdf["payload"]],
                    "width": pdf["width"],
                    "height": pdf["height"],
                }
            )

    return media.mapInPandas(resize_batches, RESIZE_SCHEMA)


def frame_sample(
    media: DataFrame, frame_size: int = 256, every_n: int = 4
) -> DataFrame:
    """Sample every Nth fixed-size frame from video payloads — entirely
    JVM-side (``sequence`` + ``transform`` + ``explode``; no Python).
    Output: media_id, frame_no (0-based among sampled), frame (binary),
    frame_bytes."""
    stride = frame_size * every_n
    frames = media.where(F.col("kind") == "video").select(
        "media_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(1), F.octet_length("payload"), F.lit(stride)
                ),
                lambda pos: F.col("payload").substr(pos, F.lit(frame_size)),
            )
        ).alias("frame_no", "frame"),
    )
    return frames.select(
        "media_id",
        "frame_no",
        "frame",
        F.octet_length("frame").alias("frame_bytes"),
    )


MJPEG_SCHEMA = (
    "media_id long, n_frames int, fps int, frame_w int, frame_h int,"
    " within_tol boolean"
)


def mjpeg_roundtrip(media: DataFrame, quality: int = 95, tol: int = 2) -> DataFrame:
    """REAL compressed-video round trip: each video row's analytic frames
    are encoded as a Motion-JPEG AVI — every frame an actual baseline
    JPEG (DCT, quality-scaled quantization, canonical Huffman entropy
    coding — :mod:`cruncher_spark.functions.jpeg`) — then decoded back
    through the container index and the entropy decoder.

    Output per video: container metadata (frame count, fps, frame dims)
    plus ``within_tol`` = the max absolute pixel error of the decoded
    frames vs the source stays within the quantization tolerance. JPEG is
    lossy, so exact pixel sums can't be oracle-predicted; the tolerance
    bound is the decode-correctness witness (a broken bitstream or
    transform blows far past it, or fails to parse at all).
    """

    def batches(it):
        import numpy as np
        import pandas as pd

        from cruncher_spark.functions.codecs import (
            avi_decode,
            avi_encode_mjpeg,
            avi_index,
        )

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                m = int(r.media_id)
                vw = int(r.width) // VIDEO_DIM_DIV
                vh = int(r.height) // VIDEO_DIM_DIV
                n = int(r.n_frames)
                fps = 10 + m % 20
                f = np.arange(n, dtype=np.int64)[:, None, None]
                y = np.arange(vh, dtype=np.int64)[None, :, None]
                x = np.arange(vw, dtype=np.int64)[None, None, :]
                # wrap-FREE smooth gradient (max value 240): the mod-256
                # pattern other gates use has 255->0 cliffs whose DCT
                # ringing exceeds any tight tolerance; lossy-codec
                # correctness is witnessed on band-limited content
                span = max(1, (vw - 1) + (vh - 1) + (n - 1))
                frames = (
                    m % 40 + ((x + y + f) * 200) // span
                ).astype(np.uint8)
                data = avi_encode_mjpeg(frames, fps, quality)
                idx = avi_index(data)
                got_fps, out = avi_decode(data)
                err = int(np.abs(out.astype(int) - frames.astype(int)).max())
                rows.append(
                    (m, idx["n_frames"], got_fps, out.shape[2], out.shape[1],
                     err <= tol)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_frames", "fps", "frame_w", "frame_h",
                    "within_tol",
                ],
            )

    videos = media.where(F.col("kind") == "video").select(
        "media_id", "width", "height", "n_frames"
    )
    return videos.mapInPandas(batches, MJPEG_SCHEMA)
