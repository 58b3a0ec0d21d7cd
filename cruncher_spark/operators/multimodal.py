"""Multimodal column operators: binary payloads + typed metadata.

A large-scale training-data pipeline stores image/audio/video as opaque
``binary`` columns beside typed metadata, and runs decode / feature
extraction / resize / frame sampling as Arrow-batched Pandas UDFs. This
module implements that plumbing — schemas, JVM-side metadata derivation,
``mapInPandas`` batch shapes, frame explosion — with TWO codec tiers:

- REAL codecs for images and audio via the pure-stdlib PNG/WAV
  implementations in :mod:`cruncher_spark.functions.codecs`:
  ``attach_media(real_payloads=True)`` emits valid PNG/WAV bytes,
  :func:`decode_features_real` actually parses them back (dimensions,
  sample rate, sample counts, pixel stats) and
  :func:`resize_image_real` decodes → nearest-neighbor rescales →
  re-encodes inside the same Arrow batch loop.
- video stays honestly stubbed (inter-frame codecs genuinely require
  libav; ``real_decode=True`` on the fake path raises at the exact call
  site), and the original deterministic fake-feature path remains the
  default so the DuckDB oracle can verify the plumbing with plain SQL.

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
FORMATS = {"image": "png", "audio": "wav", "video": "mp4"}

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
    stand-in). ``real_payloads=True`` replaces image/audio payloads with
    VALID PNG/WAV bytes generated deterministically from the row's own
    metadata (gradient pixels ``(media_id+x+y) % 256``; int16 samples
    ``((media_id*31 + i*7) % 65536) - 32768`` at the row's sample_rate),
    via the same Arrow batch loop real ingestion would use.
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

        from cruncher_spark.functions.codecs import png_encode, wav_encode

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
                else:  # video: no stdlib codec — synthetic bytes stay
                    payloads.append(bytes(r.payload))
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
                    "real image/audio/video decoding requires codec "
                    "libraries (PIL/soundfile/av) not present in this "
                    "environment; the deterministic fake path exercises "
                    "the identical Spark plumbing"
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
    " sample_rate int, n_samples long, mean_value double"
)


def decode_features_real(media: DataFrame) -> DataFrame:
    """REAL decode via the stdlib codecs: parse actual PNG/WAV payload
    bytes back into dimensions / sample rate / counts / content stats.

    Image rows report (width, height) from the decoded pixel array and
    mean_value = mean pixel; audio rows report (sample_rate, n_samples)
    from the WAV header/frames and mean_value = mean |sample|. Video is
    excluded (no stdlib codec — see module doc). Run on
    ``attach_media(real_payloads=True)`` output, or any table whose
    payloads are real PNG/WAV bytes.
    """

    def decode_batches(batches):
        import numpy as np
        import pandas as pd

        from cruncher_spark.functions.codecs import png_decode, wav_decode

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind == "image":
                    arr = png_decode(bytes(r.payload))
                    rows.append(
                        (r.media_id, r.kind, arr.shape[1], arr.shape[0],
                         None, None, float(arr.mean()))
                    )
                elif r.kind == "audio":
                    rate, samples = wav_decode(bytes(r.payload))
                    rows.append(
                        (r.media_id, r.kind, None, None, rate,
                         len(samples), float(np.abs(samples).mean()))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "width", "height",
                    "sample_rate", "n_samples", "mean_value",
                ],
            )

    return media.where(F.col("kind") != "video").mapInPandas(
        decode_batches, REAL_DECODE_SCHEMA
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
