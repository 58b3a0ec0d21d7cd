"""Multimodal column operators: binary payloads + typed metadata.

A large-scale training-data pipeline stores image/audio/video as opaque
``binary`` columns beside typed metadata, and runs decode / feature
extraction / resize / frame sampling as Arrow-batched Pandas UDFs. This
module implements that plumbing for real — schemas, JVM-side metadata
derivation, ``mapInPandas`` batch shapes, frame explosion — while the
codec step itself is stubbed (no image/audio libraries in this
container): ``real_decode=True`` raises ``NotImplementedError`` at the
exact call site a PIL/libav decode would occupy, and the default path
computes *deterministic fake features* (md5 fingerprint, byte counts)
that an oracle can verify end-to-end.

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


def attach_media(docs: DataFrame) -> DataFrame:
    """documents → media table: payload = utf-8 bytes of ``text`` (the
    deterministic stand-in for real image/audio bytes), plus typed
    metadata derived JVM-side. Columns: media_id, kind, payload, fmt,
    width, height, sample_rate, n_frames."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    fmt_map = F.create_map(
        *[x for k, v in FORMATS.items() for x in (F.lit(k), F.lit(v))]
    )
    payload = F.encode(F.col("text"), "utf-8")
    nbytes = F.octet_length(payload)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.element_at(fmt_map, kind).alias("fmt"),
        (F.lit(16) + (F.col("doc_id") % 24) * 16).cast("int").alias("width"),
        (F.lit(16) + (F.col("doc_id") % 18) * 16).cast("int").alias("height"),
        F.when(kind == "audio", F.lit(8000) + (F.col("doc_id") % 5) * 4000)
        .cast("int")
        .alias("sample_rate"),
        F.when(kind == "video", F.floor(nbytes / 256) + 1)
        .cast("int")
        .alias("n_frames"),
    )


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
