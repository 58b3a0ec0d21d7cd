"""Registry entries for the multimodal column operators.

Payloads are synthesized deterministically from ``documents.text``
(utf-8 bytes), so DuckDB can verify the full pipeline — including the
mapInPandas fake-decode features — with plain SQL over the same view
(``md5(text)`` == md5 of the payload bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cruncher_spark.operators.multimodal import (
    attach_media,
    decode_features,
    decode_features_real,
    frame_sample,
    frame_sample_real,
    resize_image_real,
    resize_media,
)
from cruncher_spark.plans.registry import register
from cruncher_spark.sources.tables import Star, fan_out

#: doc_id % 3 → kind, mirrored in SQL
KIND_CASE = (
    "CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'"
    " ELSE 'video' END"
)


@register(
    "multimodal_metadata",
    f"""
    SELECT
        {KIND_CASE} AS kind,
        COUNT(*) AS n,
        CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        CAST(MAX(16 + (doc_id % 24) * 16) AS INT) AS max_width,
        CAST(
            SUM(
                CASE WHEN doc_id % 3 = 2
                     THEN FLOOR(octet_length(encode(text)) / 256) + 1
                END
            ) AS BIGINT
        ) AS frames_total
    FROM documents
    GROUP BY 1
    """,
    doc="binary media columns with typed metadata, derived JVM-side "
    "(no UDF): per-kind byte and frame accounting",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_media(Star(spark, sf_dir).documents)
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.max("width").alias("max_width"),
        F.sum("n_frames").alias("frames_total"),
    )


@register(
    "multimodal_decode",
    f"""
    SELECT
        doc_id AS media_id,
        {KIND_CASE} AS kind,
        md5(text) AS f_hash,
        CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes
    FROM documents
    """,
    doc="mapInPandas decode/feature-extract (Arrow batches); codec step "
    "stubbed behind real_decode=True NotImplementedError, deterministic "
    "md5 fingerprint features verified end-to-end",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no fan_out: the per-row Python work (one md5) is lighter than the
    # round-robin exchange it would buy (measured 0.51 -> 0.64 s)
    media = attach_media(Star(spark, sf_dir).documents)
    return decode_features(media).select(
        "media_id", "kind", "f_hash", "size_bytes"
    )


def _diag_px_sum(c: str, w: str, h: str) -> str:
    """DuckDB SQL for the exact pixel sum of a ``(c + x + y) % 256``
    gradient over a w×h raster, via the diagonal closed form: x+y=d has
    ``min(d, w-1, h-1, w+h-2-d)+1`` cells, so the double sum collapses
    to O(w+h) list elements instead of O(w·h)."""
    return (
        f"list_sum(list_transform(range(0, ({w}) + ({h}) - 1), "
        f"d -> (LEAST(d, ({w}) - 1, ({h}) - 1, ({w}) + ({h}) - 2 - d) + 1)"
        f" * ((({c}) + d) % 256)))"
    )


#: real-video metadata formulas, shared by the decode + frame gates
_VW = "2 + (doc_id % 24) * 2"
_VH = "2 + (doc_id % 18) * 2"
_NFRAMES = "FLOOR(octet_length(encode(text)) / 256) + 1"


@register(
    "multimodal_decode_real",
    f"""
    SELECT
        doc_id AS media_id,
        {KIND_CASE} AS kind,
        CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + (doc_id % 24) * 16
                  WHEN doc_id % 3 = 2 THEN {_VW} END AS INT) AS width,
        CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + (doc_id % 18) * 16
                  WHEN doc_id % 3 = 2 THEN {_VH} END AS INT) AS height,
        CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 5) * 4000 END AS INT) AS sample_rate,
        CAST(CASE WHEN doc_id % 3 = 1 THEN n_chars END AS BIGINT) AS n_samples,
        CAST(CASE WHEN doc_id % 3 = 2 THEN {_NFRAMES} END AS INT) AS n_frames,
        CAST(CASE WHEN doc_id % 3 = 2 THEN 10 + doc_id % 20 END AS INT) AS fps,
        CAST(CASE
            WHEN doc_id % 3 = 0
            THEN {_diag_px_sum("doc_id", "16 + (doc_id % 24) * 16", "16 + (doc_id % 18) * 16")}
            WHEN doc_id % 3 = 2
            THEN list_sum(list_transform(range(0, CAST({_NFRAMES} AS BIGINT)),
                 f -> {_diag_px_sum("doc_id + 7 * f", _VW, _VH)}))
        END AS BIGINT) AS px_sum
    FROM documents
    """,
    doc="REAL codec round-trip for ALL THREE kinds: Spark encodes valid "
    "PNG/WAV/AVI payloads then decodes them back (pure-stdlib codecs, "
    "mapInPandas); the oracle predicts the decoded dimensions/rates/"
    "frame counts/fps AND the exact integer pixel sums analytically from "
    "the generation formulas — matching values prove the actual bytes "
    "round-trip through the real containers.",
)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_media(fan_out(Star(spark, sf_dir).documents), real_payloads=True)
    return decode_features_real(media).select(
        "media_id", "kind", "width", "height", "sample_rate", "n_samples",
        "n_frames", "fps", "px_sum",
    )


@register(
    "multimodal_frames_real",
    f"""
    WITH v AS (
        SELECT doc_id,
            CAST({_VW} AS INT) AS vw,
            CAST({_VH} AS INT) AS vh,
            unnest(range(0, CAST({_NFRAMES} AS BIGINT), 2)) AS fno
        FROM documents
        WHERE doc_id % 3 = 2
    )
    SELECT doc_id AS media_id,
        CAST(fno AS INT) AS frame_no,
        vw AS frame_w,
        vh AS frame_h,
        CAST({_diag_px_sum("doc_id + 7 * fno", "vw", "vh")} AS BIGINT) AS px_sum
    FROM v
    """,
    doc="REAL container-index frame sampling: read the AVI idx1 index, "
    "slice every-2nd frame's bytes by (offset, size), decode only those "
    "frames. The oracle reproduces each sampled frame's exact pixel sum "
    "analytically — proving the index points at the right bytes and the "
    "DIB decode is correct, per frame.",
)
def multimodal_frames_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_media(fan_out(Star(spark, sf_dir).documents), real_payloads=True)
    return frame_sample_real(media, every_n=2)


@register(
    "multimodal_resize_real",
    """
    SELECT
        doc_id AS media_id,
        CAST((16 + (doc_id % 24) * 16) / 2 AS INT) AS width,
        CAST((16 + (doc_id % 18) * 16) / 2 AS INT) AS height
    FROM documents
    WHERE doc_id % 3 = 0
    """,
    doc="REAL image resize: decode PNG, nearest-neighbor downscale 2x, "
    "re-encode; output dims come from re-decoding the resized payload.",
)
def multimodal_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_media(fan_out(Star(spark, sf_dir).documents), real_payloads=True)
    return resize_image_real(media, factor=2).select(
        "media_id", "width", "height"
    )


@register(
    "multimodal_resize",
    """
    SELECT
        doc_id AS media_id,
        CAST(LEAST(octet_length(encode(text)), 1024) AS INT) AS resized_bytes
    FROM documents
    """,
    doc="mapInPandas resize (deterministic byte truncation standing in "
    "for decode-scale-reencode in the same Arrow batch loop)",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no fan_out: byte truncation is cheaper than the exchange (0.47 -> 0.64 s)
    media = attach_media(Star(spark, sf_dir).documents)
    return resize_media(media, max_bytes=1024).select(
        "media_id", F.octet_length("payload").cast("int").alias("resized_bytes")
    )


@register(
    "multimodal_frame_sample",
    """
    WITH positions AS (
        SELECT
            doc_id,
            octet_length(encode(text)) AS nbytes,
            unnest(range(1, octet_length(encode(text)) + 1, 1024)) AS g
        FROM documents
        WHERE doc_id % 3 = 2
    )
    SELECT
        doc_id AS media_id,
        CAST(COUNT(*) AS INT) AS n_frames_sampled,
        CAST(SUM(LEAST(256, nbytes - g + 1)) AS BIGINT) AS sampled_bytes
    FROM positions
    GROUP BY doc_id
    """,
    doc="every-Nth fixed-size frame sampling, fully JVM-side "
    "(sequence + transform + posexplode on binary; no Python)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_media(Star(spark, sf_dir).documents)
    frames = frame_sample(media, frame_size=256, every_n=4)
    return frames.groupBy("media_id").agg(
        F.count("*").cast("int").alias("n_frames_sampled"),
        F.sum("frame_bytes").alias("sampled_bytes"),
    )


@register(
    "multimodal_mjpeg_real",
    f"""
    SELECT doc_id AS media_id,
        CAST({_NFRAMES} AS INT) AS n_frames,
        CAST(10 + doc_id % 20 AS INT) AS fps,
        CAST({_VW} AS INT) AS frame_w,
        CAST({_VH} AS INT) AS frame_h,
        TRUE AS within_tol
    FROM documents
    WHERE doc_id % 3 = 2
    """,
    doc="REAL compressed video: every frame of each video row is encoded "
    "as an actual baseline JPEG (DCT + quality-scaled quantization + "
    "canonical Huffman entropy coding, functions/jpeg.py) inside a "
    "Motion-JPEG AVI, then decoded back via the container index and the "
    "entropy decoder. The oracle predicts the container metadata "
    "analytically and the decoded pixels must stay within the "
    "quantization tolerance of the source — a broken bitstream, "
    "transform, or index blows past it or fails to parse. This closes "
    "the last codec stub: intra-only compressed video is real; "
    "inter-frame codecs (H.264) remain out of scope.",
)
def multimodal_mjpeg_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cruncher_spark.operators.multimodal import mjpeg_roundtrip

    media = attach_media(fan_out(Star(spark, sf_dir).documents))
    return mjpeg_roundtrip(media)


#: shared oracle tail for the perceptual-hash gates: exact-dup groups
#: over a `bits(media_id, dhash)` CTE + banded Hamming neighbor counts
#: (8 chunks x 7 bits, pigeonhole-complete through Hamming 7) — the SQL
#: mirror of operators/imagehash.py dhash_dedup_groups
_DHASH_GROUP_TAIL = """
    g AS (
      SELECT dhash, min(media_id) AS rep, count(*) AS n_members
      FROM bits GROUP BY 1
    ),
    band AS (
      SELECT dhash, b.range AS band_idx,
        (dhash >> (b.range * 7)) & 127 AS chunk
      FROM g, range(8) b
    ),
    pair AS (
      SELECT DISTINCT a.dhash AS ha, c.dhash AS hb
      FROM band a JOIN band c
        ON a.band_idx = c.band_idx AND a.chunk = c.chunk
      WHERE a.dhash <> c.dhash
        AND bit_count(xor(a.dhash, c.dhash)) <= 7
    ),
    near AS (SELECT ha, count(*) AS n_neighbors FROM pair GROUP BY 1)
    SELECT g.rep, g.n_members,
      coalesce(near.n_neighbors, 0) AS n_neighbors, g.dhash
    FROM g LEFT JOIN near ON near.ha = g.dhash
"""


@register(
    "image_dhash_dedup",
    """
    WITH img AS (
      SELECT doc_id AS media_id,
        16 + (doc_id % 24) * 16 AS w,
        16 + (doc_id % 18) * 16 AS h
      FROM documents WHERE doc_id % 3 = 0
    ),
    cell AS (
      SELECT media_id, gy.range AS gy, gx.range AS gx,
        (media_id + ((gx.range * w) // 9) + ((gy.range * h) // 7)) % 256
          AS pa,
        (media_id + (((gx.range + 1) * w) // 9) + ((gy.range * h) // 7))
          % 256 AS pb
      FROM img, range(7) gy, range(8) gx
    ),
    bits AS (
      SELECT media_id,
        CAST(SUM(CASE WHEN pb > pa
                      THEN CAST(1 AS BIGINT) << (gy * 8 + gx)
                      ELSE 0 END) AS BIGINT) AS dhash
      FROM cell GROUP BY 1
    ),
    """
    + _DHASH_GROUP_TAIL,
    doc="Perceptual image dedup over REAL PNG payloads: a 56-bit "
    "integer-exact difference hash per image (one zero-shuffle "
    "mapInPandas decode+hash pass — the codec is the only Python "
    "boundary), identical images collapsed first on the hash "
    "(map-side combined), then SimHash-style banded Hamming "
    "neighbors between DISTINCT hashes (8 chunks x 7 bits — "
    "pigeonhole-complete through Hamming 7, verified by exact "
    "bit_count(xor)). The oracle re-derives every hash in plain SQL "
    "from the fixtures' analytic pixel formula WITHOUT the PNG codec, "
    "so the whole pipeline — encoder, decoder, grid sampling, "
    "banding, verification — is checked end to end. dHash over a "
    "float DCT pHash is deliberate: integer comparisons make the "
    "hash bit-identical across engines; a DCT hash would hinge "
    "cross-engine equality on last-bit float rounding.",
)
def image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cruncher_spark.operators.imagehash import (
        dhash_dedup_groups,
        dhash_images,
    )

    docs = fan_out(Star(spark, sf_dir).documents.where(F.col("doc_id") % 3 == 0))
    media = attach_media(docs, real_payloads=True)
    return dhash_dedup_groups(dhash_images(media))


@register(
    "audio_fingerprint_dedup",
    """
    WITH aud AS (
      SELECT doc_id AS media_id, n_chars AS n,
        greatest(1, n_chars // 57) AS w
      FROM documents WHERE doc_id % 3 = 1
    ),
    samp AS (
      SELECT media_id, n, w, unnest(range(n)) AS i FROM aud
    ),
    fe AS (
      SELECT media_id, i // w AS f,
        CAST(SUM(CAST((media_id * 31 + i * 7) % 65536 - 32768 AS BIGINT)
                 * CAST((media_id * 31 + i * 7) % 65536 - 32768 AS BIGINT))
             AS BIGINT) AS e
      FROM samp WHERE i < (n // w) * w
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT media_id, count(*) AS nf, CAST(SUM(e) AS BIGINT) AS te
      FROM fe GROUP BY 1
    ),
    bits AS (
      SELECT fe.media_id,
        CAST(SUM(CASE WHEN fe.e * t.nf > t.te AND f <= 55
                      THEN CAST(1 AS BIGINT) << f ELSE 0 END)
             AS BIGINT) AS dhash
      FROM fe JOIN tot t ON fe.media_id = t.media_id GROUP BY 1
    ),
    """
    + _DHASH_GROUP_TAIL,
    doc="Perceptual audio dedup over REAL WAV payloads: a 56-bit "
    "loudness-profile fingerprint per clip (bit f set iff frame f is "
    "louder than the clip mean, compared by exact integer "
    "cross-multiplication — aHash for audio; energy-DELTA signs would "
    "be constant on these monotonically decaying clips), frame width "
    "max(1, n//57) so every clip with >= 57 samples fills all 56 "
    "bits, then the SAME exact-group + banded Hamming tail as "
    "image_dhash_dedup — one dedup machinery, two modalities. One "
    "zero-shuffle mapInPandas decode+hash pass; the oracle re-derives "
    "every fingerprint in plain SQL from the fixtures' analytic "
    "sample formula without the WAV codec, checking encoder, decoder, "
    "framing, and banding end to end.",
)
def audio_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cruncher_spark.operators.imagehash import (
        audio_fingerprints,
        dhash_dedup_groups,
    )

    docs = fan_out(Star(spark, sf_dir).documents.where(F.col("doc_id") % 3 == 1))
    media = attach_media(docs, real_payloads=True)
    return dhash_dedup_groups(audio_fingerprints(media))


@register(
    "video_frame_dedup",
    f"""
    WITH vid AS (
      SELECT doc_id AS media_id,
        CAST({_VW} AS BIGINT) AS w,
        CAST({_VH} AS BIGINT) AS h,
        CAST({_NFRAMES} AS BIGINT) AS nframes
      FROM documents WHERE doc_id % 3 = 2
    ),
    fr AS (
      SELECT media_id, w, h, unnest(range(nframes)) AS fno FROM vid
    ),
    cell AS (
      SELECT media_id, fno, gy.range AS gy, gx.range AS gx,
        (media_id + 7 * fno + ((gx.range * w) // 9)
         + ((gy.range * h) // 7)) % 256 AS pa,
        (media_id + 7 * fno + (((gx.range + 1) * w) // 9)
         + ((gy.range * h) // 7)) % 256 AS pb
      FROM fr, range(7) gy, range(8) gx
    ),
    fbits AS (
      SELECT media_id, fno,
        CAST(SUM(CASE WHEN pb > pa
                      THEN CAST(1 AS BIGINT) << (gy * 8 + gx)
                      ELSE 0 END) AS BIGINT) AS fh
      FROM cell GROUP BY 1, 2
    ),
    vf AS (SELECT DISTINCT media_id, fh FROM fbits),
    hot AS (SELECT fh FROM vf GROUP BY fh HAVING count(*) > 1000),
    jf AS (SELECT vf.* FROM vf ANTI JOIN hot USING (fh)),
    ov AS (
      SELECT a.media_id, count(DISTINCT b.media_id) AS n_overlapping
      FROM jf a JOIN jf b ON a.fh = b.fh AND a.media_id <> b.media_id
      GROUP BY 1
    )
    SELECT v.media_id, v.nframes AS n_frames,
      d.nd AS n_distinct_hashes,
      coalesce(ov.n_overlapping, 0) AS n_overlapping_videos
    FROM vid v
    JOIN (SELECT media_id, count(*) AS nd FROM vf GROUP BY 1) d
      USING (media_id)
    LEFT JOIN ov USING (media_id)
    """,
    doc="Frame-level video dedup over REAL AVI payloads, completing "
    "the perceptual trio (image dHash, audio loudness profile, video "
    "frames): every frame of every video is decoded via the container "
    "index and hashed with the SAME integer-exact dHash grid as still "
    "images (cross-modal reuse collides by construction), then "
    "shared-footage detection is an equi-join on the distinct "
    "(video, frame-hash) table — the containment skeleton of video "
    "dedup; videos sharing any exact frame hash are re-encodes or "
    "clips of common footage. A hash shared by more than df_cap=1000 "
    "videos is boilerplate (a viral logo frame shared by a million "
    "videos would cost 10^12 pairs) and is capped out of the overlap "
    "count — the posting-list df-cap pattern of "
    "dedup_substring_fingerprint. One zero-shuffle decode+hash pass, "
    "hash-keyed join, per-video aggregates. The oracle re-derives "
    "every frame hash in plain SQL from the analytic frame formula "
    "without the AVI codec and mirrors the cap.",
)
def video_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cruncher_spark.operators.imagehash import (
        video_frame_hashes,
        video_overlap_report,
    )

    docs = fan_out(Star(spark, sf_dir).documents.where(F.col("doc_id") % 3 == 2))
    media = attach_media(docs, real_payloads=True)
    return video_overlap_report(video_frame_hashes(media))


@register(
    "cross_modal_reuse",
    f"""
    WITH img AS (
      SELECT doc_id AS media_id,
        16 + (doc_id % 24) * 16 AS w,
        16 + (doc_id % 18) * 16 AS h
      FROM documents WHERE doc_id % 3 = 0
    ),
    icell AS (
      SELECT media_id, gy.range AS gy, gx.range AS gx,
        (media_id + ((gx.range * w) // 9) + ((gy.range * h) // 7)) % 256
          AS pa,
        (media_id + (((gx.range + 1) * w) // 9) + ((gy.range * h) // 7))
          % 256 AS pb
      FROM img, range(7) gy, range(8) gx
    ),
    ibits AS (
      SELECT media_id,
        CAST(SUM(CASE WHEN pb > pa
                      THEN CAST(1 AS BIGINT) << (gy * 8 + gx)
                      ELSE 0 END) AS BIGINT) AS dhash
      FROM icell GROUP BY 1
    ),
    vid AS (
      SELECT doc_id AS media_id,
        CAST({_VW} AS BIGINT) AS w,
        CAST({_VH} AS BIGINT) AS h,
        CAST({_NFRAMES} AS BIGINT) AS nframes
      FROM documents WHERE doc_id % 3 = 2
    ),
    fr AS (
      SELECT media_id, w, h, unnest(range(nframes)) AS fno FROM vid
    ),
    vcell AS (
      SELECT media_id, fno, gy.range AS gy, gx.range AS gx,
        (media_id + 7 * fno + ((gx.range * w) // 9)
         + ((gy.range * h) // 7)) % 256 AS pa,
        (media_id + 7 * fno + (((gx.range + 1) * w) // 9)
         + ((gy.range * h) // 7)) % 256 AS pb
      FROM fr, range(7) gy, range(8) gx
    ),
    fbits AS (
      SELECT media_id, fno,
        CAST(SUM(CASE WHEN pb > pa
                      THEN CAST(1 AS BIGINT) << (gy * 8 + gx)
                      ELSE 0 END) AS BIGINT) AS fh
      FROM vcell GROUP BY 1, 2
    ),
    ig AS (
      SELECT dhash, count(*) AS n_images, min(media_id) AS img_rep
      FROM ibits GROUP BY 1
    ),
    vg AS (
      SELECT fh AS dhash, count(*) AS n_videos, min(media_id) AS vid_rep
      FROM (SELECT DISTINCT media_id, fh FROM fbits) GROUP BY 1
    )
    SELECT ig.dhash, ig.n_images, ig.img_rep, vg.n_videos, vg.vid_rep
    FROM ig JOIN vg USING (dhash)
    """,
    doc="Cross-modal reuse detection — stills that appear as video "
    "frames: both modalities hash with the SAME integer-exact dHash "
    "grid (a deliberate property of the perceptual suite), so "
    "detection is a GROUP-LEVEL equi-join of the two distinct-hash "
    "tables (hash-keyed counts + min-id representative, map-side "
    "combined), one output row per shared hash value. No pair "
    "expansion ever happens — a hash shared by 10^6 images and 10^6 "
    "videos costs two aggregate rows and one joined row — so unlike "
    "video_frame_dedup this needs no df-cap. Two zero-shuffle "
    "decode+hash passes, two bounded aggregates, one hash join; the "
    "oracle re-derives every hash on both sides in plain SQL from "
    "the analytic payload formulas without either codec.",
)
def cross_modal_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cruncher_spark.operators.imagehash import (
        cross_modal_matches,
        dhash_images,
        video_frame_hashes,
    )

    docs = Star(spark, sf_dir).documents
    images = attach_media(
        fan_out(docs.where(F.col("doc_id") % 3 == 0)), real_payloads=True
    )
    videos = attach_media(
        fan_out(docs.where(F.col("doc_id") % 3 == 2)), real_payloads=True
    )
    return cross_modal_matches(
        dhash_images(images), video_frame_hashes(videos)
    )
