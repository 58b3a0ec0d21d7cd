"""End-to-end crawl ingestion: WARC segments arriving as micro-batches,
frontier URL dedup (canonical-URL PointTable, KEEP policy) in front of
the streaming content near-dup filter — the composition a continuous
crawl pipeline actually runs:

    segment.warc.gz -> warc_documents -> canon_url frontier -> NearDupIngest

Pins that (a) a refetch of an already-seen canonical URL (tracker-param
variant) never reaches the content filter, (b) a mirrored page at a NEW
URL passes the frontier and is dropped by content dedup against history,
(c) everything else survives with its text extracted.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from test_warc import _http, _record


def _page(body_text: str) -> bytes:
    return (
        f"<html><body><p>{body_text}</p></body></html>"
    ).encode()


def _segment(path, pages: list[tuple[str, str, str]]) -> str:
    """pages = [(record_id, url, body_text)] -> one .warc file."""
    blob = b"".join(
        _record("response", _http(200, "text/html", _page(text)), uri=url, rid=rid)
        for rid, url, text in pages
    )
    path.write_bytes(blob)
    return str(path)


SEGMENTS = [
    # segment 0: two fresh pages
    [
        ("rec-a", "http://a.example/page", "alpha original content here today"),
        ("rec-b", "http://b.example/page", "beta original content here today"),
    ],
    # segment 1: page A mirrored at a NEW canonical URL (content dedup must
    # drop it) + one fresh page
    [
        ("rec-a-mirror", "http://mirror.example/a", "alpha original content here today"),
        ("rec-c", "http://c.example/page", "gamma original content here today"),
    ],
    # segment 2: refetch of page B under tracker params (SAME canonical URL
    # -> frontier drops it before the content filter ever sees it; its text
    # differs so a frontier miss would wrongly retain it) + one fresh page
    [
        (
            "rec-b-refetch",
            "HTTP://b.example:80/page?utm_source=recrawl",
            "beta content CHANGED by the refetch",
        ),
        ("rec-d", "http://d.example/page", "delta original content here today"),
    ],
]


def test_crawl_frontier_plus_content_dedup(spark, tmp_path):
    from cruncher_spark.merge.upsert import MergePolicy, PointTable
    from cruncher_spark.sources.warc import warc_documents
    from cruncher_spark.streaming.neardup import NearDupIngest

    url_state = PointTable(
        spark,
        str(tmp_path / "urls"),
        key=["canon_url"],
        policies={"first_doc": MergePolicy.KEEP},
        mode="lsm",
    )
    ingest = NearDupIngest(spark, str(tmp_path / "state"))

    doc_ids: dict[str, int] = {}  # record url -> doc_id, for assertions
    seen_any = False
    for i, pages in enumerate(SEGMENTS):
        seg = _segment(tmp_path / f"segment-{i}.warc", pages)
        docs = warc_documents(spark, seg).where(F.col("canon_url").isNotNull())
        for r in docs.select("url", "doc_id").collect():
            doc_ids[r.url] = r.doc_id
        if seen_any:
            seen = url_state.read().select("canon_url")
            # materialize BEFORE the frontier merge below: the anti-join
            # reads the frontier's current version lazily, and the merge's
            # LSM compaction garbage-collects that version's files (the
            # read() docstring caveat — this test hit FAILED_READ_FILE
            # without the checkpoint)
            fresh = docs.join(seen, "canon_url", "left_anti").localCheckpoint()
        else:
            fresh = docs
        url_state.merge(
            fresh.select("canon_url", F.col("doc_id").alias("first_doc")),
            batch_id=f"urls-{i}",
        )
        seen_any = True
        ingest.process_batch(fresh.select("doc_id", "text"), batch_id=i)

    retained = {r.doc_id for r in ingest.retained().select("doc_id").collect()}
    expect_kept = {
        doc_ids["http://a.example/page"],
        doc_ids["http://b.example/page"],
        doc_ids["http://c.example/page"],
        doc_ids["http://d.example/page"],
    }
    assert retained == expect_kept

    # the mirror was dropped by CONTENT dedup against history, crediting A
    decisions = {
        r.doc_id: (r.dup_of, r.via) for r in ingest.decisions().collect()
    }
    mirror_id = doc_ids["http://mirror.example/a"]
    assert decisions[mirror_id] == (
        doc_ids["http://a.example/page"],
        "history",
    )

    # the refetch was dropped by the FRONTIER: the content filter never saw
    # it — no decision row, not retained, and its changed text is nowhere
    # (retained() holds signatures, not text — identity checks only)
    refetch_id = doc_ids["HTTP://b.example:80/page?utm_source=recrawl"]
    assert refetch_id not in decisions
    assert refetch_id not in retained

    # frontier state holds one row per canonical URL (refetch collapsed
    # onto the original's row by the KEEP policy)
    urls = {
        r.canon_url: r.first_doc for r in url_state.read().collect()
    }
    assert urls["http://b.example/page"] == doc_ids["http://b.example/page"]
    assert len(urls) == 5  # a, b, c, d, mirror


def test_crawl_frontier_replay_is_idempotent(spark, tmp_path):
    """Re-processing a segment with the same batch ids (crash-replay) must
    change neither the frontier nor the retained set — both state stores
    sit behind the batch-id ledger."""
    from cruncher_spark.merge.upsert import MergePolicy, PointTable
    from cruncher_spark.sources.warc import warc_documents
    from cruncher_spark.streaming.neardup import NearDupIngest

    url_state = PointTable(
        spark,
        str(tmp_path / "urls"),
        key=["canon_url"],
        policies={"first_doc": MergePolicy.KEEP},
        mode="lsm",
    )
    ingest = NearDupIngest(spark, str(tmp_path / "state"))
    seg = _segment(tmp_path / "seg.warc", SEGMENTS[0])
    docs = warc_documents(spark, seg).where(F.col("canon_url").isNotNull())

    for _ in range(2):  # second pass = replay after a crash
        url_state.merge(
            docs.select("canon_url", F.col("doc_id").alias("first_doc")),
            batch_id="urls-0",
        )
        ingest.process_batch(docs.select("doc_id", "text"), batch_id=0)

    assert url_state.read().count() == 2
    assert ingest.retained().count() == 2
