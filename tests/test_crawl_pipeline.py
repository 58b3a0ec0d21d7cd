"""End-to-end crawl ingestion: WARC segments arriving as micro-batches,
frontier URL dedup (UrlFrontier — replay-stable seen-set over a KEEP-policy
LSM PointTable) in front of the streaming content near-dup filter:

    segment.warc.gz -> warc_documents -> UrlFrontier.filter_fresh -> NearDupIngest

Pins that (a) a refetch of an already-seen canonical URL (tracker-param
variant) never reaches the content filter, (b) a mirrored page at a NEW
URL passes the frontier and is dropped by content dedup against history,
(c) everything else survives, and (d) the frontier's fresh set is
REPLAY-STABLE: a batch that crashed between the frontier merge and the
downstream ingest is NOT lost on replay (the hazard a naive
anti-join-then-merge frontier has — its replayed anti-join drops the
whole batch because its own crashed run already recorded the URLs).
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
    from cruncher_spark.sources.warc import warc_documents
    from cruncher_spark.streaming.frontier import UrlFrontier
    from cruncher_spark.streaming.neardup import NearDupIngest

    frontier = UrlFrontier(spark, str(tmp_path / "urls"))
    ingest = NearDupIngest(spark, str(tmp_path / "state"))

    doc_ids: dict[str, int] = {}  # record url -> doc_id, for assertions
    for i, pages in enumerate(SEGMENTS):
        seg = _segment(tmp_path / f"segment-{i}.warc", pages)
        docs = warc_documents(spark, seg)
        for r in docs.select("url", "doc_id").collect():
            doc_ids[r.url] = r.doc_id
        fresh = frontier.filter_fresh(docs, batch_id=f"crawl-{i}")
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
    # it — no decision row, not retained
    refetch_id = doc_ids["HTTP://b.example:80/page?utm_source=recrawl"]
    assert refetch_id not in decisions
    assert refetch_id not in retained

    # frontier state holds one row per canonical URL, crediting the batch
    # that introduced it (refetch collapsed onto the original's row)
    urls = {
        r.canon_url: (r.first_doc, r.first_batch)
        for r in frontier.seen_urls().collect()
    }
    assert urls["http://b.example/page"] == (
        doc_ids["http://b.example/page"],
        "crawl-0",
    )
    assert len(urls) == 5  # a, b, c, d, mirror


def test_frontier_replay_returns_identical_fresh_set(spark, tmp_path):
    """The hazard this class exists for: crash AFTER the frontier merge,
    BEFORE the downstream ingest — replaying the batch must return the
    SAME fresh set (a naive anti-join frontier returns the empty set and
    silently loses the batch)."""
    from cruncher_spark.sources.warc import warc_documents
    from cruncher_spark.streaming.frontier import UrlFrontier

    frontier = UrlFrontier(spark, str(tmp_path / "urls"))
    seg0 = _segment(tmp_path / "seg0.warc", SEGMENTS[0])
    docs0 = warc_documents(spark, seg0)
    first = {r.doc_id for r in frontier.filter_fresh(docs0, "b-0").collect()}
    assert len(first) == 2
    # state committed; now "crash" and replay the SAME batch id
    replay = {r.doc_id for r in frontier.filter_fresh(docs0, "b-0").collect()}
    assert replay == first  # not empty — the batch is not lost
    assert frontier.seen_urls().count() == 2  # and state did not double

    # a LATER batch refetching one of those URLs is still filtered
    seg1 = _segment(
        tmp_path / "seg1.warc",
        [("rec-a2", "http://a.example/page?utm_source=x", "changed alpha")],
    )
    later = frontier.filter_fresh(warc_documents(spark, seg1), "b-1")
    assert later.count() == 0


def test_frontier_crash_replay_across_lsm_fold(spark, tmp_path):
    """r8 VERDICT #5: pin BOTH documented frontier hazards in one
    crash-replay scenario that spans LSM fold boundaries.

    Equal-sized batches b-0..b-3 commit first, so the seen-set's LSM
    binary-counter compaction folds fire along the way and the replayed
    read sees those batches' ``first_batch`` rows only as FOLD PRODUCTS,
    not the runs that originally recorded them. b-4's fresh set is
    computed and its merge COMMITS, then the process "crashes" before
    the downstream ingest consumes the set (simulated by a brand-new
    UrlFrontier instance on the same state dir). The replay of b-4 must
    (a) return the identical fresh set — replay stability via
    ``first_batch`` (hazard #1), (b) append no new run and record no new
    state rows (batch-id ledger idempotence), and (c) the PRE-crash
    fresh DataFrame must still be consumable after a LATER batch's
    merge+fold garbage-collects the version it was derived from —
    ``localCheckpoint`` materialization (hazard #2)."""
    from cruncher_spark.streaming.frontier import UrlFrontier

    def batch(i: int, extra: list[tuple[int, str]] = ()) -> "DataFrame":
        rows = [
            (i * 10 + j, f"http://site{i}-{j}.example/p", f"text {i} {j}")
            for j in range(3)
        ] + [(doc, url, "refetched text") for doc, url in extra]
        return spark.createDataFrame(
            rows, "doc_id long, url string, text string"
        ).withColumn("canon_url", F.col("url"))

    frontier = UrlFrontier(spark, str(tmp_path / "urls"))
    for i in range(4):
        # each batch also refetches one batch-0 URL — must stay filtered
        # no matter how many folds have rewritten the state layout
        extra = [(900 + i, "http://site0-0.example/p")] if i else []
        fresh = frontier.filter_fresh(batch(i, extra), f"b-{i}")
        assert {r.doc_id for r in fresh.collect()} == {i * 10 + j for j in range(3)}

    state = frontier.state
    runs_before = [d.name for d in state._run_dirs(state._current_version())]
    assert len(runs_before) < 4  # compaction actually folded prior runs

    # b-4 commits, then the process crashes before downstream consume
    fresh4 = frontier.filter_fresh(batch(4), "b-4")
    runs_at_crash = [d.name for d in state._run_dirs(state._current_version())]
    seen_at_crash = frontier.seen_urls().count()

    replayer = UrlFrontier(spark, str(tmp_path / "urls"))  # "new process"
    replay = replayer.filter_fresh(batch(4), "b-4")
    assert {r.doc_id for r in replay.collect()} == {40, 41, 42}  # not lost
    rstate = replayer.state
    assert [
        d.name for d in rstate._run_dirs(rstate._current_version())
    ] == runs_at_crash  # ledger made the re-merge a no-op: no new run
    assert replayer.seen_urls().count() == seen_at_crash  # no double-record

    # hazard #2: a later batch merges and folds (retain_versions=1 GCs
    # the version fresh4's plan referenced) — the pre-crash frame must
    # still be consumable because filter_fresh localCheckpointed it
    replayer.filter_fresh(batch(5, [(905, "http://site4-0.example/p")]), "b-5")
    assert {r.doc_id for r in fresh4.collect()} == {40, 41, 42}


def test_frontier_in_batch_refetch_collapses_deterministically(spark, tmp_path):
    """Two fetches of the same canonical URL inside ONE batch keep exactly
    the lowest-id row, regardless of partitioning."""
    from cruncher_spark.streaming.frontier import UrlFrontier

    rows = [
        (7, "http://x.example/p?utm_source=a", "http://x.example/p", "late"),
        (3, "http://x.example/p", "http://x.example/p", "early"),
        (9, "http://y.example/q", "http://y.example/q", "other"),
        (11, None, None, "quarantined"),  # non-absolute target URI
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, url string, canon_url string, text string"
    ).repartition(8)
    frontier = UrlFrontier(spark, str(tmp_path / "urls"))
    fresh = {r.doc_id: r.text for r in frontier.filter_fresh(docs, "b-0").collect()}
    assert fresh == {3: "early", 9: "other"}
    assert frontier.seen_urls().count() == 2  # NULL canon never recorded


def test_frontier_requires_canon_url(spark, tmp_path):
    from cruncher_spark.streaming.frontier import UrlFrontier

    frontier = UrlFrontier(spark, str(tmp_path / "urls"))
    with pytest.raises(ValueError, match="canon_url"):
        frontier.filter_fresh(spark.range(1), "b-0")
