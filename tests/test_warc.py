"""WARC crawl-source reader: wire-format parse, gzip members, HTTP
extraction, malformed-record quarantine, and the crawl→curation bridge.

The fixture WARCs are built byte-by-byte here (the format is framing +
Content-Length, ISO 28500), including the per-record-gzip layout
Common Crawl publishes, so the reader's claims are pinned against the
actual wire format rather than a library's re-serialization.
"""

from __future__ import annotations

import gzip

import pytest


def _record(wtype: str, body: bytes, uri: str | None = None, rid: str = "id-0") -> bytes:
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + wtype.encode(),
        b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
        b"WARC-Date: 2024-01-01T00:00:00Z",
    ]
    if uri:
        headers.append(b"WARC-Target-URI: " + uri.encode())
    if wtype in ("response", "request"):
        headers.append(b"Content-Type: application/http; msgtype=" + wtype.encode())
    else:
        headers.append(b"Content-Type: application/warc-fields")
    headers.append(b"Content-Length: " + str(len(body)).encode())
    return b"\r\n".join(headers) + b"\r\n\r\n" + body + b"\r\n\r\n"


def _http(status: int, ctype: str, payload: bytes) -> bytes:
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode() + payload


_HTML = (
    b"<html><head><style>p {color: red}</style>"
    b"<script>var x = '<p>no</p>';</script></head>"
    b"<body><h1>Hello &amp; welcome</h1>\n<p>crawled   text</p></body></html>"
)


def _warc_bytes() -> bytes:
    return b"".join(
        [
            _record("warcinfo", b"software: test\r\n", rid="info"),
            _record(
                "request",
                b"GET / HTTP/1.1\r\nHost: a.example\r\n\r\n",
                uri="http://a.example/",
                rid="req-1",
            ),
            _record(
                "response",
                _http(200, "text/html; charset=utf-8", _HTML),
                uri="http://a.example/",
                rid="resp-1",
            ),
            _record(
                "response",
                _http(404, "text/html", b"<html>gone</html>"),
                uri="http://a.example/missing",
                rid="resp-2",
            ),
            _record(
                "response",
                _http(200, "text/html", _HTML),  # exact dup of resp-1 body
                uri="http://mirror.example/",
                rid="resp-3",
            ),
        ]
    )


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    (d / "seg-00000.warc").write_bytes(_warc_bytes())
    # Common Crawl layout: EVERY record its own gzip member, concatenated
    members = b"".join(
        gzip.compress(_record("response", _http(200, "text/html", _HTML),
                              uri=f"http://gz.example/{i}", rid=f"gz-{i}"))
        for i in range(3)
    )
    (d / "seg-00001.warc.gz").write_bytes(members)
    return d


def test_read_warc_parses_records_and_http(spark, warc_dir):
    from cruncher_spark.sources.warc import read_warc

    rows = {
        r.record_id: r
        for r in read_warc(spark, str(warc_dir / "seg-00000.warc")).collect()
    }
    # types=("response",) default: warcinfo/request filtered out
    assert set(rows) == {
        "<urn:uuid:resp-1>", "<urn:uuid:resp-2>", "<urn:uuid:resp-3>"
    }
    r1 = rows["<urn:uuid:resp-1>"]
    assert r1.http_status == 200
    assert r1.http_content_type.startswith("text/html")
    assert bytes(r1.payload) == _HTML
    assert r1.target_uri == "http://a.example/"
    assert rows["<urn:uuid:resp-2>"].http_status == 404

    everything = read_warc(
        spark, str(warc_dir / "seg-00000.warc"), types=None
    ).collect()
    assert {r.warc_type for r in everything} == {
        "warcinfo", "request", "response"
    }
    assert all(r.parse_error is None for r in everything)


def test_read_warc_multi_member_gzip(spark, warc_dir):
    """Per-record gzip members (the Common Crawl layout): a plain
    single-member gunzip would see only the first record."""
    from cruncher_spark.sources.warc import read_warc

    rows = read_warc(spark, str(warc_dir / "seg-00001.warc.gz")).collect()
    assert len(rows) == 3
    assert {r.target_uri for r in rows} == {
        f"http://gz.example/{i}" for i in range(3)
    }


def test_read_warc_glob_reads_both_segments(spark, warc_dir):
    from cruncher_spark.sources.warc import read_warc

    assert read_warc(spark, str(warc_dir) + "/seg-*").count() == 6


def test_malformed_record_quarantined_not_fatal(spark, tmp_path):
    """A record with a lying Content-Length yields a parse_error row
    and skips the rest of THAT file; clean records before the damage
    and other files are unaffected — a 100 TB scan never FAILFASTs."""
    from cruncher_spark.sources.warc import read_warc

    good = _record(
        "response", _http(200, "text/html", b"ok"), uri="http://x/", rid="g"
    )
    bad = good + b"WARC/1.0\r\nContent-Length: 999999\r\n\r\nshort"
    (tmp_path / "bad.warc").write_bytes(bad)
    (tmp_path / "good.warc").write_bytes(good)

    rows = read_warc(spark, str(tmp_path) + "/*.warc", types=None).collect()
    errs = [r for r in rows if r.parse_error is not None]
    assert len(errs) == 1 and "truncated" in errs[0].parse_error
    clean = [r for r in rows if r.parse_error is None]
    assert len(clean) == 2  # the good record in BOTH files survived


def test_warc_documents_bridge_feeds_text_operators(spark, warc_dir):
    """warc_documents: 2xx HTML responses → (doc_id, url, text) with
    JVM-side extraction — and the result is directly consumable by the
    repo's dedup family (the mirrored page collapses to one survivor)."""
    from cruncher_spark.operators.dedup import exact_dedup_survivors
    from cruncher_spark.sources.warc import warc_documents

    docs = warc_documents(spark, str(warc_dir / "seg-00000.warc"))
    rows = {r.url: r for r in docs.collect()}
    # 404 filtered; the two 200s (original + mirror) remain
    assert set(rows) == {"http://a.example/", "http://mirror.example/"}
    text = rows["http://a.example/"].text
    assert text == "Hello & welcome crawled text"
    assert "script" not in text and "color" not in text  # blocks dropped
    assert rows["http://a.example/"].doc_id is not None

    survivors = exact_dedup_survivors(docs, "doc_id", "text").collect()
    assert len(survivors) == 1  # the mirrored page collapsed to one id


def test_html_to_text_entities_and_whitespace(spark):
    from cruncher_spark.functions.text import html_to_text

    df = spark.createDataFrame(
        [("<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39;&nbsp;e</p>",)], "h string"
    )
    got = df.select(html_to_text("h").alias("t")).head().t
    assert got == "a <b> \"c\" 'd' e"


def test_undecompressable_gz_surfaces_as_parse_error(spark, tmp_path):
    """A .gz segment whose very first member is corrupt must yield a
    parse_error row — not silently vanish from the scan (the
    damage-visibility contract); intact sibling files are unaffected."""
    import gzip

    from cruncher_spark.sources.warc import read_warc

    good = _record(
        "response", _http(200, "text/html", b"ok"), uri="http://x/", rid="g"
    )
    (tmp_path / "ok.warc.gz").write_bytes(gzip.compress(good))
    (tmp_path / "corrupt.warc.gz").write_bytes(b"\x1f\x8b\x08\xff garbage")

    rows = read_warc(spark, str(tmp_path) + "/*.warc.gz", types=None).collect()
    errs = [r for r in rows if r.parse_error is not None]
    assert len(errs) == 1
    assert "gzip" in errs[0].parse_error
    assert errs[0].warc_file.endswith("corrupt.warc.gz")
    assert len([r for r in rows if r.parse_error is None]) == 1


def test_mid_file_damaged_gz_member_reports_not_truncates(spark, tmp_path):
    """A multi-member .gz whose FIRST member is intact but a LATER one
    is damaged must keep the decoded leading records AND surface a
    parse_error row — the old behavior truncated silently because the
    damage signal was 'decoded 0 bytes', which a partial decode never
    trips."""
    import gzip

    from cruncher_spark.sources.warc import read_warc

    good = _record(
        "response", _http(200, "text/html", b"ok"), uri="http://x/", rid="g"
    )
    blob = gzip.compress(good) + b"\x1f\x8b\x08\xff damaged-member"
    (tmp_path / "partial.warc.gz").write_bytes(blob)

    rows = read_warc(spark, str(tmp_path) + "/*.warc.gz", types=None).collect()
    clean = [r for r in rows if r.parse_error is None]
    errs = [r for r in rows if r.parse_error is not None]
    assert len(clean) == 1 and clean[0].target_uri == "http://x/"
    assert len(errs) == 1 and "damaged" in errs[0].parse_error


def test_truncated_final_gz_member_reports(spark, tmp_path):
    """A download cut mid-member (valid gzip prefix, no stream end)
    must surface as a parse_error row, not a clean short read."""
    import gzip

    from cruncher_spark.sources.warc import read_warc

    good = _record(
        "response", _http(200, "text/html", b"ok"), uri="http://x/", rid="g"
    )
    member = gzip.compress(good)
    (tmp_path / "cut.warc.gz").write_bytes(member + member[: len(member) // 2])

    rows = read_warc(spark, str(tmp_path) + "/*.warc.gz", types=None).collect()
    errs = [r for r in rows if r.parse_error is not None]
    # two honest error rows: the WARC-level truncated record parsed out
    # of the partial payload, plus the gzip-level truncation signal
    assert any("gzip member truncated" in e.parse_error for e in errs)
    assert len([r for r in rows if r.parse_error is None]) == 1


def test_empty_payload_gz_member_is_not_damage(spark, tmp_path):
    """A syntactically valid gzip member whose decompressed payload is
    genuinely 0 bytes is a clean (empty) decode — the old empty-output
    heuristic misfiled it as 'gzip decode produced 0 bytes'."""
    import gzip

    from cruncher_spark.sources.warc import read_warc

    (tmp_path / "empty.warc.gz").write_bytes(gzip.compress(b""))

    rows = read_warc(spark, str(tmp_path) + "/*.warc.gz", types=None).collect()
    assert rows == []  # no records, and no false parse_error row
