"""JSONL/CSV ingestion: typed clean side, quarantined corrupt side."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import types as T

from cruncher_spark.sources.ingest import CORRUPT_COL, read_csv, read_jsonl

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

GOOD = [
    '{"doc_id": 1, "text": "hello world", "lang": "en"}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr"}',
]
MISSING_FIELD = '{"doc_id": 3, "text": "no lang"}'  # valid: lang -> NULL
BAD_JSON = '{"doc_id": 4, "text": "unterminated'
BAD_TYPE = '{"doc_id": "not-a-number", "text": "t", "lang": "en"}'


def test_jsonl_clean_and_quarantine(spark, tmp_path):
    src = tmp_path / "docs.jsonl"
    src.write_text("\n".join(GOOD + [MISSING_FIELD, BAD_JSON, BAD_TYPE]) + "\n")
    dlq = str(tmp_path / "dlq")

    clean = read_jsonl(spark, str(src), SCHEMA, quarantine_path=dlq)
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[3]["lang"] is None  # missing field is NULL, not corrupt
    assert clean.schema.fieldNames() == ["doc_id", "text", "lang"]

    q = spark.read.parquet(dlq)
    raws = {r[CORRUPT_COL] for r in q.collect()}
    assert raws == {BAD_JSON, BAD_TYPE}


def test_jsonl_gzip_member(spark, tmp_path):
    src = tmp_path / "docs.jsonl.gz"
    with gzip.open(src, "wt") as f:
        f.write("\n".join(GOOD) + "\n")
    clean = read_jsonl(spark, str(src), SCHEMA)
    assert clean.count() == 2


def test_jsonl_without_quarantine_still_filters(spark, tmp_path):
    src = tmp_path / "docs.jsonl"
    src.write_text("\n".join(GOOD + [BAD_JSON]) + "\n")
    assert read_jsonl(spark, str(src), SCHEMA).count() == 2


def test_jsonl_rejects_predeclared_corrupt_col(spark):
    bad = T.StructType([T.StructField(CORRUPT_COL, T.StringType())])
    with pytest.raises(ValueError):
        read_jsonl(spark, "/nonexistent", bad)


def test_csv_clean_and_quarantine(spark, tmp_path):
    src = tmp_path / "docs.csv"
    src.write_text(
        "doc_id,text,lang\n"
        '1,"hello, quoted",en\n'
        "2,plain,fr\n"
        "nope,badid,en\n"  # unparsable long -> quarantined
    )
    dlq = str(tmp_path / "dlq_csv")
    clean = read_csv(spark, str(src), SCHEMA, quarantine_path=dlq)
    rows = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert rows == {1: "hello, quoted", 2: "plain"}

    q = spark.read.parquet(dlq)
    assert [r[CORRUPT_COL] for r in q.collect()] == ["nope,badid,en"]


def test_csv_wrong_column_count_quarantined(spark, tmp_path):
    src = tmp_path / "docs.csv"
    src.write_text("doc_id,text,lang\n1,ok,en\n2,too,many,columns,here\n")
    dlq = str(tmp_path / "dlq2")
    clean = read_csv(spark, str(src), SCHEMA, quarantine_path=dlq)
    assert [r["doc_id"] for r in clean.collect()] == [1]
    assert spark.read.parquet(dlq).count() == 1


def test_file_list_snapshotted_at_call_time(spark, tmp_path):
    """ADVICE r6 ingest.py:90: the quarantine pass is eager but the
    clean DataFrame is lazy — a file dropped into the source directory
    AFTER read_jsonl returns must be invisible to the clean plan too
    (identical malformed sets by construction), not read clean-side
    without ever being quarantine-scanned."""
    src = tmp_path / "drop"
    src.mkdir()
    (src / "a.jsonl").write_text("\n".join(GOOD) + "\n")
    dlq = str(tmp_path / "dlq_snap")
    clean = read_jsonl(spark, str(src), SCHEMA, quarantine_path=dlq)

    # a late file with one clean and one corrupt row arrives before the
    # clean plan executes
    (src / "b.jsonl").write_text(
        '{"doc_id": 9, "text": "late", "lang": "en"}\n' + BAD_JSON + "\n"
    )
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    assert spark.read.parquet(dlq).count() == 0  # nothing was corrupt

    # re-invoking picks the late file up in BOTH passes
    clean2 = read_jsonl(spark, str(src), SCHEMA, quarantine_path=dlq)
    assert sorted(r["doc_id"] for r in clean2.collect()) == [1, 2, 9]
    assert spark.read.parquet(dlq).count() == 1


def test_empty_source_dir_returns_empty_typed_frame(spark, tmp_path):
    src = tmp_path / "empty"
    src.mkdir()
    df = read_jsonl(spark, str(src), SCHEMA)
    assert df.count() == 0 and df.schema == SCHEMA
