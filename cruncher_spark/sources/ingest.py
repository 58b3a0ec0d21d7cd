"""Text-format ingestion: JSONL and CSV with corrupt-record quarantine.

The raw side of a training-data pipeline rarely starts as parquet: web
dumps and vendor drops arrive as (gzipped) JSONL or CSV. These readers
are the batch analog of the streaming worker's poison-message
quarantine (SURVEY.md S5/S7, `streaming/worker.py`): rows that fail to
parse are never silently invisible and never poison the typed columns
(FAILFAST aborting a 100 TB job 90% in) — on request they land in a
dead-letter parquet directory with the raw line preserved, while the
clean side comes back fully typed.

Scale decisions:

- **Schema is required, never inferred.** Inference is an extra full
  pass over the data before the real one — at 100 TB that doubles the
  scan — and it silently widens types on dirty rows, which is exactly
  the failure quarantine exists to surface.
- **Clean side parses DROPMALFORMED.** The corrupt-record column never
  enters the clean plan, so every downstream shape works — including
  plans that prune all data columns (a bare ``count()``), which Spark
  rejects when they would reference only the corrupt column
  (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN).
- **Quarantine is its own PERMISSIVE pass.** When ``quarantine_path``
  is given the source is scanned a second time and rows whose corrupt
  column is non-null are written out with their partial parse (the
  typed columns make a DLQ row triageable). Two passes is the honest
  cost of a DLQ without caching the raw corpus; the malformed set of
  both passes is identical because both use the same parser and schema
  AND (ADVICE r6 ingest.py:90) both read a file list SNAPSHOTTED once
  at call time — the quarantine write is eager but the returned clean
  DataFrame is lazy, so without the snapshot a file appended to the
  source directory between the DLQ write and the clean plan's
  execution would be read clean-side without ever being
  quarantine-scanned. With the snapshot, late-arriving files are in
  NEITHER pass (re-invoke to ingest them). The DLQ write is
  mode=append — re-reading the same source with the same quarantine
  path appends the same bad rows again, so give each ingestion run its
  own quarantine directory (the streaming worker's per-batch scoping
  is the pattern). Streaming ingestion gets the single-pass version
  via the worker's quarantine branch.
- **Compression is transparent.** ``.jsonl.gz`` / ``.csv.gz`` decode by
  file extension inside the scan; gzip is not splittable, so at scale
  the unit of parallelism is the FILE — many medium gz members (the
  web-dump layout) parallelize; one giant member serializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: quarantine column holding the raw unparsable line
CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not predeclare {CORRUPT_COL}")
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def _snapshot_files(spark: SparkSession, path: str) -> list[str]:
    """Resolve ``path`` (a file, directory, or glob — any Hadoop-visible
    scheme) to the concrete file list ONCE, so the quarantine pass and
    the lazily-executed clean pass read the identical set even if the
    source directory keeps receiving files (ADVICE r6 ingest.py:90).
    Hidden files (``_``/``.`` prefixes) are skipped exactly as Spark's
    own file listing would."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    files: list[str] = []

    def walk(status):
        name = status.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            return
        if status.isDirectory():
            for child in fs.listStatus(status.getPath()):
                walk(child)
        else:
            files.append(status.getPath().toString())

    matched = fs.globStatus(hpath)
    if matched is None:
        raise FileNotFoundError(path)
    for status in matched:
        walk(status)
    return sorted(files)


def _reader(spark: SparkSession, schema: T.StructType, mode: str, **opts):
    r = spark.read.option("mode", mode)
    if mode == "PERMISSIVE":
        r = r.schema(_with_corrupt(schema)).option(
            "columnNameOfCorruptRecord", CORRUPT_COL
        )
    else:
        # validate the schema either way so misuse fails identically
        _with_corrupt(schema)
        r = r.schema(schema)
    for k, v in opts.items():
        r = r.option(k, v)
    return r


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    quarantine_path: str | None = None,
) -> DataFrame:
    """Read line-delimited JSON with an explicit schema.

    Returns the clean typed rows; writes unparsable lines (bad JSON, or
    a type that contradicts ``schema``) to ``quarantine_path`` as
    parquet when given. A line that is valid JSON but MISSES fields is
    not corrupt — missing fields are NULL (schema evolution tolerance,
    same contract as `sources/tables.py load_evolving`).
    """
    _with_corrupt(schema)  # validate before touching the filesystem
    files = _snapshot_files(spark, path)
    if not files:
        return spark.createDataFrame([], schema)
    if quarantine_path is not None:
        _reader(spark, schema, "PERMISSIVE").json(files).where(
            F.col(CORRUPT_COL).isNotNull()
        ).write.mode("append").parquet(quarantine_path)
    return _reader(spark, schema, "DROPMALFORMED").json(files)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    quarantine_path: str | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Read CSV with an explicit schema and corrupt-row quarantine.

    A row with the wrong column count or an unparsable typed value is
    quarantined with the raw line intact; quoted fields and embedded
    separators follow RFC 4180 (Spark's univocity parser).
    """
    opts = {"header": str(header).lower(), "sep": sep, "enforceSchema": "false"}
    _with_corrupt(schema)  # validate before touching the filesystem
    files = _snapshot_files(spark, path)
    if not files:
        return spark.createDataFrame([], schema)
    if quarantine_path is not None:
        _reader(spark, schema, "PERMISSIVE", **opts).csv(files).where(
            F.col(CORRUPT_COL).isNotNull()
        ).write.mode("append").parquet(quarantine_path)
    return _reader(spark, schema, "DROPMALFORMED", **opts).csv(files)
