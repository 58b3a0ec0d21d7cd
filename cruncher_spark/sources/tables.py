"""Batch table sources.

Reference analog: every ``FROM``/``JOIN`` in the crunch scripts is a JDBC
table scan executed by MySQL (SURVEY.md S2). Here sources are columnar
parquet scans — Catalyst pushes filters and prunes columns into the scan,
which the reference's row-store could not do. ``spark.read.format("jdbc")``
remains available for parity deployments; the fixtures and the driver
test data are parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the driver-provided star schema (TESTDATA.md)
STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: inferred parquet schemas keyed by (absolute path, mtime_ns, size) —
#: METADATA reuse, not result caching: the first read of a table in a
#: process pays footer-based schema inference as always and every later
#: read of the SAME bytes passes the schema explicitly, skipping a
#: ~100 ms driver-side inference round trip per call. Registered plans
#: rebuild their scans per invocation (the bench calls each query fn
#: once per rep), so one bench run was paying ~500 re-inferences of ten
#: static files. A rewritten file changes (mtime, size) and re-infers;
#: the key is engine-independent, so a restarted session reuses nothing
#: stale (schemas are plain StructTypes, not session-bound handles).
_SCHEMA_CACHE: dict[tuple, T.StructType] = {}


def _schema_cache_key(path: str) -> tuple | None:
    import os

    try:
        st = os.stat(path)
    except OSError:
        return None
    if os.path.isdir(path):
        # Directory-style dataset (ADVICE r12): a directory's own
        # mtime/size do NOT track in-place part-file rewrites, so key on
        # a shallow listing fingerprint (name, mtime_ns, size of every
        # regular file) instead — any part file rewritten, added, or
        # removed changes the key and re-infers. Metadata-only, same as
        # the single-file path.
        try:
            files, subdirs = [], False
            for e in os.scandir(path):
                if e.is_dir():
                    subdirs = True
                    break
                if e.is_file():
                    files.append((e.name, e.stat().st_mtime_ns, e.stat().st_size))
        except OSError:
            return None
        if subdirs:
            # hive-partitioned layout: a rewrite inside key=val subdirs is
            # invisible to a shallow listing — don't cache at all
            return None
        return (os.path.abspath(path), tuple(sorted(files)))
    return (os.path.abspath(path), st.st_mtime_ns, st.st_size)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table, normalized to a single timestamp flavor.

    Column pruning + predicate pushdown are left to Catalyst — callers
    express plain DataFrame plans and the scan narrows itself (verify with
    ``.explain``: ``PushedFilters``/``ReadSchema``).

    Parquet writers disagree on the physical timestamp encoding; the three
    flavors the driver's generators have produced so far are
    TIMESTAMP(NANOS) (read as raw-nanos long under ``nanosAsLong``),
    timestamp[us] UTC-adjusted (plain TIMESTAMP), and timestamp[us] with
    ``isAdjustedToUTC=false`` (TIMESTAMP_NTZ). Downstream operators use
    ``unix_micros``/``window``/``session_window``, which require TIMESTAMP —
    so normalize every flavor here, in ONE place, rather than per query.
    The session time zone is pinned to UTC (session.RUNTIME_CONFS), so the
    NTZ→TIMESTAMP cast is a pure relabel: wall-clock micros are unchanged
    and the DuckDB oracle's ``epoch_us(ts)`` agrees. The reference is
    equally flavor-indifferent: MySQL DATETIME is naive and the crunch SQL
    (crunch_global.sql:40) compares it directly.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    key = _schema_cache_key(path)
    cached = _SCHEMA_CACHE.get(key) if key is not None else None
    if cached is not None:
        df = spark.read.schema(cached).parquet(path)
    else:
        df = spark.read.parquet(path)
        if key is not None:
            _SCHEMA_CACHE[key] = df.schema
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # nanosAsLong read the TIMESTAMP(NANOS) column as raw nanos; convert
        # with integer division (doubles lose precision above 2^53)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


#: footer row counts memoized on the schema-cache key discipline —
#: metadata reuse only; a rewritten file changes the key and re-reads
_ROW_COUNT_CACHE: dict[tuple, int] = {}


def parquet_row_count(path: str) -> int | None:
    """EXACT row count of a parquet file (or flat directory of part files)
    from footer metadata — a driver-side read, no Spark job.

    Parquet footers carry the authoritative row count (DuckDB's count(*)
    serves from the same metadata), so this is the cheapest exact source
    for row-count BOUNDS that gate data-dependent plan choices — e.g. the
    prefix-Jaccard hot-shingle probe, whose full corpus-pass probe job is
    provably unnecessary whenever |docs| <= df_cap (a shingle's document
    frequency cannot exceed the document count). Returns None when the
    footer cannot be read (callers must then fall back to the probe).
    Metadata only — no data rows, no results.
    """
    import os

    key = _schema_cache_key(path)
    if key is not None and key in _ROW_COUNT_CACHE:
        return _ROW_COUNT_CACHE[key]
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            total = 0
            for e in os.scandir(path):
                if not e.is_file() or e.name.startswith(("_", ".")):
                    continue
                total += pq.ParquetFile(e.path).metadata.num_rows
        else:
            total = pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None
    if key is not None:
        _ROW_COUNT_CACHE[key] = total
    return total


def load_evolving(
    spark: SparkSession,
    path: str,
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Schema-evolution-tolerant scan: files written under OLD schema
    versions coexist with new ones in the same table directory.

    ``mergeSchema`` unions every parquet footer's schema (columns added
    over time appear as NULL for pre-addition files — parquet's
    schema-on-read contract); ``defaults`` then backfills chosen columns
    with a constant so downstream aggregates need no per-column
    null-handling. At 100 TB footer merging touches metadata only (one
    footer per file, no data read), and column pruning/pushdown still
    reach the scan — files lacking a pruned column are simply read as
    nulls. The reference's analog is MySQL ``ALTER TABLE ADD COLUMN
    DEFAULT``: one logical schema over rows of two generations.
    """
    df = spark.read.option("mergeSchema", "true").parquet(path)
    for c, v in (defaults or {}).items():
        df = df.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return df


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 1000,
) -> DataFrame:
    """Read one table over JDBC — the parity path to the reference's
    MySQL reads (worker.js:61-64, Sequelize pool).

    ``partition_column``/bounds/``num_partitions`` split the scan into
    parallel range queries — the distributed analog of the reference's
    MAXCONNS=3 connection pool (worker.js:26-27); ``fetchsize`` bounds
    per-round-trip rows like the reference's 1000-id batches. Catalyst
    pushes filters into the generated WHERE clause (``PushedFilters`` in
    ``.explain``), so the same plans narrow their scans on a row store
    too. Tested against the Derby jars Spark bundles —
    tests/test_jdbc_source.py.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", fetchsize)
    )
    if driver is not None:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions)
        )
    return reader.load()


def load_tables_jdbc(
    spark: SparkSession, url: str, names=STAR_TABLES, **kw
) -> dict[str, DataFrame]:
    """All named tables from one JDBC endpoint (keyword args forwarded to
    :func:`jdbc_reader`) — drop-in replacement for the parquet Star when
    the data lives in a row store, as in the reference deployment."""
    return {n: jdbc_reader(spark, url, n, **kw) for n in names}


#: scan partition counts memoized per (canonicalized-plan semanticHash,
#: split-size conf, target) — ``df.rdd.getNumPartitions()`` costs a
#: physical-planning py4j round trip (~7 ms) per call and the bench calls
#: :func:`fan_out` for ~100 registered queries per rep over ten STATIC
#: files. semanticHash distinguishes plan shapes AND scanned paths (the
#: relation's location is part of the canonicalized plan), so the only
#: staleness window is a file REWRITTEN IN PLACE inside one process — which
#: could at most mis-skip/mis-apply the repartition (a pure parallelism
#: choice; results are identical either way). Metadata only — no data, no
#: results.
_FAN_OUT_PARTS: dict[tuple, int] = {}


def fan_out(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow scan before CPU-heavy per-row work
    — IF the scan is narrower than the cluster.

    A single small parquet file arrives as ONE input partition, serializing
    shingling/regex/UDF work onto one core (measured 20x slowdown in the
    dedup family). At production scale a 100 TB table arrives in thousands
    of splits, so the gate below skips the exchange outright (VERDICT r12
    #1: the unconditional form would force a full exchange of the corpus —
    and REDUCE its parallelism to defaultParallelism — exactly where the
    input needs no help). At bench scale the inputs are 1-split files, the
    gate never trips, and plans are unchanged.
    """
    n = parts or df.sparkSession.sparkContext.defaultParallelism
    try:
        # canonicalized-plan hash: distinguishes plan shapes over the same
        # file (a plain scan vs a union of two derivations of it have
        # different partition counts) as well as different paths
        key = (
            df._jdf.queryExecution().analyzed().semanticHash(),
            df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", ""),
            n,
        )
    except Exception:  # pragma: no cover - defensive (connect-style session)
        key = None
    cur = _FAN_OUT_PARTS.get(key) if key is not None else None
    if cur is None:
        # scan/filter/union plans have no exchange, so this compiles the
        # physical plan without running a job
        cur = df.rdd.getNumPartitions()
        if key is not None:
            _FAN_OUT_PARTS[key] = cur
    if cur >= n:
        return df
    return df.repartition(n)


class Star:
    """Lazy handle over one scale-factor directory of the test star schema.

    Also registers temp views on demand so operators can be expressed in
    Spark SQL where that is clearer than the DataFrame API.
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = load_table(self.spark, self.sf_dir, name)
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in STAR_TABLES:
            return self.table(name)
        raise AttributeError(name)

    def view(self, *names: str) -> None:
        """Register temp views (idempotent) for SQL-expressed queries."""
        for n in names or STAR_TABLES:
            self.table(n).createOrReplaceTempView(n)
