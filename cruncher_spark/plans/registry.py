"""Query registry: named (spark_fn, oracle_sql) pairs.

Each registered query is one operator family from SURVEY.md §2, expressed
Spark-first over the driver's star-schema test tables, with an ANSI-SQL
oracle DuckDB runs on the same parquet for the correctness gate. Column
names are aliased identically on both sides (the driver hashes values after
sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


#: the driver's correctness gate runs oracles at this scale factor
ORACLE_SF_DIR = "/root/testdata/sf0.01"


@dataclass(frozen=True)
class Query:
    name: str
    fn: SparkQuery
    #: str → static ANSI SQL; callable(sf_dir) → SQL generated against the
    #: gate's data (used when the plan embeds data-fitted literals, e.g.
    #: k-means IVF centroids); None → non-SQL-expressible, rows-only check
    oracle: str | Callable[[str], str] | None
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | Callable[[str], str] | None, doc: str = ""):
    """Decorator: add a (spark, oracle) pair to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def query_map() -> dict[str, SparkQuery]:
    _load_all()
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_map(sf_dir: str = ORACLE_SF_DIR) -> dict[str, str]:
    _load_all()
    return {
        name: (q.oracle(sf_dir) if callable(q.oracle) else q.oracle)
        for name, q in QUERIES.items()
        if q.oracle is not None
    }


def _load_all() -> None:
    """Import every plan module for its registration side effects."""
    from cruncher_spark.plans import star_queries  # noqa: F401

    try:
        from cruncher_spark.plans import pipeline_queries  # noqa: F401
    except ImportError:  # pragma: no cover - module added incrementally
        pass
    try:
        from cruncher_spark.plans import crunch_queries  # noqa: F401
    except ImportError:  # pragma: no cover
        pass
    try:
        from cruncher_spark.plans import multimodal_queries  # noqa: F401
    except ImportError:  # pragma: no cover
        pass
    try:
        from cruncher_spark.plans import analytics_queries  # noqa: F401
    except ImportError:  # pragma: no cover
        pass
