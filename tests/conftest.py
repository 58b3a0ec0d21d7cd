"""Shared test fixtures: one local SparkSession + cruncher-shaped parquet."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_DRIVER_MEM", "6g")


@pytest.fixture(scope="session")
def spark():
    from cruncher_spark.session import get_spark

    s = get_spark("tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def crunch_dir(spark, tmp_path_factory):
    """Cruncher-shaped fixture tables written to parquet once per test run."""
    from cruncher_spark.fixtures import write_parquet

    out = tmp_path_factory.mktemp("crunch_fixtures")
    write_parquet(spark, str(out))
    return str(out)


@pytest.fixture(scope="session")
def crunch_tables(spark, crunch_dir):
    from cruncher_spark.schemas import ALL_TABLES

    return {
        name: spark.read.schema(schema).parquet(f"{crunch_dir}/{name}.parquet")
        for name, schema in ALL_TABLES.items()
    }


@pytest.fixture(scope="session")
def duck(crunch_dir):
    """DuckDB connection with every cruncher table registered as a view."""
    import duckdb

    from cruncher_spark.schemas import ALL_TABLES

    con = duckdb.connect()
    for name in ALL_TABLES:
        con.execute(
            f'CREATE OR REPLACE VIEW "{name}" AS '
            f"SELECT * FROM read_parquet('{crunch_dir}/{name}.parquet/*.parquet')"
        )
    return con
