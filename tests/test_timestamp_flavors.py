"""Timestamp-flavor indifference (VERDICT r3 #1/#4).

Parquet writers encode timestamps three ways — TIMESTAMP(NANOS) (Spark reads
it as a raw-nanos long under ``nanosAsLong``), timestamp[us] UTC-adjusted
(TIMESTAMP), and timestamp[us] with ``isAdjustedToUTC=false``
(TIMESTAMP_NTZ). Round 3's only red gate was environment drift between these
flavors reaching ``unix_micros`` unnormalized. ``load_table`` must absorb all
of them so no query depends on the writer's choice — the reference is equally
indifferent (MySQL DATETIME is naive; crunch_global.sql:40 compares it
directly).

These tests write the SAME logical events table in each physical flavor and
assert every timestamp-consuming registered query (``session_windows`` uses
``session_window``+``unix_micros``, ``asof_join_events`` sorts/compares ts,
``hll_user_distinct`` shares the events scan) produces identical results.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cruncher_spark.sources.tables import load_table

_QUERIES = ["session_windows", "asof_join_events", "hll_user_distinct"]


def _events_arrow(ts_type: pa.DataType) -> pa.Table:
    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = []
    eid = 0
    for user in (1, 2, 3):
        t = base
        for burst in range(3):
            for i in range(4):
                rows.append(
                    (
                        eid,
                        t + dt.timedelta(seconds=90 * i),
                        user,
                        "click" if (eid % 3 == 0) else "view",
                        float(eid % 7) / 2.0,
                        "{}",
                    )
                )
                eid += 1
            t += dt.timedelta(hours=2)  # > 30 min gap => new session
    cols = list(zip(*rows))
    return pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], ts_type),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )


#: flavor name -> pyarrow timestamp type for the ts column
_FLAVORS = {
    "ntz_us": pa.timestamp("us"),                  # TIMESTAMP_NTZ in Spark
    "utc_us": pa.timestamp("us", tz="UTC"),        # plain TIMESTAMP
    "nanos": pa.timestamp("ns"),                   # nanosAsLong path
}


@pytest.fixture(scope="module")
def flavor_dirs(tmp_path_factory):
    dirs = {}
    for flavor, ts_type in _FLAVORS.items():
        d = tmp_path_factory.mktemp(f"tsflavor_{flavor}")
        pq.write_table(_events_arrow(ts_type), str(d / "events.parquet"))
        dirs[flavor] = str(d)
    return dirs


def test_load_table_normalizes_every_flavor(spark, flavor_dirs):
    for flavor, d in flavor_dirs.items():
        df = load_table(spark, d, "events")
        assert df.schema["ts"].dataType.simpleString() == "timestamp", (
            flavor,
            df.schema["ts"].dataType,
        )
        # wall-clock micros are preserved exactly (UTC session TZ relabel)
        from pyspark.sql import functions as F

        lo, hi = df.select(
            F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
        ).first()
        assert lo == 1714564800000000  # 2024-05-01T12:00:00Z
        assert hi > lo


@pytest.mark.parametrize("qname", _QUERIES)
def test_queries_flavor_indifferent(spark, flavor_dirs, qname):
    from cruncher_spark.plans import query_map

    fn = query_map()[qname]
    results = {}
    for flavor, d in flavor_dirs.items():
        df = fn(spark, d)
        rows = sorted(
            tuple(str(v) for v in r) for r in df.collect()
        )
        results[flavor] = (df.schema.simpleString(), rows)
    ref = results["utc_us"]
    for flavor, got in results.items():
        assert got == ref, f"{qname} differs between utc_us and {flavor}"
