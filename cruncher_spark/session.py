"""SparkSession factory tuned for the cruncher workload.

The reference delegates all execution tuning to MySQL plus deployment knobs
(worker.js:26-34). Here the equivalents are Spark confs: AQE for runtime
re-planning (skew joins, partition coalescing), broadcast thresholds sized so
every cruncher dimension table (O(10-1000) rows) broadcasts, and Arrow for
any pandas interchange. On a real cluster only ``master`` and memory sizing
change; the SQL confs below are scale-independent.
"""

from __future__ import annotations

import os

# Pin BLAS/OpenMP pools to one thread BEFORE numpy loads anywhere (driver or
# the Python workers forked under it). Every worker otherwise spins up a
# cores-wide BLAS pool; with 32 workers x 32 threads the resulting thrash
# measured 5-10x slowdowns on Arrow-UDF stages. Executor-side parallelism
# comes from Spark partitions, not intra-op threads.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

from pyspark.sql import SparkSession

#: SQL confs that are safe (and wanted) on any session, including one the
#: test driver created before handing it to us. These are all runtime-settable.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # coalesce small-but-CPU-heavy shuffles to many partitions, not one:
    # sketch/join stages on compact rows are compute-bound, and the 64m
    # default advisory size serializes them onto a single core
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # InferFiltersFromGenerate inserts `size(arr) > 0` below every explode;
    # the predicate is then pushed into the file-scan filter, where the
    # generator input is RE-EVALUATED per row. Every exploded array here is
    # a computed expression (shingles, minhash bands, deletion variants),
    # so the "optimization" re-runs the most expensive projection in the
    # plan 1-2 extra times — measured 3.5x on contamination_check, 3.1x on
    # dedup_simhash, 2.7x on corpus_curate at sf0.1. The rule only helps
    # when the array is a STORED column whose emptiness prunes cheaply;
    # that shape does not occur in this engine. Excluding an optimizer rule
    # cannot change results, only plans.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
    # every cruncher dim is broadcast-sized; 64m keeps even a large build/item
    # dim on the broadcast path at 100 TB fact scale
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # deterministic timestamp rendering against the DuckDB oracle
    "spark.sql.session.timeZone": "UTC",
    # the events table stores TIMESTAMP(NANOS) which the vectorized reader
    # rejects; read as long and convert in the loader (sources/tables.py)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (driver-owned)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static on some builds
            pass
    return spark


def get_spark(app_name: str = "cruncher-spark") -> SparkSession:
    """Build a local session sized from SPARK_GRAFT_CPUS (default 32).

    On a production cluster this function is replaced by whatever session the
    platform provides; nothing else in the package assumes local mode.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    # cluster deployments: pin worker-side BLAS pools the same way the
    # module-level setdefault does for local mode
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        builder = builder.config(f"spark.executorEnv.{v}", "1")
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
