"""Per-query wall-time decomposition for the optimization round.

For each registered query (or the names given on argv), measures, on a
warm session:

- build_s: Python-side plan construction (``fn(spark, sf_dir)``) — includes
  any eager localCheckpoint actions the query performs while building;
- plan_s: Catalyst analysis+optimization+physical planning of the final
  DataFrame (forcing ``queryExecution().executedPlan()`` without running);
- exec_s: the noop-sink execution of the already-planned DataFrame
  (guide §1.4 — full materialization of every column, no driver transfer);
- jobs: Spark job count the query issued end-to-end (build+exec), from the
  status tracker — sequential jobs are un-parallelizable fixed cost.

Usage: python tools/profile_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cruncher_spark.plans import query_map
from cruncher_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and "/" in args[0] else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = [a for a in args if "/" not in a]
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    spark = get_spark("cruncher-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = query_map()
    if names:
        qmap = {k: qmap[k] for k in names}

    # warmup (same as bench.py)
    try:
        query_map()["batch_delta"](spark, sf_dir).count()
        spark.range(64).repartition(32).mapInPandas(
            lambda it: it, "id long"
        ).count()
    except Exception:
        pass

    tracker = spark.sparkContext.statusTracker()
    rows = []
    for name, fn in qmap.items():
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        best = None
        for _ in range(max(reps, 1)):
            try:
                jobs0 = len(tracker.getJobIdsForGroup(None) or [])
                spark.sparkContext.setJobDescription(f"profile:{name}")
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                df._jdf.queryExecution().executedPlan()
                t2 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t3 = time.perf_counter()
                njobs = len(tracker.getJobIdsForGroup(None) or []) - jobs0
                rec = {
                    "build_s": round(t1 - t0, 3),
                    "plan_s": round(t2 - t1, 3),
                    "exec_s": round(t3 - t2, 3),
                    "total_s": round(t3 - t0, 3),
                    "jobs": njobs,
                }
                if best is None or rec["total_s"] < best["total_s"]:
                    best = rec
            except Exception as exc:  # noqa: BLE001
                best = {"error": f"{type(exc).__name__}: {exc}"[:200]}
                break
            finally:
                spark.sparkContext.setJobDescription(None)
                try:
                    spark.catalog.clearCache()
                except Exception:
                    pass
        best["name"] = name
        rows.append(best)
        print(json.dumps(best), flush=True)

    ok = [r for r in rows if "error" not in r]
    print(
        json.dumps(
            {
                "summary": {
                    "n": len(ok),
                    "build_s": round(sum(r["build_s"] for r in ok), 2),
                    "plan_s": round(sum(r["plan_s"] for r in ok), 2),
                    "exec_s": round(sum(r["exec_s"] for r in ok), 2),
                    "total_s": round(sum(r["total_s"] for r in ok), 2),
                    "jobs": sum(r["jobs"] for r in ok),
                }
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
