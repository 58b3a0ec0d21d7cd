"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every registered query on Spark and its oracle on DuckDB over the same
parquet, then compares row count, sorted column names, and an
order-insensitive value comparison (doubles to 9 significant digits).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cruncher_spark.plans import oracle_map, query_map
from cruncher_spark.session import get_spark
from cruncher_spark.sources.tables import STAR_TABLES


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, bool):
            return bool(v)
        if isinstance(v, float):
            return float(f"{v:.9g}")
        return v

    out = [tuple(norm(r[i]) for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qmap, omap = query_map(), oracle_map()
    failures = 0
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        sdf = fn(get_spark("oracle-check"), sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        if name not in omap:
            print(f"{name:28s} rows-only: {len(srows)} rows (no oracle)")
            continue
        ores = con.execute(omap[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        ok_vals = ok_cols and ok_count and normalize(srows, scols) == normalize(orows, ocols)
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:28s} {status}  rows {len(srows)}/{len(orows)}"
            f"  cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'}"
            f"  vals={'ok' if ok_vals else 'MISMATCH'}"
        )
        if status == "FAIL" and ok_cols and ok_count:
            sn, on = normalize(srows, scols), normalize(orows, ocols)
            for a, b in list(zip(sn, on))[:200]:
                if a != b:
                    print("   spark :", a)
                    print("   oracle:", b)
                    break
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
