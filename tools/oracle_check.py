"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every registered query on Spark and its oracle on DuckDB over the same
parquet, then compares row count, sorted column names, and an
order-insensitive EXACT value comparison (bit-exact doubles — the driver
hashes exact values, so any tolerance here would hide driver-gate failures;
see VERDICT.md round 1, "What's wrong" #1).

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
        # exact: bools stay bools, floats stay bit-exact (repr round-trips),
        # Decimal→float only where an engine returns Decimal for a DOUBLE cast
        import decimal

        if isinstance(v, bool):
            return bool(v)
        if isinstance(v, decimal.Decimal):
            return float(v)
        return v

    out = [tuple(norm(r[i]) for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def dtype_classes(df) -> dict[str, str]:
    """Map a pandas frame's dtypes to coarse classes the driver's value hash
    is sensitive to.  DuckDB SUM(int) returns HUGEINT which pandas renders as
    float64 ("3.0"), while Spark's bigint renders int64 ("3") — equal under
    ==, different under a rendered-value hash.  This check catches that class
    of driver-only failure locally (round-1 root cause of the 4 HASH-FAILs).
    """
    out = {}
    for c in df.columns:
        k = df[c].dtype.kind
        out[c] = {
            "i": "int", "u": "int", "f": "float", "b": "bool", "M": "ts"
        }.get(k, "obj")
        if out[c] == "obj":
            nonnull = df[c].dropna()
            if len(nonnull):
                out[c] = type(nonnull.iloc[0]).__name__
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qmap, omap = query_map(), oracle_map(sf_dir)
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
        # driver-path dtype check: both engines rendered through pandas
        ok_dtypes = True
        if ok_cols:
            sdt = dtype_classes(sdf.toPandas())
            odt = dtype_classes(con.execute(omap[name]).df())
            bad = {c: (sdt[c], odt[c]) for c in sdt if sdt[c] != odt[c]}
            if bad:
                ok_dtypes = False
                print(f"{name:28s} DTYPE MISMATCH (spark vs oracle): {bad}")
        status = "OK" if (ok_cols and ok_count and ok_vals and ok_dtypes) else "FAIL"
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
