"""Regenerate the committed cruncher-shaped fixture parquet.

The fixture tables (cruncher_spark/fixtures.py, seed 42) are committed at
fixtures_parquet/ so the driver's correctness gate can run the crunch
parity queries and their DuckDB oracles over identical, stable data
without an ordering dependency between the two runs.

Usage: python tools/gen_fixtures.py [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cruncher_spark.fixtures import write_parquet
from cruncher_spark.session import get_spark


def main() -> None:
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else str(Path(__file__).resolve().parent.parent / "fixtures_parquet")
    )
    spark = get_spark("gen-fixtures")
    dfs = write_parquet(spark, out)
    for name, df in sorted(dfs.items()):
        print(f"{name:24s} {df.count():6d} rows")
    spark.stop()


if __name__ == "__main__":
    main()
