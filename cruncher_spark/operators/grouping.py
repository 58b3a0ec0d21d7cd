"""'all'-row rollup cubes as native GROUPING SETS.

The reference's signature construct: every dimension table carries a synthetic
``name='all'`` row and facts join with ``(fact matches dim) OR dim.name='all'``
(crunch_global.sql:41-45), so each fact row fans out to every
(specific,'all') combination — a hand-rolled CUBE computed by join
multiplication. A 4-dim fan-out multiplies the fact stream 16x *before* the
aggregate.

Spark-first rewrite: plain equi-joins for labels, then
``GROUP BY GROUPING SETS`` — the fan-out happens inside the aggregate
(partial/map-side combined, no row multiplication on the shuffled side).
At 100 TB this is the difference between shuffling 16x the input and
shuffling only the grouped partials.

The constrained variant (crunch_player.sql:39 — role only specific when hero
is 'all', never hero x role) is why this operator takes explicit grouping
sets rather than a blind ``cube()``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALL_LABEL = "all"


def grouping_sets_rollup(
    df: DataFrame,
    dims: Sequence[str],
    aggs: Sequence[Column],
    sets: Sequence[Sequence[str]] | None = None,
    all_label: str = ALL_LABEL,
) -> DataFrame:
    """Aggregate ``df`` over explicit grouping sets, labeling rolled-up
    dimensions with ``all_label`` (the reference's 'all' dim row).

    Parameters
    ----------
    dims: dimension column names (already joined/derived on ``df``).
    aggs: aliased aggregate Columns.
    sets: list of dim-name tuples to keep *specific* per output stratum;
        ``None`` means the full cube (every subset — the unconstrained
        crunch_global fan-out). ``[]`` inside means the grand-total row.

    Output columns: ``dims`` (as strings, rolled-up → ``all_label``) followed
    by the aggregates. Dimension values that are NULL in the input stay NULL
    (distinguishable from rolled-up rows, same as the reference where an
    unmatched dim id simply never joins).
    """
    if sets is None:
        sets = _powerset(dims)
    for s in sets:
        unknown = set(s) - set(dims)
        if unknown:
            raise ValueError(f"grouping set {s!r} references non-dims {unknown}")

    grouped = df.groupingSets([list(s) for s in sets], *[F.col(d) for d in dims])
    out = grouped.agg(F.grouping_id(*[F.col(d) for d in dims]).alias("_gid"), *aggs)

    n = len(dims)
    labeled = [
        F.when((F.col("_gid").bitwiseAND(F.lit(1 << (n - 1 - i)))) != 0, F.lit(all_label))
        .otherwise(F.col(d).cast("string"))
        .alias(d)
        for i, d in enumerate(dims)
    ]
    agg_names = [c for c in out.columns if c != "_gid" and c not in dims]
    return out.select(*labeled, *[F.col(c) for c in agg_names])


def grouping_sets_sql(
    dims: Sequence[str],
    sets: Sequence[Sequence[str]] | None = None,
    all_label: str = ALL_LABEL,
) -> tuple[str, str]:
    """ANSI-SQL fragments (select-list labels, GROUP BY clause) mirroring
    :func:`grouping_sets_rollup` — used to build DuckDB oracles and keeps the
    two definitions visibly in sync."""
    if sets is None:
        sets = _powerset(dims)
    labels = ",\n  ".join(
        f"CASE WHEN GROUPING({d}) = 1 THEN '{all_label}' ELSE CAST({d} AS VARCHAR) END AS {d}"
        for d in dims
    )
    sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
    return labels, f"GROUP BY GROUPING SETS ({sets_sql})"


def _powerset(dims: Sequence[str]) -> list[tuple[str, ...]]:
    out: list[tuple[str, ...]] = []
    n = len(dims)
    for mask in range(1 << n):
        out.append(tuple(d for i, d in enumerate(dims) if mask & (1 << i)))
    return out
