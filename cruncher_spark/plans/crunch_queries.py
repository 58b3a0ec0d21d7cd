"""Registry entries for the six reference crunch views (parity gate).

Each query runs its Spark plan (cruncher_spark.plans.crunch) over the
committed deterministic fixture parquet (fixtures_parquet/, seed 42) and
is checked against the *literal* DuckDB rendering of the corresponding
reference SQL (reference_oracles) over the same files — i.e. the driver's
correctness gate directly verifies reference parity, not just
self-consistency. The ``sf_dir`` argument is ignored: these tables are
cruncher-shaped, not TPC-H-shaped, and fixed-size by design.

The oracle strings bind the table names via CTEs over absolute
read_parquet paths, so they run in any DuckDB session regardless of which
views the harness pre-registers.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from cruncher_spark.plans import reference_oracles as O
from cruncher_spark.plans.registry import register
from cruncher_spark.schemas import ALL_TABLES

FIXTURES_DIR = Path(__file__).resolve().parents[2] / "fixtures_parquet"

#: deterministic batch: fixtures generate participants p-1..p-360,
#: phase rows ph-1..ph-720 (fixtures.py)
BATCH_IDS = [f"p-{i}" for i in range(1, 121)]
PHASE_BATCH_IDS = [f"ph-{i}" for i in range(1, 151)]
ITEM_IDS = [14, 22, 31]  # is_activable rows of the item dim (fixtures.py)
NOW = "2026-08-10 12:00:00"
TODAY = "2026-08-10"

_ORACLE_TABLES = [
    "participant", "participant_stats", "participant_items",
    "participant_phases", "hero", "role", "region", "game_mode",
    "skill_tier", "series", "filter", "build", "global_point_filters",
    "player", "team", "team_membership", "roster", "match",
]


def _with_fixture_ctes(sql: str) -> str:
    ctes = ",\n".join(
        f'"{t}" AS (SELECT * FROM read_parquet('
        f"'{FIXTURES_DIR}/{t}.parquet/*.parquet'))"
        for t in _ORACLE_TABLES
    )
    return f"WITH\n{ctes}\n{sql}"


_TABLE_CACHE: dict[int, dict] = {}


def _tables(spark: SparkSession):
    """One tables dict per session — stable DataFrame identities let the
    dim-lookup cache in plans.crunch hit across the six queries."""
    key = id(spark)
    if key not in _TABLE_CACHE:
        _TABLE_CACHE[key] = {
            name: spark.read.schema(schema).parquet(
                str(FIXTURES_DIR / f"{name}.parquet")
            )
            for name, schema in ALL_TABLES.items()
        }
    return _TABLE_CACHE[key]


def _now_col():
    from pyspark.sql import functions as F

    return F.lit(NOW).cast("timestamp")


@register(
    "crunch_global",
    _with_fixture_ctes(O.crunch_global_sql(BATCH_IDS, ITEM_IDS)),
    doc="crunch_global.sql parity: global rollup cube via grouping sets "
    "(J3/J5-J9, A1-A8) vs the literal OR-join reference SQL",
)
def crunch_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cruncher_spark.plans.crunch import crunch_global_delta

    return crunch_global_delta(_tables(spark), BATCH_IDS, now=_now_col()).drop(
        "updated_at"
    )


@register(
    "crunch_player",
    _with_fixture_ctes(O.crunch_player_sql(BATCH_IDS, ITEM_IDS)),
    doc="crunch_player.sql parity: constrained grouping sets "
    "(J4 — never hero x role)",
)
def crunch_player(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cruncher_spark.plans.crunch import crunch_player_delta

    return crunch_player_delta(_tables(spark), BATCH_IDS).drop("updated_at")


@register(
    "crunch_hero_vs_hero",
    _with_fixture_ctes(O.crunch_hero_vs_hero_sql(BATCH_IDS, ITEM_IDS)),
    doc="crunch_hero_vs_hero.sql parity: match self-join pair stats (J10)",
)
def crunch_hero_vs_hero(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cruncher_spark.plans.crunch import crunch_hero_vs_hero_delta

    return crunch_hero_vs_hero_delta(
        _tables(spark), BATCH_IDS, now=_now_col()
    ).drop("updated_at")


@register(
    "crunch_phases",
    _with_fixture_ctes(O.crunch_phases_sql(PHASE_BATCH_IDS, ITEM_IDS)),
    doc="crunch_phases.sql parity: in-game time-slice rollup, 59 measures",
)
def crunch_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cruncher_spark.plans.crunch import crunch_phases_delta

    return crunch_phases_delta(
        _tables(spark), PHASE_BATCH_IDS, now=_now_col()
    ).drop("updated_at")


@register(
    "crunch_phases_bans",
    _with_fixture_ctes(O.crunch_phases_bans_sql(PHASE_BATCH_IDS)),
    doc="crunch_phases_bans.sql parity: ban-count rollup (ban-keyed hero dim)",
)
def crunch_phases_bans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cruncher_spark.plans.crunch import crunch_phases_bans_delta

    return crunch_phases_bans_delta(
        _tables(spark), PHASE_BATCH_IDS, now=_now_col()
    ).drop("updated_at")


@register(
    "crunch_team_fame",
    _with_fixture_ctes(O.crunch_team_sql(1, TODAY)),
    doc="crunch_team.sql parity: 7-day CASE-weighted fame recompute "
    "(A9/A10, no-ELSE NULL semantics)",
)
def crunch_team_fame_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from cruncher_spark.plans.crunch import crunch_team_fame

    return crunch_team_fame(_tables(spark), 1, today=F.lit(TODAY))
