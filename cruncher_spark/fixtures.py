"""Deterministic cruncher-shaped fixture generator (seed 42).

Builds every table the six crunch scripts touch (FIXTURES.md), sized so each
grouping-set stratum is populated and every NULL/edge path is exercised:

- dims carry a ``name='all'`` row plus specific rows; ``series`` has
  overlapping daily (show_in_web=false) / patch (true) / all-time intervals
  for both dimension_on='global' and 'player';
- ``item_grants`` strings include multi-item lists, repeated items, counts
  >= 2, and both matching and non-matching cases per build slot, with NULL
  (wildcard) build slots;
- matches have 6 participants across 2 rosters (hero-vs-hero gets both
  played_with=true and false pairs);
- some participants lack ``participant_items`` rows (left-join NULL path),
  some have ``winner`` NULL (no-ELSE CASE), some team memberships reach
  tm_cnt>3 (NULL weight path);
- ``item_uses`` maps include non-activable keys and omit some activable
  keys (coalesce-0 path);
- timestamps straddle series boundaries and the 7-day team-fame window.
"""

from __future__ import annotations

import datetime as dt
import random
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from cruncher_spark.schemas import ALL_TABLES, PHASE_MEASURES

NOW = dt.datetime(2026, 8, 10, 12, 0, 0)  # fixed "today" for the 7-day window

HEROES = [(1, "all"), (2, "ringo"), (3, "catherine"), (4, "skaarf"), (5, "taka")]
ROLES = [(1, "all"), (2, "carry"), (3, "jungler"), (4, "captain")]
REGIONS = [(1, "all"), (2, "na"), (3, "eu"), (4, "sg")]
GAME_MODES = [(1, "all"), (2, "casual"), (3, "ranked"), (4, "blitz")]
SKILL_TIERS = [
    (1, "all", -1, 30),
    (2, "bronze", 0, 9),
    (3, "silver", 10, 19),
    (4, "gold", 20, 29),
]
ITEMS = [
    (14, "boots", True),
    (22, "flare", True),
    (31, "minion_candy", True),
    (40, "sword", False),
    (55, "armor", False),
]
ACTIVABLE_ITEM_IDS = [i for i, _, act in ITEMS if act]


def _series_rows() -> list[tuple]:
    rows = []
    sid = 1
    for dim_on in ("global", "player"):
        # all-time (visible), two patches (visible), overlapping dailies (not)
        spans = [
            ("all_time", dt.datetime(2020, 1, 1), dt.datetime(2030, 1, 1), True),
            ("patch_1", dt.datetime(2026, 7, 1), dt.datetime(2026, 8, 1), True),
            ("patch_2", dt.datetime(2026, 8, 1), dt.datetime(2026, 9, 1), True),
            ("daily_0807", dt.datetime(2026, 8, 7), dt.datetime(2026, 8, 8), False),
            ("daily_0808", dt.datetime(2026, 8, 8), dt.datetime(2026, 8, 9), False),
        ]
        for name, start, end, web in spans:
            rows.append((sid, name, dim_on, start, end, web))
            sid += 1
    return rows


FILTERS = [
    (1, "all", "global"),
    (2, "featured", "global"),
    (3, "tournament", "global"),
    (4, "all", "player"),
    (5, "ranked_only", "player"),
]

# build 1 = 'all'; build 2 matches boots;1 (+wildcards); build 3 needs
# flare;2 AND sword;1; build 4 never matches (item 99 absent from grants)
BUILDS = [
    (1, "all", "global") + (None, None) * 6,
    (2, "boots_rush", "global", 14, 1, None, None, None, None, None, None, None, None, None, None),
    (3, "double_flare", "global", 22, 2, 40, 1, None, None, None, None, None, None, None, None),
    (4, "phantom", "global", 99, 1, None, None, None, None, None, None, None, None, None, None),
]


def generate(n_matches: int = 60, seed: int = 42) -> dict[str, list[tuple]]:
    """Row lists per table; deterministic for a given (n_matches, seed)."""
    rng = random.Random(seed)
    rows: dict[str, list[tuple]] = {name: [] for name in ALL_TABLES}

    rows["hero"] = HEROES
    rows["role"] = ROLES
    rows["region"] = REGIONS
    rows["game_mode"] = GAME_MODES
    rows["skill_tier"] = SKILL_TIERS
    rows["item"] = ITEMS
    rows["series"] = _series_rows()
    rows["filter"] = FILTERS
    rows["build"] = BUILDS

    players = [f"player-{i}" for i in range(40)]
    rows["player"] = [(p, f"name-{p}") for p in players]
    rows["team"] = [(1, "alpha"), (2, "beta"), (3, "gamma")]
    statuses = ["initiate", "member", "veteran", "officer", "leader"]
    tm_id = 0
    for t_id in (1, 2, 3):
        for p in rng.sample(players, 12):  # overlapping rosters across teams
            tm_id += 1
            rows["team_membership"].append(
                (tm_id, t_id, p, rng.choice(statuses), 0.0)
            )

    pid = 0
    ph_id = 0
    for m in range(n_matches):
        match_api = f"match-{m}"
        rows["match"].append((match_api,))
        # spread created_at across series boundaries and the 7-day window
        created = NOW - dt.timedelta(
            days=rng.choice([0, 1, 2, 5, 8, 20, 45]),
            hours=rng.randrange(24),
            minutes=rng.randrange(60),
        )
        mode_id = rng.choice([2, 3, 4])
        shard = rng.choice(["na", "eu", "sg", "cn"])  # cn has no region row
        for f_id in rng.sample([2, 3], rng.choice([0, 1, 2])):
            rows["global_point_filters"].append((match_api, f_id))
        rosters = [f"roster-{m}-a", f"roster-{m}-b"]
        for r_i, roster_api in enumerate(rosters):
            rows["roster"].append((roster_api, 2 * m + r_i, match_api))
        winner_side = rng.randrange(2)
        for slot in range(6):
            pid += 1
            api = f"p-{pid}"
            side = slot % 2
            winner = None if rng.random() < 0.08 else (side == winner_side)
            hero_id = rng.choice([2, 3, 4, 5, 99])  # 99: unknown hero
            rows["participant"].append(
                (
                    pid, api, match_api, rng.choice(players), rosters[side],
                    hero_id, rng.choice([2, 3, 4]), shard, mode_id,
                    rng.randrange(0, 30), winner,
                    round(rng.uniform(-5, 5), 2), created,
                )
            )
            grants = _grants(rng)
            rows["participant_stats"].append(
                (
                    api, created, rng.randrange(600, 1800), rng.randrange(15),
                    rng.randrange(12), rng.randrange(20),
                    round(rng.uniform(0, 90), 2), rng.randrange(120),
                    rng.randrange(40), rng.randrange(100), rng.randrange(3),
                    rng.randrange(3), rng.randrange(2), rng.randrange(6),
                    rng.randrange(2000, 14000), round(rng.uniform(0, 200), 2),
                    grants,
                )
            )
            if rng.random() < 0.8:  # some lack items rows (left-join NULLs)
                rows["participant_items"].append(
                    (api, rng.randrange(2), _item_uses(rng))
                )
            for start, end in ((0, 300), (300, 600)):
                ph_id += 1
                rows["participant_phases"].append(
                    (
                        f"ph-{ph_id}", api, start, end,
                        rng.choice([2, 3, 4, 5, None]),
                        _item_uses(rng),
                        *[_phase_measure(rng, c) for c in PHASE_MEASURES],
                    )
                )
    return rows


def _grants(rng: random.Random) -> str:
    """Serialized 'itemId;count,...' with repeats and counts >= 2."""
    n = rng.randrange(1, 5)
    parts = []
    for _ in range(n):
        item = rng.choice([14, 22, 31, 40, 55])
        parts.append(f"{item};{rng.choice([1, 1, 2, 3])}")
    return ",".join(parts)


def _item_uses(rng: random.Random) -> dict[int, int]:
    """Map with some activable keys missing and non-activable keys present."""
    uses = {}
    for item_id in ACTIVABLE_ITEM_IDS:
        if rng.random() < 0.7:
            uses[item_id] = rng.randrange(1, 6)
    uses[rng.choice([40, 55, 77])] = rng.randrange(1, 4)  # outside activable set
    return uses


def _phase_measure(rng: random.Random, col: str):
    import pyspark.sql.types as T

    from cruncher_spark.schemas import PARTICIPANT_PHASES

    dtype = PARTICIPANT_PHASES[col].dataType
    if isinstance(dtype, T.IntegerType):
        return rng.randrange(0, 20)
    return round(rng.uniform(0, 500), 2)


def as_dataframes(
    spark: SparkSession, rows: dict[str, list[tuple]] | None = None
) -> dict[str, DataFrame]:
    rows = rows if rows is not None else generate()
    return {
        name: spark.createDataFrame(rows[name], ALL_TABLES[name])
        for name in rows
    }


def write_parquet(
    spark: SparkSession, out_dir: str, rows: dict[str, list[tuple]] | None = None
) -> dict[str, DataFrame]:
    """Write fixtures to parquet (for DuckDB oracle tests); returns the DFs."""
    dfs = as_dataframes(spark, rows)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for name, df in dfs.items():
        df.coalesce(1).write.mode("overwrite").parquet(str(out / f"{name}.parquet"))
    return dfs
