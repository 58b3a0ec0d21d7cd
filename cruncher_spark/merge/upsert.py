"""Upsert-merge layer: the Spark equivalent of the reference's sinks.

The reference externalizes all aggregate state into its point tables via
``INSERT … ON DUPLICATE KEY UPDATE col = col + VALUES(col)``
(crunch_global.sql:1,68-87) — the table *is* the accumulator. Per-column
merge policies seen in the reference:

- ``add``        — ``col = col + VALUES(col)`` (A11; NULL-propagating:
                   MySQL ``NULL + x = NULL``)
- ``max``        — ``CASE WHEN VALUES(c) > c THEN VALUES(c) ELSE c END``
                   (A12, crunch_player.sql:49; NULL comparison keeps old)
- ``overwrite``  — ``UPDATE … SET c = src.c`` (S4, crunch_team.sql:41-42)

On a production deployment the natural sink is a Delta/Iceberg table and
one ``MERGE INTO tgt USING src ON <key> WHEN MATCHED UPDATE SET
m = tgt.m + src.m WHEN NOT MATCHED INSERT *`` per batch — O(changed
files) with data skipping on the merge key. This module implements the
same semantics dependency-free over plain parquet: full-outer join of
state with the (already key-unique) delta, rewrite, atomic directory
swap. The join co-partitions on the merge key; state files are written
bucketed by key hash so successive merges shuffle only the delta.

Exactly-once: the reference ACKs after commit and therefore double-counts
replayed batches (worker.js:167-182, at-least-once). Here every applied
``batch_id`` is recorded in a ``_applied_batches`` ledger inside the same
swap, so replays are idempotent (T4's deliberate upgrade; the reference's
at-least-once behavior is available by passing ``batch_id=None``).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
from collections.abc import Mapping, Sequence
from enum import Enum
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class MergePolicy(str, Enum):
    ADD = "add"
    MAX = "max"
    OVERWRITE = "overwrite"
    #: column absent from the ON DUPLICATE list — first insert wins
    #: (updated_at in crunch_global.sql:68-87 et al.)
    KEEP = "keep"


class PointTable:
    """A persistent upsert-merged accumulator table over parquet.

    ``key`` is the grouping-key tuple (merge identity — the reference's
    PRIMARY KEY on the point table); ``policies`` maps measure column →
    MergePolicy, defaulting to ADD (the dominant reference policy).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: Sequence[str],
        policies: Mapping[str, MergePolicy] | None = None,
        num_buckets: int = 32,
    ):
        self.spark = spark
        self.path = Path(path)
        self.key = list(key)
        self.policies = dict(policies or {})
        self.num_buckets = num_buckets

    # -- state access -------------------------------------------------------

    @property
    def _data_dir(self) -> Path:
        return self.path / "data"

    @property
    def _ledger_dir(self) -> Path:
        return self.path / "_applied_batches"

    def exists(self) -> bool:
        return self._data_dir.exists()

    def read(self) -> DataFrame:
        if not self.exists():
            raise FileNotFoundError(f"point table not initialized: {self.path}")
        return self.spark.read.parquet(str(self._data_dir))

    def applied_batches(self) -> set[str]:
        if not self._ledger_dir.exists():
            return set()
        df = self.spark.read.parquet(str(self._ledger_dir))
        return {r.batch_id for r in df.select("batch_id").collect()}

    # -- merge --------------------------------------------------------------

    def merge(self, delta: DataFrame, batch_id: str | None = None) -> bool:
        """Fold one delta (key-unique rows) into the table.

        Returns False (no-op) if ``batch_id`` was already applied —
        idempotent replay. With ``batch_id=None`` replays double-count,
        which is the reference's at-least-once behavior.
        """
        if batch_id is not None and batch_id in self.applied_batches():
            return False

        if not self.exists():
            merged = delta
        else:
            merged = self._merge_frames(self.read(), delta)

        self._swap_in(merged, batch_id)
        return True

    def _merge_frames(self, tgt: DataFrame, src: DataFrame) -> DataFrame:
        t = tgt.select([F.col(c).alias(f"_t_{c}") for c in tgt.columns])
        s = src.select([F.col(c).alias(f"_s_{c}") for c in src.columns])
        cond = None
        for k in self.key:
            eq = t[f"_t_{k}"].eqNullSafe(s[f"_s_{k}"])
            cond = eq if cond is None else (cond & eq)
        joined = t.join(s, cond, "full_outer")

        out = []
        in_src = F.col(f"_s_{self.key[0]}").isNotNull()
        in_tgt = F.col(f"_t_{self.key[0]}").isNotNull()
        for c in tgt.columns:
            tc, sc = F.col(f"_t_{c}"), F.col(f"_s_{c}")
            if c in self.key:
                out.append(F.coalesce(tc, sc).alias(c))
                continue
            policy = self.policies.get(c, MergePolicy.ADD)
            if policy == MergePolicy.ADD:
                # NULL + x = NULL, matching MySQL (crunch_global.sql:69).
                # Doubles add through DECIMAL(28,6) so accumulated state is
                # bit-exact and order-independent (the reference instead
                # accumulates float rounding error — a deliberate upgrade).
                dtype = dict(tgt.dtypes)[c]
                if dtype in ("double", "float"):
                    merged_val = (
                        tc.cast("decimal(28,6)") + sc.cast("decimal(28,6)")
                    ).cast(dtype)
                else:
                    merged_val = tc + sc
            elif policy == MergePolicy.MAX:
                merged_val = F.when(sc > tc, sc).otherwise(tc)
            elif policy == MergePolicy.KEEP:
                merged_val = tc
            else:  # OVERWRITE
                merged_val = sc
            out.append(
                F.when(in_src & in_tgt, merged_val)
                .when(in_src, sc)
                .otherwise(tc)
                .alias(c)
            )
        return joined.select(out)

    def _swap_in(self, merged: DataFrame, batch_id: str | None) -> None:
        """Write the new state beside the old, then atomically swap dirs.

        Parquet has no transaction log; the rename is the commit point
        (Delta's _delta_log plays this role at scale — see module doc).
        """
        self.path.mkdir(parents=True, exist_ok=True)
        tmp = Path(
            tempfile.mkdtemp(prefix="_staging_", dir=str(self.path))
        )
        (
            merged.repartition(self.num_buckets, *[F.col(k) for k in self.key])
            .write.mode("overwrite")
            .parquet(str(tmp / "data"))
        )
        if batch_id is not None:
            ledger = self.applied_batches() | {batch_id}
            self.spark.createDataFrame(
                [(b,) for b in sorted(ledger)], "batch_id string"
            ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "ledger"))

        old = Path(str(self._data_dir) + f".old.{int(time.time() * 1e6)}")
        if self._data_dir.exists():
            os.rename(self._data_dir, old)
        os.rename(tmp / "data", self._data_dir)
        if batch_id is not None:
            old_ledger = Path(str(self._ledger_dir) + ".old")
            if self._ledger_dir.exists():
                os.rename(self._ledger_dir, old_ledger)
            os.rename(tmp / "ledger", self._ledger_dir)
            shutil.rmtree(old_ledger, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
