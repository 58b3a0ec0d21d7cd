"""Fully distributed Lloyd's k-means over an embedding column.

The third tier of in-engine ML beside the trained logreg classifier
(`operators/classifier.py`, distributed GD) and the driver-fit IVF
quantizer (`operators/similarity.py fit_ivf_centroids`, bounded-sample
collect): here BOTH the fit and the assignment are distributed — no
corpus row and no centroid ever has to visit the driver, so the same
code runs unchanged when the corpus is 100 TB and the centroid table is
millions of rows (K x dim can itself outgrow a broadcast; only the
per-dimension slices joined here need to fit a broadcast, and the join
degrades to shuffle automatically if they don't).

Shapes per iteration (all linear in the corpus, nothing quadratic):

- **assignment**: the exploded (vec_id, dim, component) table joins the
  K x dim centroid table on ``dim`` (broadcast — K x dim rows), squared
  differences partially aggregate map-side to N x K (vec, cluster)
  distance rows, and ``min(struct(d2, cluster))`` picks the nearest
  cluster (ties -> smaller cluster id) in one more keyed aggregate.
- **update**: assignments join back onto components (vec_id-keyed, both
  sides data-sized -> shuffle join, linear) and a (cluster, dim)
  aggregate — map-side combined to parts x K x dim partials — computes
  the new means; empty clusters keep their previous centroid.

Cross-engine exactness (the DuckDB oracle unrolls the same iterations
as chained CTEs — the logreg discipline): components round to 6
decimals in DECIMAL(18,6); centroids are means rounded to 9 in
DECIMAL(28,9); differences narrow to DECIMAL(18,9) so the square is
DECIMAL(37,18) — EXACT (a (28,9)-width product would force Spark's
precision-loss scale adjustment to 17 and diverge from DuckDB's
18-scale product); squared distances accumulate through aggregate SUM,
which preserves scale (38,18), never through expression-level addition,
whose +1-precision rule would also clip the scale. Argmin over exact
decimals is therefore bit-identical in any engine.

Reference parity note: the reference engine (vainglorygame/cruncher)
has no clustering operator — this extends the engine for the
LLM-training-data surface (corpus structure discovery, SemDeDup-style
cell seeding, mixture design), per the round brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["kmeans_assign"]


def _components(vectors: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, dim, v): vectors exploded with 6-decimal components."""
    v6 = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double"), 6).cast("decimal(18,6)")
    )
    return vectors.select(
        F.col(id_col).alias("vec_id"), F.posexplode(v6).alias("dim", "v")
    )


def _sq(diff: Column) -> Column:
    d = diff.cast("decimal(18,9)")
    return (d * d).cast("decimal(38,18)")


def _assign(comp: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per vector: (vec_id, cluster, d2)."""
    d2 = (
        comp.join(F.broadcast(cents), "dim")
        .select(
            "vec_id",
            "cluster",
            _sq(F.col("v").cast("decimal(28,9)") - F.col("c")).alias("sq"),
        )
        .groupBy("vec_id", "cluster")
        .agg(F.sum("sq").alias("d2"))
    )
    return (
        d2.groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cluster")).alias("m"))
        .select(
            "vec_id",
            F.col("m.cluster").alias("cluster"),
            F.col("m.d2").alias("d2"),
        )
    )


def _update(comp: DataFrame, assigned: DataFrame, cents: DataFrame) -> DataFrame:
    """New means per (cluster, dim); empty clusters keep the old centroid."""
    m = (
        comp.join(assigned.select("vec_id", "cluster"), "vec_id")
        .groupBy("cluster", "dim")
        .agg(
            F.round(F.sum("v").cast("double") / F.count(F.lit(1)), 9)
            .cast("decimal(28,9)")
            .alias("cm")
        )
    )
    return cents.join(m, ["cluster", "dim"], "left").select(
        "cluster", "dim", F.coalesce("cm", F.col("c")).alias("c")
    )


def kmeans_assign(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Distributed k-means: ``iters`` Lloyd updates, then final assignment.

    Init is the K lowest-id vectors (cluster ids 0..K-1 in id order) —
    deterministic and reproducible in plain SQL, the same seeding
    :func:`cruncher_spark.operators.similarity.lowest_id_centroids`
    uses. Returns (vec_id, cluster, d2r) where ``d2r`` is the squared
    distance to the winning centroid rounded to 6 decimals.
    """
    comp = _components(vectors, id_col, vec_col)
    seeds = (
        vectors.select(F.col(id_col).alias("vec_id"))
        .orderBy("vec_id")
        .limit(k)
        .select(
            "vec_id",
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias(
                "cluster"
            ),
        )
    )
    cents = comp.join(seeds, "vec_id").select(
        "cluster", "dim", F.col("v").cast("decimal(28,9)").alias("c")
    )
    for _ in range(iters):
        assigned = _assign(comp, cents)
        cents = _update(comp, assigned, cents)
    final = _assign(comp, cents)
    return final.select(
        "vec_id",
        "cluster",
        F.round(F.col("d2").cast("double"), 6).alias("d2r"),
    )
