"""Distributed graph operators for dedup pipelines.

The endpoint of every near-dup pipeline (MinHash/SimHash/embedding) is not
the pair list — it's the *partition into duplicate clusters* so the
pipeline can keep one representative per cluster. That is connected
components over the pair graph.

Implementation: iterative min-label propagation expressed as DataFrame
joins — each round every node adopts the smallest component id among
itself and its neighbors, followed by a pointer-jumping shortcut
(``comp ← comp(comp)``) that collapses chains, giving O(log n) rounds on
path-shaped graphs instead of O(diameter). Each round's result is
``localCheckpoint``-ed so lineage (and the replayed shuffle DAG) stays
constant-size across iterations. All state is (id, comp) pairs — shuffle
volume per round is O(V + E), never materializing pair-wise reachability.

At 100 TB the same loop holds: edges and labels are co-partitioned by the
join key each round (one hash shuffle each), and convergence is detected
with a single scalar aggregate (sum of labels strictly decreases — no
row-wise diff join). For adversarial graph shapes (giant near-chain
components) switch to alternating large-star/small-star rounds
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
— same (id, comp) state, provably O(log^2 n) rounds; the propagation
kernel below is the building block either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 50,
) -> DataFrame:
    """Component id (= min node id in the component) for every node that
    appears in ``pairs``.

    Returns (id, comp). Deterministic: min-id labeling is independent of
    iteration order. Raises if ``max_iter`` rounds don't converge (a
    diameter-2^max_iter graph — not a realistic dedup clustering).
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("comp")).first()[0]

    for _ in range(max_iter):
        # each node pulls the min label among its neighbors ...
        neighbor_min = (
            edges.join(
                labels.select(F.col("id").alias("b"), F.col("comp").alias("bc")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("bc").alias("nc"))
        )
        stepped = labels.join(
            neighbor_min.select(F.col("a").alias("id"), "nc"), "id", "left"
        ).select(
            "id", F.least("comp", F.coalesce("nc", F.col("comp"))).alias("comp")
        )
        # ... then pointer-jumps: comp ← comp(comp). comp values are node
        # ids, so the lookup table is `stepped` itself.
        labels = (
            stepped.alias("s")
            .join(
                stepped.select(
                    F.col("id").alias("comp"), F.col("comp").alias("cc")
                ).alias("t"),
                "comp",
            )
            .select(F.col("id"), F.col("cc").alias("comp"))
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("comp")).first()[0]
        if new_sum == prev_sum:
            edges.unpersist()
            return labels
        prev_sum = new_sum
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
