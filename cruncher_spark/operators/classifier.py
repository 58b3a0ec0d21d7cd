"""Distributed training of a hashed-feature logistic-regression document
classifier — the "quality/language classifier" stage of LLM data
pipelines (GPT-3's WebText LR filter, CCNet's fasttext lang-id class),
expressed as pure DataFrame algebra so a 100 TB corpus trains without a
single row leaving the cluster.

Model: ``p = sigmoid(w · x)`` over hashed bag-of-words counts (feature
hashing, Weinberger et al. 2009 — vocabulary never materializes; any
token stream maps into ``dim`` buckets via the engine-portable md5 hash)
plus a bias bucket. Training is full-batch gradient descent with a fixed
iteration count — the same fixed-K discipline as the PageRank gate, so
the DuckDB oracle can unroll the rounds as chained CTEs and match every
weight bit-for-bit.

Cross-engine float determinism (the pagerank/tfidf discipline):

- per-(doc,bucket) margin terms and per-(doc,bucket) gradient
  contributions are CAST to DECIMAL(28,14) before their sums, making
  both aggregations exact and order-independent (a plain double sum
  varies with partitioning);
- the sigmoid output is rounded to 9 decimals — ``exp`` is the one
  libm call in the loop and engines may differ in the last ulp; at 1e-9
  granularity a flip needs the true value within ~1e-17 of a boundary;
- weights round to 14 decimals after each update, so every round starts
  from an identical, exactly-representable state.

Scale shape: the feature table is one corpus-sized (doc, bucket)
aggregate. Each round is (a) margin: feature ⋈ weight table on bucket —
the weight side is ``dim + 1`` rows, broadcast at any realistic dim —
then one per-doc decimal sum; (b) gradient: one per-bucket decimal sum;
(c) update: a ``dim``-sized join. Nothing iterates over raw text after
the one feature pass, and no step ever collects corpus-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cruncher_spark.functions.text import portable_hash64

#: decimal type for order-independent margin/gradient accumulation
_DEC = "decimal(28,14)"


def hashed_doc_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    salt: str = "lrfeat",
) -> DataFrame:
    """(id, bucket, x): token counts hashed into ``dim`` buckets plus a
    constant bias feature at bucket ``dim`` — one corpus pass, one
    aggregate."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).select(
        id_col,
        F.pmod(portable_hash64("tok", salt), F.lit(dim)).alias("bucket"),
    )
    counts = toks.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("x")
    )
    bias = docs.select(
        F.col(id_col),
        F.lit(dim).cast("long").alias("bucket"),
        F.lit(1).cast("long").alias("x"),
    )
    return counts.select(id_col, "bucket", F.col("x").cast("long")).unionByName(
        bias
    )


def train_logreg(
    feats: DataFrame,
    labels: DataFrame,
    dim: int = 64,
    iters: int = 3,
    lr: float = 0.5,
    id_col: str = "doc_id",
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-``iters`` full-batch GD from zero weights; returns the
    ``dim + 1``-row (bucket, w) table. ``labels`` is (id, y) with y in
    {0, 1}; ``lr`` should be exactly representable in binary (0.5, 0.25,
    …) so the update arithmetic is identical everywhere.

    ``checkpoint=False`` keeps the whole unrolled iteration lazy —
    value-identical (pinned by test) but with the real multi-round plan
    visible to ``explain``; the audit form plan audits consume
    (the pagerank lazy-form discipline, VERDICT r5 next #1)."""
    spark = feats.sparkSession
    cut = (lambda df: df.localCheckpoint()) if checkpoint else (lambda df: df)
    n = labels.agg(F.count(F.lit(1)).alias("n"))
    w = cut(
        spark.range(dim + 1).select(
            F.col("id").alias("bucket"), F.lit(0.0).alias("w")
        )
    )

    for _ in range(iters):
        margin = (
            feats.join(F.broadcast(w), "bucket")
            .select(
                F.col(id_col),
                (F.col("w") * F.col("x")).cast(_DEC).alias("t"),
            )
            .groupBy(id_col)
            .agg(F.sum("t").cast("double").alias("margin"))
        )
        p = margin.select(
            F.col(id_col),
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))), 9)
            .alias("p"),
        )
        grad = (
            feats.join(p, id_col)
            .join(labels, id_col)
            .select(
                "bucket",
                ((F.col("p") - F.col("y")) * F.col("x")).cast(_DEC).alias("g"),
            )
            .groupBy("bucket")
            .agg(F.sum("g").alias("g"))
        )
        w = (
            w.join(grad, "bucket", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "bucket",
                F.round(
                    F.col("w")
                    - F.lit(lr)
                    * F.coalesce(F.col("g").cast("double"), F.lit(0.0))
                    / F.col("n"),
                    14,
                ).alias("w"),
            )
        )
        w = cut(w)
    return w


def score_logreg(
    feats: DataFrame, weights: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, score): sigmoid margins under a trained weight table — the
    same decimal-sum margin as training, rounded to 9."""
    return (
        feats.join(F.broadcast(weights), "bucket")
        .select(id_col, (F.col("w") * F.col("x")).cast(_DEC).alias("t"))
        .groupBy(id_col)
        .agg(F.sum("t").cast("double").alias("margin"))
        .select(
            F.col(id_col),
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))), 9
            ).alias("score"),
        )
    )
