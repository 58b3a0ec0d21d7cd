"""cruncher_spark — a PySpark-native incremental OLAP analytics engine.

A from-scratch re-expression of the capabilities of ``vainglorygame/cruncher``
(reference snapshot at /root/reference, read-only) on Apache Spark:

- the reference's hand-rolled ``'all'``-dimension-row cube (OR-join fan-out,
  crunch_global.sql:41-45) becomes native ``GROUP BY GROUPING SETS``
  (:mod:`cruncher_spark.operators.grouping`);
- its interval/band joins (series membership, skill-tier bands) become
  broadcast range joins (:mod:`cruncher_spark.operators.interval_join`);
- its regex theta-join on item builds becomes a broadcast nested-loop
  ``rlike`` join (:mod:`cruncher_spark.operators.regex_join`);
- its ``INSERT .. ON DUPLICATE KEY UPDATE col = col + VALUES(col)`` upsert
  accumulator becomes an additive MERGE layer
  (:mod:`cruncher_spark.merge.point_table`);
- its AMQP micro-batch worker loop becomes Structured Streaming
  ``foreachBatch`` (:mod:`cruncher_spark.streaming.worker`).

Beyond reference parity, :mod:`cruncher_spark.operators.dedup`,
:mod:`cruncher_spark.operators.similarity` and
:mod:`cruncher_spark.functions.text` add the large-scale training-data
pipeline operators (dedup, ANN search, text analysis) designed for
100 TB-scale execution (broadcast-able dims, shuffle-minimal plans,
no row-at-a-time Python in hot paths).
"""

__version__ = "0.1.0"
