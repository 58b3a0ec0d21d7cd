from cruncher_spark.operators.grouping import (
    ALL_LABEL,
    grouping_sets_rollup,
    grouping_sets_sql,
)
from cruncher_spark.operators.joins import (
    band_join,
    cooccurrence_pairs,
    interval_join,
    regex_join,
)

__all__ = [
    "ALL_LABEL",
    "grouping_sets_rollup",
    "grouping_sets_sql",
    "band_join",
    "cooccurrence_pairs",
    "interval_join",
    "regex_join",
]
