from cruncher_spark.sources.layout import (
    read_date_range,
    write_bucketed,
    write_date_partitioned,
)
from cruncher_spark.sources.tables import Star, fan_out, load_table

__all__ = [
    "Star",
    "fan_out",
    "load_table",
    "read_date_range",
    "write_bucketed",
    "write_date_partitioned",
]
