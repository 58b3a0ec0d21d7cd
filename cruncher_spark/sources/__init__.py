from cruncher_spark.sources.tables import Star, fan_out, load_table

__all__ = ["Star", "fan_out", "load_table"]
