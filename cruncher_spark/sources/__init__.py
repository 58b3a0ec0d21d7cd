from cruncher_spark.sources.tables import Star, load_table

__all__ = ["Star", "load_table"]
