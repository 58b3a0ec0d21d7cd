from cruncher_spark.merge.upsert import MergePolicy, PointTable

__all__ = ["MergePolicy", "PointTable"]
