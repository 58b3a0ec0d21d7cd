from cruncher_spark.streaming.worker import CrunchWorker

__all__ = ["CrunchWorker"]
