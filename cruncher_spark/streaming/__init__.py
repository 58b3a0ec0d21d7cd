from cruncher_spark.streaming.frontier import UrlFrontier
from cruncher_spark.streaming.worker import CrunchWorker

__all__ = ["CrunchWorker", "UrlFrontier"]
