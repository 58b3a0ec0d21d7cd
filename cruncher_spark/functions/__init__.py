from cruncher_spark.functions.scalars import dsum, posix_to_java_regex

__all__ = ["dsum", "posix_to_java_regex"]
