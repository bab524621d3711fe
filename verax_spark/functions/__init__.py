from verax_spark.functions.presto import presto_call, PRESTO_TO_SPARK

__all__ = ["presto_call", "PRESTO_TO_SPARK"]
