from verax_spark.queries import tpch

__all__ = ["tpch"]
