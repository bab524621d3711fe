from verax_spark.sql.presto import PrestoSession, transpile

__all__ = ["PrestoSession", "transpile"]
