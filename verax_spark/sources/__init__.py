from verax_spark.sources.layout import (
    write_bucketed,
    write_partitioned,
)

__all__ = ["write_bucketed", "write_partitioned"]
