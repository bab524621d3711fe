from verax_spark.sources.cow import delete_rows, update_rows
from verax_spark.sources.layout import (
    write_bucketed,
    write_partitioned,
)

__all__ = ["delete_rows", "update_rows", "write_bucketed", "write_partitioned"]
