"""Skew-aware join: salting for hot keys.

AQE's skew-join splitting (enabled in the session factory) handles skewed
SHUFFLE partitions at runtime, but only for sort-merge joins it can see; a
pathologically hot key (zipf user_id at 100 TB) can still serialize one
task. Salting is the explicit fix: split each hot left-side key into
`salt_factor` synthetic sub-keys and replicate the matching right-side rows
across all sub-keys, turning one giant partition into salt_factor even ones.

Deterministic: the salt comes from xxhash64 of a caller-chosen disambiguator
column (e.g. the fact table's row id), not from rand(), so results are
reproducible under retries and speculative execution — rand() in a join key
breaks task retry idempotency.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    *,
    salt_col: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted by `salt_factor`.

    left is the large/skewed side; `salt_col` is any left column with high
    cardinality (row id) used to derive the deterministic salt. right rows
    are replicated salt_factor times (explode of a literal range — keep the
    right side the smaller one).
    """
    salted_left = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_factor))
    )
    replicated_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    joined = salted_left.join(
        replicated_right,
        (F.col(left_key) == F.col(right_key)) & (salted_left["__salt"] == replicated_right["__salt"]),
        how,
    )
    return joined.drop("__salt")
