"""Build-once cache for pure Column expression trees (r10, guide §1.2
step 2 / §5 driver work).

Operator modules build large Column trees from literals and unresolved
column names only — MinHash permutation aggregates (64 min/xxhash64
terms), SimHash bit-lane sums (64 when/bitwiseAND terms), LSH sign
projections (16 zip_with/aggregate higher-order folds). Constructing
them is pure py4j round-trip traffic repeated IDENTICALLY on every
operator call — measured 0.5–1.9 s of per-query steady time at sf0.1
(tools/profile_query.py; e.g. pl_dedup_minhash build 1.85 s of a 2.1 s
total). The JVM expression objects are plan-independent (unresolved
attributes, resolved fresh by the analyzer in every query that uses
them), so they can be cached per JVM gateway and reused across calls.

This caches EXPRESSIONS only — never data, plans, or results. The cache
key must include every parameter that shapes the expression (column
names, permutation/band counts); the JVM id guards against a restarted
gateway holding stale object references.
"""

from __future__ import annotations

from typing import Any, Callable

_CACHE: dict = {}


def cached_exprs(key: tuple, builder: Callable[[], Any]) -> Any:
    from pyspark.sql import SparkSession

    sess = SparkSession.getActiveSession()
    jvm_id = 0 if sess is None else id(sess.sparkContext._jvm)
    ck = (key, jvm_id)
    v = _CACHE.get(ck)
    if v is None:
        v = builder()
        _CACHE[ck] = v
    return v
