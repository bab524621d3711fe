"""Plan-cache semantics (verax_spark/plancache).

The cache may re-serve the ANALYZED LOGICAL PLAN of a pure query, but a
repeat call must be a full re-execution (fresh shuffle IDs — same job
count as a fresh build, no skipped-stage collapse) with identical
results, and queries with side-effecting builds (DML demos) or
Python-computed local results must never be served from the cache.
"""

from __future__ import annotations

import pytest

from verax_spark import plancache
from verax_spark.queries import operators, tpch


def _jobs(spark):
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(None) or [])


def test_pure_query_repeat_is_full_reexecution(spark, sf_dir):
    fn = tpch.QUERIES["tpch_q3"]
    df1 = fn(spark, sf_dir)
    before = _jobs(spark)
    r1 = sorted(map(tuple, df1.collect()))
    jobs_fresh = _jobs(spark) - before

    df2 = fn(spark, sf_dir)  # plan-cache hit (same key)
    before = _jobs(spark)
    r2 = sorted(map(tuple, df2.collect()))
    jobs_cached = _jobs(spark) - before

    assert r1 == r2
    # No stage reuse: the re-wrapped plan must schedule the same jobs a
    # fresh build does (the r09-rejected DataFrame reuse collapsed the job
    # count — that behavior must never come back).
    assert jobs_cached == jobs_fresh


def test_impure_build_never_cached(spark, sf_dir):
    # op_table_update rewrites a parquet table during the build: the job
    # probe must mark it impure and keep it out of the cache.
    name = "op_table_update"
    fn = operators.QUERIES[name]
    r1 = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert not any(k[0] == name for k in plancache._CACHE)
    r2 = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert not any(k[0] == name for k in plancache._CACHE)
    assert r1 == r2


def test_local_values_plan_not_cached(spark, sf_dir):
    # op_values returns a LocalRelation-rooted plan; plans embedding local
    # rows are never cached (a python-computed result wrapped in
    # local_values would otherwise be re-served without doing the work).
    name = "op_values"
    fn = operators.QUERIES[name]
    r1 = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert not any(k[0] == name for k in plancache._CACHE)
    r2 = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert r1 == r2


def test_cached_plan_results_match_uncached(spark, sf_dir, monkeypatch):
    name = "op_fn_collections"
    fn = operators.QUERIES[name]
    cached = sorted(map(tuple, fn(spark, sf_dir).collect()))
    cached2 = sorted(map(tuple, fn(spark, sf_dir).collect()))
    monkeypatch.setenv("SPARK_GRAFT_DISABLE_PLAN_CACHE", "1")
    fresh = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert cached == fresh
    assert cached2 == fresh
