"""Per-process logical-plan cache for PURE declared queries (r11).

Re-building a declared query's DataFrame costs 0.1-2.6 s of py4j DSL
traffic + eager JVM analysis per run at bench scale (measured: tpch_q2
578 gateway round-trips = 0.33 s; op_fn_geo5 0.77 s of analysis over an
already-cached Column tree) — repeated IDENTICALLY for every run of the
same (query, corpus). This module caches the ANALYZED JVM LOGICAL PLAN
and wraps a FRESH Dataset around it per call: a fresh QueryExecution
re-optimizes, re-plans and re-EXECUTES with new shuffle IDs, so no
stage/shuffle-output reuse is possible. Verified: a repeat collect of the
re-wrapped plan runs the same Spark job count as a fresh build (the
r09-rejected DataFrame reuse collapsed to skipped stages; this does not).
This is the plan cache any long-running engine keeps for repeated
identical query text — results are recomputed from the parquet inputs on
every call.

What is NEVER cached (each guard closes a distinct route to result
caching):

- Plans whose string form shows materialized state: ``LogicalRDD`` /
  ``ExistingRDD`` (a localCheckpoint executed during the build IS
  materialized data), ``InMemoryRelation`` (.cache()), streaming
  relations.
- Plans containing ``LocalRelation``: a query that computes its output in
  Python and returns it via ``local_values`` (EXPLAIN/DESCRIBE demos, DDL
  row counts) embeds the COMPUTED ROWS as plan literals — serving that
  plan again would skip the query's actual work. (This also skips caching
  for honest VALUES inputs; their builds are trivially cheap.)
- Non-deterministic seeds (``rand(``/``randn(``/``uuid(``).
- Any query whose build EXECUTED Spark jobs (DML writes, format
  round-trips, collect-probes, checkpoint fixpoints): detected with the
  status tracker around the build; such a query is marked impure for the
  rest of the process and always rebuilt.

The cache key includes the sparkContext.applicationId, so a restarted
session can never be served py4j refs bound to a dead gateway, and the
cache dies with the process — every bench/driver invocation starts cold.
"""

from __future__ import annotations

import os

_CACHE: dict[tuple, object] = {}

_PLAN_UNSAFE = (
    "LogicalRDD",
    "ExistingRDD",
    "InMemoryRelation",
    "StreamingRelation",
    "LocalRelation",
    "rand(",
    "randn(",
    "uuid(",
)


def enabled() -> bool:
    return not os.environ.get("SPARK_GRAFT_DISABLE_PLAN_CACHE")


def wrap_plan(spark, jplan):
    """Fresh Dataset around a cached analyzed logical plan (full
    re-analysis/optimization/execution; only the DSL re-build is saved)."""
    from pyspark.sql import DataFrame

    jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
        spark._jsparkSession, jplan
    )
    return DataFrame(jdf, spark)


def get(key: tuple, spark):
    jplan = _CACHE.get(key)
    if jplan is None:
        return None
    return wrap_plan(spark, jplan)


def offer(key: tuple, df) -> bool:
    """Store df's analyzed plan under key if it is safe to re-serve.
    Returns False (and stores nothing) for unsafe plans."""
    try:
        jplan = df._jdf.logicalPlan()
        text = jplan.toString()
    except Exception:  # noqa: BLE001 - connect-mode / foreign DataFrame
        return False
    if any(m in text for m in _PLAN_UNSAFE):
        return False
    _CACHE[key] = jplan
    return True


def cached_query(name: str, fn):
    """Wrap a (spark, sf_dir) -> DataFrame declared query with the plan
    cache + purity probe. Queries whose build runs Spark jobs (side
    effects) or whose plan trips a guard are rebuilt on every call."""
    impure = False

    def run(spark, sf_dir: str):
        nonlocal impure
        if impure or not enabled():
            return fn(spark, sf_dir)
        from verax_spark.optimizer.layouts import _registry_state

        key = (
            name,
            sf_dir,
            spark.sparkContext.applicationId,
            _registry_state(sf_dir),
        )
        hit = get(key, spark)
        if hit is not None:
            return hit
        # Job probe via MAX job id (monotonic): a plain count comparison
        # goes flat once the UI store evicts old jobs (spark.ui.retainedJobs,
        # default 1000) and would mis-classify a side-effecting build as
        # pure deep into a long bench run.
        tracker = spark.sparkContext.statusTracker()
        before = max(tracker.getJobIdsForGroup(None) or [-1])
        df = fn(spark, sf_dir)
        after = max(tracker.getJobIdsForGroup(None) or [-1])
        if after != before or not offer(key, df):
            # Build executed jobs (writes/probes/checkpoints) or the plan
            # embeds materialized state: never serve this query from the
            # cache in this process.
            impure = True
        return df

    run.__wrapped_query__ = getattr(fn, "__wrapped_query__", fn)
    run.__name__ = getattr(fn, "__name__", name)
    run.__module__ = fn.__module__
    run.__qualname__ = getattr(fn, "__qualname__", name)
    run.__doc__ = fn.__doc__
    return run


def cache_pure_queries(queries: dict) -> None:
    """Wrap every entry of a QUERIES registry in place."""
    for n in list(queries):
        queries[n] = cached_query(n, queries[n])
