"""Plan-shape assertions for the corpus (PlanTest/TpchPlanTest analog) +
metamorphic config sweeps (AxiomSql check_test_flag_combinations analog).

The shape tests pin the physical properties we design for at 100 TB:
filters and projections reach the parquet scan, dimension joins broadcast,
top-k splits into TakeOrderedAndProject, aggregates are partial+final.
The metamorphic tests re-run queries under different optimizer/runtime
configurations and demand identical results.
"""

import pyspark.sql.functions as F
import pytest

from verax_spark.catalog import Catalog
from verax_spark.queries import tpch
from verax_spark.testing import assert_frames_match
from verax_spark.testing_plans import (
    PlanMatcher,
    count_exchanges,
    has_whole_stage_codegen,
    physical_plan,
    pushed_filters,
    read_schema_columns,
)


def test_q6_filter_pushdown_and_pruning(spark, sf_dir):
    df = tpch.q6(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "l_quantity" in pushed and "l_discount" in pushed, pushed
    cols = read_schema_columns(df)
    assert cols <= {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}, cols
    assert has_whole_stage_codegen(df)


def test_q6_plan_shape(spark, sf_dir):
    PlanMatcher().scan().aggregate().exchange().aggregate().assert_matches(
        tpch.q6(spark, sf_dir)
    )


def test_q3_topk_plan(spark, sf_dir):
    assert "TakeOrderedAndProject" in physical_plan(tpch.q3(spark, sf_dir))


def test_q5_broadcasts_dimensions(spark, sf_dir):
    plan = physical_plan(tpch.q5(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_partial_final_aggregation(spark, sf_dir):
    """Spark must split grouped aggs into partial+final (map-side combine) —
    the reference models this explicitly (RelationOp Aggregation step)."""
    plan = physical_plan(tpch.q1(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, plan


def test_join_count_bounded_exchanges(spark, sf_dir):
    """q5 joins 6 tables; with dims broadcast the shuffle count stays small
    (fact-side exchanges only). Regression guard against plans that
    re-shuffle per join."""
    n = count_exchanges(tpch.q5(spark, sf_dir))
    assert n <= 6, f"too many exchanges: {n}"


# -- metamorphic config sweeps ----------------------------------------------
_SWEEP = [
    {"spark.sql.adaptive.enabled": "false"},
    {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    {"spark.sql.shuffle.partitions": "3"},
]


@pytest.mark.parametrize("overrides", _SWEEP, ids=["no-aqe", "no-broadcast", "3-parts"])
@pytest.mark.parametrize("qname", ["tpch_q5", "tpch_q13", "tpch_q17"])
def test_metamorphic_config_sweep(spark, sf_dir, qname, overrides):
    """Results must be invariant under optimizer/runtime config changes
    (reference: AxiomSql.cpp:105-108 flag-combination checks)."""
    baseline = tpch.QUERIES[qname](spark, sf_dir).toPandas()
    saved = {k: spark.conf.get(k) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        swept = tpch.QUERIES[qname](spark, sf_dir).toPandas()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert_frames_match(swept, baseline, context=f"{qname}:{overrides}")


def test_parallelism_sweep_union_partitions(spark, sf_dir):
    """Same result whether the source is 1 partition or many (reference's
    workers×drivers matrix, QueryTestBase.h:57-68)."""
    cat = Catalog(spark, sf_dir)
    base = (
        cat.lineitem.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
        .toPandas()
    )
    one = (
        cat.lineitem.coalesce(1)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
        .toPandas()
    )
    many = (
        cat.lineitem.repartition(17)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
        .toPandas()
    )
    assert_frames_match(one, base, context="coalesce1")
    assert_frames_match(many, base, context="repartition17")


def test_tpch_plans_have_no_duplicate_fact_scans(spark, sf_dir):
    """Regression guard for the single-pass rewrites (q2/q11/q15/q17/q21):
    no table may appear twice in any TPC-H physical plan, except known-benign
    double scans — nation twice in q7/q8 (two join roles of a broadcast
    dimension) and customer twice in q22 (single-column scalar-subquery
    rescan)."""
    import re
    from collections import Counter

    from verax_spark.queries import tpch

    allowed = {
        ("tpch_q7", "nation"), ("tpch_q8", "nation"), ("tpch_q22", "customer"),
        # r05 implied-predicate pushdown: q5 reads the bounded nation
        # dimension twice — once as the broadcast semi-filter that
        # pre-reduces customers to Asian nations, once as the display join
        # (region rides along: nation is pre-joined to the ASIA region in
        # both roles, so region's 5-row scan also appears twice)
        ("tpch_q5", "nation"), ("tpch_q5", "region"),
    }
    for name, fn in sorted(tpch.QUERIES.items()):
        df = fn(spark, sf_dir)
        # execute first and inspect only the FINAL adaptive plan: AQE
        # applies exchange/stage reuse at runtime, so a pre-execution
        # plan (and the "Initial Plan" section of an executed one) shows
        # a shared subtree as two scans even though it runs once —
        # q11's broadcast-threshold branch is the canonical case
        # (ReusedExchange over the groupBy's hash exchange).
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        files = re.findall(r"Location: InMemoryFileIndex[^\n]*?(\w+)\.parquet", plan)
        for table, cnt in Counter(files).items():
            if cnt > 1 and (name, table) not in allowed:
                raise AssertionError(
                    f"{name} scans {table} {cnt}x — single-pass regression"
                )


def test_exact_dedup_winners_reused_at_runtime(spark, sf_dir):
    """The winners semi-join relation is pushed below the union into both
    branches in the static plan (two identical broadcast subtrees); AQE's
    runtime stage reuse must collapse them into one computation."""
    from verax_spark.queries import pipeline

    df = pipeline.QUERIES["pl_dedup_exact"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan


def test_scale_lint_detects_unpartitioned_window(spark):
    """tools/scale_lint.py structural detector: a global window flags,
    a partitioned one does not, a broadcast nested loop flags."""
    import json

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from tools.scale_lint import lint_plan_json

    def nodes_of(df):
        ep = df._jdf.queryExecution().executedPlan()
        if ep.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            ep = ep.initialPlan()
        return json.loads(ep.toJSON())

    base = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("g")
    )
    global_w = base.select(
        F.row_number().over(Window.partitionBy().orderBy("id")).alias("r")
    )
    assert "unpartitioned-window" in lint_plan_json(nodes_of(global_w))

    part_w = base.select(
        F.row_number().over(Window.partitionBy("g").orderBy("id")).alias("r")
    )
    assert "unpartitioned-window" not in lint_plan_json(nodes_of(part_w))

    nl = base.crossJoin(F.broadcast(spark.range(3).select(F.col("id").alias("j"))))
    assert "nested-loop" in lint_plan_json(nodes_of(nl))
