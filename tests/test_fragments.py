"""MultiFragmentPlan-analog fragment extraction (plans/fragments.py).

The reference asserts fragment decomposition of optimized plans
(runner/MultiFragmentPlan.h contract); these tests pin the same properties
on Spark physical plans: exchanges become fragment boundaries with the
right kinds, broadcast dimensions become broadcast fragments, top-k roots
gather to one partition.
"""

import pyspark.sql.functions as F

from verax_spark.catalog import Catalog
from verax_spark.plans.fragments import fragment_plan


def test_q1_shape_partial_final_agg(spark, sf_dir):
    from verax_spark.queries import tpch

    frag = fragment_plan(tpch.q1(spark, sf_dir))
    # root (sort) <- final agg fragment <- scan+partial-agg fragment
    assert frag.count() >= 3
    assert frag.kind == "root"
    flat = []

    def collect(f):
        flat.append(f)
        for i in f.inputs:
            collect(i)

    collect(frag)
    kinds = [f.kind for f in flat]
    assert "partitioned" in kinds
    leaf = [f for f in flat if not f.inputs][-1]
    assert any("Scan" in op for op in leaf.ops)
    assert any("HashAggregate" in op for op in leaf.ops)  # partial agg co-located with scan


def test_q3_broadcast_fragments(spark, sf_dir):
    from verax_spark.queries import tpch

    frag = fragment_plan(tpch.q3(spark, sf_dir))
    flat = []

    def collect(f):
        flat.append(f)
        for i in f.inputs:
            collect(i)

    collect(frag)
    # r05 q3 shape: customer participates as a broadcast SEMI key set
    # (PK-filter join); the orders side is a shuffled-hash build (hinted),
    # so exactly the key-set broadcast remains
    assert sum(1 for f in flat if f.kind == "broadcast") >= 1  # customer keys
    assert sum(1 for f in flat if f.kind == "partitioned") >= 1  # fact exchange
    assert frag.width == 1  # TakeOrderedAndProject gathers to the driver


def test_join_shuffle_is_partitioned_boundary(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = (
            cat.orders.join(
                cat.lineitem, F.col("o_orderkey") == F.col("l_orderkey")
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        frag = fragment_plan(df)
        flat = []

        def collect(f):
            flat.append(f)
            for i in f.inputs:
                collect(i)

        collect(frag)
        # both join inputs shuffle on the key → ≥2 partitioned boundaries
        assert sum(1 for f in flat if f.kind == "partitioned") >= 2
        assert all(f.width >= 0 for f in flat)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_pretty_renders_every_fragment(spark, sf_dir):
    from verax_spark.queries import tpch

    frag = fragment_plan(tpch.q3(spark, sf_dir))
    text = frag.pretty()
    assert text.count("fragment") == frag.count()
    assert "broadcast" in text
