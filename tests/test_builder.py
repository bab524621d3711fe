"""PlanBuilder/ExprApi tests: fluent chains produce oracle-matching results.

Models the reference's PlanBuilderTest/ExprApiTest plus the differential
check (QueryTestBase::checkSame).
"""

import pyspark.sql.functions as F

from verax_spark.plans import Call, Col, Lit, PlanBuilder, Sql
from verax_spark.plans.expr import Agg
from verax_spark.testing import assert_frames_match, duckdb_connection


def _oracle(sf_dir, sql):
    con = duckdb_connection(sf_dir)
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def test_builder_q6_scan_filter_agg(spark, sf_dir):
    """TPC-H Q6 through the fluent chain (SURVEY §7 M0 slice)."""
    df = (
        PlanBuilder(spark, sf_dir)
        .table_scan("lineitem", ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
        .filter(
            (Col("l_shipdate") >= Lit("1996-01-01").cast("timestamp"))
            & (Col("l_shipdate") < Lit("1997-01-01").cast("timestamp"))
            & Col("l_discount").between(0.05, 0.07)
            & (Col("l_quantity") < 24)
        )
        .aggregate(
            [],
            {
                "revenue": Sql(
                    "cast(sum(cast(l_extendedprice as decimal(12,2))"
                    " * cast(l_discount as decimal(3,2))) as double)"
                )
            },
        )
        .build()
    )
    from verax_spark.queries.tpch import Q6_SQL

    assert_frames_match(df.toPandas(), _oracle(sf_dir, Q6_SQL), context="builder_q6")


def test_builder_join_agg_sort_limit(spark, sf_dir):
    """customer ⋈ orders with agg + top-k (Q3 shape) via builder."""
    cust = PlanBuilder(spark, sf_dir).table_scan("customer").filter(
        Col("c_mktsegment") == "BUILDING"
    )
    df = (
        PlanBuilder(spark, sf_dir)
        .table_scan("orders")
        .join(cust, Col("c_custkey") == Col("o_custkey"))
        .aggregate(
            ["o_orderstatus"],
            {"n": Agg("count"), "total": Agg("sum", Col("o_totalprice").cast("decimal(12,2)")).cast("double")},
        )
        .sort((Col("total"), "desc"), "o_orderstatus")
        .limit(3)
        .build()
    )
    oracle = _oracle(
        sf_dir,
        """
        select o_orderstatus, count(*) as n,
               cast(sum(cast(o_totalprice as decimal(12,2))) as double) as total
        from orders join customer on c_custkey = o_custkey
        where c_mktsegment = 'BUILDING'
        group by o_orderstatus order by total desc, o_orderstatus limit 3
        """,
    )
    assert_frames_match(df.toPandas(), oracle, context="builder_join")


def test_builder_values_project_unnest(spark, sf_dir):
    df = (
        PlanBuilder(spark, sf_dir)
        .values([(1, [10, 20]), (2, [30]), (3, [])], "id int, xs array<int>")
        .unnest(Col("xs"), ordinality=True, alias="x")
        .project(Col("id"), Col("x"), Col("x_ordinality"))
        .sort("id", "x_ordinality")
        .build()
    )
    rows = [(r.id, r.x, r.x_ordinality) for r in df.collect()]
    # id=3 dropped (empty array), ordinality 1-based
    assert rows == [(1, 10, 1), (1, 20, 2), (2, 30, 1)]


def test_builder_exists_and_scalar_subquery(spark, sf_dir):
    """EXISTS → semi join; scalar subquery → broadcast cross join."""
    big_orders = PlanBuilder(spark, sf_dir).table_scan("orders").filter(
        Col("o_totalprice") > 45000
    )
    avg_bal = (
        PlanBuilder(spark, sf_dir)
        .table_scan("customer")
        .aggregate([], {"avg_bal": Agg("avg", Col("c_acctbal"))})
    )
    df = (
        PlanBuilder(spark, sf_dir)
        .table_scan("customer")
        .filter_exists(big_orders, Col("c_custkey") == Col("o_custkey"))
        .with_scalar_subquery("avg_bal", avg_bal)
        .filter(Col("c_acctbal") > Col("avg_bal"))
        .aggregate([], {"n": Agg("count")})
        .build()
    )
    oracle = _oracle(
        sf_dir,
        """
        select count(*) as n from customer
        where exists (select 1 from orders where o_custkey = c_custkey and o_totalprice > 45000)
          and c_acctbal > (select avg(c_acctbal) from customer)
        """,
    )
    assert_frames_match(df.toPandas(), oracle, context="builder_exists")


def test_builder_setops_and_explain(spark, sf_dir):
    a = PlanBuilder(spark, sf_dir).table_scan("customer").project(
        Col("c_nationkey").alias("k")
    )
    b = PlanBuilder(spark, sf_dir).table_scan("supplier").project(
        Col("s_nationkey").alias("k")
    )
    pb = a.intersect(b)
    df = pb.sort("k").build()
    oracle = _oracle(
        sf_dir,
        "select c_nationkey as k from customer intersect select s_nationkey from supplier order by k",
    )
    assert_frames_match(df.toPandas(), oracle, context="builder_setop")
    tree = pb.explain_logical()
    assert "Set(intersect)" in tree and "TableScan" in tree


def test_expr_api_presto_functions(spark, sf_dir):
    """Presto-name function calls through the shim."""
    df = (
        PlanBuilder(spark, sf_dir)
        .table_scan("documents")
        .filter(Col("doc_id") < 10)
        .project(
            Col("doc_id"),
            Call("cardinality", Call("split", Col("text"), Lit(" "))).alias("n_words"),
            Call("strpos", Col("text"), Lit("the")).alias("the_pos"),
            Call("upper", Col("lang")).alias("lang_uc"),
        )
        .sort("doc_id")
        .build()
    )
    oracle = _oracle(
        sf_dir,
        """
        select doc_id, len(string_split(text, ' ')) as n_words,
               strpos(text, 'the') as the_pos, upper(lang) as lang_uc
        from documents where doc_id < 10 order by doc_id
        """,
    )
    assert_frames_match(df.toPandas(), oracle, context="expr_presto")


def test_builder_physical_plan_has_pushdown(spark, sf_dir):
    """Filter + column pruning must reach the parquet scan (SURVEY §4)."""
    pb = (
        PlanBuilder(spark, sf_dir)
        .table_scan("lineitem", ["l_shipdate", "l_quantity"])
        .filter(Col("l_quantity") < 5)
        .project(Col("l_shipdate"))
    )
    plan = pb.explain_physical()
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5" in plan.replace(
        "l_quantity, 5", "l_quantity,5"
    ), plan
    assert "l_extendedprice" not in plan  # pruned


def test_explain_logical_golden(spark, sf_dir):
    """PlanPrinter golden-string parity (reference PlanPrinterTest)."""
    pb = (
        PlanBuilder(spark, sf_dir)
        .table_scan("lineitem", ["l_orderkey", "l_quantity"])
        .filter(Col("l_quantity") > 40)
        .aggregate(["l_orderkey"], {"n": Sql("count(*)")})
        .sort("l_orderkey")
        .limit(5)
    )
    assert pb.explain_logical() == (
        "- Limit [5]\n"
        "  - Sort [1 keys]\n"
        "    - Aggregate [keys=['l_orderkey'] aggs=['n']]\n"
        "      - Filter [Call]\n"
        "        - TableScan [lineitem cols=['l_orderkey', 'l_quantity']]"
    )


def test_lambda_expr_in_builder(spark, sf_dir):
    """LambdaExpr through the typed DSL (higher-order transform/filter)."""
    from verax_spark.plans.expr import Lambda

    df = (
        PlanBuilder(spark, sf_dir)
        .table_scan("documents")
        .filter(Col("doc_id") < 10)
        .project(
            Col("doc_id"),
            Call(
                "array_to_string",
                Call(
                    "transform",
                    Call("split", Col("text"), Lit(" ")),
                    Lambda(["w"], lambda w: Call("upper", w)),
                ),
                Lit("|"),
            ).alias("uc"),
        )
        .sort("doc_id")
        .build()
    )
    oracle = _oracle(
        sf_dir,
        """
        select doc_id,
          array_to_string(list_transform(string_split(text, ' '), w -> upper(w)), '|') as uc
        from documents where doc_id < 10 order by doc_id
        """,
    )
    assert_frames_match(df.toPandas(), oracle, context="lambda_expr")


def test_values_is_local_relation(spark):
    """ValuesNode must compile to a LocalRelation (in-plan literal table),
    not a parallelized RDD scan — a 3-row VALUES must run zero tasks."""
    import datetime

    from verax_spark.plans.builder import local_values

    rows = [
        (1, "it's\na\\b", 2.5, None, datetime.datetime(2020, 1, 2, 3, 4, 5, 123456), True),
        (None, None, 3.0, 7.0, None, False),
    ]
    schema = "a int, b string, c double, d double, e timestamp, f boolean"
    df = local_values(spark, rows, schema)
    ref = spark.createDataFrame(rows, schema)
    assert [f.dataType for f in df.schema.fields] == [f.dataType for f in ref.schema.fields]
    got = sorted((str(r) for r in df.collect()))
    want = sorted((str(r) for r in ref.collect()))
    assert got == want
    assert "LocalRelation" in df._jdf.queryExecution().optimizedPlan().toString()

    # non-literal types fall back to createDataFrame transparently
    fb = local_values(spark, [([1, 2],)], "g array<int>")
    assert fb.collect()[0][0] == [1, 2]

    # the fluent builder path
    chained = PlanBuilder(spark).values([(2, "y"), (1, "x")], "a int, b string").sort("a").build()
    assert [tuple(r) for r in chained.collect()] == [(1, "x"), (2, "y")]


def test_scalar_subquery_enforce_single_row(spark):
    """EnforceSingleRow semantics (ref RelationOp.h RelType): a scalar
    subquery with >1 row errors at runtime; an EMPTY subquery yields NULL
    for every outer row (a bare cross join would drop them)."""
    import pytest as _pytest

    from verax_spark.plans.builder import PlanBuilder

    def b(rows, schema):
        return PlanBuilder(spark).values(rows, schema)

    with _pytest.raises(Exception, match="more than one row"):
        (
            b([(1,), (2,)], "x int")
            .with_scalar_subquery("s", b([(10,), (20,)], "v int"))
            .build()
            .collect()
        )

    rows = (
        b([(1,), (2,)], "x int")
        .with_scalar_subquery("s", b([], "v int"))
        .build()
        .orderBy("x")
        .collect()
    )
    assert [(r.x, r.s) for r in rows] == [(1, None), (2, None)]
