"""Presto SQL front door: every TPC-H corpus oracle statement runs through
PrestoSession.sql and matches DuckDB executing the same statement — the
reference's differential-parse-and-run strategy (PrestoParserTest +
checkSame) in one harness."""

import pytest

from verax_spark.queries import tpch
from verax_spark.sql import PrestoSession, transpile
from verax_spark.testing import assert_frames_match, duckdb_connection


@pytest.fixture(scope="module")
def presto(spark, sf_dir):
    return PrestoSession(spark, sf_dir)


@pytest.mark.parametrize("name", sorted(tpch.ORACLE))
def test_sql_frontend_runs_tpch_corpus(presto, sf_dir, name):
    sql = tpch.ORACLE[name]
    got = presto.sql(sql).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        want = con.execute(sql).df()
    finally:
        con.close()
    assert_frames_match(got, want, context=f"sql:{name}")


def test_typed_literals_transpile(presto):
    df = presto.sql(
        "select double '0.07' as d, bigint '42' as b, "
        "date '1996-01-01' as dt, cast(1 as integer) + integer '2' as i"
    )
    row = df.collect()[0]
    assert (row.d, row.b, row.i) == (0.07, 42, 3)
    assert str(row.dt) == "1996-01-01"


def test_presto_function_names(presto):
    row = presto.sql(
        "select approx_distinct(l_suppkey) as ad, cardinality(split('a b', ' ')) as n, "
        "strpos('hello', 'll') as p, arbitrary(l_returnflag) as any_flag "
        "from lineitem"
    ).collect()[0]
    assert row.n == 2 and row.p == 3 and row.ad > 0 and row.any_flag in ("A", "N", "R")


def test_unnest_rewrite(presto):
    rows = presto.sql(
        "select t.w from (select split('x y z', ' ') as ws) s cross join unnest(s.ws) as t(w)"
    ).collect()
    assert sorted(r.w for r in rows) == ["x", "y", "z"]


def test_unnest_with_ordinality_raises(presto):
    with pytest.raises(NotImplementedError):
        presto.sql("select * from t cross join unnest(xs) with ordinality as u(x, i)")


def test_explain_statement(presto):
    plan = presto.sql("explain select count(*) from lineitem").collect()[0].plan
    assert "Physical Plan" in plan


def test_interval_arithmetic(presto):
    row = presto.sql(
        "select count(*) as n from orders "
        "where o_orderdate >= date '1996-01-01' "
        "and o_orderdate < date '1996-01-01' + interval '1' year"
    ).collect()[0]
    assert row.n > 0


def test_string_literals_protected(presto):
    # function-looking text inside strings must not be rewritten
    row = presto.sql("select 'strpos(cardinality(' as s").collect()[0]
    assert row.s == "strpos(cardinality("


def test_sql_window_functions(presto, sf_dir):
    sql = """
    select * from (
      select o_custkey, o_orderkey,
        row_number() over (partition by o_custkey order by o_totalprice desc, o_orderkey) as rn,
        cast(sum(cast(o_totalprice as decimal(12,2)))
          over (partition by o_custkey order by o_orderkey
                rows between unbounded preceding and current row) as double) as running
      from orders) t
    where rn = 1 and o_custkey < 50 order by o_custkey
    """
    got = presto.sql(sql).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        want = con.execute(sql).df()
    finally:
        con.close()
    got["rn"] = got["rn"].astype("int64")
    assert_frames_match(got, want, context="sql_window")


def test_sql_cte_and_grouping_sets(presto, sf_dir):
    sql = """
    with big as (select * from orders where o_totalprice > 30000)
    select o_orderstatus, o_orderpriority,
      grouping(o_orderstatus, o_orderpriority) as gid, count(*) as n
    from big
    group by grouping sets ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    order by gid, o_orderstatus, o_orderpriority
    """
    got = presto.sql(sql).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        want = con.execute(sql).df()
    finally:
        con.close()
    got["gid"] = got["gid"].astype("int64")
    assert_frames_match(got, want, context="sql_cte_gs")


def test_sql_filter_clause(presto, sf_dir):
    sql = """
    select l_returnflag,
      count(*) filter (where l_quantity > 25) as n_big,
      count(*) as n
    from lineitem group by l_returnflag order by l_returnflag
    """
    got = presto.sql(sql).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        want = con.execute(sql).df()
    finally:
        con.close()
    assert_frames_match(got, want, context="sql_filter_clause")
