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


def test_unnest_with_ordinality(presto):
    rows = presto.sql(
        "select u.w, u.i from (select split('x y z', ' ') as ws) s "
        "cross join unnest(s.ws) with ordinality as u(w, i) order by u.i"
    ).collect()
    assert [(r.w, r.i) for r in rows] == [("x", 1), ("y", 2), ("z", 3)]


def test_unnest_map_two_columns(presto):
    rows = presto.sql(
        "select t.k, t.v from (select map(array['a', 'b'], array[1, 2]) as m) s "
        "cross join unnest(s.m) as t(k, v) order by t.k"
    ).collect()
    assert [(r.k, r.v) for r in rows] == [("a", 1), ("b", 2)]


def test_unnest_multi_array_zip(presto):
    rows = presto.sql(
        "select t.x, t.y from (select array[1, 2, 3] as a, array['p', 'q'] as b) s "
        "cross join unnest(s.a, s.b) as t(x, y) order by t.x"
    ).collect()
    assert [(r.x, r.y) for r in rows] == [(1, "p"), (2, "q"), (3, None)]


def test_comma_lateral_unnest(presto):
    # implicit-lateral comma form (ref AstRelations.h: Unnest is correlated
    # with relations to its left) — lowered to LATERAL VIEW like CROSS JOIN
    rows = presto.sql(
        "select s.n, t.w from (select 1 as n, split('x y', ' ') as ws) s, "
        "unnest(s.ws) as t(w) order by t.w"
    ).collect()
    assert [(r.n, r.w) for r in rows] == [(1, "x"), (1, "y")]


def test_unsupported_unnest_raises(presto):
    with pytest.raises(NotImplementedError):
        transpile("select * from t left join unnest(xs) as u(x) on true")
    with pytest.raises(NotImplementedError):
        transpile("select * from t where x > 1 group by grouping sets ((x)) "
                  "union all select * from s join lateral (select 1) q on true")


def test_typed_literal_inside_string_untouched():
    # 'price double ''1.5''' is one string literal; the type keyword inside
    # it must not trigger the typed-literal rewrite
    out = transpile("select 'price double ''1.5''' as s, double '2.5' as d")
    assert "'price double ''1.5'''" in out
    assert "cast('2.5' as double)" in out


def test_sql_compat_functions(presto):
    row = presto.sql(
        "select truncate(-2.7) as t, hex(sha256('abc')) as h, "
        "json_parse('{\"a\":  1}') as j, infinity() as inf"
    ).collect()[0]
    assert row.t == -2.0
    assert row.h.lower().startswith("ba7816bf")
    assert row.j == '{"a":1}'
    assert row.inf == float("inf")


def test_sql_compat_batch6(presto):
    row = presto.sql(
        "select strrpos('abcabc', 'bc') as rp, strrpos('abc', 'zz') as rp0, "
        "to_iso8601(timestamp '2020-01-02 03:04:05.5') as iso, "
        "year_of_week(date '2021-01-01') as yw, "
        "is_finite(infinity()) as fin, "
        "luhn_check('79927398713') as luhn, "
        "cosine_similarity(map(array['a','b'], array[3.0, 4.0]), "
        "                  map(array['a','b'], array[3.0, 4.0])) as cs"
    ).collect()[0]
    assert (row.rp, row.rp0) == (5, 0)
    assert row.iso == "2020-01-02T03:04:05.500"
    assert row.yw == 2020
    assert row.fin is False
    assert row.luhn is True
    assert row.cs == 1.0


def test_sql_compat_batch7(presto):
    row = presto.sql(
        "select sha512('hello world') as h512, "
        "to_base64url('hello world') as b64u, "
        "wilson_interval_lower(50, 100, 1.96) as wl, "
        "url_extract_port('https://example.com:8080/p') as port, "
        "is_json_scalar('1') as ijs, "
        "json_array_contains('[1, 2, 3]', 2) as jac, "
        "word_stem('running') as stem, "
        "normalize('é') as norm, "
        "parse_datetime('2020-01-02 03:04', 'yyyy-MM-dd HH:mm') as pd, "
        "ip_prefix('10.1.2.3', 24) as ipp, "
        "ip_subnet_min('10.1.2.0/24') as smin, "
        "is_subnet_of('10.1.0.0/16', '10.1.2.3') as sof"
    ).collect()[0]
    assert row.h512.startswith("309ecc489c12d6eb")
    assert row.b64u == "aGVsbG8gd29ybGQ="
    assert abs(row.wl - 0.40382982859014716) < 1e-12
    assert row.port == 8080
    assert row.ijs is True and row.jac is True
    assert row.stem == "run" and row.norm == "é"
    assert row.pd.year == 2020 and row.pd.minute == 4
    assert row.ipp == "10.1.2.0/24" and row.smin == "10.1.2.0"
    assert row.sof is True


def test_sql_compat_batch7_aggregates(presto):
    rows = presto.sql(
        "select n_regionkey as rk, "
        "histogram(n_regionkey) as h, "
        "map_union(map(array[n_name], array[n_nationkey])) as mu, "
        "multimap_agg(n_regionkey, n_nationkey) as mm, "
        "set_union(array[n_nationkey, n_nationkey + 100]) as su, "
        "checksum(n_name) as ck "
        "from nation group by n_regionkey order by n_regionkey"
    ).collect()
    assert len(rows) == 5
    r0 = rows[0]
    assert r0.h == {r0.rk: 5}
    assert len(r0.mu) == 5 and len(r0.mm[r0.rk]) == 5
    assert len(r0.su) == 10 and isinstance(r0.ck, int)
    # checksum is order-insensitive: same multiset in reversed order
    a, b = presto.sql(
        "select checksum(n_name) as c from (select n_name from nation order by n_name)"
    ).collect()[0].c, presto.sql(
        "select checksum(n_name) as c from "
        "(select n_name from nation order by n_name desc)"
    ).collect()[0].c
    assert a == b


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


@pytest.mark.parametrize("kind", ["", "inner ", "left ", "full outer "])
def test_sql_natural_join(presto, sf_dir, kind):
    # NATURAL JOIN (ref NaturalJoin, axiom/sql/presto/ast/AstRelations.h:477):
    # implicit equi-join on all same-named columns. TPC-H base tables share
    # no column names, so the interesting case is derived tables; the LEFT/
    # FULL legs exercise null-supplying sides (suppliers span fewer nations
    # than the full nation list once filtered).
    sql = f"""
    select nationkey, n_name, n_supp
    from (select n_nationkey as nationkey, n_name from nation) a
    natural {kind}join (select s_nationkey as nationkey, count(*) as n_supp
                        from supplier where s_acctbal > 5000
                        group by s_nationkey) b
    order by nationkey
    """
    got = presto.sql(sql).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        want = con.execute(sql).df()
    finally:
        con.close()
    assert_frames_match(got, want, context=f"sql_natural_{kind.strip() or 'join'}")


def test_quantified_comparisons(presto):
    # = ANY → IN ; <> ALL → NOT IN ; > ALL → max ; < ANY → max
    row = presto.sql(
        "select c_custkey from customer "
        "where c_custkey = any (select o_custkey from orders where o_totalprice > 100000) "
        "order by c_custkey limit 1"
    ).collect()
    assert len(row) <= 1
    big = presto.sql(
        "select count(*) as n from customer "
        "where c_acctbal > all (select c_acctbal from customer where c_custkey <> 1)"
    ).collect()[0].n
    assert big <= 1  # at most the single maximal account
    some = transpile("select 1 where 2 = some (select 2)")
    assert "in (" in some.lower()


def test_quantified_rewrites_text():
    assert "not in (select" in transpile("select 1 where 3 <> all (select x from t)")
    out = transpile("select 1 where 3 > any (select x from t)")
    assert "min(__q.__v)" in out
    out = transpile("select 1 where 3 <= all (select x from t)")
    assert "min(__q.__v)" in out  # x <= ALL(S) ⇔ x <= min(S)
    out = transpile("select 1 where 3 < any (select x from t)")
    assert "max(__q.__v)" in out  # x < ANY(S) ⇔ x < max(S)


# ---------------------------------------------------------------------------
# Cost-based join reordering in the front door (sql/reorder.py): the
# reference routes every SELECT through the optimizer
# (axiom/optimizer/Optimization.h:44-48); these tests pin the wiring.
_BAD_ORDER_SQL = """
    select n_name, count(*) as n_items
    from lineitem l, orders o, customer c, nation n, region r
    where l.l_orderkey = o.o_orderkey
      and o.o_custkey = c.c_custkey
      and c.c_nationkey = n.n_nationkey
      and n.n_regionkey = r.r_regionkey
      and r.r_name = 'ASIA'
    group by n_name order by n_name
"""


def test_reorder_fixes_bad_textual_order(presto):
    df = presto.sql(_BAD_ORDER_SQL)
    info = presto.last_reorder
    assert info is not None
    # textual order starts at lineitem (the biggest table); the planner must
    # not — it starts from the filtered region side of the star
    assert info.order[0] != "l"
    assert info.order.index("l") > info.order.index("r")
    # small dimensions get broadcast hints; lineitem never does
    assert "n" in info.broadcast and "r" in info.broadcast
    assert "l" not in info.broadcast
    # the hint reached Catalyst: dims are broadcast in the physical plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # and the rewrite is semantics-preserving
    n = df.count()
    want = presto.spark.sql(
        "select count(distinct n_name) from nation n join region r "
        "on n.n_regionkey = r.r_regionkey where r.r_name = 'ASIA' "
        "and n_nationkey in (select c_nationkey from customer)"
    ).collect()[0][0]
    assert n == want


def test_reorder_disabled_renders_as_written(spark, sf_dir):
    ps = PrestoSession(spark, sf_dir, reorder=False)
    ps.sql(_BAD_ORDER_SQL)
    assert ps.last_reorder is None


def test_reorder_skips_ineligible_queries(presto):
    # FULL join: textual order must stand (only LEFT boundaries hoist)
    presto.sql(
        "select count(*) as n from orders o full join customer c "
        "on o.o_custkey = c.c_custkey join nation n on c.c_nationkey = n.n_nationkey"
    )
    assert presto.last_reorder is None
    # LEFT join over a 2-table core: below min_tables, not worth sampling
    presto.sql(
        "select count(*) as n from orders o left join customer c "
        "on o.o_custkey = c.c_custkey join nation n on c.c_nationkey = n.n_nationkey"
    )
    assert presto.last_reorder is None
    # two tables: below min_tables, not worth the sampling
    presto.sql(
        "select count(*) as n from orders o join customer c on o.o_custkey = c.c_custkey"
    )
    assert presto.last_reorder is None


def test_reorder_hoists_left_join_boundary(presto, sf_dir):
    """A single LEFT JOIN no longer forfeits reordering: the 5-table inner
    core is planned and the LEFT boundary re-attaches above it (wrapInDt
    analog, ref axiom/optimizer/ToGraph.cpp:1216). The ON predicate stays on
    the join (NOT movable to WHERE — it controls null-extension)."""
    sql = """
        select n_name, count(*) as n_items, count(s.s_suppkey) as n_matched
        from lineitem l
          join orders o on l.l_orderkey = o.o_orderkey
          left join supplier s
            on l.l_suppkey = s.s_suppkey and s.s_acctbal > 3000
          join customer c on o.o_custkey = c.c_custkey
          join nation n on c.c_nationkey = n.n_nationkey
          join region r on n.n_regionkey = r.r_regionkey
        where r.r_name = 'ASIA'
        group by n_name order by n_name
    """
    df = presto.sql(sql)
    info = presto.last_reorder
    assert info is not None
    assert info.attachments == ["s"]
    assert set(info.order) == {"l", "o", "c", "n", "r"}
    # the core was actually replanned: big fact never first, dims broadcast
    assert info.order[0] != "l"
    assert "r" in info.broadcast and "n" in info.broadcast
    got = df.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        want = con.execute(sql).df()
    finally:
        con.close()
    assert_frames_match(got, want, context="reorder-left-hoist")


def test_reorder_left_join_conjunct_referencing_attachment(presto, sf_dir):
    """An inner-ON conjunct that references the hoisted attachment migrates
    to WHERE (filter placement above both joins commutes); when that would
    force a cross join in the core, the textual order stands instead."""
    sql = """
        select count(*) as n
        from orders o
          join customer c on o.o_custkey = c.c_custkey
          left join nation n on c.c_nationkey = n.n_nationkey
          join region r on n.n_regionkey = r.r_regionkey
        where o.o_totalprice > 1000
    """
    got = presto.sql(sql).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        want = con.execute(sql).df()
    finally:
        con.close()
    assert_frames_match(got, want, context="reorder-left-residual")


def test_reorder_hoists_right_join_boundary(presto, sf_dir):
    """A RIGHT JOIN B ≡ B LEFT JOIN A: the left side hoists as the
    null-supplied attachment and the inner core still reorders."""
    sql = """
        select n_name, count(*) as n, count(s.s_acctbal) as matched
        from supplier s
          right join lineitem l
            on l.l_suppkey = s.s_suppkey and s.s_acctbal > 3000
          join orders o on l.l_orderkey = o.o_orderkey
          join customer c on o.o_custkey = c.c_custkey
          join nation n on c.c_nationkey = n.n_nationkey
        where o.o_totalprice > 50000
        group by n_name order by n_name
    """
    df = presto.sql(sql)
    info = presto.last_reorder
    assert info is not None
    assert info.attachments == ["s"]
    assert set(info.order) == {"l", "o", "c", "n"}
    got = df.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        want = con.execute(sql).df()
    finally:
        con.close()
    assert_frames_match(got, want, context="reorder-right-hoist")


def test_reorder_derived_table_leaf(presto, sf_dir):
    """A non-lateral aliased subquery in FROM joins the core as an opaque
    derived-table leaf with estimated cardinality."""
    sql = """
        select n.n_name, count(*) as n_cust, sum(t.cnt) as n_orders
        from customer c
          join nation n on c.c_nationkey = n.n_nationkey
          join (select o_custkey, count(*) as cnt
                from orders group by o_custkey) t
            on t.o_custkey = c.c_custkey
        where n.n_name <> 'NATION_3'
        group by n.n_name order by n.n_name
    """
    df = presto.sql(sql)
    info = presto.last_reorder
    assert info is not None
    assert "t" in info.order and set(info.order) == {"c", "n", "t"}
    got = df.toPandas()
    con = duckdb_connection(sf_dir)
    try:
        want = con.execute(sql).df()
    finally:
        con.close()
    assert_frames_match(got, want, context="reorder-derived-leaf")


def test_reorder_preserves_residual_and_single_table_predicates(presto, sf_dir):
    # theta conjunct (non-equi, two tables) + correlated-free scalar filters
    # survive into WHERE; result matches DuckDB
    sql = """
        select c.c_custkey, count(*) as n
        from orders o, customer c, nation n
        where o.o_custkey = c.c_custkey
          and c.c_nationkey = n.n_nationkey
          and o.o_totalprice > c.c_acctbal
          and n.n_name <> 'NATION_3'
        group by c.c_custkey
        order by c.c_custkey
        limit 50
    """
    got = presto.sql(sql).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        want = con.execute(sql).df()
    finally:
        con.close()
    assert_frames_match(got, want, context="reorder-residual")
    assert presto.last_reorder is not None


def test_reorder_fires_inside_cte(presto):
    # the DerivedTable analog: CTE bodies are planned too
    df = presto.sql(
        """with asia as (
             select n_name, count(*) as n
             from lineitem l, orders o, customer c, nation n, region r
             where l.l_orderkey = o.o_orderkey and o.o_custkey = c.c_custkey
               and c.c_nationkey = n.n_nationkey and n.n_regionkey = r.r_regionkey
               and r.r_name = 'ASIA'
             group by n_name)
           select count(*) as k from asia"""
    )
    assert df.collect()[0][0] == 5


def test_cli_sweep_flag_combinations(spark, sf_dir):
    """AxiomSql's check_test_flag_combinations analog: the same query under
    reorder on/off x AQE on/off must agree."""
    from tools.sql_cli import sweep

    combos = sweep(
        spark, sf_dir,
        "select n_name, count(*) as n from supplier s, nation n "
        "where s.s_nationkey = n.n_nationkey and n.n_nationkey < 10 "
        "group by n_name order by n_name",
    )
    assert len(combos) == 4


def test_reorder_plans_star_without_sampling(spark, sf_dir, monkeypatch):
    """With DSL-translatable predicates, dense-unique PK fanouts, and
    footer stats, planning the star query must never call df.sample() —
    the 100 TB contract: planning touches metadata, not data."""
    import pyspark.sql

    import verax_spark.sql.reorder as ro

    ro._SHARED_HISTORY = None  # cold planner — no cached estimates

    def boom(self, *a, **k):
        raise AssertionError("df.sample() during planning")

    monkeypatch.setattr(pyspark.sql.DataFrame, "sample", boom)
    ps = PrestoSession(spark, sf_dir)
    ps.sql(
        """select n_name, count(*) as n from
           lineitem l, orders o, customer c, nation n, region r
           where l.l_orderkey = o.o_orderkey and o.o_custkey = c.c_custkey
             and c.c_nationkey = n.n_nationkey and n.n_regionkey = r.r_regionkey
             and r.r_name = 'ASIA' and o.o_orderdate >= date '1996-01-01'
           group by n_name order by n_name"""
    )
    assert ps.last_reorder is not None
    monkeypatch.undo()
    ro._SHARED_HISTORY = None


def test_reorder_fires_in_setop_branches(presto, sf_dir):
    """Each branch of a UNION is its own DerivedTable — both star branches
    must still produce correct results after per-branch reordering."""
    sql = """
        select n_name, count(*) as n
        from lineitem l, orders o, customer c, nation n, region r
        where l.l_orderkey = o.o_orderkey and o.o_custkey = c.c_custkey
          and c.c_nationkey = n.n_nationkey and n.n_regionkey = r.r_regionkey
          and r.r_name = 'ASIA'
        group by n_name
        union all
        select n_name, count(*) as n
        from supplier s, nation n, region r
        where s.s_nationkey = n.n_nationkey and n.n_regionkey = r.r_regionkey
          and r.r_name = 'EUROPE'
        group by n_name
        order by n_name, n
    """
    got = presto.sql(sql).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        want = con.execute(sql).df()
    finally:
        con.close()
    assert_frames_match(got, want, context="setop-reorder")


# ---------------------------------------------------------------------------
# SQL-text DML (reference sql/presto/ast/AstStatements.h surface; WriteKind
# kInsert/kDelete/kUpdate, ConnectorMetadata.h:457-627)
def test_parse_dml_statements():
    from verax_spark.sql import ast
    from verax_spark.sql.parser import Parser

    s = Parser("insert into t (a, b) select x, y from u").parse_statement()
    assert isinstance(s, ast.InsertStmt) and s.columns == ["a", "b"]
    s2 = Parser("insert into t values (1, 'x'), (2, 'y')").parse_statement()
    assert isinstance(s2, ast.InsertStmt) and s2.columns == []
    d = Parser("delete from t where a < 3").parse_statement()
    assert isinstance(d, ast.DeleteStmt) and d.where is not None
    d2 = Parser("delete from t").parse_statement()
    assert isinstance(d2, ast.DeleteStmt) and d2.where is None
    u = Parser("update t set a = a + 1, b = 'z' where a >= 3").parse_statement()
    assert isinstance(u, ast.UpdateStmt)
    assert [c for c, _ in u.assignments] == ["a", "b"]
    # rendering round-trips through the parser
    assert isinstance(
        Parser(u.sql()).parse_statement(), ast.UpdateStmt
    )


@pytest.fixture()
def dml_table(spark, sf_dir, tmp_path):
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(i, float(i * 10), "abc"[i % 3]) for i in range(20)],
        "id bigint, v double, tag string",
    ).repartition(3, "tag").write.parquet(path)
    sess = PrestoSession(spark, sf_dir)
    sess.register_table("t", path)
    return sess


def test_sql_insert_executes(dml_table):
    sess = dml_table
    out = sess.sql("insert into t values (100, 5.0, 'z')").first()
    assert out.rows_inserted == 1
    out = sess.sql(
        "insert into t (id, v) select id + 200, v from t where id < 2"
    ).first()
    assert out.rows_inserted == 2
    back = sess.sql("select count(*) as n from t").first()
    assert back.n == 23
    # NULL fill of unmentioned columns
    assert sess.sql("select count(*) as n from t where tag is null").first().n == 2
    # type coercion: INSERT of an int literal into a double column
    assert sess.sql("select v from t where id = 100").first().v == 5.0


def test_sql_delete_executes(dml_table):
    sess = dml_table
    out = sess.sql("delete from t where tag = 'a'").first()
    assert out.rows_deleted == 7
    assert sess.sql("select count(*) as n from t").first().n == 13
    assert sess.sql("select count(*) as n from t where tag = 'a'").first().n == 0
    # delete-all (no WHERE)
    assert sess.sql("delete from t").first().rows_deleted == 13
    assert sess.sql("select count(*) as n from t").first().n == 0


def test_sql_update_executes(dml_table):
    sess = dml_table
    out = sess.sql("update t set v = v * 2, tag = 'u' where id < 5").first()
    assert out.rows_updated == 5
    rows = {r.id: (r.v, r.tag) for r in sess.sql("select * from t").collect()}
    for i in range(20):
        if i < 5:
            assert rows[i] == (i * 20.0, "u")
        else:
            assert rows[i][1] in "abc"


def test_dml_guards(dml_table):
    sess = dml_table
    with pytest.raises(ValueError, match="not a registered writable"):
        sess.sql("delete from lineitem where l_quantity < 0")
    with pytest.raises(NotImplementedError, match="subquery"):
        sess.sql("delete from t where id in (select 1)")
    with pytest.raises(ValueError, match="column count"):
        sess.sql("insert into t (id) select 1, 2")
    with pytest.raises(ValueError, match="unknown columns"):
        sess.sql("insert into t (nope) select 1")


def test_quantile_sketch_pipeline_sql(presto):
    from verax_spark.sql.presto import transpile

    sql = transpile(
        "select value_at_quantile(qdigest_agg(l_quantity), 0.5) as med "
        "from lineitem"
    )
    assert "percentile_approx" in sql
    row = presto.sql(
        "select value_at_quantile(qdigest_agg(l_quantity), 0.5) as med, "
        "values_at_quantiles(tdigest_agg(l_quantity), array[0.1, 0.9]) as vs "
        "from lineitem"
    ).collect()[0]
    assert 1 <= row.med <= 50 and len(row.vs) == 2 and row.vs[0] <= row.vs[1]


def test_sql_ddl_lifecycle(spark, sf_dir):
    """CREATE TABLE / CTAS / CREATE VIEW / DROP — reference
    AstStatements.h:44-460 statement surface, executed on the session
    scratch (WriteKind kCreate) so created tables accept the DML surface."""
    sess = PrestoSession(spark, sf_dir)
    # CTAS with data
    r = sess.sql(
        "create table t_ctas as select n_nationkey, n_name from nation "
        "where n_regionkey = 2"
    ).collect()[0]
    assert r.rows == 5
    assert sess.sql("select count(*) as n from t_ctas").collect()[0].n == 5
    # idempotence via IF NOT EXISTS; plain duplicate raises
    sess.sql("create table if not exists t_ctas as select 1 as x")
    with pytest.raises(ValueError, match="already exists"):
        sess.sql("create table t_ctas as select 1 as x")
    # empty CREATE TABLE + INSERT round trip
    sess.sql("create table t_empty (k bigint, v varchar, d decimal(12,2))")
    ins = sess.sql(
        "insert into t_empty select n_nationkey, n_name, 1.50 from nation"
    ).collect()[0]
    assert ins.rows_inserted == 25
    row = sess.sql(
        "select count(*) as n, sum(d) as s from t_empty"
    ).collect()[0]
    assert row.n == 25 and float(row.s) == 37.5
    # CTAS WITH NO DATA copies only the shape
    sess.sql("create table t_shape as select * from t_empty with no data")
    assert sess.sql("select count(*) as n from t_shape").collect()[0].n == 0
    # views
    sess.sql("create view v_two as select * from t_ctas where n_nationkey < 99")
    assert sess.sql("select count(*) as n from v_two").collect()[0].n == 5
    with pytest.raises(ValueError, match="already exists"):
        sess.sql("create view v_two as select 1 as x")
    sess.sql("create or replace view v_two as select 1 as x")
    assert sess.sql("select * from v_two").collect()[0].x == 1
    # show tables includes catalog + created + views
    names = {r.table for r in sess.sql("show tables").collect()}
    assert {"nation", "t_ctas", "t_empty", "v_two"} <= names
    # drops
    assert sess.sql("drop view v_two").collect()[0].dropped is True
    assert sess.sql("drop table t_ctas").collect()[0].dropped is True
    assert (
        sess.sql("drop table if exists t_ctas").collect()[0].dropped is False
    )
    with pytest.raises(ValueError, match="does not exist"):
        sess.sql("drop table t_ctas")
    names = {r.table for r in sess.sql("show tables").collect()}
    assert "t_ctas" not in names and "v_two" not in names


def test_analyze_statement(spark, sf_dir):
    """ANALYZE computes table stats in one pass and records the exact row
    count into the planner history under the reorderer's scan signature."""
    from verax_spark.optimizer.query_graph import QueryGraph
    from verax_spark.sql.reorder import _history

    sess = PrestoSession(spark, sf_dir)
    rows = {r.column: r for r in sess.sql("analyze nation").collect()}
    assert rows["__table__"].ndv == 25
    assert rows["n_nationkey"].nulls == 0
    assert 23 <= rows["n_nationkey"].ndv <= 27  # approx NDV of 25
    g = QueryGraph(history=_history())
    g.table("nation", spark.table("nation"), None)
    assert _history().lookup(g._signature(g.tables["nation"])) == 25.0


def test_explain_analyze(spark, sf_dir):
    sess = PrestoSession(spark, sf_dir)
    row = sess.sql(
        "explain analyze select count(*) as n from lineitem where l_quantity < 10"
    ).collect()[0]
    assert row.rows == 1 and row.wall_ms > 0
    assert "Scan" in row.plan or "AdaptiveSparkPlan" in row.plan


def test_explain_options_shapes(spark, sf_dir):
    """EXPLAIN (TYPE ..) — ref AstStatements.h:597-635. VALIDATE never
    executes (returns a boolean and raises on unresolved names); IO
    reports the post-pruning footprint with LOGICAL table names even when
    a scan is served from a split-cache or bucketed-layout path."""
    import pytest as _pytest

    sess = PrestoSession(spark, sf_dir)
    q = (
        "select o_orderstatus, count(*) as n from orders "
        "where o_totalprice > 1000 group by o_orderstatus"
    )
    assert sess.sql(f"explain (type validate) {q}").collect()[0].valid
    with _pytest.raises(Exception):
        sess.sql("explain (type validate) select nope from orders").collect()

    io = {
        r.table: r.columns
        for r in sess.sql(f"explain (type io) {q}").collect()
    }
    # logical table name, post-pruning columns only
    assert io == {"orders": "o_orderstatus,o_totalprice"}, io

    logical = sess.sql(f"explain (type logical) {q}").collect()[0].plan
    assert "Aggregate" in logical
    dist = sess.sql(f"explain (type distributed) {q}").collect()[0].plan
    assert "fragment0" in dist

    import json as _json

    payload = sess.sql(f"explain (type io, format json) {q}").collect()[0]
    parsed = _json.loads(payload.io_plan)
    assert parsed == [
        {"table": "orders", "columns": ["o_orderstatus", "o_totalprice"]}
    ]


def test_extract_presto_units(presto):
    """EXTRACT canonicalizes Presto-semantic units: dow is ISO Monday=1
    (2020-01-02 is a Thursday); yow is the ISO week-numbering year."""
    row = presto.sql(
        "select extract(dow from date '2020-01-02') as dw, "
        "extract(day_of_week from date '2019-12-29') as sun, "
        "extract(doy from date '2020-02-01') as dy, "
        "extract(week from date '2020-01-02') as wk, "
        "extract(yow from date '2021-01-01') as yw, "
        "extract(year from date '2020-01-02') as y, "
        "localtimestamp as lt"
    ).collect()[0]
    assert row.dw == 4 and row.sun == 7
    assert row.dy == 32 and row.wk == 1 and row.yw == 2020 and row.y == 2020
    assert row.lt.year >= 2026


def test_create_schema_namespace_lifecycle(spark, sf_dir):
    """CREATE SCHEMA (ref AstStatements.h:237): schema-qualified tables
    resolve in DML and queries; RESTRICT refuses non-empty; CASCADE drops
    members."""
    import pytest as _pytest

    from verax_spark.sql import PrestoSession

    sess = PrestoSession(spark, sf_dir)
    sess.sql("create schema s1")
    with _pytest.raises(ValueError, match="already exists"):
        sess.sql("create schema s1")
    sess.sql("create schema if not exists s1")  # idempotent spelling
    with _pytest.raises(ValueError, match="does not exist"):
        sess.sql("create table nosuch.t (a integer)")
    sess.sql("create table s1.t as select r_regionkey, r_name from region")
    sess.sql("insert into s1.t select 99, 'X'")
    assert (
        sess.sql("select count(*) as c from s1.t").collect()[0].c == 6
    )
    sess.sql("update s1.t set r_name = 'Y' where r_regionkey = 99")
    got = sess.sql(
        "select r_name from s1.t where r_regionkey = 99"
    ).collect()
    assert [r.r_name for r in got] == ["Y"]
    with _pytest.raises(ValueError, match="not empty"):
        sess.sql("drop schema s1")
    sess.sql("drop schema s1 cascade")
    assert "s1" not in {
        r.schema for r in sess.sql("show schemas").collect()
    }


def test_materialized_view_refresh_semantics(spark, sf_dir):
    """CREATE MATERIALIZED VIEW (ref AstStatements.h:191): stale until
    REFRESH; refresh matches recomputation; DROP removes it."""
    import pytest as _pytest

    from verax_spark.sql import PrestoSession

    sess = PrestoSession(spark, sf_dir)
    sess.sql("drop table if exists mvt_base")
    sess.sql("create table mvt_base as select n_nationkey, n_regionkey from nation")
    sess.sql(
        "create materialized view mvt as "
        "select n_regionkey, count(*) as n from mvt_base group by n_regionkey"
    )
    assert sess.sql("select sum(n) as s from mvt").collect()[0].s == 25
    sess.sql("delete from mvt_base where n_regionkey = 0")
    # stale read
    assert sess.sql("select sum(n) as s from mvt").collect()[0].s == 25
    sess.sql("refresh materialized view mvt")
    fresh = sess.sql("select sum(n) as s from mvt").collect()[0].s
    recomputed = (
        sess.sql("select count(*) as c from mvt_base").collect()[0].c
    )
    assert fresh == recomputed == 20
    sess.sql("drop materialized view mvt")
    with _pytest.raises(ValueError, match="does not exist"):
        sess.sql("refresh materialized view mvt")
    sess.sql("drop materialized view if exists mvt")  # tolerated


def test_create_function_sql_udf(spark, sf_dir):
    """CREATE FUNCTION (ref AstStatements.h:269): SQL-language routine
    executed as a Catalyst-inlined SQL UDF; Presto types map; DROP
    removes; TYPE/ROLE/CALL fail loudly (parse-only in the reference)."""
    import pytest as _pytest

    from verax_spark.sql import PrestoSession

    sess = PrestoSession(spark, sf_dir)
    sess.sql(
        "create function tax_price(p double, rate double) returns double "
        "deterministic return p * (1 + rate)"
    )
    got = sess.sql(
        "select tax_price(o_totalprice, 0.1) as t from orders "
        "order by o_orderkey limit 1"
    ).collect()[0].t
    base = sess.sql(
        "select o_totalprice as p from orders order by o_orderkey limit 1"
    ).collect()[0].p
    assert abs(got - base * 1.1) < 1e-9
    with _pytest.raises(ValueError, match="already exists"):
        sess.sql(
            "create function tax_price(p double) returns double return p"
        )
    sess.sql(
        "create or replace function tax_price(p varchar) returns varchar "
        "return upper(p)"
    )
    assert (
        sess.sql("select tax_price('ab') as u").collect()[0].u == "AB"
    )
    sess.sql("drop function tax_price")
    with _pytest.raises(ValueError, match="does not exist"):
        sess.sql("drop function tax_price")
    sess.sql("drop function if exists tax_price")
    # CREATE TYPE and CALL became executable in r05 (see
    # test_create_type_alias_and_struct / test_call_procedure); an
    # unregistered procedure still fails loudly
    with _pytest.raises(ValueError, match="not registered"):
        sess.sql("call some_proc(1)")
    with _pytest.raises(NotImplementedError, match="LANGUAGE"):
        sess.sql(
            "create function j(x integer) returns integer language java "
            "return x"
        )


def test_quantified_comparison_edge_semantics(spark, sf_dir):
    """SQL-standard 8.9 edges the min/max rewrite alone gets wrong
    (caught by the replay corpus at sf0.001 where the subquery came back
    empty): x > ALL(empty) is TRUE, x > ANY(empty) is FALSE, a NULL
    element forces UNKNOWN unless a definite witness/counterexample
    exists, and a NULL operand yields UNKNOWN against non-empty sets."""
    from verax_spark.sql import PrestoSession

    sess = PrestoSession(spark, sf_dir)

    def rows(sql):
        return [tuple(r) for r in sess.sql(sql).collect()]

    # empty set: ALL keeps every row, ANY drops every row
    assert (
        rows(
            "select count(*) as n from region where r_regionkey > all "
            "(select r_regionkey from region where r_regionkey > 99)"
        )[0][0]
        == 5
    )
    assert (
        rows(
            "select count(*) as n from region where r_regionkey > any "
            "(select r_regionkey from region where r_regionkey > 99)"
        )[0][0]
        == 0
    )
    # NULL element: 3 > ALL(1, NULL) is UNKNOWN (row dropped);
    # 0 > ALL(1, NULL) is FALSE either way; 3 > ANY(1, NULL) is TRUE
    sess.sql("drop table if exists qc_t")
    sess.sql("create table qc_t (v integer)")
    sess.sql("insert into qc_t select 1")
    sess.sql("insert into qc_t select cast(null as integer)")
    assert rows("select 1 as x where 3 > all (select v from qc_t)") == []
    assert rows("select 1 as x where 0 > all (select v from qc_t)") == []
    assert rows("select 1 as x where 3 > any (select v from qc_t)") == [(1,)]
    assert rows("select 1 as x where 0 > any (select v from qc_t)") == []
    sess.sql("drop table qc_t")


def test_quantified_truth_table_differential(spark, sf_dir):
    """Exhaustive mini-domain differential: every ordered op x quantifier
    over subquery sets {empty, with-NULL, without-NULL} x operand
    {NULL, low, mid, high} must match DuckDB row-for-row."""
    import duckdb

    from verax_spark.sql import PrestoSession

    sess = PrestoSession(spark, sf_dir)
    con = duckdb.connect()
    sets = {
        "empty": "select 5 as v where false",
        "nonull": "select * from (values (2), (5)) as t(v)",
        "withnull": "select * from (values (2), (5), (cast(null as integer))) as t(v)",
    }
    operands = ["cast(null as integer)", "1", "3", "9"]
    for sname, ssql in sets.items():
        for op in (">", ">=", "<", "<="):
            for quant in ("any", "all"):
                for x in operands:
                    q = (
                        f"select 1 as hit where {x} {op} {quant} ({ssql})"
                    )
                    got = len(sess.sql(q).collect())
                    want = len(con.execute(q).fetchall())
                    assert got == want, (sname, op, quant, x, got, want)
    con.close()


def test_create_type_alias_and_struct(spark, sf_dir):
    """CREATE TYPE (ref AstStatements.h:348, PrestoSql.g4:80): the alias
    form resolves in CAST and CREATE TABLE column definitions; the struct
    form resolves to a ROW type; duplicate names refuse; aliases compose."""
    import pytest

    from verax_spark.sql import PrestoSession

    sess = PrestoSession(spark, sf_dir)
    sess.sql("create type t_money as decimal(10,2)")
    row = sess.sql("select cast('7.456' as t_money) as m").collect()[0]
    assert str(row.m) == "7.46"
    # alias-of-alias composes to the base type
    sess.sql("create type t_money2 as t_money")
    row = sess.sql("select cast(1 as t_money2) as m").collect()[0]
    assert str(row.m) == "1.00"
    # struct form
    sess.sql("create type t_pt as (x double, y double)")
    p = sess.sql("select cast(row(3.0, 4.0) as t_pt) as p").collect()[0].p
    assert (p.x, p.y) == (3.0, 4.0)
    # column definition resolution
    sess.sql("drop table if exists t_type_tbl")
    sess.sql("create table t_type_tbl (id integer, amt t_money)")
    desc = {r.column: r.type for r in sess.sql("describe t_type_tbl").collect()}
    assert desc["amt"] == "decimal(10,2)"
    with pytest.raises(ValueError, match="already exists"):
        sess.sql("create type t_money as bigint")


def test_create_role_lifecycle(spark, sf_dir):
    """CREATE/DROP ROLE + SHOW [CURRENT] ROLES (ref AstStatements.h:323,
    PrestoSql.g4:102-104,141): session registry with grantor forms."""
    import pytest

    from verax_spark.sql import PrestoSession

    sess = PrestoSession(spark, sf_dir)
    sess.sql("create role r_a with admin user alice")
    sess.sql("create role r_b with admin current_user")
    sess.sql("create role r_c")
    roles = {r.role: r.admin for r in sess.sql("show roles").collect()}
    assert roles == {"r_a": "alice", "r_b": "current_user", "r_c": None}
    sess.sql("drop role r_b")
    assert len(sess.sql("show current roles").collect()) == 2
    with pytest.raises(ValueError, match="does not exist"):
        sess.sql("drop role r_b")
    with pytest.raises(ValueError, match="already exists"):
        sess.sql("create role r_a")


def test_call_procedure(spark, sf_dir):
    """CALL (ref AstStatements.h:661 + CallArgument PrestoSql.g4:548):
    positional + named constant arguments, registry dispatch, loud error
    for unregistered names and non-constant arguments."""
    import pytest

    from verax_spark.sql import PrestoSession

    sess = PrestoSession(spark, sf_dir)
    seen = {}

    def my_proc(session, a, *, b=None):
        seen["args"] = (a, b)
        return f"got {a}/{b}"

    sess.procedures["test.my_proc"] = my_proc
    out = sess.sql("call test.my_proc(42, b => 'x')").collect()[0].result
    assert out == "got 42/x" and seen["args"] == (42, "x")
    # built-in flush actually clears the catalog scan cache
    assert sess.catalog._cache or sess.catalog.table("nation") is not None
    out = sess.sql("call system.flush_metadata_cache()").collect()[0].result
    assert out.startswith("flushed") and not sess.catalog._cache
    with pytest.raises(ValueError, match="not registered"):
        sess.sql("call system.absent()")
    with pytest.raises(ValueError, match="must be a constant"):
        sess.sql("call test.my_proc(n_nationkey)")


def test_prepared_statement_parameters(presto, sf_dir):
    """Positional `?` parameters (ref Parameter, AstExpressions.h:133)
    bound by parse order; DuckDB binds the same placeholders natively."""
    import datetime

    sql = (
        "select o_orderstatus as st, count(*) as n from orders "
        "where o_totalprice > ? and o_orderdate >= ? "
        "group by o_orderstatus order by st"
    )
    params = [150000, datetime.datetime(1997, 1, 1)]
    got = presto.sql(sql, params=params).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        want = con.execute(sql, params).df()
    finally:
        con.close()
    assert_frames_match(got, want, context="sql_params")
    with pytest.raises(ValueError, match="parameter"):
        presto.sql("select ? as a")
    with pytest.raises(ValueError, match="parameter"):
        presto.sql("select 1 as a", params=[2])


def test_explain_reference_grammar_order(presto):
    """EXPLAIN ANALYZE? VERBOSE? before the option list — the reference
    grammar order (AstStatements.h:597-635; ADVICE r09 flagged the
    inverted acceptance). The legacy trailing-ANALYZE spelling from
    earlier rounds keeps parsing."""
    # Presto-ordered ANALYZE + options
    row = presto.sql(
        "explain analyze (type distributed) "
        "select count(*) as n from nation"
    ).collect()[0]
    assert "fragment0" in row.plan
    # legacy order still accepted
    row = presto.sql(
        "explain (type distributed) analyze "
        "select count(*) as n from nation"
    ).collect()[0]
    assert "fragment0" in row.plan
    # VERBOSE widens the default rendering to all plan phases
    plan = presto.sql(
        "explain verbose select count(*) as n from nation"
    ).collect()[0].plan
    assert "Optimized Logical Plan" in plan or "Physical Plan" in plan


def test_explain_format_graphviz(presto):
    """EXPLAIN (FORMAT GRAPHVIZ) — ref ExplainFormat kGraphviz. DOT text
    with one node per fragment and kind-labelled exchange edges."""
    dot = presto.sql(
        "explain (format graphviz) select n_regionkey, count(*) as n "
        "from nation group by n_regionkey"
    ).collect()[0].plan
    assert dot.startswith("digraph plan {") and dot.rstrip().endswith("}")
    assert "->" in dot and "label=" in dot


def test_flush_clears_footer_stats_caches(presto):
    """CALL system.flush_metadata_cache() drops the footer-stat caches
    too (ADVICE r09): the catalog-level cache pins DataFrames by id and
    a GC-recycled id must never serve stale stats after a flush."""
    from verax_spark import catalog as cat_mod
    from verax_spark.sources import stats as stats_mod

    presto.catalog.stats("nation")
    assert cat_mod._STATS_CACHE
    # every cached entry pins the DataFrame whose id() keys it
    assert all(
        id(df) == key[3] for key, (df, _) in cat_mod._STATS_CACHE.items()
    )
    presto.sql("call system.flush_metadata_cache()").collect()
    assert not cat_mod._STATS_CACHE and not stats_mod._STATS_CACHE
