"""Parser round-trip fuzzing: hypothesis generates random Presto SQL TEXT
(expressions over the nation table), which must (a) parse + transpile, and
(b) produce identical results when the transpiled SQL runs on Spark and the
ORIGINAL Presto text runs on DuckDB.

This goes one level deeper than test_property_differential (which fuzzes
DataFrame shapes): here the fuzz target is the SQL front door itself —
tokenizer, precedence, rendering — against an independent parser's reading
of the same text. Only constructs with identical Presto/DuckDB/Spark
semantics are generated (no int division, no engine-specific functions).
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from verax_spark.sql.presto import transpile
from verax_spark.testing import assert_frames_match

INT_COLS = ["n_nationkey", "n_regionkey"]
STR_COLS = ["n_name"]


# -- expression text generators ---------------------------------------------
def _int_base() -> st.SearchStrategy[str]:
    return st.one_of(
        st.sampled_from(INT_COLS),
        st.integers(min_value=-20, max_value=20).map(
            lambda n: str(n) if n >= 0 else f"({n})"
        ),
        st.sampled_from(STR_COLS).map(lambda c: f"length({c})"),
    )


def _base_cmp() -> st.SearchStrategy[str]:
    return st.tuples(
        _int_base(), st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]), _int_base()
    ).map(lambda t: f"{t[0]} {t[1]} {t[2]}")


def int_expr(depth: int = 2) -> st.SearchStrategy[str]:
    base = _int_base()
    if depth == 0:
        return base
    sub = int_expr(depth - 1)
    return st.one_of(
        base,
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        st.tuples(sub, sub).map(lambda t: f"coalesce({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"abs({t[0]} - {t[1]})"),
        st.tuples(_base_cmp(), sub, sub).map(
            lambda t: f"(case when {t[0]} then {t[1]} else {t[2]} end)"
        ),
    )


def str_expr() -> st.SearchStrategy[str]:
    return st.one_of(
        st.sampled_from(STR_COLS),
        st.tuples(
            st.sampled_from(STR_COLS),
            st.integers(min_value=1, max_value=5),
            st.integers(min_value=1, max_value=8),
        ).map(lambda t: f"substr({t[0]}, {t[1]}, {t[2]})"),
        st.tuples(st.sampled_from(STR_COLS), st.sampled_from(STR_COLS)).map(
            lambda t: f"({t[0]} || {t[1]})"
        ),
    )


def bool_expr(depth: int = 1) -> st.SearchStrategy[str]:
    cmp_ = st.tuples(
        int_expr(1), st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]), int_expr(1)
    ).map(lambda t: f"{t[0]} {t[1]} {t[2]}")
    if depth == 0:
        return cmp_
    sub = bool_expr(depth - 1)
    return st.one_of(
        cmp_,
        st.tuples(sub, st.sampled_from(["and", "or"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        st.tuples(int_expr(0), st.lists(
            st.integers(min_value=0, max_value=24), min_size=1, max_size=4
        )).map(lambda t: f"{t[0]} in ({', '.join(map(str, t[1]))})"),
        st.sampled_from(STR_COLS).map(lambda c: f"{c} like 'NATION%'"),
    )


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(e1=int_expr(), e2=str_expr(), pred=bool_expr())
def test_random_sql_text_matches_duckdb(spark, sf_dir, e1, e2, pred):
    sql = (
        f"select n_nationkey, {e1} as v1, {e2} as v2 "
        f"from nation where {pred} order by n_nationkey"
    )
    try:
        spark_sql = transpile(sql)
        from verax_spark.sql import PrestoSession

        PrestoSession(spark, sf_dir)  # ensure views registered
        got = spark.sql(spark_sql).toPandas()
        con = duckdb.connect()
        try:
            con.execute(
                f"create view nation as select * from read_parquet('{sf_dir}/nation.parquet')"
            )
            want = con.execute(sql).df()
        finally:
            con.close()
        got["v1"] = got["v1"].astype("int64")
        want["v1"] = want["v1"].astype("int64")
        assert_frames_match(got, want, context=f"sql fuzz: {sql}")
    except Exception:
        # persist the failing input as a permanent regression test
        # (replay corpus, PrestoQueryReplayRunner analog)
        from tools.replay import record

        record(sql, note="recorded by test_parser_fuzz failure")
        raise


# ---------------------------------------------------------------------------
# Metamorphic fuzzing of the cost-based reorderer: for random star-join
# queries over the TPC-H FK graph, the reordered plan must return exactly
# what the textual-order plan returns (reordering may only change plans).
_FK_EDGES = {
    ("lineitem", "orders"): "l_orderkey = o_orderkey",
    ("lineitem", "part"): "l_partkey = p_partkey",
    ("lineitem", "supplier"): "l_suppkey = s_suppkey",
    ("orders", "customer"): "o_custkey = c_custkey",
    ("customer", "nation"): "c_nationkey = n_nationkey",
    ("supplier", "nation"): "s_nationkey = n_nationkey",
    ("nation", "region"): "n_regionkey = r_regionkey",
}
_FILTERS = {
    "lineitem": ["l_quantity < 25", "l_discount >= 0.05"],
    "orders": ["o_totalprice > 150000", "o_orderdate >= date '1997-01-01'"],
    "customer": ["c_acctbal > 0"],
    "supplier": ["s_acctbal > 1000"],
    "part": ["p_size < 30"],
    "nation": ["n_regionkey <> 2"],
    "region": ["r_name = 'ASIA'"],
}
_COUNT_COL = {
    "lineitem": "l_orderkey", "orders": "o_orderkey", "customer": "c_custkey",
    "supplier": "s_suppkey", "part": "p_partkey", "nation": "n_nationkey",
    "region": "r_regionkey",
}


def _connected_subsets():
    # every connected table subset of size 3-5 reachable through FK edges
    import itertools

    tables = sorted({t for e in _FK_EDGES for t in e})
    out = []
    for size in (3, 4, 5):
        for combo in itertools.combinations(tables, size):
            s = set(combo)
            edges = [v for k, v in _FK_EDGES.items() if set(k) <= s]
            # connectivity via union-find over chosen edges
            parent = {t: t for t in s}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for k in _FK_EDGES:
                if set(k) <= s:
                    parent[find(k[0])] = find(k[1])
            if len({find(t) for t in s}) == 1:
                out.append((sorted(s), edges))
    return out


_SUBSETS = _connected_subsets()


@settings(
    max_examples=24,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ix=st.integers(min_value=0, max_value=len(_SUBSETS) - 1),
    filter_mask=st.integers(min_value=0, max_value=127),
    star=st.booleans(),
)
def test_reorder_metamorphic_star_fuzz(spark, sf_dir, ix, filter_mask, star):
    from verax_spark.sql import PrestoSession

    tables, edges = _SUBSETS[ix]
    conds = list(edges)
    for i, t in enumerate(tables):
        if filter_mask >> i & 1:
            conds.append(
                _FILTERS[t][(filter_mask >> (i + 3) & 1) % len(_FILTERS[t])]
            )
    if star:
        # `select *` expands in FROM order: the reorderer must decline, and
        # the result (column order included) must match the textual plan.
        select_list = "*"
    else:
        count_expr = _COUNT_COL[tables[0]]
        select_list = f"count(*) as n, sum({count_expr}) as s"
    sql = (
        f"select {select_list} from {', '.join(tables)} "
        f"where {' and '.join(conds)}"
    )
    df_on = PrestoSession(spark, sf_dir, reorder=True).sql(sql)
    df_off = PrestoSession(spark, sf_dir, reorder=False).sql(sql)
    assert df_on.columns == df_off.columns, sql
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(df_on.collect()) == key(df_off.collect()), sql


def _chain_order(tables):
    """BFS order along FK edges: each table after the first joins one
    earlier table through exactly one _FK_EDGES condition."""
    order, conds = [tables[0]], []
    remaining = set(tables[1:])
    while remaining:
        for t in sorted(remaining):
            hit = next(
                (
                    cond
                    for (a, b), cond in _FK_EDGES.items()
                    if t in (a, b) and (a if b == t else b) in order
                ),
                None,
            )
            if hit is not None:
                order.append(t)
                conds.append(hit)
                remaining.discard(t)
                break
        else:  # pragma: no cover - subsets are connected by construction
            break
    return order, conds


@settings(
    max_examples=16,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ix=st.integers(min_value=0, max_value=len(_SUBSETS) - 1),
    left_pick=st.integers(min_value=0, max_value=10),
    filter_mask=st.integers(min_value=0, max_value=127),
    use_right=st.booleans(),
)
def test_reorder_metamorphic_left_join_fuzz(
    spark, sf_dir, ix, left_pick, filter_mask, use_right
):
    """One join in a random FK chain becomes LEFT (or RIGHT, with the new
    table as the null-supplied left operand): the reorderer either hoists
    it above the reordered core or declines — both must return exactly the
    textual-order result, including null-extension (count of the nullable
    side's column vs count(*) would expose any divergence)."""
    from verax_spark.sql import PrestoSession

    tables, _ = _SUBSETS[ix]
    order, conds = _chain_order(tables)
    left_ix = 1 + left_pick % (len(order) - 1)
    from_parts = [order[0]]
    for i, t in enumerate(order[1:], 1):
        kind = "join"
        if i == left_ix:
            # RIGHT spelling only works at position 1 (the chain head
            # becomes the right operand); elsewhere keep LEFT
            if use_right and i == 1:
                from_parts = [t, f"right join {order[0]} on {conds[0]}"]
                # null-supplied side is t itself under RIGHT…, but the
                # chain needs order[0..] joinable: swap roles — simplest is
                # to treat this as: new table t RIGHT JOIN head — head
                # stays the core. Continue the chain from the head.
                continue
            kind = "left join"
        from_parts.append(f"{kind} {t} on {conds[i - 1]}")
    where = [
        _FILTERS[t][(filter_mask >> (i + 3) & 1) % len(_FILTERS[t])]
        for i, t in enumerate(order)
        if filter_mask >> i & 1 and i != left_ix  # null-extended side stays unfiltered
    ]
    left_col = _COUNT_COL[order[left_ix]]
    sql = (
        f"select count(*) as n, count({left_col}) as matched "
        f"from {' '.join(from_parts)}"
        + (f" where {' and '.join(where)}" if where else "")
    )
    df_on = PrestoSession(spark, sf_dir, reorder=True).sql(sql)
    df_off = PrestoSession(spark, sf_dir, reorder=False).sql(sql)
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(df_on.collect()) == key(df_off.collect()), sql


def test_reorder_declines_unqualified_star(spark, sf_dir):
    # ADVICE r03 (high): unqualified `select *` must disqualify reordering —
    # column order is positional and FROM-order-dependent.
    from verax_spark.sql import PrestoSession
    from verax_spark.sql.parser import parse
    from verax_spark.sql.reorder import reorder_joins

    PrestoSession(spark, sf_dir)  # registers views
    sql = (
        "select * from lineitem, orders, customer "
        "where l_orderkey = o_orderkey and o_custkey = c_custkey"
    )
    _, info = reorder_joins(parse(sql), spark)
    assert info is None
    # qualified stars stay eligible
    sql_q = (
        "select c.*, o.o_totalprice from lineitem l, orders o, customer c "
        "where l.l_orderkey = o.o_orderkey and o.o_custkey = c.c_custkey"
    )
    _, info_q = reorder_joins(parse(sql_q), spark)
    assert info_q is not None
