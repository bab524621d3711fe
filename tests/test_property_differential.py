"""Property-based differential fuzzing: hypothesis generates filter/agg
shapes; Spark and DuckDB must agree on every one.

Goes beyond the reference's test strategy (SURVEY §5 notes it has no
property-based framework) — randomized coverage of the filter/aggregate
surface where hand-written corpora leave gaps.
"""

import duckdb
import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from verax_spark.catalog import Catalog
from verax_spark.testing import assert_frames_match

NUMERIC_COLS = ["l_quantity", "l_discount", "l_tax", "l_extendedprice"]
KEY_COLS = ["l_returnflag", "l_linestatus"]
OPS = ["<", "<=", ">", ">=", "=", "<>"]

predicates = st.tuples(
    st.sampled_from(NUMERIC_COLS),
    st.sampled_from(OPS),
    st.floats(min_value=0.0, max_value=60.0, allow_nan=False).map(
        lambda x: round(x, 2)
    ),
)


def _spark_pred(col, op, val):
    c = F.col(col)
    return {
        "<": c < val,
        "<=": c <= val,
        ">": c > val,
        ">=": c >= val,
        "=": c == val,
        "<>": c != val,
    }[op]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(p1=predicates, p2=predicates, key=st.sampled_from(KEY_COLS))
def test_random_filter_agg_matches_duckdb(spark, sf_dir, p1, p2, key):
    cat = Catalog(spark, sf_dir)
    got = (
        cat.lineitem.filter(_spark_pred(*p1) & _spark_pred(*p2))
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(4,1)")).cast("double").alias("q"),
        )
        .orderBy(key)
        .toPandas()
    )
    (c1, o1, v1), (c2, o2, v2) = p1, p2
    con = duckdb.connect()
    try:
        con.execute(
            f"create view lineitem as select * from read_parquet('{sf_dir}/lineitem.parquet')"
        )
        want = con.execute(
            f"""
            select {key}, count(*) as n,
              cast(sum(cast(l_quantity as decimal(4,1))) as double) as q
            from lineitem
            where {c1} {o1} {v1} and {c2} {o2} {v2}
            group by {key} order by {key}
            """
        ).df()
    finally:
        con.close()
    assert_frames_match(got, want, context=f"fuzz {p1} {p2} {key}")


def test_approx_count_distinct_sanity(spark, sf_dir):
    """Approximate aggregates can't be oracle-hashed (engine-specific
    sketches) — invariant check instead: within rsd bounds of exact."""
    cat = Catalog(spark, sf_dir)
    row = cat.lineitem.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.1


def test_percentile_approx_sanity(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    row = cat.lineitem.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
    ).collect()[0]
    assert abs(row.p50 - row.exact_p50) / row.exact_p50 < 0.05


WIN_RANKS = ["rank", "dense_rank", "row_number"]
WIN_AGGS = ["sum", "count", "min", "max"]
FRAMES = {
    "unb": "rows between unbounded preceding and current row",
    "two": "rows between 2 preceding and current row",
    "ahead": "rows between current row and 1 following",
}


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fn=st.sampled_from(WIN_RANKS + WIN_AGGS),
    part=st.sampled_from(["o_orderpriority", "o_orderstatus"]),
    frame=st.sampled_from(sorted(FRAMES)),
    desc=st.booleans(),
)
def test_random_window_matches_duckdb(spark, sf_dir, fn, part, frame, desc):
    """Random window shapes (ranking + framed aggregates over random
    partition keys and orderings) must agree with DuckDB. Ordering always
    ends in the unique o_orderkey so ties are deterministic cross-engine."""
    from pyspark.sql import Window

    cat = Catalog(spark, sf_dir)
    order_cols = [F.col("o_totalprice"), F.col("o_orderkey")]
    if desc:
        order_cols = [c.desc() for c in order_cols]
    w = Window.partitionBy(part).orderBy(*order_cols)
    if fn in WIN_RANKS:
        val = getattr(F, fn)().over(w).cast("long")
    else:
        wf = w.rowsBetween(
            {"unb": Window.unboundedPreceding, "two": -2, "ahead": 0}[frame],
            {"unb": 0, "two": 0, "ahead": 1}[frame],
        )
        arg = F.col("o_totalprice").cast("decimal(12,2)")
        val = getattr(F, fn)(arg).over(wf)
        val = val.cast("long") if fn == "count" else val.cast("double")
    got = (
        cat.orders.filter(F.col("o_orderkey") < 3000)
        .select("o_orderkey", val.alias("v"))
        .orderBy("o_orderkey")
        .toPandas()
    )
    dirn = "desc" if desc else "asc"
    over = f"partition by {part} order by o_totalprice {dirn}, o_orderkey {dirn}"
    if fn in WIN_RANKS:
        expr = f"cast({fn}() over ({over}) as bigint)"
    else:
        inner = f"{fn}(cast(o_totalprice as decimal(12,2))) over ({over} {FRAMES[frame]})"
        expr = (
            f"cast({inner} as bigint)" if fn == "count"
            else f"cast({inner} as double)"
        )
    con = duckdb.connect()
    try:
        con.execute(
            f"create view orders as select * from read_parquet('{sf_dir}/orders.parquet')"
        )
        want = con.execute(
            f"select o_orderkey, {expr} as v from orders "
            f"where o_orderkey < 3000 order by o_orderkey"
        ).df()
    finally:
        con.close()
    assert_frames_match(got, want, context=f"window fuzz {fn} {part} {frame} {dirn}")


JOIN_TYPES = ["inner", "left", "right", "full"]
DUCK_JOIN = {"inner": "join", "left": "left join", "right": "right join", "full": "full join"}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    how=st.sampled_from(JOIN_TYPES),
    cutoff=st.floats(min_value=1000, max_value=60000).map(lambda x: round(x, 2)),
)
def test_random_join_type_matches_duckdb(spark, sf_dir, how, cutoff):
    """Random outer-join shapes with a filtered build side must agree with
    DuckDB on counts per nation (null-extension semantics included)."""
    cat = Catalog(spark, sf_dir)
    orders = cat.orders.filter(F.col("o_totalprice") > cutoff)
    got = (
        cat.customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), how)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_nationkey")
        .toPandas()
    )
    con = duckdb.connect()
    try:
        for t in ("customer", "orders"):
            con.execute(
                f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
            )
        want = con.execute(
            f"""
            select c_nationkey, count(*) as n, count(o_orderkey) as n_orders
            from customer {DUCK_JOIN[how]}
              (select * from orders where o_totalprice > {cutoff}) o
              on c_custkey = o_custkey
            group by c_nationkey order by c_nationkey
            """
        ).df()
    finally:
        con.close()
    got["c_nationkey"] = got["c_nationkey"].astype("float64")
    want["c_nationkey"] = want["c_nationkey"].astype("float64")
    assert_frames_match(got, want, context=f"join fuzz {how} {cutoff}")
