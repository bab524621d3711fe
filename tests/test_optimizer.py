"""Optimizer parity layer tests: join ordering + broadcast hints, history
feedback, map-as-struct rewrite."""

import os
import tempfile

import pyspark.sql.functions as F
import pytest

from verax_spark.catalog import Catalog
from verax_spark.optimizer import ExecutionHistory, QueryGraph, maps_as_structs
from verax_spark.optimizer.history import plan_signature
from verax_spark.testing import assert_frames_match, duckdb_connection


def _graph(spark, sf_dir, history=None) -> QueryGraph:
    cat = Catalog(spark, sf_dir)
    g = QueryGraph(history=history)
    g.table("region", cat.region, F.col("r_name") == "ASIA")
    g.table("nation", cat.nation)
    g.table("supplier", cat.supplier)
    g.table("lineitem", cat.lineitem, F.col("l_quantity") < 10)
    g.edge("nation", "n_regionkey", "region", "r_regionkey")
    g.edge("supplier", "s_nationkey", "nation", "n_nationkey")
    g.edge("lineitem", "l_suppkey", "supplier", "s_suppkey")
    return g


def test_query_graph_result_correct(spark, sf_dir):
    """The planner may pick any order; the result must equal the naive SQL."""
    df = (
        _graph(spark, sf_dir)
        .plan()
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("n_name")
    )
    con = duckdb_connection(sf_dir)
    try:
        want = con.execute(
            """
            select n_name, count(*) as n
            from lineitem, supplier, nation, region
            where l_suppkey = s_suppkey and s_nationkey = n_nationkey
              and n_regionkey = r_regionkey and r_name = 'ASIA' and l_quantity < 10
            group by n_name order by n_name
            """
        ).df()
    finally:
        con.close()
    assert_frames_match(df.toPandas(), want, context="query_graph")


def test_query_graph_broadcasts_small_sides(spark, sf_dir):
    plan = _graph(spark, sf_dir).plan()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan  # all dims broadcastable at test scale


def test_query_graph_starts_from_most_filtered_table(spark, sf_dir):
    g = _graph(spark, sf_dir)
    est = {n: g._estimate_rows(r) for n, r in g.tables.items()}
    # region filtered to 1 row must be the cheapest start
    assert min(est, key=lambda n: est[n]) == "region"


def test_history_feedback_roundtrip(spark, sf_dir):
    path = os.path.join(tempfile.gettempdir(), "verax_hist_test.json")
    if os.path.exists(path):
        os.remove(path)
    hist = ExecutionHistory(path)
    cat = Catalog(spark, sf_dir)
    df = cat.orders.filter(F.col("o_totalprice") > 30000)
    sig = plan_signature(df)
    observed, pending = hist.observe(df, sig)
    n = observed.count()
    actual = pending.flush()
    assert actual == n
    hist.save()

    # fresh session-independent lookup
    hist2 = ExecutionHistory(path)
    assert hist2.lookup(sig) == n
    # signature stability: rebuilding the same frame gives the same key
    assert plan_signature(cat.orders.filter(F.col("o_totalprice") > 30000)) == sig


def test_history_misestimate_report():
    hist = ExecutionHistory(os.path.join(tempfile.gettempdir(), "verax_hist_m.json"))
    hist.record_estimate("scan:a", 100.0)
    hist.record("scan:a", 5000.0)
    hist.record_estimate("scan:b", 10.0)
    hist.record("scan:b", 12.0)
    bad = hist.misestimates(factor=4.0)
    assert "scan:a" in bad and "scan:b" not in bad


def test_maps_as_structs_json(spark, sf_dir):
    """Hot-key hoist on the JSON props column: values match full parses."""
    cat = Catalog(spark, sf_dir)
    rewritten = maps_as_structs(
        cat.events.filter(F.col("event_id") < 100),
        {"props": ["k"]},
        value_type="bigint",
    )
    assert "props" not in rewritten.columns and "props_k" in rewritten.columns
    got = rewritten.select("event_id", "props_k").orderBy("event_id").toPandas()
    con = duckdb_connection(sf_dir)
    try:
        want = con.execute(
            "select event_id, cast(json_extract(props,'$.k') as bigint) as props_k "
            "from events where event_id < 100 order by event_id"
        ).df()
    finally:
        con.close()
    assert_frames_match(got, want, context="maps_as_structs")


def test_maps_as_structs_maptype(spark):
    df = spark.createDataFrame(
        [(1, {"a": "x", "b": "y"}), (2, {"a": "z"})], "id int, m map<string,string>"
    )
    out = maps_as_structs(df, {"m": ["a", "b"]})
    rows = {r.id: (r.m_a, r.m_b) for r in out.collect()}
    assert rows == {1: ("x", "y"), 2: ("z", None)}


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must not change join semantics (events.user_id is the skewed
    zipf key per FIXTURES)."""
    from verax_spark.optimizer.skew import salted_join

    cat = Catalog(spark, sf_dir)
    users = (
        cat.events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    )
    plain = (
        cat.events.join(users.withColumnRenamed("user_id", "u2"),
                        F.col("user_id") == F.col("u2"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_events").alias("s"))
        .collect()[0]
    )
    salted = (
        salted_join(
            cat.events,
            users.withColumnRenamed("user_id", "u2"),
            "user_id",
            "u2",
            salt_col="event_id",
            salt_factor=8,
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_events").alias("s"))
        .collect()[0]
    )
    assert (plain.n, plain.s) == (salted.n, salted.s)


def test_presto_datetime_adapters(spark):
    from verax_spark.functions.presto import presto_call

    df = spark.createDataFrame([("2024-03-05 10:00:00",)], "s string").select(
        F.col("s").cast("timestamp").alias("ts")
    )
    row = df.select(
        presto_call("date_add", "day", 3, F.col("ts")).alias("plus3d"),
        presto_call("date_diff", "hour", F.col("ts"), F.col("ts")).alias("zero"),
        presto_call("date_trunc", "month", F.col("ts")).alias("m"),
        presto_call("element_at", F.split(F.lit("a b"), " "), 5).alias("oob"),
    ).collect()[0]
    assert str(row.plus3d) == "2024-03-08 10:00:00"
    assert row.zero == 0
    assert str(row.m) == "2024-03-01 00:00:00"
    assert row.oob is None  # presto element_at: NULL out of range


def test_plan_uses_parquet_metadata_not_full_counts(spark, sf_dir, monkeypatch):
    """Planning must never run a full count() over a parquet base table —
    base cardinality comes from footer metadata (the reference's
    TableLayout stats, ConnectorMetadata.h:262-269)."""
    from pyspark.sql import DataFrame

    from verax_spark.optimizer.query_graph import _parquet_row_count

    cat = Catalog(spark, sf_dir)
    assert _parquet_row_count(cat.nation) == cat.nation.count()

    g = QueryGraph()
    g.table("nation", cat.nation)
    g.table("supplier", cat.supplier)
    g.edge("supplier", "s_nationkey", "nation", "n_nationkey")

    def boom(self):
        raise AssertionError("full count() during plan()")

    monkeypatch.setattr(DataFrame, "count", boom)
    df = g.plan()  # must not raise: no-predicate estimates are footer-only
    monkeypatch.undo()
    assert df.count() > 0


def test_high_fanout_edge_demotes_small_table(spark):
    """JoinSample analog (axiom/optimizer/JoinSample.cpp:28-60): a SMALL
    table reached over a HIGH-fanout edge must be joined after a larger
    low-fanout one — ranking by projected result growth, not base size."""
    # A (4 rows, the smallest → start): hot key a=1, distinct b
    a = spark.createDataFrame([(1, i) for i in range(4)], "a int, b int")
    # B (12 rows): 3 rows per b value → fanout 3
    b = spark.createDataFrame(
        [(i, j) for i in range(4) for j in range(3)], "b2 int, tag int"
    )
    # C (6 rows): all on the hot key → fanout (4*6)/4 = 6 despite |C|=6 < |B|
    c = spark.createDataFrame([(1, j) for j in range(6)], "a2 int, pay int")

    g = QueryGraph(fanout_mod=1)  # sample the whole key domain (tiny data)
    g.table("A", a)
    g.table("B", b)
    g.table("C", c)
    g.edge("A", "b", "B", "b2")
    g.edge("A", "a", "C", "a2")
    out = g.plan()
    assert g.last_order == ["A", "B", "C"], g.last_order
    assert out.count() == 4 * 3 * 6


def test_implied_edges_close_equality_classes(spark):
    """addImpliedJoins analog (DerivedTable.cpp:90, Column::Equivalence
    QueryGraph.h:154-157): A.k=B.bk and B.bk=C.ck imply A.k=C.ck, so the
    enumeration can join the two cheap endpoints FIRST instead of being
    forced through the fat middle table of the chain."""
    # A: 10 keys, one row each
    a = spark.createDataFrame([(k, k * 10) for k in range(10)], "k int, av int")
    # B: fat middle — 5 rows per key
    b = spark.createDataFrame(
        [(k, j) for k in range(10) for j in range(5)], "bk int, bv int"
    )
    # C: tiny selective endpoint — 2 keys
    c = spark.createDataFrame([(0, 7), (1, 8)], "ck int, cv int")

    g = QueryGraph(fanout_mod=1)
    g.table("A", a).table("B", b).table("C", c)
    g.edge("A", "k", "B", "bk")
    g.edge("B", "bk", "C", "ck")
    added = g.add_implied_edges()
    assert [(e.left, e.left_key, e.right, e.right_key) for e in added] == [
        ("A", "k", "C", "ck")
    ]
    assert g.add_implied_edges() == []  # idempotent

    out = g.plan()
    # endpoints join before the fat middle table
    assert set(g.last_order[:2]) == {"A", "C"}, g.last_order
    # the implied edge is exact for inner joins: same result as the chain
    expect = (
        a.join(b, F.col("k") == F.col("bk"))
        .join(c, F.col("bk") == F.col("ck"))
        .count()
    )
    assert out.count() == expect == 10


def _semired_graph(spark, **kw) -> QueryGraph:
    fact = spark.createDataFrame(
        [(i % 100, i) for i in range(5000)], "fk int, v int"
    )
    dim = spark.createDataFrame(
        [(k, k % 7) for k in range(100)], "dk int, attr int"
    )
    g = QueryGraph(fanout_mod=1, broadcast_rows=1000, **kw)
    g.table("fact", fact)
    g.table("dim", dim, predicate=F.col("attr") == 0)
    g.edge("dim", "dk", "fact", "fk")
    return g


def test_semijoin_reduction_fires_and_is_exact(spark):
    """Existences analog (ref optimizer/Plan.h:134-151, DerivedTable::import
    DerivedTable.cpp:293): a big shuffle side is semi-joined down to the
    filtered partner's keys before the main join — a broadcast LeftSemi in
    the plan — without changing the result."""
    for algo in ("dp", "greedy"):
        g = _semired_graph(spark)
        out = g.plan(algo)
        assert g.reductions == [("fact", "dim")], (algo, g.reductions)
        assert "LeftSemi" in out._jdf.queryExecution().executedPlan().toString()
        base = _semired_graph(spark, semijoin_reduction=False)
        expect = base.plan(algo)
        assert base.reductions == []
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, expect.collect())
        )


def test_semijoin_reduction_requires_filtered_partner(spark):
    """An unfiltered dimension broadcasts its whole key domain and reduces
    nothing — the reduction must not fire."""
    fact = spark.createDataFrame([(i % 10, i) for i in range(2000)], "fk int, v int")
    dim = spark.createDataFrame([(k,) for k in range(10)], "dk int")
    g = QueryGraph(fanout_mod=1, broadcast_rows=1000)
    g.table("fact", fact)
    g.table("dim", dim)
    g.edge("dim", "dk", "fact", "fk")
    g.plan()
    assert g.reductions == []


def test_dp_enumeration_finds_bushy_plan(spark):
    """Memoized enumeration (Optimization.cpp:1555 makeJoins analog) must
    consider BUSHY shapes: with two reducing arms, joining (A⋈B) with (C⋈D)
    beats every left-deep order under the C_out cost."""
    g = QueryGraph()
    for name, cols in [("A", "a int, ab int"), ("B", "ab2 int, b int"),
                       ("C", "a2 int, cd int"), ("D", "cd2 int, d int")]:
        g.table(name, spark.createDataFrame([(1, 1)], cols))
    g.edge("A", "ab", "B", "ab2")
    g.edge("A", "a", "C", "a2")
    g.edge("B", "b", "D", "d")
    g.edge("C", "cd", "D", "cd2")
    # stub stats: DP must rely on these, not data (instance attrs shadow
    # the methods; called without self)
    est = {"A": 100.0, "B": 200.0, "C": 300.0, "D": 1000.0}
    fans = {("A", "B"): (2.0, 1.0), ("A", "C"): (3.0, 1.0),
            ("B", "D"): (10.0, 2.0), ("C", "D"): (1.0, 0.3)}
    g._estimate_rows = lambda ref: est[ref.name]
    g._edge_fanout = lambda e, mod=None: fans[(e.left, e.right)]
    df = g.plan("dp")
    assert df is not None

    def kinds(tree):
        return (tree[0],) + tuple(t[0] for t in tree[1:3]) if tree[0] != "leaf" else ("leaf",)

    # best plan is the bushy (A⋈B) ⋈ (C⋈D): both children are joins
    assert g.last_tree[0] == "join"
    assert g.last_tree[1][0] == "join" and g.last_tree[2][0] == "join", g.last_tree


# ---------------------------------------------------------------------------
# Footer statistics layer (ConnectorMetadata.h:51-93, :262-269 analog)
def test_footer_stats_match_data(spark, sf_dir):
    from verax_spark.catalog import Catalog

    cat = Catalog(spark, sf_dir)
    st = cat.stats("orders")
    assert st is not None
    truth = cat.orders.agg(
        F.count(F.lit(1)), F.min("o_totalprice"), F.max("o_totalprice")
    ).collect()[0]
    assert st.num_rows == truth[0]
    cs = st.columns["o_totalprice"]
    assert cs.min == truth[1] and cs.max == truth[2]
    assert cs.null_count == 0
    assert st.total_bytes > 0


def test_selectivity_from_stats(spark, sf_dir):
    from verax_spark.catalog import Catalog
    from verax_spark.plans.expr import Call, Col, Lit
    from verax_spark.sources.stats import selectivity

    cat = Catalog(spark, sf_dir)
    st = cat.stats("orders")
    total = st.num_rows
    mid = (st.columns["o_totalprice"].min + st.columns["o_totalprice"].max) / 2
    pred = Call("lt", Col("o_totalprice"), Lit(mid))
    sel = selectivity(st, pred)
    actual = cat.orders.filter(F.col("o_totalprice") < mid).count() / total
    assert sel is not None and abs(sel - actual) < 0.25
    # boolean combinators
    both = Call("and", pred, Call("gt", Col("o_totalprice"), Lit(mid / 2)))
    assert 0.0 <= selectivity(st, both) <= sel + 1e-9
    neg = Call("not", pred)
    assert abs(selectivity(st, neg) - (1 - sel)) < 1e-9
    # shapes stats cannot answer → None (caller samples)
    assert selectivity(st, Call("like", Col("o_orderpriority"), Lit("5%"))) is None


def test_plan_estimates_run_no_spark_jobs_with_stats(spark, sf_dir, monkeypatch):
    """The reference rule (ConnectorMetadata.h:262-269): planning consults
    metadata/samples, never full actions. With parquet tables and DSL Expr
    predicates, _estimate_rows must not trigger ANY DataFrame action."""
    from pyspark.sql import DataFrame

    from verax_spark.catalog import Catalog
    from verax_spark.plans.expr import Call, Col, Lit

    cat = Catalog(spark, sf_dir)
    g = QueryGraph()
    g.table("orders", cat.orders, Call("lt", Col("o_totalprice"), Lit(100000.0)))
    g.table("customer", cat.customer, Call("gt", Col("c_acctbal"), Lit(0.0)))

    def boom(self, *a, **k):
        raise AssertionError("planning ran a Spark action")

    monkeypatch.setattr(DataFrame, "count", boom)
    monkeypatch.setattr(DataFrame, "collect", boom)
    est_o = g._estimate_rows(g.tables["orders"])
    est_c = g._estimate_rows(g.tables["customer"])
    assert 0 < est_o < cat.stats("orders").num_rows
    assert 0 < est_c <= cat.stats("customer").num_rows


def test_transfer_cost_breaks_cout_ties(spark):
    """Byte-denominated objective (Cost.h:95-123 analog): A joins B and C
    with identical cardinalities and fanouts (C_out ties exactly), but B is
    wide (many strings) and C narrow — the planner must join the narrow
    table first so the wide rows cross the wire as late as possible."""
    g = QueryGraph()
    g.table("A", spark.createDataFrame([(1, 1, 1)], "a int, kb int, kc int"))
    g.table("B", spark.createDataFrame(
        [(1, "x" * 5, "y" * 5, "z" * 5, "w" * 5)],
        "kb2 int, s1 string, s2 string, s3 string, s4 string"))
    g.table("C", spark.createDataFrame([(1, 2)], "kc2 int, c int"))
    g.edge("A", "kb", "B", "kb2")
    g.edge("A", "kc", "C", "kc2")
    est = {"A": 1000.0, "B": 1000.0, "C": 1000.0}
    fans = {("A", "B"): (1.0, 1.0), ("A", "C"): (1.0, 1.0)}
    g._estimate_rows = lambda ref: est[ref.name]
    g._edge_fanout = lambda e, mod=None: fans[(e.left, e.right)]
    g.plan("dp")
    order = g.last_order
    # same C_out either way (every intermediate is 1000 rows); only the
    # transfer/width terms can separate the orders
    assert order.index("C") < order.index("B"), order


# ---------------------------------------------------------------------------
# Per-path subfield statistics (ConnectorMetadata.h:51-93 analog)
@pytest.fixture(scope="module")
def nested_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nested") / "t.parquet")
    df = spark.createDataFrame(
        [(i, (i, f"v{i}"), {"alpha": i, "beta": i * 2}) for i in range(100)],
        "id long, s struct<x: long, label: string>, m map<string, long>",
    )
    df.repartition(2).write.mode("overwrite").parquet(path)
    return path


def test_subfield_stats_per_path(spark, nested_parquet):
    from verax_spark.sources.stats import table_stats

    stats = table_stats(spark.read.parquet(nested_parquet))
    assert stats is not None and stats.num_rows == 100
    # struct field paths carry their own chunk statistics
    sx = stats.path_stats("s.x")
    assert sx is not None and sx.min == 0 and sx.max == 99
    # map key/value streams (physical key_value level elided)
    mk = stats.path_stats("m.key")
    assert mk is not None
    lo = mk.min.decode() if isinstance(mk.min, bytes) else mk.min
    hi = mk.max.decode() if isinstance(mk.max, bytes) else mk.max
    assert lo == "alpha" and hi == "beta"
    mv = stats.path_stats("m.value")
    assert mv is not None and mv.max == 198


def test_selectivity_on_subfield_path(spark, nested_parquet):
    from verax_spark.plans.expr import Col, Lit
    from verax_spark.sources.stats import selectivity, table_stats

    stats = table_stats(spark.read.parquet(nested_parquet))
    from verax_spark.plans.expr import Call

    sel = selectivity(stats, Call("lte", Col("s.x"), Lit(49)))
    assert sel is not None and 0.4 < sel < 0.6


def test_maps_as_structs_gated_by_key_stats(spark, nested_parquet):
    from verax_spark.optimizer.subfields import maps_as_structs, stats_backed_keys
    from verax_spark.sources.stats import table_stats

    df = spark.read.parquet(nested_parquet)
    stats = table_stats(df)
    # 'zzz' is outside the footer key range [alpha, beta] — provably absent
    assert stats_backed_keys(stats, "m", ["alpha", "zzz"]) == ["alpha"]
    out = maps_as_structs(df, {"m": ["alpha", "zzz"]}, stats=stats)
    # pruned key still materializes (typed null) — schema must be stable
    # whether or not the footer proved it absent (ADVICE r03)
    assert "m_alpha" in out.columns and "m_zzz" in out.columns
    assert out.filter(F.col("m_alpha") != F.col("id")).count() == 0
    assert out.schema["m_zzz"].dataType == out.schema["m_alpha"].dataType
    assert out.filter(F.col("m_zzz").isNotNull()).count() == 0
    # the pruned plan must not touch the map for the absent key: same
    # result set as the un-gated rewrite
    out2 = maps_as_structs(df, {"m": ["alpha", "zzz"]})
    assert "m_zzz" in out2.columns
    assert sorted(map(tuple, out.select("id", "m_alpha", "m_zzz").collect())) == sorted(
        map(tuple, out2.select("id", "m_alpha", "m_zzz").collect())
    )
    # truncated-upper-bound soundness: a key that merely EXTENDS the stored
    # max prefix may exist — must NOT be pruned
    assert "beta2" in stats_backed_keys(stats, "m", ["beta2"])


def test_metadata_fanout_for_pk_edges(spark, sf_dir, monkeypatch):
    """A dense-unique (PK) join side proven by footer stats must yield its
    fanout from metadata alone — zero Spark jobs (TableLayout stats analog,
    ConnectorMetadata.h:262-269: planning never scans)."""
    from verax_spark.optimizer.query_graph import JoinEdge

    cat = Catalog(spark, sf_dir)
    g = QueryGraph()
    g.table("supplier", cat.supplier)
    g.table("nation", cat.nation)
    e = JoinEdge("supplier", "nation", "s_nationkey", "n_nationkey")
    g.edges.append(e)
    n_sup = cat.supplier.count()

    # the sampled estimator at mod=1 (exhaustive) is the ground truth
    exact = g._edge_fanout(e, mod=1)
    meta = g._metadata_fanout(e)
    assert meta is not None
    assert abs(meta[0] - exact[0]) < 1e-9  # 1 match per supplier row
    assert abs(meta[1] - exact[1]) < 1e-9  # n_sup/25 per nation row
    assert abs(meta[1] - n_sup / 25) < 1e-9

    # and the default path takes it without running any job
    import pyspark.sql

    def boom(self):
        raise AssertionError("fanout probe ran a Spark job on a PK edge")

    monkeypatch.setattr(pyspark.sql.DataFrame, "collect", boom)
    got = g._edge_fanout(e)
    assert abs(got[0] - meta[0]) < 1e-9 and abs(got[1] - meta[1]) < 1e-9


def test_metadata_fanout_filter_rules(spark, sf_dir):
    """Filters under uniformity: a PK-side filter scales matches-per-probe
    -row by its selectivity; a PROBE-side filter leaves it unchanged and
    scales only the reverse fanout."""
    from verax_spark.optimizer.query_graph import JoinEdge

    cat = Catalog(spark, sf_dir)
    g = QueryGraph()
    g.table("supplier", cat.supplier)
    g.table("nation", cat.nation, F.col("n_regionkey") == 0)
    e = JoinEdge("supplier", "nation", "s_nationkey", "n_nationkey")
    g.edges.append(e)
    meta0 = g._metadata_fanout(e)
    assert meta0 is not None
    n_match = cat.nation.filter(F.col("n_regionkey") == 0).count()
    assert abs(meta0[0] - n_match / 25) < 1e-9  # sel-scaled per-probe fanout

    g2 = QueryGraph()
    g2.table("supplier", cat.supplier, F.col("s_acctbal") > 0)
    g2.table("nation", cat.nation)
    e2 = JoinEdge("supplier", "nation", "s_nationkey", "n_nationkey")
    g2.edges.append(e2)
    meta = g2._metadata_fanout(e2)
    assert meta is not None
    assert abs(meta[0] - 1.0) < 1e-9  # per filtered-supplier row: 1 nation
    est_sup = g2._estimate_rows(g2.tables["supplier"])
    assert abs(meta[1] - est_sup / 25) < 1e-9


def test_metadata_fanout_requires_uniqueness_proof(spark, tmp_path):
    """ADVICE r03 (medium): dense-range footer stats do NOT prove
    uniqueness — [1,2,2,4] passes every min/max/count test. Without a
    declared unique-key constraint (or exact footer NDV) the metadata
    path must decline and leave the sampler in charge."""
    import pandas as pd

    from verax_spark.optimizer.query_graph import JoinEdge

    left = str(tmp_path / "dup.parquet")
    right = str(tmp_path / "probe.parquet")
    # the advisor's exact counterexample: range 4, count 4, no nulls — dup
    pd.DataFrame({"k": [1, 2, 2, 4]}).to_parquet(left)
    # every probe row hits the duplicated key — the ≤1-match claim is
    # off by 2× here, exactly what the unsound range "proof" would assert
    pd.DataFrame({"pk": [2, 2, 2, 2]}).to_parquet(right)
    g = QueryGraph()
    g.table("d", spark.read.parquet(left))
    g.table("p", spark.read.parquet(right))
    e = JoinEdge("d", "p", "k", "pk")
    g.edges.append(e)
    assert g._metadata_fanout(e) is None
    # the sampler ground truth disagrees with the ≤1-match "proof":
    # key 2 matches twice
    exact = g._edge_fanout(e, mod=1)
    assert exact[1] > 1.0  # per probe row with pk=2: two matches

    # a declared constraint flips it back on — and a declared constraint
    # contradicted by footers (nulls) is still refused
    g2 = QueryGraph()
    g2.table("d", spark.read.parquet(left), unique_keys={"k"})
    g2.table("p", spark.read.parquet(right))
    g2.edges.append(e)
    assert g2._metadata_fanout(e) is not None  # trusted contract

    nulls = str(tmp_path / "nullkey.parquet")
    pd.DataFrame({"k": pd.array([1, 2, None, 4], dtype="Int64")}).to_parquet(nulls)
    g3 = QueryGraph()
    g3.table("d", spark.read.parquet(nulls), unique_keys={"k"})
    g3.table("p", spark.read.parquet(right))
    g3.edges.append(e)
    assert g3._metadata_fanout(e) is None  # falsified by footer

    # pigeonhole falsification: 5 values in a 4-slot range → duplicates
    pig = str(tmp_path / "pigeon.parquet")
    pd.DataFrame({"k": [1, 2, 2, 3, 4]}).to_parquet(pig)
    g4 = QueryGraph()
    g4.table("d", spark.read.parquet(pig), unique_keys={"k"})
    g4.table("p", spark.read.parquet(right))
    g4.edges.append(e)
    assert g4._metadata_fanout(e) is None


def test_metadata_fanout_not_recorded_into_history(spark, sf_dir):
    """Footer-derived fanouts are recomputable for free and must not
    outlive the files they describe — _edge_fanout must serve them
    without persisting estimates into the shared history (ADVICE r03)."""
    from verax_spark.optimizer.history import ExecutionHistory
    from verax_spark.optimizer.query_graph import JoinEdge

    cat = Catalog(spark, sf_dir)
    g = QueryGraph(history=ExecutionHistory())
    g.table("supplier", cat.supplier)
    g.table("nation", cat.nation)
    e = JoinEdge("supplier", "nation", "s_nationkey", "n_nationkey")
    g.edges.append(e)
    got = g._edge_fanout(e)
    assert got is not None
    assert not any(k.startswith("edge:") for k in g.history._estimates)
    assert not any(k.startswith("edge:") for k in g.history._data)


def test_history_signature_carries_data_fingerprint(spark, sf_dir):
    """ADVICE r03: history signatures must change when the underlying
    files change, or stale row estimates silently drive plans."""
    cat = Catalog(spark, sf_dir)
    g = QueryGraph()
    g.table("nation", cat.nation)
    sig = g._signature(g.tables["nation"])
    assert "fp=" in sig and not sig.endswith("fp=mem")
    # in-memory relations get the neutral marker
    g.table("m", spark.createDataFrame([(1,)], "a int"))
    assert g._signature(g.tables["m"]).endswith("fp=mem")


def test_copartitioned_bucket_layout_prefers_colocated_join(spark):
    """isSamePartition analog (Schema.h:190): with cardinalities and
    fanouts tied, the planner must join the two identically-bucketed
    tables first (zero shuffle) before the unbucketed one."""
    g = QueryGraph()
    g.table("A", spark.createDataFrame([(1, 1)], "k int, ka int"),
            bucketed_by=(("k",), 16))
    g.table("B", spark.createDataFrame([(1, 2)], "k2 int, kb int"),
            bucketed_by=(("k2",), 16))
    g.table("C", spark.createDataFrame([(1, 3)], "k3 int, kc int"))
    g.edge("A", "k", "B", "k2")
    g.edge("A", "k", "C", "k3")
    est = {"A": 1000.0, "B": 1000.0, "C": 1000.0}
    fans = {("A", "B"): (1.0, 1.0), ("A", "C"): (1.0, 1.0)}
    g._estimate_rows = lambda ref: est[ref.name]
    g._edge_fanout = lambda e, mod=None: fans.get((e.left, e.right), (1.0, 1.0))
    g.plan("dp")
    order = g.last_order
    assert order.index("B") < order.index("C"), order
    # mismatched bucket counts must NOT co-partition
    g2 = QueryGraph()
    g2.table("A", spark.createDataFrame([(1, 1)], "k int, ka int"),
             bucketed_by=(("k",), 16))
    g2.table("B", spark.createDataFrame([(1, 2)], "k2 int, kb int"),
             bucketed_by=(("k2",), 8))
    g2.edge("A", "k", "B", "k2")
    g2._estimate_rows = lambda ref: 1000.0
    g2._edge_fanout = lambda e, mod=None: (1.0, 1.0)
    tree, _ = g2.choose_tree()
    assert tree is not None  # still plans; just no zero-shuffle credit


def test_execution_feedback_roundtrip(spark, sf_dir, tmp_path, monkeypatch):
    """Round-4 #5: an executed query's per-scan actuals (from Spark SQL
    metrics — zero extra jobs) are recorded into the shared history under
    the planner's own signatures, persisted, and the SECOND planning of the
    same query uses the observed rows without running any estimation job
    (VeloxHistory::recordVeloxExecution analog, VeloxHistory.h:44-50)."""
    import verax_spark.sql.reorder as reorder_mod
    from verax_spark.optimizer.history import ExecutionHistory
    from verax_spark.sql import PrestoSession

    hist = ExecutionHistory(path=str(tmp_path / "h.json"))
    monkeypatch.setattr(reorder_mod, "_SHARED_HISTORY", hist)
    ps = PrestoSession(spark, sf_dir)
    sql = (
        "select count(*) as n from lineitem l, orders o, customer c "
        "where l.l_orderkey = o.o_orderkey and o.o_custkey = c.c_custkey "
        "and o.o_totalprice > 150000"
    )
    df = ps.sql(sql)
    info1 = ps.last_reorder
    assert info1 is not None and set(info1.signatures) == {"l", "o", "c"}
    df.collect()  # full action → feedback flush
    o_sig = info1.signatures["o"][0]
    assert o_sig in hist._data, "filtered-scan actual not recorded"
    true_o = (
        spark.table("orders").filter(F.col("o_totalprice") > 150000).count()
    )
    assert hist._data[o_sig] == true_o
    # unfiltered scans record their scan-node actuals too
    assert hist._data[info1.signatures["l"][0]] == spark.table("lineitem").count()
    # persisted to disk (flush-on-action)
    assert ExecutionHistory(path=str(tmp_path / "h.json"))._data.get(o_sig) == true_o

    # second planning: every leaf estimate must come from the recorded
    # actuals — pin by breaking the entire estimation fallback
    def boom(self, ref):
        raise AssertionError(f"estimation ran for {ref.name} despite actuals")

    monkeypatch.setattr(QueryGraph, "_estimate_rows_uncached", boom, raising=True)
    # keep the history shortcut alive: _estimate_rows_uncached consults the
    # history first, so emulate just that prefix
    def history_only(self, ref):
        got = self.history.lookup(self._signature(ref)) if self.history else None
        if got is None:
            raise AssertionError(f"no actual for {ref.name}; estimation would run")
        return got

    monkeypatch.setattr(QueryGraph, "_estimate_rows_uncached", history_only)
    ps2 = PrestoSession(spark, sf_dir)
    ps2.sql(sql)
    info2 = ps2.last_reorder
    assert info2 is not None
    assert info2.est["o"] == true_o


def test_branch_and_bound_dp_beats_greedy_at_12_tables(spark):
    """Round-4 #8: branch-and-bound pruning (Plan.h:273-276 analog) keeps
    exact enumeration affordable past the old 10-table cap. A 12-table
    chain with one expensive edge at the smallest table: greedy starts
    there and drags the blow-up through every intermediate; exact DP joins
    the cheap suffix first and crosses the expensive edge once, at the end.
    """
    import time

    g = QueryGraph()
    n = 12
    names = [f"t{i:02d}" for i in range(n)]
    for i, name in enumerate(names):
        # two DISTINCT key columns per table: a real chain, not one big
        # equivalence class (implied-edge closure would clique it)
        g.table(name, spark.createDataFrame([(1, 1)], f"a{i} int, b{i} int"))
        if i:
            g.edge(names[i - 1], f"b{i - 1}", name, f"a{i}")
    est = {"t00": 10.0}
    est.update({name: 1000.0 - i for i, name in enumerate(names) if i})
    fans = {("t00", "t01"): (500.0, 5.0)}  # the trap edge
    g._estimate_rows = lambda ref: est[ref.name]
    g._edge_fanout = lambda e, mod=None: fans.get((e.left, e.right), (1.0, 1.0))

    t0 = time.monotonic()
    tree, _ = g.choose_tree()
    elapsed = time.monotonic() - t0
    assert tree is not None
    assert elapsed < 20.0, f"12-table enumeration took {elapsed:.1f}s"

    def leaves_in_order(t):
        if t[0] == "leaf":
            return [t[1]]
        return leaves_in_order(t[1]) + leaves_in_order(t[2])

    order = leaves_in_order(tree)
    # greedy starts at t00 (smallest); exact DP must NOT — the expensive
    # edge is deferred so intermediates stay small
    assert order[0] != "t00", order
    assert order.index("t00") >= n - 2, order


def test_byte_aware_broadcast_gate(spark):
    """Broadcast eligibility is byte-denominated (Distribution::broadcast,
    Schema.h:167-171): a 2M-row narrow side under the byte budget
    broadcasts (beats re-shuffling a 60M-row probe); a wide side of the
    same row count does not; the hash-build row cap binds regardless."""
    g = QueryGraph()
    assert g.broadcastable(500_000, 1000.0)  # legacy row threshold
    assert g.broadcastable(2_000_000, 24.0)  # 48 MB narrow slice
    assert not g.broadcastable(2_000_000, 100.0)  # 200 MB
    assert not g.broadcastable(5_000_000, 4.0)  # row cap


def test_parquet_stats_cached_by_file_state(sf_dir, monkeypatch):
    from verax_spark.sources import stats as stats_mod

    files = [f"{sf_dir}/nation.parquet"]
    stats_mod._STATS_CACHE.clear()
    first = stats_mod.parquet_stats(files)
    assert first is not None and first.num_rows == 25

    def boom(paths):
        raise AssertionError("footer re-read despite unchanged files")

    monkeypatch.setattr(stats_mod, "_parquet_stats_uncached", boom)
    again = stats_mod.parquet_stats(files)
    assert again is first


def test_fanout_survives_low_cardinality_key_domains(spark, sf_dir):
    """A 25-value key domain can dodge the mod-16 hash sample entirely; the
    estimator must re-probe exhaustively rather than silently report the
    neutral 1.0 fanout (which once made a 60,000x nationkey edge look free
    and planned a billion-row intermediate)."""
    from verax_spark.optimizer.query_graph import JoinEdge

    cat = Catalog(spark, sf_dir)
    g = QueryGraph()
    g.table("customer", cat.customer)
    g.table("supplier", cat.supplier)
    e = JoinEdge("customer", "supplier", "c_nationkey", "s_nationkey")
    g.edges.append(e)
    n_c = cat.customer.count()
    n_s = cat.supplier.count()
    # exhaustive ground truth: uniform nationkeys → ~n_s/25 matches per
    # customer row; accept wide tolerance but NEVER the neutral 1.0
    l2r, r2l = g._edge_fanout(e)
    assert l2r > n_s / 25 * 0.3, (l2r, r2l)
    assert r2l > n_c / 25 * 0.3, (l2r, r2l)


def test_fanout_single_key_domain_exact(spark):
    """Degenerate single-valued key: fanout is exactly the other side's row
    count whether or not the hash sample catches the one key."""
    from verax_spark.optimizer.query_graph import JoinEdge

    g = QueryGraph()
    g.table("a", spark.createDataFrame([(7,)] * 40, "k int"))
    g.table("b", spark.createDataFrame([(7,)] * 10, "j int"))
    e = JoinEdge("a", "b", "k", "j")
    g.edges.append(e)
    assert g._edge_fanout(e) == (10.0, 40.0)


def test_selectivity_intersects_same_column_ranges(spark, sf_dir):
    """``lo <= c AND c < hi`` is an interval intersection, not an
    independence product (the product overestimates a 3-month window in a
    7-year span 6x, which blocked a broadcast at scale)."""
    import datetime as _dt

    from verax_spark.plans import expr as dsl
    from verax_spark.sources.stats import selectivity, table_stats

    cat = Catalog(spark, sf_dir)
    stats = table_stats(cat.orders)
    pred = dsl.Call(
        "and",
        dsl.Call("gte", dsl.Col("o_orderdate"), dsl.Lit(_dt.datetime(1996, 10, 1))),
        dsl.Call("lt", dsl.Col("o_orderdate"), dsl.Lit(_dt.datetime(1997, 1, 1))),
    )
    sel = selectivity(stats, pred)
    true = cat.orders.filter(
        "o_orderdate >= timestamp '1996-10-01' and o_orderdate < timestamp '1997-01-01'"
    ).count() / max(cat.orders.count(), 1)
    assert sel is not None
    assert abs(sel - true) < 0.02, (sel, true)
    # mixed-column conjunct still multiplies independently
    pred2 = dsl.Call(
        "and",
        pred,
        dsl.Call("lt", dsl.Col("o_totalprice"), dsl.Lit(100000.0)),
    )
    sel2 = selectivity(stats, pred2)
    assert sel2 is not None and sel2 < sel
