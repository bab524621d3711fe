"""Connector metadata layer (ConnectorMetadata analog with hive/tpch/test
implementations, ref axiom/connectors/ConnectorMetadata.h:176-353)."""

import pyspark.sql.functions as F
import pytest

from verax_spark.connectors import (
    MemoryConnector,
    ParquetConnector,
    TpchConnector,
)
from verax_spark.testing import assert_frames_match


def test_parquet_connector_lists_and_resolves(spark, sf_dir):
    c = ParquetConnector(
        spark, sf_dir, unique_keys={"nation": {"n_nationkey"}}
    )
    assert "lineitem" in c.list_tables() and "nation" in c.list_tables()
    t = c.table("nation")
    assert t.df.count() == 25
    assert t.unique_keys == frozenset({"n_nationkey"})
    assert t.path and t.path.endswith("nation.parquet")
    # footer statistics, no jobs
    st = c.stats("nation")
    assert st is not None and st.num_rows == 25
    with pytest.raises(KeyError):
        c.table("nope")
    with pytest.raises(NotImplementedError):
        c.insert("nation", t.df)  # writable=False


def test_memory_connector_write_surface(spark):
    c = MemoryConnector()
    c.register("t", spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string"))
    c.insert("t", spark.createDataFrame([(3, "c")], "id int, s string"))
    assert c.table("t").df.count() == 3
    c.update_where("t", {"s": F.lit("z")}, F.col("id") == 2)
    assert [r.s for r in c.table("t").df.orderBy("id").collect()] == ["a", "z", "c"]
    c.delete_where("t", F.col("id") == 1)
    assert c.table("t").df.count() == 2


def test_tpch_connector_determinism_and_counts(spark):
    a = TpchConnector(spark, sf=0.001)
    b = TpchConnector(spark, sf=0.001)
    assert a.list_tables() == sorted(a.list_tables())
    for t in ("nation", "orders"):
        ra = sorted(map(tuple, a.table(t).df.collect()))
        rb = sorted(map(tuple, b.table(t).df.collect()))
        assert ra == rb  # same formulas, same rows
    assert a.table("lineitem").df.count() == 4 * a.n_orders
    assert a.table("orders").df.count() == 1500
    # referential integrity by construction
    li, od = a.table("lineitem").df, a.table("orders").df
    dangling = li.join(od, li.l_orderkey == od.o_orderkey, "left_anti")
    assert dangling.count() == 0


def test_tpch_connector_matches_ansi_regeneration(spark):
    """The generated rows are reproducible from range() in ANSI SQL — the
    property that keeps generated-table queries oracle-able (r03 lesson:
    engine-specific generation is invisible to differential checks)."""
    import duckdb

    from verax_spark.connectors.tpch import oracle_ddl

    c = TpchConnector(spark, sf=0.001)
    con = duckdb.connect()
    ddl = oracle_ddl(0.001)
    try:
        for t in ("region", "nation", "customer", "supplier", "part"):
            got = c.table(t).df.toPandas()
            want = con.execute(f"with {ddl} select * from gen_{t}").df()
            assert_frames_match(got, want, context=f"tpch-gen {t}")
        # spot-check the fact tables on an aggregate (full frames are big)
        got = (
            c.table("lineitem")
            .df.agg(
                F.count("*").alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                .alias("sq"),
            )
            .toPandas()
        )
        want = con.execute(
            f"with {ddl} select count(*) as n, "
            "cast(sum(cast(l_quantity as decimal(18,2))) as double) as sq "
            "from gen_lineitem"
        ).df()
        assert_frames_match(got, want, context="tpch-gen lineitem agg")
    finally:
        con.close()


def test_presto_session_attach_qualified_names(spark, sf_dir):
    from verax_spark.sql import PrestoSession

    ps = PrestoSession(spark, sf_dir)
    ps.attach(TpchConnector(spark, sf=0.001))
    # catalog-qualified table, joined against a driver-catalog view
    df = ps.sql(
        """
        select r.r_name, count(*) as n
        from tpch.nation n join region r on n.n_regionkey = r.r_regionkey
        group by r.r_name order by r.r_name
        """
    )
    rows = df.collect()
    assert len(rows) == 5 and all(r.n == 5 for r in rows)
    # generated alias keeps qualified column refs working
    one = ps.sql(
        "select n.n_name from tpch.nation n where n.n_nationkey = 3"
    ).collect()
    assert one[0].n_name == "NATION_3"


def test_files_connector_mixed_formats(spark, sf_dir, tmp_path):
    """FilesConnector dispatches parquet/ORC/CSV/JSON by extension from
    one directory; text formats honor explicit schemas (no inference
    scan); ambiguous basenames refuse; unknown tables KeyError."""
    import pytest

    from verax_spark.catalog import Catalog
    from verax_spark.connectors import FilesConnector

    cat = Catalog(spark, sf_dir)
    root = str(tmp_path)
    cat.nation.coalesce(1).write.option("header", True).csv(f"{root}/nation.csv")
    cat.region.coalesce(1).write.json(f"{root}/region.json")
    cat.region.write.orc(f"{root}/region2.orc")
    cat.nation.limit(3).write.parquet(f"{root}/nation3.parquet")

    fc = FilesConnector(
        spark,
        root,
        schemas={"nation": "n_nationkey bigint, n_name string, n_regionkey bigint"},
    )
    assert fc.list_tables() == ["nation", "nation3", "region", "region2"]
    n = fc.table("nation")
    assert n.extra["format"] == "csv"
    assert n.df.count() == cat.nation.count()
    assert dict(n.df.dtypes)["n_nationkey"] == "bigint"  # explicit schema
    assert fc.table("region").extra["format"] == "json"
    assert fc.table("region2").df.count() == 5
    assert fc.table("nation3").path is not None  # parquet keeps stats path
    assert fc.stats("nation3").num_rows == 3
    with pytest.raises(KeyError):
        fc.table("absent")
    cat.nation.limit(1).write.parquet(f"{root}/region.parquet")
    with pytest.raises(ValueError, match="ambiguous"):
        fc.list_tables()
