"""Generated TPC-H-style connector (tpch ConnectorMetadata analog).

The reference ships a tpch connector that materializes nothing: tables are
generated on demand at a scale factor, used throughout its optimizer tests
(axiom/connectors/tpch/, optimizer/tests use tpch.* tables). This is the
Spark-first analog with one extra design constraint: every column is a
CLOSED-FORM integer expression of the row id (no engine-specific hashing,
no RNG state), so any SQL engine can regenerate the identical rows from a
``range(n)`` source — which makes queries over generated tables fully
oracle-able (the r03 lesson: engine-specific functions make results
invisible to differential checking).

Generation is distributive and scale-safe: ``spark.range(n)`` partitions
the id space across executors; all columns are JVM-side Column expressions
(whole-stage codegen, zero Python). At sf=1000 this generates ~6e9 lineitem
rows with no driver involvement beyond planning.

Schema matches the driver testdata (TESTDATA.md) — leaner than standard
TPC-H — so every query in this repo runs unchanged against either source.
Row counts: lineitem = 6,000,000 x sf (4 lines/order), orders = 1,500,000 x
sf, customer = 150,000 x sf, part = 200,000 x sf, supplier = 10,000 x sf,
nation = 25, region = 5.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from verax_spark.connectors.base import Connector, ConnectorTable

_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_TYPES = [
    "ECONOMY ANODIZED STEEL",
    "LARGE BRUSHED BRASS",
    "MEDIUM POLISHED COPPER",
    "PROMO BURNISHED NICKEL",
    "SMALL PLATED TIN",
    "STANDARD POLISHED BRASS",
]

# epoch anchor for order dates; span covers the testdata's 1995-2001 window
_DATE0 = "1995-01-01"
_DATE_SPAN = 2557  # days


def _pick(expr, options: list[str]):
    """options[expr] as a chained CASE — portable to any SQL engine."""
    out = F.lit(options[-1])
    for i in range(len(options) - 2, -1, -1):
        out = F.when(expr == i, F.lit(options[i])).otherwise(out)
    return out


class TpchConnector(Connector):
    def __init__(self, spark: SparkSession, sf: float = 0.01, *, name: str = "tpch"):
        self.spark = spark
        self.sf = sf
        self.name = name
        self.n_customer = max(int(150_000 * sf), 1)
        self.n_supplier = max(int(10_000 * sf), 1)
        self.n_part = max(int(200_000 * sf), 1)
        self.n_orders = max(int(1_500_000 * sf), 1)
        self.n_lineitem = self.n_orders * 4

    def list_tables(self) -> list[str]:
        return [
            "customer",
            "lineitem",
            "nation",
            "orders",
            "part",
            "region",
            "supplier",
        ]

    _UNIQUE = {
        "region": frozenset({"r_regionkey"}),
        "nation": frozenset({"n_nationkey"}),
        "customer": frozenset({"c_custkey"}),
        "supplier": frozenset({"s_suppkey"}),
        "part": frozenset({"p_partkey"}),
        "orders": frozenset({"o_orderkey"}),
    }

    def table(self, table: str) -> ConnectorTable:
        fn = getattr(self, f"_gen_{table}", None)
        if fn is None:
            raise KeyError(f"{self.name}.{table}: no such table")
        return ConnectorTable(
            name=table,
            df=fn(),
            unique_keys=self._UNIQUE.get(table, frozenset()),
            extra={"sf": self.sf},
        )

    # -- generators (closed-form in row id; see module docstring) ----------
    def _ids(self, n: int, partitions: int | None = None) -> DataFrame:
        defaults = self.spark.sparkContext.defaultParallelism
        return self.spark.range(0, n, 1, partitions or defaults)

    def _gen_region(self) -> DataFrame:
        i = F.col("id")
        return self._ids(5, 1).select(
            i.cast("int").alias("r_regionkey"),
            _pick(i, _REGIONS).alias("r_name"),
        )

    def _gen_nation(self) -> DataFrame:
        i = F.col("id")
        return self._ids(25, 1).select(
            i.cast("int").alias("n_nationkey"),
            F.concat(F.lit("NATION_"), i.cast("string")).alias("n_name"),
            (i % 5).cast("int").alias("n_regionkey"),
        )

    def _gen_supplier(self) -> DataFrame:
        i = F.col("id")
        return self._ids(self.n_supplier).select(
            (i + 1).alias("s_suppkey"),
            F.concat(F.lit("SUPP_"), i.cast("string")).alias("s_name"),
            ((i * 7 + 3) % 25).cast("int").alias("s_nationkey"),
            (((i * 9973) % 100000).cast("double") / 100.0 - 100.0).alias(
                "s_acctbal"
            ),
        )

    def _gen_customer(self) -> DataFrame:
        i = F.col("id")
        return self._ids(self.n_customer).select(
            (i + 1).alias("c_custkey"),
            F.concat(F.lit("CUST_"), i.cast("string")).alias("c_name"),
            ((i * 11 + 1) % 25).cast("int").alias("c_nationkey"),
            (((i * 7919) % 110000).cast("double") / 100.0 - 100.0).alias(
                "c_acctbal"
            ),
            _pick((i * 13) % 5, _SEGMENTS).alias("c_mktsegment"),
        )

    def _gen_part(self) -> DataFrame:
        i = F.col("id")
        return self._ids(self.n_part).select(
            (i + 1).alias("p_partkey"),
            F.concat(F.lit("PART_"), i.cast("string")).alias("p_name"),
            F.concat(F.lit("BRAND_"), ((i * 3) % 25).cast("string")).alias(
                "p_brand"
            ),
            _pick((i * 5) % 6, _TYPES).alias("p_type"),
            ((i * 17) % 50 + 1).cast("int").alias("p_size"),
            (((i * 100) % 20001 + 90000).cast("double") / 100.0).alias(
                "p_retailprice"
            ),
        )

    def _order_date_days(self, okey_zero_based):
        """Day offset of an order's date — shared by orders and lineitem so
        shipdate >= orderdate holds by construction."""
        return (okey_zero_based * 2654435761) % _DATE_SPAN

    def _gen_orders(self) -> DataFrame:
        i = F.col("id")
        return self._ids(self.n_orders).select(
            (i + 1).alias("o_orderkey"),
            ((i * 104717 + 5) % self.n_customer + 1).alias("o_custkey"),
            _pick(i % 3, ["F", "O", "P"]).alias("o_orderstatus"),
            (
                ((i * 104729) % 45000000 + 100000).cast("double") / 100.0
            ).alias("o_totalprice"),
            F.date_add(
                F.to_date(F.lit(_DATE0)), self._order_date_days(i).cast("int")
            )
            .cast("timestamp")
            .alias("o_orderdate"),
            _pick((i * 7) % 5, _PRIORITIES).alias("o_orderpriority"),
        )

    def _gen_lineitem(self) -> DataFrame:
        i = F.col("id")
        okey0 = F.expr("id div 4")  # zero-based order id, 4 lines per order
        qty = (i * 41) % 50 + 1
        return self._ids(self.n_lineitem).select(
            (okey0 + 1).alias("l_orderkey"),
            ((i * 31 + 7) % self.n_part + 1).alias("l_partkey"),
            ((i * 37 + 11) % self.n_supplier + 1).alias("l_suppkey"),
            (i % 4 + 1).cast("int").alias("l_linenumber"),
            qty.cast("double").alias("l_quantity"),
            (
                (qty * ((i * 521) % 90000 + 100001)).cast("double") / 100.0
            ).alias("l_extendedprice"),
            (((i * 13) % 11).cast("double") / 100.0).alias("l_discount"),
            (((i * 19) % 9).cast("double") / 100.0).alias("l_tax"),
            _pick((i * 23) % 3, ["A", "N", "R"]).alias("l_returnflag"),
            _pick(i % 2, ["F", "O"]).alias("l_linestatus"),
            F.date_add(
                F.to_date(F.lit(_DATE0)),
                (self._order_date_days(okey0) + i % 122 + 1).cast("int"),
            )
            .cast("timestamp")
            .alias("l_shipdate"),
        )


def oracle_ddl(sf: float) -> str:
    """DuckDB SQL prelude (CTE bodies) regenerating the SAME tables from
    range() sources — the differential-check counterpart of the generators
    above. Returns a WITH-clause fragment defining gen_<table> views."""
    c = TpchConnector.__new__(TpchConnector)  # counts only, no spark
    c.sf = sf
    c.n_customer = max(int(150_000 * sf), 1)
    c.n_supplier = max(int(10_000 * sf), 1)
    c.n_part = max(int(200_000 * sf), 1)
    c.n_orders = max(int(1_500_000 * sf), 1)
    c.n_lineitem = c.n_orders * 4

    def pick(expr: str, options: list[str]) -> str:
        cases = " ".join(
            f"when {expr} = {i} then '{o}'" for i, o in enumerate(options[:-1])
        )
        return f"(case {cases} else '{options[-1]}' end)"

    return f"""
gen_lineitem as (
  select
    (id // 4) + 1 as l_orderkey,
    (id * 31 + 7) % {c.n_part} + 1 as l_partkey,
    (id * 37 + 11) % {c.n_supplier} + 1 as l_suppkey,
    cast(id % 4 + 1 as int) as l_linenumber,
    cast((id * 41) % 50 + 1 as double) as l_quantity,
    cast(((id * 41) % 50 + 1) * ((id * 521) % 90000 + 100001) as double) / 100.0
      as l_extendedprice,
    cast((id * 13) % 11 as double) / 100.0 as l_discount,
    cast((id * 19) % 9 as double) / 100.0 as l_tax,
    {pick("(id * 23) % 3", ["A", "N", "R"])} as l_returnflag,
    {pick("id % 2", ["F", "O"])} as l_linestatus,
    cast(date '{_DATE0}'
      + cast(((id // 4) * 2654435761) % {_DATE_SPAN} + id % 122 + 1 as int)
      as timestamp) as l_shipdate
  from range({c.n_lineitem}) t(id)
),
gen_orders as (
  select
    id + 1 as o_orderkey,
    (id * 104717 + 5) % {c.n_customer} + 1 as o_custkey,
    {pick("id % 3", ["F", "O", "P"])} as o_orderstatus,
    cast((id * 104729) % 45000000 + 100000 as double) / 100.0 as o_totalprice,
    cast(date '{_DATE0}' + cast((id * 2654435761) % {_DATE_SPAN} as int)
      as timestamp) as o_orderdate,
    {pick("(id * 7) % 5", _PRIORITIES)} as o_orderpriority
  from range({c.n_orders}) t(id)
),
gen_customer as (
  select
    id + 1 as c_custkey,
    'CUST_' || cast(id as varchar) as c_name,
    cast((id * 11 + 1) % 25 as int) as c_nationkey,
    cast((id * 7919) % 110000 as double) / 100.0 - 100.0 as c_acctbal,
    {pick("(id * 13) % 5", _SEGMENTS)} as c_mktsegment
  from range({c.n_customer}) t(id)
),
gen_supplier as (
  select
    id + 1 as s_suppkey,
    'SUPP_' || cast(id as varchar) as s_name,
    cast((id * 7 + 3) % 25 as int) as s_nationkey,
    cast((id * 9973) % 100000 as double) / 100.0 - 100.0 as s_acctbal
  from range({c.n_supplier}) t(id)
),
gen_part as (
  select
    id + 1 as p_partkey,
    'PART_' || cast(id as varchar) as p_name,
    'BRAND_' || cast((id * 3) % 25 as varchar) as p_brand,
    {pick("(id * 5) % 6", _TYPES)} as p_type,
    cast((id * 17) % 50 + 1 as int) as p_size,
    cast((id * 100) % 20001 + 90000 as double) / 100.0 as p_retailprice
  from range({c.n_part}) t(id)
),
gen_nation as (
  select cast(id as int) as n_nationkey,
         'NATION_' || cast(id as varchar) as n_name,
         cast(id % 5 as int) as n_regionkey
  from range(25) t(id)
),
gen_region as (
  select cast(id as int) as r_regionkey, {pick("id", _REGIONS)} as r_name
  from range(5) t(id)
)"""
