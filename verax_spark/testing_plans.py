"""Plan-shape matcher (axiom/optimizer/tests/PlanMatcher.h analog).

The reference asserts optimized plan structure with a fluent matcher
(tableScan/filter/project/aggregation/hashJoin chains, PlanMatcher.h:24-118).
Spark's physical plans are strings from explain; this matcher checks an
ordered sequence of operator markers appears bottom-up in the formatted plan,
plus convenience predicates for the shapes we optimize for (pushdown reached
the scan, a join is broadcast, no shuffle present).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@dataclass
class PlanMatcher:
    """Fluent operator-sequence matcher over the formatted physical plan."""

    markers: list[str] = field(default_factory=list)

    def scan(self, table_hint: str = "") -> "PlanMatcher":
        self.markers.append(f"Scan parquet{'' if not table_hint else ''}")
        if table_hint:
            self.markers[-1] = "Scan parquet"
            self.markers.append(table_hint)
        return self

    def filter(self) -> "PlanMatcher":
        self.markers.append("Filter")
        return self

    def project(self) -> "PlanMatcher":
        self.markers.append("Project")
        return self

    def aggregate(self) -> "PlanMatcher":
        self.markers.append("HashAggregate")
        return self

    def exchange(self) -> "PlanMatcher":
        self.markers.append("Exchange")
        return self

    def broadcast_join(self) -> "PlanMatcher":
        self.markers.append("BroadcastHashJoin")
        return self

    def sort_merge_join(self) -> "PlanMatcher":
        self.markers.append("SortMergeJoin")
        return self

    def top_k(self) -> "PlanMatcher":
        self.markers.append("TakeOrderedAndProject")
        return self

    def matches(self, df: DataFrame) -> bool:
        plan = physical_plan(df)
        pos = 0
        for m in self.markers:
            hit = plan.find(m, pos)
            if hit < 0:
                return False
            pos = hit + len(m)
        return True

    def assert_matches(self, df: DataFrame) -> None:
        if not self.matches(df):
            raise AssertionError(
                f"plan does not contain ordered markers {self.markers}:\n"
                + physical_plan(df)
            )


# -- shape predicates --------------------------------------------------------
def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (DSv2 pushdown)."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", physical_plan(df))


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from parquet (column pruning check)."""
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", physical_plan(df)):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (fragment boundaries, the reference's
    Repartition ops — ToVelox.cpp:1270-1308)."""
    return len(re.findall(r"\bExchange\b", physical_plan(df)))


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """Check the EXECUTED plan (AQE only finalizes codegen at runtime):
    runs the query, then inspects the final physical tree."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE final plans mark codegen stages with the "*(" prefix
    return "WholeStageCodegen" in plan or "codegen id" in plan or "*(" in plan
