"""Query graph + cost-based join ordering above Catalyst.

Reference model (axiom/optimizer/): a DerivedTable holds BaseTables, single-
table filters, and equi-JoinEdges with equivalence classes
(DerivedTable.h:36-238, QueryGraph.h:416-464); `makeJoins` enumerates join
orders starting from the highest-filtered table, costing candidates with
sampled selectivities (Optimization.cpp:1555, JoinSample.cpp) and deciding
broadcast vs partitioned distribution (Schema.h:167-171).

Spark-first translation: we don't re-plan what AQE can fix at runtime; we
decide the two things that must be right *before* execution because they are
baked into the DataFrame DAG:

1. join ORDER (Catalyst reorders only with CBO stats it usually lacks over
   raw parquet) — greedy smallest-effective-cardinality-first, the same
   heuristic family as the reference's startingScore + greedy candidate
   expansion (branch-and-bound memoization is overkill for the linear/star
   graphs this layer targets; document and keep the surface);
2. BROADCAST hints for dimension sides under threshold, from sampled sizes
   (isBroadcastableType analog) — letting Catalyst skip the shuffle.

Cardinality comes from `sample()` probes (the reference's sampleFilters) and
is corrected by recorded history when available (VeloxHistory analog).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

DEFAULT_BROADCAST_ROWS = 1_000_000  # ~rows that comfortably broadcast


@dataclass
class TableRef:
    """BaseTable analog: a relation plus its single-table filter."""

    name: str
    df: DataFrame
    predicate: Column | None = None

    def filtered(self) -> DataFrame:
        return self.df.filter(self.predicate) if self.predicate is not None else self.df


@dataclass
class JoinEdge:
    """Equi-join edge (QueryGraph.h:416-464): left.key == right.key."""

    left: str
    right: str
    left_key: str
    right_key: str


@dataclass
class QueryGraph:
    """DerivedTable analog: tables + edges; plan() emits the ordered,
    hinted DataFrame join tree."""

    tables: dict[str, TableRef] = field(default_factory=dict)
    edges: list[JoinEdge] = field(default_factory=list)
    sample_fraction: float = 0.05
    broadcast_rows: int = DEFAULT_BROADCAST_ROWS
    history: "ExecutionHistory | None" = None

    def table(self, name: str, df: DataFrame, predicate: Column | None = None) -> "QueryGraph":
        self.tables[name] = TableRef(name, df, predicate)
        return self

    def edge(self, left: str, left_key: str, right: str, right_key: str) -> "QueryGraph":
        self.edges.append(JoinEdge(left, right, left_key, right_key))
        return self

    # -- cardinality estimation (sampleFilters analog) ----------------------
    def _estimate_rows(self, ref: TableRef) -> float:
        if self.history is not None:
            remembered = self.history.lookup(self._signature(ref))
            if remembered is not None:
                return remembered
        base = ref.df.count()
        if ref.predicate is None or base == 0:
            return float(base)
        if base <= 10_000:
            return float(ref.filtered().count())
        sample = ref.df.sample(fraction=self.sample_fraction, seed=42)
        n_sample = sample.count()
        if n_sample == 0:
            return float(base)
        hits = sample.filter(ref.predicate).count()
        return base * (hits / n_sample)

    def _signature(self, ref: TableRef) -> str:
        pred = "" if ref.predicate is None else str(ref.predicate)
        return f"scan:{ref.name}|{pred}"

    # -- ordering (startingScore / makeJoins greedy analog) ------------------
    def plan(self) -> DataFrame:
        """Greedy order: start at the smallest effective table, repeatedly
        join the smallest connected neighbor; broadcast sides under the
        row threshold. Records estimates into history for feedback."""
        if not self.tables:
            raise ValueError("empty query graph")
        est = {name: self._estimate_rows(ref) for name, ref in self.tables.items()}
        if self.history is not None:
            for name, ref in self.tables.items():
                self.history.record_estimate(self._signature(ref), est[name])

        adjacency: dict[str, list[JoinEdge]] = {n: [] for n in self.tables}
        for e in self.edges:
            adjacency[e.left].append(e)
            adjacency[e.right].append(e)

        start = min(est, key=lambda n: est[n])
        joined = {start}
        current = self.tables[start].filtered()

        def frontier() -> list[tuple[str, JoinEdge]]:
            out = []
            for e in self.edges:
                if e.left in joined and e.right not in joined:
                    out.append((e.right, e))
                elif e.right in joined and e.left not in joined:
                    out.append((e.left, e))
            return out

        while len(joined) < len(self.tables):
            candidates = frontier()
            if not candidates:
                # disconnected graph → cross join smallest remaining
                rest = [n for n in self.tables if n not in joined]
                nxt = min(rest, key=lambda n: est[n])
                current = current.crossJoin(self._side(nxt, est))
                joined.add(nxt)
                continue
            nxt, e = min(candidates, key=lambda c: est[c[0]])
            left_in = e.left in joined
            my_key = e.left_key if left_in else e.right_key
            other_key = e.right_key if left_in else e.left_key
            current = current.join(
                self._side(nxt, est), F.col(my_key) == F.col(other_key)
            )
            joined.add(nxt)
        return current

    def _side(self, name: str, est: dict[str, float]) -> DataFrame:
        df = self.tables[name].filtered()
        if est[name] <= self.broadcast_rows:
            df = F.broadcast(df)
        return df
