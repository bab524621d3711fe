"""Optimizer parity layer — the pieces Catalyst doesn't give us for free.

SURVEY §4 bottom line: ~80% of the reference optimizer's effects are native
Catalyst behavior (pushdown, pruning, broadcast decisions, partial aggs,
top-k splitting, exchange reuse). This package supplies the genuinely custom
remainder, implemented *above* Catalyst exactly as the reference sits above
Velox:

- query_graph: DerivedTable/JoinEdge-style query graph + sampling-based
  cardinality + greedy cost-based join ordering emitting broadcast hints
  (axiom/optimizer/DerivedTable.h, Optimization.cpp makeJoins).
- history: execution feedback keyed by canonical plan signature
  (axiom/optimizer/VeloxHistory.h analog).
- subfields: map-as-struct hot-key rewrite
  (axiom/optimizer/Subfields.cpp, OptimizerOptions allMapsAsStruct).
"""

from verax_spark.optimizer.query_graph import JoinEdge, QueryGraph, TableRef
from verax_spark.optimizer.history import ExecutionHistory
from verax_spark.optimizer.subfields import maps_as_structs

__all__ = [
    "QueryGraph",
    "TableRef",
    "JoinEdge",
    "ExecutionHistory",
    "maps_as_structs",
]
