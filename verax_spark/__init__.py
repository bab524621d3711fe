"""verax_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of facebookexperimental/verax ("Axiom").

The reference (C++: logical plan + cost-based optimizer + Presto SQL frontend
over Velox execution) is re-expressed Spark-first: the DataFrame API is the
execution substrate, Catalyst/Tungsten do optimization and vectorized
execution, and this package supplies the layers the reference adds above its
engine — a typed fluent plan builder (reference:
axiom/logical_plan/PlanBuilder.h), a Presto-dialect function surface
(axiom/logical_plan/Expr.h), the full relational operator inventory
(axiom/logical_plan/LogicalPlanNode.h), and large-scale data-pipeline
operators (dedup / similarity / text analysis) beyond the reference surface.
"""

from verax_spark.session import get_spark
from verax_spark.catalog import Catalog, load_tables
from verax_spark.curate import curate, curation_report

__all__ = ["get_spark", "Catalog", "load_tables", "curate", "curation_report"]
__version__ = "0.1.0"
