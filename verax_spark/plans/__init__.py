from verax_spark.plans.expr import (
    Call,
    Cast,
    Col,
    Exists,
    Expr,
    Lambda,
    Lit,
    Sql,
    Subquery,
    TryCast,
)
from verax_spark.plans.builder import PlanBuilder

__all__ = [
    "PlanBuilder",
    "Expr",
    "Col",
    "Lit",
    "Call",
    "Cast",
    "TryCast",
    "Lambda",
    "Subquery",
    "Exists",
    "Sql",
]
