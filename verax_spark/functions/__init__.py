from verax_spark.functions.presto import presto_call, PRESTO_TO_SPARK
from verax_spark.functions.registry import (
    FunctionMetadata,
    canonicalize,
    expr_cost,
    function_metadata,
    is_deterministic,
    register_function,
    reversible_functions,
)

__all__ = [
    "presto_call",
    "PRESTO_TO_SPARK",
    "FunctionMetadata",
    "canonicalize",
    "expr_cost",
    "function_metadata",
    "is_deterministic",
    "register_function",
    "reversible_functions",
]
