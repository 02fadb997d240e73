from warpdb_spark.functions.registry import FunctionRegistry

__all__ = ["FunctionRegistry"]
