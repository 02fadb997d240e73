from warpdb_spark.plans.tokenizer import Token, tokenize
from warpdb_spark.plans.parser import parse_expression, parse_query
from warpdb_spark.plans.compiler import compile_expr, validate
from warpdb_spark.plans.builder import build_dataframe

__all__ = [
    "Token",
    "tokenize",
    "parse_expression",
    "parse_query",
    "compile_expr",
    "validate",
    "build_dataframe",
]
