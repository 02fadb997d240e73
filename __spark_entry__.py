"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()`` — one entry per implemented SURVEY §2 operator (plus the
pipeline superset); each callable takes (spark, sf_dir) → DataFrame.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query; entries
omitted here get a rows-only check (non-SQL-expressible ops).

The actual inventory lives in ``warpdb_spark/inventory/`` so each
operator family stays reviewable next to its implementation.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from warpdb_spark.inventory import load_all  # noqa: E402

_QUERIES, _ORACLES = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 — the reference's
    canonical ``price * quantity WHERE price > 10`` (include/warpdb.hpp:18)
    on the lineitem stand-in columns, via the WarpDB mini-language."""
    return _QUERIES["flagship_filter_project"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
