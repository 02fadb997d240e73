"""Driver-facing query inventory.

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (ANSI SQL for DuckDB).
``__spark_entry__.py`` aggregates them. Naming convention: the prefix
states the SURVEY §2 operator family the entry covers.
"""

from __future__ import annotations


def load_all():
    from warpdb_spark.inventory import core_sql, tpch_extra

    queries: dict = {}
    oracles: dict = {}
    modules = [core_sql, tpch_extra]
    try:
        from warpdb_spark.inventory import pipeline_ops

        modules.append(pipeline_ops)
    except ImportError:
        pass
    for m in modules:
        queries.update(m.QUERIES)
        oracles.update(m.ORACLES)
    return queries, oracles
