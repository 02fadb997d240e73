"""File sinks (superset — the reference has none, SURVEY §2.1 last row).

Includes the shared-location Arrow/Parquet handoff that replaces the
reference's POSIX-shm result export (src/arrow_utils.cpp:44-62): on a
cluster, "shared memory" between processes is a shared filesystem path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_FORMATS = {"parquet", "csv", "json", "orc"}


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"Unsupported sink format: {fmt}")
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", True)
    getattr(writer, fmt)(path)
