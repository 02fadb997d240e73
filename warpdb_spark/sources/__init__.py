from warpdb_spark.sources.readers import load_table, read_csv, read_json, read_parquet, read_arrow, read_orc
from warpdb_spark.sources.writers import write_table

__all__ = [
    "load_table",
    "read_csv",
    "read_json",
    "read_parquet",
    "read_arrow",
    "read_orc",
    "write_table",
]
