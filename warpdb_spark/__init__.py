"""warpdb_spark — a PySpark-native analytics engine with the capability
surface of seanwevans/WarpDB (reference: /root/reference, read-only).

The reference is a ~4k-LoC CUDA JIT query engine (see SURVEY.md). This
package re-expresses every capability Spark-first:

- ``WarpDB(path, schema)`` API with ``query`` / ``query_sql`` /
  ``query_arrow`` / ``query_stream``  (reference: include/warpdb.hpp:13-38)
- a tokenizer + recursive-descent parser for the WarpDB SQL dialect that
  emits PySpark ``Column`` expressions and DataFrame pipelines
  (reference: src/expression.cpp, src/jit.cpp — here Catalyst/Tungsten do
  the codegen)
- file-format dispatch readers (csv/ndjson/parquet/arrow/orc)
  (reference: src/warpdb.cpp:159-190)
- a Python UDF registry, the analog of ``custom.cu`` device functions
  (reference: src/jit.cpp:65-81)
- scale superset: dedup (exact/MinHash-LSH/SimHash/embedding), similarity
  search, text analysis, multimodal binary columns, structured streaming.
"""

from warpdb_spark.api import WarpDB
from warpdb_spark.errors import ParseError, ValidationError, WarpDBError
from warpdb_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "WarpDB",
    "get_spark",
    "WarpDBError",
    "ParseError",
    "ValidationError",
]
