"""Drop-in compatibility shim for the reference's Python binding.

The reference exposes ``pywarpdb.WarpDB(path)`` whose methods return a
flat ``list[float]`` (bindings/python/pywarpdb.cpp:8-38, result type
``std::vector<float>`` per include/warpdb.hpp:19). A user switching
from the reference can::

    from warpdb_spark.compat import WarpDB
    db = WarpDB("data/test.csv")
    db.query("price + 1")            # -> [11.5, 21.0, 16.25, 31.0]
    db.query_multi_gpu("price * 2")  # -> same floats (partitioned exec)
    db.query_arrow("price")          # -> (ArrowArray-bearing) pyarrow objects

Results are float32-coerced to match the reference's everything-is-
float32 semantics (SURVEY §1.2); the richer typed API lives in
``warpdb_spark.api.WarpDB``.
"""

from __future__ import annotations

from warpdb_spark.api import WarpDB as _Engine


class WarpDB:
    def __init__(self, filepath: str, schema=None):
        self._db = _Engine(filepath, schema=schema)

    def _collect(self, df) -> list[float]:
        return [r[0] for r in df.collect()]

    def query(self, expr: str) -> list[float]:
        """``"<expr> [WHERE <cond>]"`` → float32 values
        (include/warpdb.hpp:17-19)."""
        return self._collect(self._db.query(expr, coerce_float32=True))

    def query_multi_gpu(self, expr: str) -> list[float]:
        """Partitioned execution analog (src/warpdb.cpp:508-542) —
        identical results; Spark partitions are the 'devices'."""
        return self.query(expr)

    @staticmethod
    def query_multi_gpu_csv(path: str, expr: str, rows_per_chunk: int = 1_000_000) -> list[float]:
        """Chunked out-of-core analog (src/warpdb.cpp:544-590)."""
        df = _Engine.query_csv(path, expr, rows_per_chunk)
        return [float(r[0]) for r in df.select(df.columns[0]).collect()]

    def query_arrow(self, expr: str, use_shared_memory: bool = False):
        """Strict parity with the reference binding: returns an
        ``(ArrowArray capsule, ArrowSchema capsule)`` tuple over the
        single result column (bindings/python/pywarpdb.cpp:19-37 returns
        exactly this pair). The capsules follow the Arrow PyCapsule
        protocol, so ``pyarrow.array(obj)`` consumes them via any
        wrapper exposing ``__arrow_c_array__``; the richer
        ``pyarrow.Table`` form lives on ``api.WarpDB.query_arrow``."""
        tbl = self._db.query(expr, coerce_float32=True).toArrow()
        arr = tbl.column(0).combine_chunks()
        schema_capsule, array_capsule = arr.__arrow_c_array__()
        return array_capsule, schema_capsule
