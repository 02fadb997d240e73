"""User scalar-function registry — the ``custom.cu`` analog.

The reference prepends the whole text of ``./custom.cu`` to every
generated kernel, making any ``__device__`` function callable from
expressions, e.g. ``discount(price, 0.9)`` (src/jit.cpp:65-81,
custom.cu:1-3, tests/test_expression.cpp:17-21).

Here a registered function becomes either:

- a **column expression builder** (``kind='builtin'``): a Python callable
  ``(*Column) -> Column`` composed from pyspark.sql.functions — stays
  entirely JVM-side, zero serialization cost (the preferred path, and the
  true analog of a fused device function); or
- a **pandas UDF** (``kind='pandas'``): ``(*pd.Series) -> pd.Series``,
  Arrow-batched — for logic that genuinely needs Python; or
- a row **udf** (``kind='udf'``): last-resort per-row Python.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, DoubleType


class FunctionRegistry:
    def __init__(self):
        self._fns: dict[str, Callable[..., Column]] = {}
        # table-valued functions (Spark Python UDTFs), callable from the
        # dialect's FROM clause — kept separate from scalar functions so
        # a name can't silently shadow across the two surfaces
        self._udtfs: dict[str, object] = {}

    def __contains__(self, name: str) -> bool:
        return name.lower() in self._fns

    def names(self) -> list[str]:
        return sorted(self._fns)

    def register_udtf(self, name: str, fn: object) -> None:
        """``fn`` is a ``@pyspark.sql.functions.udtf``-decorated class
        (or the raw class — it is registered with Spark at call time by
        the builder)."""
        self._udtfs[name.lower()] = fn

    def has_udtf(self, name: str) -> bool:
        return name.lower() in self._udtfs

    def udtf(self, name: str) -> object:
        return self._udtfs[name.lower()]

    def udtf_names(self) -> list[str]:
        return sorted(self._udtfs)

    def register_builtin(self, name: str, builder: Callable[..., Column]) -> None:
        """``builder`` composes Columns (JVM-side, codegen-friendly)."""
        self._fns[name.lower()] = builder

    def register_pandas(
        self, name: str, fn: Callable, return_type: DataType | str = DoubleType()
    ) -> None:
        """Vectorized Arrow-batched UDF (the idiomatic analog of a JIT
        device function: compiled once, applied per batch)."""
        pudf = F.pandas_udf(fn, returnType=return_type)
        self._fns[name.lower()] = pudf

    def register_udf(
        self, name: str, fn: Callable, return_type: DataType | str = DoubleType()
    ) -> None:
        """Row-at-a-time Python UDF — the slow path; prefer the others."""
        self._fns[name.lower()] = F.udf(fn, returnType=return_type)

    def call(self, name: str, *args: Column) -> Column:
        return self._fns[name.lower()](*args)


def default_registry() -> FunctionRegistry:
    """Registry preloaded with the reference's bundled custom function:
    ``discount(price, factor) = price * factor`` (custom.cu:1-3) — as a
    pure column composition, so it fuses into WholeStageCodegen."""
    reg = FunctionRegistry()
    reg.register_builtin("discount", lambda price, factor: price * factor)
    from warpdb_spark.functions.udtfs import default_udtfs

    for name, fn in default_udtfs().items():
        reg.register_udtf(name, fn)
    return reg
