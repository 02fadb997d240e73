"""Vector column functions over ``array<float/double>`` embeddings.

Pure HOF compositions (F.zip_with / F.aggregate) — JVM-side, no UDF,
no shuffle. Elements are cast to double before accumulating so Spark
and any double-accumulating oracle (DuckDB list_cosine_similarity)
agree to float64 precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def int8_scale(vec: Column) -> Column:
    """Symmetric scalar-quantization scale: max(|x|)/127 (0.0 for an
    all-zero vector)."""
    absmax = F.array_max(F.transform(_d(vec), F.abs))
    return F.when(absmax == 0.0, F.lit(0.0)).otherwise(absmax / 127.0)


def int8_codes(vec: Column, scale: Column) -> Column:
    """Quantized int codes round(x/scale); all-zero scale → all-zero
    codes. round() is half-away-from-zero in both Spark and DuckDB, so
    codes are engine-reproducible."""
    return F.when(
        scale == 0.0, F.transform(vec, lambda x: F.lit(0))
    ).otherwise(F.transform(_d(vec), lambda x: F.round(x / scale).cast("int")))


def int8_max_abs_err(vec: Column, scale: Column, codes: Column) -> Column:
    """Max absolute reconstruction error |x - code*scale|."""
    return F.when(scale == 0.0, F.lit(0.0)).otherwise(
        F.array_max(
            F.zip_with(_d(vec), codes, lambda x, c: F.abs(x - c.cast("double") * scale))
        )
    )


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bit signature as a string of 0/1: bit i =
    sign(vec · planes[i]). ``planes`` are driver-side literals
    (deterministic seed), so the signature is one codegen'd expression."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    _d(vec),
                    F.array(*[F.lit(float(x)) for x in p]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)
