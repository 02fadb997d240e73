"""As-of and range joins (SURVEY §2.3 ❌ rows — absent from the
reference, required by the north star).

- ``asof_join``: the union-and-carry-forward formulation — tag both
  inputs, union, sort within each ``by`` partition by (ts, side) and
  carry the latest right-side values forward with ``last(ignorenulls)``.
  ONE shuffle on the by-key (vs. a naive range join's quadratic
  explosion); window state is O(1) per row. This is the standard
  scalable as-of on Spark.
- ``range_join``: banded equi-join formulation — both sides bucketed by
  ``band_width``; the right interval explodes to the buckets it covers,
  the join keys on bucket equality, an exact predicate refines. Turns a
  nested-loop/BNLJ theta join into a hash join whose fan-out is
  interval_width / band_width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``on`` ≤ left.on (backward, inclusive) — or smallest ≥ (forward) —
    within the same ``by`` group. Right columns arrive suffixed."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = [by] if isinstance(by, str) else (by or [])
    right_cols = right_cols or [c for c in right.columns if c != on and c not in by]

    # Right-side values travel inside ONE nullable struct: the struct is
    # non-null whenever a right row exists, so last(ignorenulls) matches
    # the nearest right ROW even when its payload columns are genuinely
    # NULL (a bare per-column carry would skip past NULL values to an
    # older row).
    rstruct = F.struct(*[F.col(c).alias(c) for c in right_cols])
    rtype = right.select(rstruct.alias("s")).schema["s"].dataType.simpleString()
    lhs = left.withColumn("__side", F.lit(1)).withColumn(
        "__r", F.lit(None).cast(rtype)
    )
    rhs = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__side"),
        rstruct.alias("__r"),
    )
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = lhs.unionByName(rhs)

    if direction == "backward":
        # right rows sort before left rows at equal ts → inclusive match
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    carried = unioned.select(
        *[c for c in left.columns],
        F.col("__side"),
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__rlast"),
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *[c for c in left.columns],
            *[F.col(f"__rlast.{c}").alias(f"{c}{suffix}") for c in right_cols],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_value: str,
    right_lo: str,
    right_hi: str,
    band_width: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to right intervals with
    ``right.lo <= left.value < right.hi``.

    With ``band_width`` the join is banded (scale path): both sides key
    on integer buckets, so Catalyst plans a hash join instead of a
    broadcast-nested-loop. Without it, a plain conditional join (fine
    when one side is broadcastable). Banded supports inner and left."""
    if band_width is None:
        cond = (F.col(right_lo) <= F.col(left_value)) & (
            F.col(left_value) < F.col(right_hi)
        )
        return left.join(right, cond, how)

    if how not in ("inner", "left"):
        raise ValueError(f"banded range_join supports inner/left, not {how!r}")
    # For the left-outer variant, tag each left row with a unique id so
    # the missed-rows anti-join keys on the id alone: anti-joining on
    # every payload column is null-UNSAFE equality, so a left row with a
    # NULL payload cell would never match itself and be emitted twice
    # (once matched, once null-extended).
    lsrc = (
        left.withColumn("__lid", F.monotonically_increasing_id())
        if how == "left"
        else left
    )
    lb = lsrc.withColumn("__bucket", F.floor(F.col(left_value) / band_width))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / band_width),
                F.floor((F.col(right_hi) - 1e-12) / band_width),
            )
        ),
    )
    cond = (F.col(right_lo) <= F.col(left_value)) & (F.col(left_value) < F.col(right_hi))
    inner = lb.join(rb, "__bucket").filter(cond).drop("__bucket")
    if how == "inner":
        return inner
    # left: add back left rows that matched no band, with null right cols
    missed = lsrc.join(inner.select("__lid"), "__lid", "left_anti")
    for c, t in right.dtypes:
        missed = missed.withColumn(c, F.lit(None).cast(t))
    return inner.unionByName(missed).drop("__lid")
