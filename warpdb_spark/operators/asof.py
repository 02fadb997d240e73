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

    lhs = left.withColumn("__side", F.lit(1))
    for c in right_cols:
        lhs = lhs.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    rhs = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
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
        *[
            F.last(F.when(F.col("__side") == 0, F.col(f"__r_{c}")), ignorenulls=True)
            .over(w)
            .alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


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
    when one side is broadcastable)."""
    if band_width is None:
        cond = (F.col(right_lo) <= F.col(left_value)) & (
            F.col(left_value) < F.col(right_hi)
        )
        return left.join(right, cond, how)

    lb = left.withColumn("__bucket", F.floor(F.col(left_value) / band_width))
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
    return lb.join(rb, "__bucket").filter(cond).drop("__bucket")
