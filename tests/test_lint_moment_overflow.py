"""Tests for tools/lint_moment_overflow.py — the expression-tree lint
that bans SUM over a product of two BIGINT columns (the rows²-growth
int64 overflow class found in round 6: agg_gini_by_segment's Σ i·cents
and events_trend_ols's Σx² crashed under ANSI at a few million rows
per group). The lint must catch the bad shapes — including the
CASE-wrapped conditional moment (the Welch z-test shape), window
sums, and cast-after-multiply — and pass the benign shapes (literal
scalings, double math, decimal-before-multiply accumulators)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from tools.lint_moment_overflow import lint_df


def _base(spark):
    return spark.range(10).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b"),
        (F.col("id") / 3.0).alias("x"),
    )


class TestLintCatches:
    def test_direct_long_product_sum(self, spark):
        df = _base(spark).agg(F.sum(F.col("a") * F.col("b")).alias("s"))
        assert lint_df(df)

    def test_long_square_sum(self, spark):
        df = _base(spark).groupBy("b").agg(F.sum(F.col("a") * F.col("a")).alias("s"))
        assert lint_df(df)

    def test_window_sum_over_long_product(self, spark):
        df = _base(spark).withColumn(
            "c", F.sum(F.col("a") * F.col("b")).over(Window.orderBy("a"))
        )
        assert lint_df(df)

    def test_case_wrapped_conditional_moment(self, spark):
        # the Welch z-test shape: sum(CASE WHEN arm=0 THEN si*si END) —
        # invisible to the old string-regex lint
        df = _base(spark).agg(
            F.sum(F.when(F.col("b") % 2 == 0, F.col("a") * F.col("a"))).alias("q0")
        )
        assert lint_df(df)

    def test_cast_after_multiply_still_flagged(self, spark):
        # decimal accumulator but the per-row product is still computed
        # in int64 space — the hazard is narrower but real
        df = _base(spark).agg(
            F.sum((F.col("a") * F.col("b")).cast("decimal(38,0)")).alias("s")
        )
        assert lint_df(df)

    def test_try_sum_is_not_a_loophole(self, spark):
        df = _base(spark).agg(F.try_sum(F.col("a") * F.col("b")).alias("s"))
        assert lint_df(df)


class TestLintPasses:
    def test_decimal_cast_before_multiply(self, spark):
        df = _base(spark).agg(
            F.sum(F.col("a").cast("decimal(38,0)") * F.col("b")).alias("s")
        )
        assert lint_df(df) == []

    def test_linear_literal_scaling(self, spark):
        # the events_user_rfm shape: sum(cast(round(value*100) as bigint))
        df = _base(spark).agg(
            F.sum(F.round(F.col("x") * 100, 0).cast("bigint")).alias("cents")
        )
        assert lint_df(df) == []

    def test_double_math_sum(self, spark):
        # the text_char_entropy shape: sum(c * log2(c)) in double space
        df = _base(spark).agg(
            F.sum(F.col("a").cast("double") * F.log2(F.col("a").cast("double")))
        )
        assert lint_df(df) == []

    def test_plain_long_first_moment(self, spark):
        df = _base(spark).agg(F.sum("a"))
        assert lint_df(df) == []

    def test_long_literal_scaling(self, spark):
        df = _base(spark).agg(F.sum(F.col("a") * F.lit(7)).alias("s"))
        assert lint_df(df) == []
