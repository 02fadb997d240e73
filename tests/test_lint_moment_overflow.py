"""Tests for tools/lint_moment_overflow.py — the static plan lint
that bans SUM over a long×long product (the rows²-growth int64
overflow class found in round 6: agg_gini_by_segment's Σ i·cents and
events_trend_ols's Σx² crashed under ANSI at a few million rows per
group). The lint must catch the bad shape, pass the benign shapes
(linear scalings, double math, decimal accumulators), and hold over
the whole inventory."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from tools.lint_moment_overflow import lint_plan


def _plan(df):
    return df._jdf.queryExecution().analyzed().toString()


def _base(spark):
    return spark.range(10).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b"),
        (F.col("id") / 3.0).alias("x"),
    )


class TestLintCatches:
    def test_direct_long_product_sum(self, spark):
        df = _base(spark).agg(F.sum(F.col("a") * F.col("b")).alias("s"))
        assert lint_plan(_plan(df))

    def test_long_square_sum(self, spark):
        df = _base(spark).groupBy("b").agg(F.sum(F.col("a") * F.col("a")).alias("s"))
        assert lint_plan(_plan(df))

    def test_window_sum_over_projected_long_product(self, spark):
        df = _base(spark).withColumn(
            "c", F.sum(F.col("a") * F.col("b")).over(Window.orderBy("a"))
        )
        assert lint_plan(_plan(df))


class TestLintPasses:
    def test_decimal_accumulator(self, spark):
        df = _base(spark).agg(
            F.sum((F.col("a") * F.col("b")).cast("decimal(38,0)")).alias("s")
        )
        assert lint_plan(_plan(df)) == []

    def test_decimal_cast_before_multiply(self, spark):
        df = _base(spark).agg(
            F.sum(F.col("a").cast("decimal(38,0)") * F.col("b")).alias("s")
        )
        assert lint_plan(_plan(df)) == []

    def test_linear_literal_scaling(self, spark):
        # the events_user_rfm shape: sum(cast(round(value*100) as bigint))
        df = _base(spark).agg(
            F.sum(F.round(F.col("x") * 100, 0).cast("bigint")).alias("cents")
        )
        assert lint_plan(_plan(df)) == []

    def test_double_math_sum(self, spark):
        # the text_char_entropy shape: sum(c * log2(c)) in double space
        df = _base(spark).agg(
            F.sum(F.col("a").cast("double") * F.log2(F.col("a").cast("double")))
        )
        assert lint_plan(_plan(df)) == []

    def test_plain_long_first_moment(self, spark):
        df = _base(spark).agg(F.sum("a"))
        assert lint_plan(_plan(df)) == []
