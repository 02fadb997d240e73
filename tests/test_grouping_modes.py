"""GROUP BY ROLLUP / CUBE / GROUPING SETS + GROUPING() through the
dialect front-end (plans/parser.py, plans/builder.py).

Ground truths are computed with Spark's native rollup/cube/groupingSets
DataFrame API over the same frame, so the dialect path is pinned to the
engine's own semantics; oracle parity vs DuckDB is covered by the
`dialect_rollup_grouping` / `dialect_grouping_sets` inventory entries.
"""

import pytest
from pyspark.sql import functions as F

from warpdb_spark import WarpDB
from warpdb_spark.errors import ValidationError


@pytest.fixture(scope="module")
def db(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return WarpDB(df=li, table_name="lineitem", spark=spark), li


def _rows(df, *cols):
    # NULL-safe sort (rollup emits NULL keys)
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


class TestRollup:
    def test_rollup_matches_native(self, db):
        d, li = db
        got = d.query_sql(
            "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sq "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        )
        want = li.rollup("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity").alias("sq")
        )
        assert _rows(got, "l_returnflag", "l_linestatus", "sq") == _rows(
            want, "l_returnflag", "l_linestatus", "sq"
        )

    def test_grouping_flags(self, db):
        d, _ = db
        rows = d.query_sql(
            "SELECT l_returnflag, grouping(l_returnflag) AS g, count(*) AS n "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag)"
        ).collect()
        total = [r for r in rows if r["g"] == 1]
        assert len(total) == 1 and total[0]["l_returnflag"] is None
        assert all(r["l_returnflag"] is not None for r in rows if r["g"] == 0)

    def test_single_expand_one_shuffle(self, db):
        d, _ = db
        plan = (
            d.query_sql(
                "SELECT l_returnflag, count(*) AS n "
                "FROM lineitem GROUP BY ROLLUP(l_returnflag)"
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Expand") == 1
        assert plan.count("Exchange hashpartitioning") <= 1


class TestCube:
    def test_cube_matches_native(self, db):
        d, li = db
        got = d.query_sql(
            "SELECT l_returnflag, l_linestatus, count(*) AS n "
            "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"
        )
        want = li.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))
        assert _rows(got, "l_returnflag", "l_linestatus", "n") == _rows(
            want, "l_returnflag", "l_linestatus", "n"
        )


class TestGroupingSets:
    def test_sets_rowcount_is_sum_of_sets(self, db):
        d, li = db
        got = d.query_sql(
            "SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem "
            "GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())"
        )
        n_cells = li.select("l_returnflag", "l_linestatus").distinct().count()
        n_status = li.select("l_linestatus").distinct().count()
        assert got.count() == n_cells + n_status + 1

    def test_empty_set_is_grand_total(self, db):
        d, li = db
        rows = d.query_sql(
            "SELECT l_returnflag, count(*) AS n FROM lineitem "
            "GROUP BY GROUPING SETS ((l_returnflag), ())"
        ).collect()
        total = [r["n"] for r in rows if r["l_returnflag"] is None]
        assert total == [li.count()]

    def test_having_on_grouping(self, db):
        d, _ = db
        rows = d.query_sql(
            "SELECT l_returnflag, count(*) AS n, grouping(l_returnflag) AS g "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag) HAVING grouping(l_returnflag) = 0"
        ).collect()
        assert all(r["g"] == 0 for r in rows) and len(rows) == 3


class TestErrors:
    def test_grouping_without_rollup(self, db):
        d, _ = db
        with pytest.raises(ValidationError, match="ROLLUP, CUBE, or GROUPING SETS"):
            d.query_sql(
                "SELECT grouping(l_returnflag) AS g FROM lineitem GROUP BY l_returnflag"
            )

    def test_grouping_of_non_key(self, db):
        d, _ = db
        with pytest.raises(ValidationError, match="not a grouping column"):
            d.query_sql(
                "SELECT grouping(l_quantity) AS g, count(*) AS n "
                "FROM lineitem GROUP BY ROLLUP(l_returnflag)"
            )

    def test_plain_group_by_ident_named_rollup_still_works(self, spark):
        # a COLUMN named rollup must not trigger rollup mode (the
        # sniffer requires a following paren)
        df = spark.createDataFrame([(1, 2)], "rollup int, v int")
        d = WarpDB(df=df, table_name="t", spark=spark)
        rows = d.query_sql("SELECT rollup, count(*) AS n FROM t GROUP BY rollup").collect()
        assert rows[0]["rollup"] == 1 and rows[0]["n"] == 1
