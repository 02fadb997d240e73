"""Dialect subqueries + CTEs (superset — the reference has no
subqueries or WITH in its keyword set, src/expression.cpp:58-62).

Covers: WITH (incl. chained CTEs referencing earlier ones), scalar
subqueries in WHERE (global-aggregate one-row broadcast), correlated
and uncorrelated EXISTS / NOT EXISTS (semi/anti join rewrites, incl.
theta correlation as in TPC-H q4), IN / NOT IN (SELECT ...) with ANSI
null semantics, and the documented restrictions as clear errors.
"""

import pytest

from warpdb_spark.api import WarpDB
from warpdb_spark.errors import ValidationError


@pytest.fixture(scope="module")
def db(spark, sf_dir):
    db = WarpDB(f"{sf_dir}/orders.parquet", spark=spark, table_name="orders")
    db.attach("lineitem", spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    db.attach("customer", spark.read.parquet(f"{sf_dir}/customer.parquet"))
    return db


class TestCTE:
    def test_single_cte(self, db):
        rows = db.query_sql(
            "WITH big AS (SELECT o_orderkey AS ok, o_totalprice AS total "
            "FROM orders WHERE o_totalprice > 400000) "
            "SELECT COUNT(*) AS n FROM big"
        ).collect()
        expected = db.query_sql(
            "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > 400000"
        ).collect()
        assert rows[0]["n"] == expected[0]["n"] > 0

    def test_chained_ctes_see_earlier(self, db):
        rows = db.query_sql(
            "WITH big AS (SELECT o_orderkey AS ok FROM orders "
            "WHERE o_totalprice > 400000), "
            "bigger AS (SELECT ok FROM big WHERE ok > 100) "
            "SELECT COUNT(*) AS n FROM bigger"
        ).collect()
        assert rows[0]["n"] >= 0

    def test_cte_shadows_base_table(self, db):
        rows = db.query_sql(
            "WITH orders AS (SELECT o_orderkey AS ok FROM orders LIMIT 5) "
            "SELECT COUNT(*) AS n FROM orders"
        ).collect()
        assert rows[0]["n"] == 5


class TestScalarSubquery:
    def test_where_above_average(self, db, spark, sf_dir):
        rows = db.query_sql(
            "SELECT COUNT(*) AS n FROM orders "
            "WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)"
        ).collect()
        from pyspark.sql import functions as F

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        avg = orders.agg(F.avg("o_totalprice")).collect()[0][0]
        assert rows[0]["n"] == orders.filter(F.col("o_totalprice") > avg).count()

    def test_requires_single_row_shape(self, db):
        with pytest.raises(ValidationError, match="global aggregate|LIMIT 1"):
            db.query_sql(
                "SELECT o_orderkey AS ok FROM orders "
                "WHERE o_totalprice > (SELECT o_totalprice FROM orders)"
            )

    def test_in_select_list(self, db):
        rows = db.query_sql(
            "SELECT o_orderkey AS ok, "
            "o_totalprice / (SELECT MAX(o_totalprice) FROM orders) AS frac "
            "FROM orders ORDER BY frac DESC LIMIT 1"
        ).collect()
        assert rows[0]["frac"] == pytest.approx(1.0)

    def test_in_having(self, db):
        rows = db.query_sql(
            "SELECT o_orderstatus AS st, COUNT(*) AS n FROM orders "
            "GROUP BY o_orderstatus "
            "HAVING COUNT(*) > (SELECT COUNT(*) FROM orders) / 2"
        ).collect()
        total = db.query_sql("SELECT COUNT(*) AS n FROM orders").collect()[0]["n"]
        for r in rows:
            assert r["n"] > total / 2

    def test_rejected_in_group_by(self, db):
        with pytest.raises(ValidationError, match="Scalar subqueries"):
            db.query_sql(
                "SELECT COUNT(*) AS n FROM orders "
                "GROUP BY (SELECT MAX(o_totalprice) FROM orders)"
            ).collect()


class TestExists:
    def test_correlated_exists_matches_semi_join(self, db, spark, sf_dir):
        got = db.query_sql(
            "SELECT o_orderkey AS ok FROM orders WHERE EXISTS ("
            "SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
            "AND l_quantity = 50)"
        )
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        from pyspark.sql import functions as F

        expected = orders.join(
            li.filter(F.col("l_quantity") == 50),
            orders.o_orderkey == li.l_orderkey,
            "left_semi",
        ).count()
        assert got.count() == expected > 0

    def test_theta_correlation_q4_shape(self, db, spark, sf_dir):
        """Non-equi correlated EXISTS (l_shipdate > o_orderdate)."""
        got = db.query_sql(
            "SELECT COUNT(*) AS n FROM orders WHERE EXISTS ("
            "SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
            "AND l_shipdate > o_orderdate)"
        ).collect()
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        expected = orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        ).count()
        assert got[0]["n"] == expected > 0

    def test_not_exists_is_complement(self, db):
        total = db.query_sql("SELECT COUNT(*) AS n FROM orders").collect()[0]["n"]
        inn = db.query_sql(
            "SELECT COUNT(*) AS n FROM orders WHERE EXISTS ("
            "SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)"
        ).collect()[0]["n"]
        out = db.query_sql(
            "SELECT COUNT(*) AS n FROM orders WHERE NOT EXISTS ("
            "SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)"
        ).collect()[0]["n"]
        assert inn + out == total

    def test_uncorrelated_exists_nonempty_keeps_all(self, db):
        total = db.query_sql("SELECT COUNT(*) AS n FROM orders").collect()[0]["n"]
        n = db.query_sql(
            "SELECT COUNT(*) AS n FROM orders WHERE EXISTS ("
            "SELECT 1 FROM lineitem WHERE l_quantity > 0)"
        ).collect()[0]["n"]
        assert n == total

    def test_uncorrelated_exists_empty_drops_all(self, db):
        n = db.query_sql(
            "SELECT COUNT(*) AS n FROM orders WHERE EXISTS ("
            "SELECT 1 FROM lineitem WHERE l_quantity < 0)"
        ).collect()[0]["n"]
        assert n == 0

    def test_exists_under_or_rejected(self, db):
        with pytest.raises(ValidationError, match="top-level AND"):
            db.query_sql(
                "SELECT o_orderkey AS ok FROM orders "
                "WHERE o_totalprice > 0 OR EXISTS ("
                "SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)"
            )


class TestInSubquery:
    def test_in_matches_semi(self, db):
        a = db.query_sql(
            "SELECT COUNT(*) AS n FROM orders WHERE o_custkey IN ("
            "SELECT c_custkey FROM customer WHERE c_acctbal > 5000)"
        ).collect()[0]["n"]
        b = db.query_sql(
            "SELECT COUNT(*) AS n FROM orders WHERE EXISTS ("
            "SELECT 1 FROM customer WHERE c_custkey = o_custkey "
            "AND c_acctbal > 5000)"
        ).collect()[0]["n"]
        assert a == b > 0

    def test_not_in_with_null_in_subquery_drops_all(self, spark):
        left = spark.createDataFrame([(1,), (2,)], ["x"])
        right = spark.createDataFrame([(1,), (None,)], ["y"])
        db = WarpDB(df=left, table_name="l", spark=spark)
        db.attach("r", right)
        rows = db.query_sql(
            "SELECT x FROM l WHERE x NOT IN (SELECT y FROM r)"
        ).collect()
        assert rows == []  # ANSI: NULL in the list makes NOT IN unknown

    def test_not_in_without_nulls(self, spark):
        left = spark.createDataFrame([(1,), (2,), (3,)], ["x"])
        right = spark.createDataFrame([(1,)], ["y"])
        db = WarpDB(df=left, table_name="l", spark=spark)
        db.attach("r", right)
        rows = db.query_sql(
            "SELECT x FROM l WHERE x NOT IN (SELECT y FROM r) ORDER BY x"
        ).collect()
        assert [r["x"] for r in rows] == [2, 3]

    def test_in_subquery_single_column_required(self, db):
        with pytest.raises(ValidationError, match="exactly one column"):
            db.query_sql(
                "SELECT o_orderkey AS ok FROM orders WHERE o_custkey IN ("
                "SELECT c_custkey, c_name FROM customer)"
            )


class TestCompose:
    def test_cte_plus_scalar_plus_exists(self, db):
        rows = db.query_sql(
            "WITH rich AS (SELECT c_custkey AS ck FROM customer "
            "WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)) "
            "SELECT COUNT(*) AS n FROM orders "
            "WHERE o_custkey IN (SELECT ck FROM rich)"
        ).collect()
        assert rows[0]["n"] > 0


class TestCorrelatedIn:
    def test_correlated_in_matches_exists(self, db):
        """x IN (SELECT y FROM t WHERE t.k = outer.k) ≡ EXISTS with the
        equality folded in."""
        a = db.query_sql(
            "SELECT COUNT(*) AS n FROM orders WHERE o_orderkey IN ("
            "SELECT l_orderkey FROM lineitem WHERE l_orderkey = o_orderkey "
            "AND l_quantity = 50)"
        ).collect()[0]["n"]
        b = db.query_sql(
            "SELECT COUNT(*) AS n FROM orders WHERE EXISTS ("
            "SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
            "AND l_quantity = 50)"
        ).collect()[0]["n"]
        assert a == b > 0

    def test_correlated_not_in_null_semantics(self, spark):
        left = spark.createDataFrame([(1, 10), (1, 20), (2, 10)], ["g", "x"])
        # group 1's list contains a NULL -> NOT IN removes ALL group-1 rows;
        # group 2's list is (30,) -> both x=10 rows... only g=2 row survives
        right = spark.createDataFrame(
            [(1, 10), (1, None), (2, 30)], ["g", "y"]
        )
        db = WarpDB(df=left, table_name="l", spark=spark)
        db.attach("r", right)
        rows = db.query_sql(
            "SELECT g, x FROM l WHERE x NOT IN (SELECT y FROM r WHERE r.g = l.g)"
        ).collect()
        assert [(r["g"], r["x"]) for r in rows] == [(2, 10)]
