"""ANSI set-operation semantics in the dialect front-end: INTERSECT
binds tighter than UNION/EXCEPT (as DuckDB and Spark SQL resolve it),
and the ALL variants keep bag semantics. The reference has no set
operations at all (src/expression.cpp:58-62) — this is superset
surface, held to the standard."""

import pytest
from pyspark.sql import Row

from warpdb_spark.api import WarpDB
from warpdb_spark.plans import ast as A
from warpdb_spark.plans.parser import parse_query


class TestParsePrecedence:
    def test_intersect_binds_tighter_than_union(self):
        q = parse_query(
            "SELECT v FROM a UNION SELECT v FROM b INTERSECT SELECT v FROM c"
        )
        # ANSI: a UNION (b INTERSECT c) — the top node is the UNION
        assert isinstance(q, A.SetOp) and q.op == "union"
        assert isinstance(q.right, A.SetOp) and q.right.op == "intersect"
        assert isinstance(q.left, A.QueryAST)

    def test_except_then_intersect(self):
        q = parse_query(
            "SELECT v FROM a EXCEPT SELECT v FROM b INTERSECT SELECT v FROM c"
        )
        assert isinstance(q, A.SetOp) and q.op == "except"
        assert isinstance(q.right, A.SetOp) and q.right.op == "intersect"

    def test_all_variants_parse(self):
        q = parse_query(
            "SELECT v FROM a INTERSECT ALL SELECT v FROM b "
            "EXCEPT ALL SELECT v FROM c"
        )
        assert isinstance(q, A.SetOp) and q.op == "except_all"
        assert isinstance(q.left, A.SetOp) and q.left.op == "intersect_all"

    def test_order_by_inside_intersect_chain_rejected(self):
        from warpdb_spark.errors import ParseError

        with pytest.raises(ParseError, match="last query of a set operation"):
            parse_query(
                "SELECT v FROM a ORDER BY v INTERSECT SELECT v FROM b"
            )


@pytest.fixture(scope="module")
def db(spark):
    # one physical table, three filtered "views" via WHERE — keeps the
    # fixture tiny while exercising genuine multi-branch set-op plans
    rows = [Row(v=1.0), Row(v=2.0), Row(v=2.0), Row(v=3.0)]
    d = WarpDB(df=spark.createDataFrame(rows), table_name="t", spark=spark)
    return d


class TestExecution:
    def _vals(self, df):
        return sorted(r.v for r in df.collect())

    def test_union_intersect_precedence(self, db):
        # t values: 1,2,2,3.  a = {1,2}, b = {2,3}, c = {3}
        out = db.query_sql(
            "SELECT v FROM t WHERE v <= 2 "
            "UNION SELECT v FROM t WHERE v >= 2 "
            "INTERSECT SELECT v FROM t WHERE v = 3"
        )
        # ANSI: a UNION (b ∩ c) = {1,2,3}; left-assoc would give {3}
        assert self._vals(out) == [1.0, 2.0, 3.0]

    def test_intersect_all_bag_semantics(self, db):
        out = db.query_sql(
            "SELECT v FROM t WHERE v = 2 "
            "INTERSECT ALL SELECT v FROM t WHERE v >= 2"
        )
        assert self._vals(out) == [2.0, 2.0]

    def test_except_all_bag_semantics(self, db):
        out = db.query_sql(
            "SELECT v FROM t WHERE v >= 2 "
            "EXCEPT ALL SELECT v FROM t WHERE v = 3"
        )
        assert self._vals(out) == [2.0, 2.0]

    def test_combined_tail_order_limit(self, db):
        out = db.query_sql(
            "SELECT v FROM t WHERE v <= 2 "
            "UNION ALL SELECT v FROM t WHERE v = 3 "
            "INTERSECT SELECT v FROM t WHERE v = 3 "
            "ORDER BY v DESC LIMIT 2"
        )
        # a(1,2,2) ++ (b ∩ c)(3) → order desc limit 2 → [3, 2]
        assert [r.v for r in out.collect()] == [3.0, 2.0]
