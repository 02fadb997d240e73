"""Derived tables — ``FROM (SELECT ...) alias`` and
``JOIN (SELECT ...) alias ON ...`` (superset: the reference grammar
only accepts bare identifiers after FROM/JOIN,
src/expression.cpp:363-372,375-401)."""

import pytest

from warpdb_spark.api import WarpDB
from warpdb_spark.errors import ParseError


@pytest.fixture(scope="module")
def db(spark, sf_dir):
    db = WarpDB(f"{sf_dir}/orders.parquet", spark=spark, table_name="orders")
    db.attach("lineitem", spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
    db.attach("customer", spark.read.parquet(f"{sf_dir}/customer.parquet"))
    return db


def test_from_derived_table(db):
    rows = db.query_sql(
        "SELECT COUNT(*) AS n FROM "
        "(SELECT o_orderkey AS ok FROM orders WHERE o_totalprice > 400000) big"
    ).collect()
    expected = db.query_sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > 400000"
    ).collect()
    assert rows[0]["n"] == expected[0]["n"] > 0


def test_from_derived_with_as_keyword(db):
    rows = db.query_sql(
        "SELECT AVG(total) AS avg_total FROM "
        "(SELECT o_totalprice AS total FROM orders LIMIT 100) AS t"
    ).collect()
    assert rows[0]["avg_total"] > 0


def test_join_derived_table_q18_shape(db, spark, sf_dir):
    """The whole TPC-H q18 shape now expressible in the dialect."""
    got = db.query_sql(
        "SELECT o_orderkey AS ok, b.total_qty AS total_qty FROM orders "
        "JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty FROM lineitem "
        "GROUP BY l_orderkey HAVING SUM(l_quantity) > 300) b "
        "ON o_orderkey = b.l_orderkey ORDER BY total_qty DESC"
    )
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    expected = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .count()
    )
    assert got.count() == expected


def test_nested_derived_tables(db):
    rows = db.query_sql(
        "SELECT MAX(ok) AS mx FROM (SELECT ok FROM "
        "(SELECT o_orderkey AS ok FROM orders) inner1 WHERE ok < 100) outer1"
    ).collect()
    assert rows[0]["mx"] < 100


def test_derived_table_requires_alias(db):
    with pytest.raises(ParseError, match="alias for derived table"):
        db.query_sql("SELECT 1 AS one FROM (SELECT o_orderkey FROM orders)")


def test_qualified_refs_into_derived(db):
    rows = db.query_sql(
        "SELECT t.seg AS seg, COUNT(*) AS n FROM "
        "(SELECT c_mktsegment AS seg FROM customer) t "
        "GROUP BY t.seg ORDER BY t.seg LIMIT 2"
    ).collect()
    assert len(rows) == 2


class TestOrdinalsAndAliases:
    def test_group_by_ordinal(self, db):
        a = db.query_sql(
            "SELECT o_orderstatus AS st, COUNT(*) AS n FROM orders "
            "GROUP BY 1 ORDER BY 1"
        ).collect()
        b = db.query_sql(
            "SELECT o_orderstatus AS st, COUNT(*) AS n FROM orders "
            "GROUP BY o_orderstatus ORDER BY o_orderstatus"
        ).collect()
        assert a == b and len(a) > 0

    def test_order_by_ordinal_desc(self, db):
        rows = db.query_sql(
            "SELECT o_orderkey AS ok, o_totalprice AS total FROM orders "
            "ORDER BY 2 DESC, 1 ASC LIMIT 3"
        ).collect()
        assert rows[0]["total"] >= rows[1]["total"] >= rows[2]["total"]

    def test_group_by_alias(self, db):
        rows = db.query_sql(
            "SELECT o_orderstatus AS st2, COUNT(*) AS n FROM orders "
            "GROUP BY st2 ORDER BY st2"
        ).collect()
        assert len(rows) > 0

    def test_ordinal_out_of_range(self, db):
        from warpdb_spark.errors import ValidationError

        with pytest.raises(ValidationError, match="ordinal 5 is out of range"):
            db.query_sql("SELECT o_orderkey AS ok FROM orders GROUP BY 5")


class TestNamedWindows:
    def test_window_clause_shared_spec(self, db):
        rows = db.query_sql(
            "SELECT o_orderkey AS ok, "
            "ROW_NUMBER() OVER w AS rn, "
            "SUM(o_totalprice) OVER w AS running "
            "FROM orders WHERE o_orderkey < 50 "
            "WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey) "
            "ORDER BY ok LIMIT 5"
        ).collect()
        assert len(rows) == 5
        assert all(r["rn"] >= 1 for r in rows)

    def test_named_equals_inline(self, db):
        a = db.query_sql(
            "SELECT o_orderkey AS ok, RANK() OVER w AS r FROM orders "
            "WHERE o_orderkey < 100 "
            "WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) "
            "ORDER BY ok"
        ).collect()
        b = db.query_sql(
            "SELECT o_orderkey AS ok, RANK() OVER "
            "(PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS r "
            "FROM orders WHERE o_orderkey < 100 ORDER BY ok"
        ).collect()
        assert a == b

    def test_unknown_window_name(self, db):
        from warpdb_spark.errors import ValidationError

        with pytest.raises(ValidationError, match="Unknown window name: w2"):
            db.query_sql(
                "SELECT ROW_NUMBER() OVER w2 AS rn FROM orders "
                "WINDOW w AS (ORDER BY o_orderkey)"
            ).collect()


class TestQualify:
    """QUALIFY (superset): post-window filter, Snowflake/DuckDB semantics
    — window functions see the pre-QUALIFY frame."""

    def test_qualify_equals_subquery(self, db):
        a = db.query_sql(
            "SELECT o_custkey AS ck, o_orderkey AS ok, "
            "row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey) AS rn "
            "FROM orders QUALIFY rn = 1 ORDER BY ck"
        ).collect()
        b = db.query_sql(
            "SELECT ck, ok, rn FROM ("
            "SELECT o_custkey AS ck, o_orderkey AS ok, "
            "row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) t "
            "WHERE rn = 1 ORDER BY ck"
        ).collect()
        assert a == b
        assert len(a) > 0

    def test_qualify_window_not_in_select(self, db):
        rows = db.query_sql(
            "SELECT o_custkey AS ck, o_orderkey AS ok FROM orders "
            "QUALIFY row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey) <= 2 ORDER BY ck, ok"
        ).collect()
        per_ck: dict = {}
        for r in rows:
            per_ck[r["ck"]] = per_ck.get(r["ck"], 0) + 1
        assert rows and max(per_ck.values()) <= 2

    def test_qualify_grouped_alias_in_spec(self, db):
        rows = db.query_sql(
            "SELECT o_custkey AS ck, sum(o_totalprice) AS total "
            "FROM orders GROUP BY o_custkey "
            "QUALIFY rank() OVER (ORDER BY total DESC) <= 3 "
            "ORDER BY total DESC"
        ).collect()
        assert len(rows) == 3
        assert rows[0]["total"] >= rows[1]["total"] >= rows[2]["total"]

    def test_qualify_grouped_direct_agg_in_spec(self, db):
        a = db.query_sql(
            "SELECT o_custkey AS ck, sum(o_totalprice) AS total "
            "FROM orders GROUP BY o_custkey "
            "QUALIFY rank() OVER (ORDER BY sum(o_totalprice) DESC) <= 3 "
            "ORDER BY total DESC"
        ).collect()
        b = db.query_sql(
            "SELECT o_custkey AS ck, sum(o_totalprice) AS total "
            "FROM orders GROUP BY o_custkey "
            "QUALIFY rank() OVER (ORDER BY total DESC) <= 3 "
            "ORDER BY total DESC"
        ).collect()
        assert a == b and len(a) == 3

    def test_qualify_named_window(self, db):
        rows = db.query_sql(
            "SELECT o_custkey AS ck, o_orderkey AS ok, "
            "row_number() OVER w AS rn FROM orders "
            "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) "
            "QUALIFY rn = 1"
        ).collect()
        assert len(rows) == len({r["ck"] for r in rows})

    def test_qualify_window_spec_prefers_real_column_over_alias(self, db):
        """Regression: a window spec is computed against the
        PRE-projection frame — PARTITION BY o_custkey must use the real
        column even when a sibling item aliases a different column to
        that name."""
        rows = db.query_sql(
            "SELECT o_orderkey AS o_custkey, o_custkey AS real_ck, "
            "count(*) OVER (PARTITION BY o_custkey) AS cnt FROM orders "
            "QUALIFY cnt >= 1"
        ).collect()
        per_ck: dict = {}
        for r in rows:
            per_ck[r["real_ck"]] = per_ck.get(r["real_ck"], 0) + 1
        # partitioned by the REAL customer key → cnt equals that
        # customer's row count, not 1-per-orderkey
        assert all(r["cnt"] == per_ck[r["real_ck"]] for r in rows)
        assert any(r["cnt"] > 1 for r in rows)

    def test_qualify_alias_does_not_shadow_real_column(self, db):
        """Regression: an alias named after a DIFFERENT real column must
        not leak into sibling select items' compilation."""
        rows = db.query_sql(
            "SELECT o_orderkey AS o_custkey, o_custkey AS real_ck FROM orders "
            "QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY o_orderkey) = 1 "
            "ORDER BY real_ck LIMIT 50"
        ).collect()
        # real_ck must be the genuine o_custkey values, not o_orderkey
        assert any(r["real_ck"] != r["o_custkey"] for r in rows)

    def test_qualify_predicate_column_first_like_duckdb(self, db):
        """Regression: inside QUALIFY a bare name that exists as a REAL
        column resolves to the column (DuckDB precedence), not to a
        sibling alias of the same name."""
        rows = db.query_sql(
            "SELECT o_orderkey AS o_totalprice, o_orderkey AS ok FROM orders "
            "QUALIFY o_totalprice > 100000 ORDER BY ok LIMIT 5"
        ).collect()
        # filters on the REAL o_totalprice (six figures), not the alias
        # (small orderkeys) — alias-first would return zero rows
        assert len(rows) == 5

    def test_qualify_grouped_agg_alias_same_name(self, db):
        """Regression: ``sum(x) AS x`` + a window spec referencing x in
        grouped mode must resolve to the aggregate alias (the base
        column is no longer addressable), not crash with internal
        column names."""
        rows = db.query_sql(
            "SELECT o_orderstatus AS st, sum(o_totalprice) AS o_totalprice "
            "FROM orders GROUP BY o_orderstatus "
            "QUALIFY rank() OVER (ORDER BY o_totalprice DESC) = 1"
        ).collect()
        assert len(rows) == 1

    def test_qualify_grouped_unknown_window_column_dialect_error(self, db):
        from warpdb_spark.errors import ValidationError

        with pytest.raises(ValidationError, match="QUALIFY window"):
            db.query_sql(
                "SELECT o_orderstatus AS st, sum(o_totalprice) AS total "
                "FROM orders GROUP BY o_orderstatus "
                "QUALIFY rank() OVER (ORDER BY o_clerk) = 1"
            )

    def test_qualify_unknown_column(self, db):
        from warpdb_spark.errors import ValidationError

        with pytest.raises(ValidationError, match="Unknown column: nope in QUALIFY"):
            db.query_sql("SELECT o_orderkey AS ok FROM orders QUALIFY nope = 1")


class TestEventTimeDialect:
    """ANSI typed literals + datetime special forms (superset)."""

    @pytest.fixture(scope="class")
    def edb(self, spark, sf_dir):
        return WarpDB(
            f"{sf_dir}/events.parquet", spark=spark, table_name="events"
        )

    def test_timestamp_literal_filter(self, edb):
        rows = edb.query_sql(
            "SELECT event_id AS eid FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' ORDER BY eid LIMIT 3"
        ).collect()
        assert len(rows) == 3

    def test_interval_arithmetic(self, edb):
        a = edb.query_sql(
            "SELECT COUNT(*) AS n FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' + INTERVAL '1 hour'"
        ).collect()[0]["n"]
        b = edb.query_sql(
            "SELECT COUNT(*) AS n FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-01 01:00:00'"
        ).collect()[0]["n"]
        assert a == b > 0

    def test_date_literal(self, edb):
        rows = edb.query_sql(
            "SELECT COUNT(*) AS n FROM events WHERE ts < DATE '2024-01-05'"
        ).collect()
        assert rows[0]["n"] > 0

    def test_extract_and_date_trunc(self, edb):
        rows = edb.query_sql(
            "SELECT date_trunc('hour', ts) AS h, extract(hour FROM ts) AS hh "
            "FROM events LIMIT 5"
        ).collect()
        for r in rows:
            assert r["h"].minute == 0 and r["h"].second == 0
            assert r["hh"] == r["h"].hour

    def test_date_format_literal_fmt(self, edb):
        rows = edb.query_sql(
            "SELECT date_format(ts, 'yyyy-MM-dd') AS d FROM events LIMIT 1"
        ).collect()
        assert len(rows[0]["d"]) == 10

    def test_single_digit_fields_accepted(self, edb):
        """Spark's cast accepts non-zero-padded fields — the dialect
        validator must too."""
        rows = edb.query_sql(
            "SELECT COUNT(*) AS n FROM events WHERE ts >= TIMESTAMP '2024-1-1 0:0:0'"
        ).collect()
        assert rows[0]["n"] > 0

    def test_hour_only_time_accepted(self, edb):
        a = edb.query_sql(
            "SELECT COUNT(*) AS n FROM events WHERE ts >= TIMESTAMP '2024-01-01 12'"
        ).collect()[0]["n"]
        b = edb.query_sql(
            "SELECT COUNT(*) AS n FROM events WHERE ts >= TIMESTAMP '2024-01-01 12:00:00'"
        ).collect()[0]["n"]
        assert a == b > 0

    def test_malformed_timestamp_rejected(self, edb):
        """Regression: a typo'd literal must error, not silently cast to
        NULL and return an empty result."""
        from warpdb_spark.errors import ValidationError

        with pytest.raises(ValidationError, match="Malformed TIMESTAMP"):
            edb.query_sql(
                "SELECT event_id AS eid FROM events WHERE ts >= TIMESTAMP '2024-13-99'"
            )
        with pytest.raises(ValidationError, match="Malformed DATE"):
            edb.query_sql(
                "SELECT event_id AS eid FROM events WHERE ts >= DATE 'not-a-date'"
            )

    def test_malformed_interval_rejected(self, edb):
        from warpdb_spark.errors import ValidationError

        with pytest.raises(ValidationError, match="Malformed INTERVAL"):
            edb.query_sql(
                "SELECT COUNT(*) AS n FROM events "
                "WHERE ts >= TIMESTAMP '2024-01-01' + INTERVAL '1 hour''; select 1'"
            ).collect()


class TestCast:
    def test_cast_types(self, db):
        rows = db.query_sql(
            "SELECT CAST(o_totalprice AS INT) AS ip, "
            "CAST(o_orderkey AS VARCHAR) AS ks, "
            "CAST('2024-01-01' AS TIMESTAMP) AS ts FROM orders LIMIT 1"
        ).collect()
        assert isinstance(rows[0]["ip"], int)
        assert isinstance(rows[0]["ks"], str)

    def test_cast_unknown_type(self, db):
        from warpdb_spark.errors import ParseError

        with pytest.raises(ParseError, match="Unknown CAST target type"):
            db.query_sql("SELECT CAST(o_orderkey AS BLOB) AS b FROM orders")


class TestIntervalRangeFrame:
    """RANGE BETWEEN INTERVAL ... (superset): event-time rolling frames
    lowered to micros offsets over unix_micros(ts) — exact to the µs."""

    @pytest.fixture(scope="class")
    def edb(self, spark, sf_dir):
        return WarpDB(
            f"{sf_dir}/events.parquet", spark=spark, table_name="events"
        )

    def test_matches_dataframe_formulation(self, edb, spark, sf_dir):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        got = {
            (r["eid"]): r["s1h"]
            for r in edb.query_sql(
                "SELECT event_id AS eid, "
                "round(SUM(value) OVER (PARTITION BY user_id ORDER BY ts "
                "RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW), 4) AS s1h "
                "FROM events"
            ).collect()
        }
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        w = (
            Window.partitionBy("user_id")
            .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
            .rangeBetween(-3_600_000_000, 0)
        )
        want = {
            r["event_id"]: r["s"]
            for r in ev.select(
                "event_id", F.round(F.sum("value").over(w), 4).alias("s")
            ).collect()
        }
        assert got == want and len(got) > 0

    def test_following_bound_and_units(self, edb):
        rows = edb.query_sql(
            "SELECT event_id AS eid, COUNT(*) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL '30 minutes' PRECEDING "
            "AND INTERVAL '30 minutes' FOLLOWING) AS n FROM events"
        ).collect()
        assert all(r["n"] >= 1 for r in rows)  # frame always includes self

    def test_error_cases(self, edb):
        from warpdb_spark.errors import ValidationError

        cases = {
            "ROWS BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW": "require RANGE",
            "RANGE BETWEEN INTERVAL '1 month' PRECEDING AND CURRENT ROW": "Unsupported INTERVAL",
            "RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND 5 FOLLOWING": "mix numeric and INTERVAL",
        }
        for frame, msg in cases.items():
            with pytest.raises(ValidationError, match=msg):
                edb.query_sql(
                    f"SELECT SUM(value) OVER (ORDER BY ts {frame}) AS s FROM events"
                ).collect()
        with pytest.raises(ValidationError, match="exactly one ORDER BY"):
            edb.query_sql(
                "SELECT SUM(value) OVER (ORDER BY ts, event_id "
                "RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW) AS s "
                "FROM events"
            ).collect()


class TestRecursiveCTE:
    """WITH RECURSIVE (superset): bounded-fixpoint evaluation — UNION
    dedups the frontier (cycle-safe), UNION ALL is bag semantics with a
    100-round cap; base branch must not self-reference."""

    @pytest.fixture(scope="class")
    def rdb(self, spark, tmp_path_factory):
        p = str(tmp_path_factory.mktemp("rec") / "edges.parquet")
        spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["src", "dst"]
        ).write.parquet(p)
        db = WarpDB(p, spark=spark, table_name="edges")
        db.attach(
            "cyc", spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
        )
        return db

    def test_transitive_closure_union(self, rdb):
        got = [
            r["node"]
            for r in rdb.query_sql(
                "WITH RECURSIVE reach AS ("
                "SELECT dst AS node FROM edges WHERE src = 1 "
                "UNION SELECT dst AS node FROM edges JOIN reach ON src = node"
                ") SELECT node FROM reach ORDER BY node"
            ).collect()
        ]
        assert got == [2, 3, 4, 5]

    def test_union_all_tracks_depth(self, rdb):
        got = [
            (r["node"], r["depth"])
            for r in rdb.query_sql(
                "WITH RECURSIVE walk AS ("
                "SELECT src AS node, 0 AS depth FROM edges WHERE src = 1 "
                "UNION ALL SELECT dst AS node, depth + 1 AS depth "
                "FROM edges JOIN walk ON src = node"
                ") SELECT node, depth FROM walk ORDER BY depth, node"
            ).collect()
        ]
        assert got == [(1, 0), (2, 1), (3, 2), (4, 3), (5, 4)]

    def test_cycle_converges_under_union(self, rdb):
        got = [
            r["node"]
            for r in rdb.query_sql(
                "WITH RECURSIVE reach AS ("
                "SELECT dst AS node FROM cyc WHERE src = 1 "
                "UNION SELECT dst AS node FROM cyc JOIN reach ON src = node"
                ") SELECT node FROM reach ORDER BY node"
            ).collect()
        ]
        assert got == [1, 2]

    @pytest.mark.slow
    def test_cycle_union_all_raises(self, rdb):
        from warpdb_spark.errors import ValidationError

        with pytest.raises(ValidationError, match="did not converge"):
            rdb.query_sql(
                "WITH RECURSIVE w AS ("
                "SELECT src AS node FROM cyc WHERE src = 1 "
                "UNION ALL SELECT dst AS node FROM cyc JOIN w ON src = node"
                ") SELECT COUNT(*) AS n FROM w"
            ).collect()

    def test_bad_shapes_raise(self, rdb):
        from warpdb_spark.errors import ValidationError

        with pytest.raises(ValidationError, match="must be 'base UNION"):
            rdb.query_sql(
                "WITH RECURSIVE r AS ("
                "SELECT src FROM edges JOIN r ON 1 = 1) SELECT src FROM r"
            ).collect()
        with pytest.raises(ValidationError, match="base .left. branch"):
            rdb.query_sql(
                "WITH RECURSIVE r AS ("
                "SELECT src AS node FROM r UNION ALL "
                "SELECT dst AS node FROM edges JOIN r ON src = node"
                ") SELECT node FROM r"
            ).collect()

    def test_non_recursive_with_unaffected(self, rdb):
        # WITHOUT the keyword, a self-reference is just an unknown table
        got = rdb.query_sql(
            "WITH t AS (SELECT src FROM edges WHERE src = 1) "
            "SELECT COUNT(*) AS n FROM t"
        ).collect()
        assert got[0]["n"] == 1


class TestTableAliases:
    """Base-table aliases (superset): FROM t [AS] a / JOIN t a ON ...;
    the alias shadows the table name and enables self-joins."""

    def test_self_join_via_aliases(self, db):
        rows = db.query_sql(
            "SELECT a.o_orderkey AS ok FROM orders a "
            "JOIN orders b ON a.o_custkey = b.o_custkey "
            "WHERE a.o_orderkey < b.o_orderkey ORDER BY ok LIMIT 5"
        ).collect()
        assert len(rows) == 5

    def test_qualified_refs_through_alias(self, db):
        a = db.query_sql(
            "SELECT o.o_orderkey AS ok, COUNT(*) AS n "
            "FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "GROUP BY o.o_orderkey ORDER BY n DESC, ok LIMIT 3"
        ).collect()
        b = db.query_sql(
            "SELECT o_orderkey AS ok, COUNT(*) AS n "
            "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
            "GROUP BY o_orderkey ORDER BY n DESC, ok LIMIT 3"
        ).collect()
        assert a == b

    def test_alias_shadows_table_name(self, db):
        from warpdb_spark.errors import ValidationError

        with pytest.raises(ValidationError, match="Unknown column: orders."):
            db.query_sql(
                "SELECT orders.o_orderkey AS ok FROM orders o LIMIT 1"
            ).collect()


class TestAggFilter:
    """ANSI FILTER (WHERE ...) on aggregates (superset)."""

    def test_filter_equals_case_when(self, db):
        a = db.query_sql(
            "SELECT o_orderpriority AS pri, "
            "COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n "
            "FROM orders GROUP BY o_orderpriority ORDER BY pri"
        ).collect()
        b = db.query_sql(
            "SELECT o_orderpriority AS pri, "
            "COUNT(CASE WHEN o_totalprice > 100000 THEN 1 END) AS n "
            "FROM orders GROUP BY o_orderpriority ORDER BY pri"
        ).collect()
        assert a == b and len(a) > 0

    def test_filter_on_scalar_function_rejected(self, db):
        with pytest.raises(ParseError, match="requires an aggregate"):
            db.query_sql(
                "SELECT round(o_totalprice, 2) FILTER (WHERE 1 = 1) AS x FROM orders"
            ).collect()

    def test_column_named_filter_still_works(self, db, spark):
        db.attach("ft", spark.createDataFrame([(1, 5)], ["id", "filter"]))
        assert db.query_sql("SELECT filter FROM ft").collect()[0][0] == 5


class TestStringAggAndModulo:
    """STRING_AGG (ordered concat, skip-nulls, FILTER-composable) and
    the % operator (superset)."""

    @pytest.fixture(scope="class")
    def ndb(self, spark, sf_dir):
        return WarpDB(
            f"{sf_dir}/nation.parquet", spark=spark, table_name="nation"
        )

    def test_ordered_concat_asc_desc(self, ndb):
        rows = ndb.query_sql(
            "SELECT n_regionkey AS rk, "
            "STRING_AGG(n_name, ',' ORDER BY n_name) AS a, "
            "STRING_AGG(n_name, ',' ORDER BY n_name DESC) AS d "
            "FROM nation GROUP BY n_regionkey ORDER BY rk"
        ).collect()
        for r in rows:
            assert r["a"].split(",") == sorted(r["a"].split(","))
            assert r["d"].split(",") == list(reversed(r["a"].split(",")))

    def test_nulls_skipped(self, ndb, spark):
        ndb.attach(
            "vals",
            spark.createDataFrame(
                [(1, "a"), (1, None), (1, "b")], ["g", "v"]
            ),
        )
        got = ndb.query_sql(
            "SELECT g, STRING_AGG(v, '-' ORDER BY v) AS s FROM vals GROUP BY g"
        ).collect()
        assert got[0]["s"] == "a-b"

    def test_modulo_operator(self, ndb):
        rows = ndb.query_sql(
            "SELECT n_nationkey AS k, n_nationkey % 3 AS m FROM nation ORDER BY k"
        ).collect()
        assert all(r["m"] == r["k"] % 3 for r in rows)

    def test_separator_must_be_literal(self, ndb):
        with pytest.raises(ParseError, match="separator must be a string literal"):
            ndb.query_sql(
                "SELECT STRING_AGG(n_name, n_name) AS x FROM nation"
            ).collect()


class TestNullsOrdering:
    """ORDER BY ... NULLS FIRST/LAST (superset) — the portable spelling
    where engine defaults disagree (Spark ASC = NULLS FIRST, DuckDB
    ASC = NULLS LAST)."""

    @pytest.fixture(scope="class")
    def vdb(self, spark, sf_dir):
        db = WarpDB(
            f"{sf_dir}/nation.parquet", spark=spark, table_name="nation"
        )
        db.attach(
            "v",
            spark.createDataFrame(
                [(1, 10.0), (2, None), (3, 5.0), (4, None)], ["id", "x"]
            ),
        )
        return db

    def test_all_four_placements(self, vdb):
        cases = {
            "x ASC NULLS FIRST": [2, 4, 3, 1],
            "x ASC NULLS LAST": [3, 1, 2, 4],
            "x DESC NULLS FIRST": [2, 4, 1, 3],
            "x DESC NULLS LAST": [1, 3, 2, 4],
        }
        for frag, want in cases.items():
            got = [
                r["id"]
                for r in vdb.query_sql(
                    f"SELECT id FROM v ORDER BY {frag}, id"
                ).collect()
            ]
            assert got == want, frag

    def test_in_window_spec(self, vdb):
        rows = vdb.query_sql(
            "SELECT id, row_number() OVER (ORDER BY x NULLS LAST, id) AS rn "
            "FROM v ORDER BY id"
        ).collect()
        assert {r["id"]: r["rn"] for r in rows} == {1: 2, 2: 3, 3: 1, 4: 4}

    def test_malformed_nulls_clause(self, vdb):
        with pytest.raises(ParseError, match="FIRST or LAST after NULLS"):
            vdb.query_sql("SELECT id FROM v ORDER BY x NULLS SOMETIMES").collect()


class TestDistinctOn:
    """DISTINCT ON (superset): Postgres first-row-per-group, with the
    well-definedness rule (ORDER BY must lead with the ON exprs)
    enforced instead of assumed."""

    def test_equals_qualify_formulation(self, db):
        a = db.query_sql(
            "SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice "
            "FROM orders ORDER BY o_custkey, o_totalprice DESC, o_orderkey"
        ).collect()
        b = db.query_sql(
            "SELECT o_custkey, o_orderkey, o_totalprice, "
            "row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey) AS rn "
            "FROM orders QUALIFY rn = 1 ORDER BY o_custkey"
        ).collect()
        assert [tuple(r)[:3] for r in a] == [tuple(r)[:3] for r in b]
        assert len(a) > 0

    def test_requires_order_by(self, db):
        import pytest as _pytest

        from warpdb_spark.errors import ValidationError

        with _pytest.raises(ValidationError, match="requires ORDER BY"):
            db.query_sql(
                "SELECT DISTINCT ON (o_custkey) o_orderkey FROM orders"
            ).collect()

    def test_order_by_must_lead_with_on_exprs(self, db):
        import pytest as _pytest

        from warpdb_spark.errors import ValidationError

        with _pytest.raises(ValidationError, match="must match initial ORDER BY"):
            db.query_sql(
                "SELECT DISTINCT ON (o_custkey) o_orderkey FROM orders "
                "ORDER BY o_orderkey"
            ).collect()

    def test_select_windows_see_pre_distinct_frame(self, db):
        # Postgres/DuckDB: select-list window functions evaluate over
        # ALL rows BEFORE the DISTINCT ON filter (review finding —
        # recomputing over the survivors returned the group count)
        rows = db.query_sql(
            "SELECT DISTINCT ON (o_orderpriority) o_orderpriority, "
            "count(*) OVER () AS total FROM orders "
            "ORDER BY o_orderpriority, o_orderkey"
        ).collect()
        n_orders = db.query_sql("SELECT count(*) AS n FROM orders").collect()[0]["n"]
        n_priorities = len(rows)
        assert n_orders > n_priorities
        for r in rows:
            assert r["total"] == n_orders  # NOT n_priorities

    def test_multi_key_and_expression(self, db):
        rows = db.query_sql(
            "SELECT DISTINCT ON (o_orderpriority, o_custkey % 10) "
            "o_orderpriority, o_custkey % 10 AS bucket, o_orderkey "
            "FROM orders "
            "ORDER BY o_orderpriority, o_custkey % 10, o_orderkey DESC"
        ).collect()
        seen = set()
        for r in rows:
            key = (r["o_orderpriority"], r["bucket"])
            assert key not in seen
            seen.add(key)


class TestIgnoreNulls:
    """func(args) IGNORE|RESPECT NULLS OVER (...) (superset): ANSI null
    treatment for lag/lead/first_value/last_value."""

    def test_lag_ignore_nulls_skips_to_last_observation(self, db):
        rows = db.query_sql(
            "SELECT o_orderkey AS k, "
            "lag(CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_totalprice END) "
            "IGNORE NULLS OVER (ORDER BY o_orderkey) AS prev "
            "FROM orders ORDER BY o_orderkey LIMIT 50"
        ).collect()
        last_obs = None
        for r in rows:
            assert r["prev"] == last_obs
            if r["k"] % 2 != 0:
                last_obs = db.query_sql(
                    f"SELECT o_totalprice AS p FROM orders WHERE o_orderkey = {r['k']}"
                ).collect()[0]["p"]

    def test_respect_nulls_is_default(self, db):
        a = db.query_sql(
            "SELECT first_value(o_totalprice) RESPECT NULLS "
            "OVER (ORDER BY o_orderkey) AS v FROM orders ORDER BY o_orderkey LIMIT 5"
        ).collect()
        b = db.query_sql(
            "SELECT first_value(o_totalprice) "
            "OVER (ORDER BY o_orderkey) AS v FROM orders ORDER BY o_orderkey LIMIT 5"
        ).collect()
        assert [r["v"] for r in a] == [r["v"] for r in b]

    def test_ignore_nulls_requires_over(self, db):
        import pytest as _pytest

        from warpdb_spark.errors import ParseError

        with _pytest.raises(ParseError, match="requires an OVER clause"):
            db.query_sql("SELECT lag(o_orderkey) IGNORE NULLS FROM orders").collect()

    def test_ignore_nulls_unsupported_function(self, db):
        import pytest as _pytest

        from warpdb_spark.errors import ValidationError

        with _pytest.raises(ValidationError, match="only supported for"):
            db.query_sql(
                "SELECT row_number() IGNORE NULLS OVER (ORDER BY o_orderkey) "
                "FROM orders"
            ).collect()


class TestAnsiFetchAndBoolAggs:
    def test_fetch_first_equals_limit(self, db):
        a = db.query_sql(
            "SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey "
            "FETCH FIRST 7 ROWS ONLY"
        ).collect()
        b = db.query_sql(
            "SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey LIMIT 7"
        ).collect()
        assert a == b and len(a) == 7

    def test_offset_rows_fetch_next(self, db):
        a = db.query_sql(
            "SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey "
            "OFFSET 3 ROWS FETCH NEXT 4 ROWS ONLY"
        ).collect()
        b = db.query_sql(
            "SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey "
            "LIMIT 4 OFFSET 3"
        ).collect()
        assert a == b and len(a) == 4

    def test_bool_aggs_match_manual(self, db):
        rows = db.query_sql(
            "SELECT o_orderstatus AS st, bool_and(o_totalprice > 1000) AS all_big, "
            "bool_or(o_totalprice > 400000) AS any_huge, "
            "SUM(CASE WHEN o_totalprice > 1000 THEN 0 ELSE 1 END) AS n_small, "
            "SUM(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END) AS n_huge "
            "FROM orders GROUP BY o_orderstatus"
        ).collect()
        assert rows
        for r in rows:
            assert r["all_big"] == (r["n_small"] == 0)
            assert r["any_huge"] == (r["n_huge"] > 0)

    def test_bool_agg_as_window(self, db):
        rows = db.query_sql(
            "SELECT o_orderkey AS k, bool_or(o_totalprice > 400000) "
            "OVER (PARTITION BY o_orderstatus) AS grp_any FROM orders "
            "ORDER BY k LIMIT 5"
        ).collect()
        assert len(rows) == 5

    def test_fetch_requires_only(self, db):
        with pytest.raises(ParseError, match="Expected ONLY"):
            db.query_sql(
                "SELECT o_orderkey FROM orders ORDER BY o_orderkey "
                "FETCH FIRST 5 ROWS"
            )


class TestArrayAgg:
    def test_ordered_native_type(self, db):
        rows = db.query_sql(
            "SELECT o_orderstatus AS st, "
            "array_agg(o_totalprice ORDER BY o_totalprice DESC) AS prices "
            "FROM orders WHERE o_orderkey < 200 GROUP BY o_orderstatus"
        ).collect()
        assert rows
        for r in rows:
            vals = list(r["prices"])
            assert vals == sorted(vals, reverse=True)
            assert all(isinstance(v, float) for v in vals)

    def test_default_order_is_value(self, db):
        rows = db.query_sql(
            "SELECT array_agg(o_orderkey) AS ks FROM orders WHERE o_orderkey < 10"
        ).collect()
        assert list(rows[0]["ks"]) == sorted(rows[0]["ks"])

    def test_filter_clause(self, db):
        rows = db.query_sql(
            "SELECT array_agg(o_orderkey ORDER BY o_orderkey) "
            "FILTER (WHERE o_totalprice > 200000) AS ks "
            "FROM orders WHERE o_orderkey < 100"
        ).collect()
        manual = db.query_sql(
            "SELECT o_orderkey AS k FROM orders "
            "WHERE o_orderkey < 100 AND o_totalprice > 200000 ORDER BY o_orderkey"
        ).collect()
        assert list(rows[0]["ks"]) == [r["k"] for r in manual]


class TestBroadcastHint:
    def test_hint_forces_broadcast_plan(self, db):
        plan = (
            db.query_sql(
                "SELECT /*+ BROADCAST(customer) */ c_mktsegment AS seg, count(*) AS n "
                "FROM orders JOIN customer ON o_custkey = c_custkey "
                "GROUP BY c_mktsegment"
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_hint_results_equal_unhinted(self, db):
        a = db.query_sql(
            "SELECT /*+ BROADCAST(customer) */ c_mktsegment AS seg, count(*) AS n "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment ORDER BY seg"
        ).collect()
        b = db.query_sql(
            "SELECT c_mktsegment AS seg, count(*) AS n "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment ORDER BY seg"
        ).collect()
        assert a == b

    def test_alias_targeting_and_unknown_hint(self, db):
        rows = db.query_sql(
            "SELECT /*+ REPARTITION(8), BROADCASTJOIN(c) */ c.c_custkey AS k "
            "FROM orders JOIN customer c ON o_custkey = c.c_custkey "
            "ORDER BY k LIMIT 3"
        ).collect()
        assert len(rows) == 3

    def test_malformed_hint_is_parse_error(self, db):
        with pytest.raises(ParseError, match="Malformed optimizer hint"):
            db.query_sql("SELECT /*+ BROADCAST */ o_orderkey FROM orders")


class TestSelectStar:
    def test_star_expands_all_columns_in_order(self, db, spark, sf_dir):
        rows = db.query_sql(
            "SELECT * FROM orders WHERE o_orderkey < 5 ORDER BY o_orderkey"
        )
        raw = spark.read.parquet(f"{sf_dir}/orders.parquet")
        assert rows.columns == raw.columns
        assert rows.count() > 0

    def test_qualified_star_joins(self, db):
        rows = db.query_sql(
            "SELECT c.*, o_orderkey FROM orders JOIN customer c "
            "ON o_custkey = c.c_custkey WHERE o_orderkey < 5 ORDER BY o_orderkey"
        )
        assert rows.columns[-1] == "o_orderkey"
        assert rows.columns[0].startswith("c_")

    def test_star_with_grouping_requires_keys(self, db):
        from warpdb_spark.errors import ValidationError

        with pytest.raises(ValidationError, match="must appear in GROUP BY"):
            db.query_sql("SELECT * FROM orders GROUP BY o_orderstatus").collect()

    def test_unknown_table_star(self, db):
        from warpdb_spark.errors import ValidationError

        with pytest.raises(ValidationError, match="Unknown table: nosuch"):
            db.query_sql("SELECT nosuch.* FROM orders")


class TestGroupByAll:
    def test_equals_explicit_keys(self, db):
        a = db.query_sql(
            "SELECT o_orderstatus, o_orderpriority, count(*) AS n "
            "FROM orders GROUP BY ALL ORDER BY 1, 2"
        ).collect()
        b = db.query_sql(
            "SELECT o_orderstatus, o_orderpriority, count(*) AS n "
            "FROM orders GROUP BY o_orderstatus, o_orderpriority ORDER BY 1, 2"
        ).collect()
        assert a == b and len(a) > 0

    def test_aggregate_less_group_by_is_distinct(self, db):
        a = db.query_sql(
            "SELECT o_orderstatus FROM orders GROUP BY o_orderstatus ORDER BY 1"
        ).collect()
        b = db.query_sql(
            "SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus"
        ).collect()
        assert a == b

    def test_all_requires_nonaggregate_item(self, db):
        from warpdb_spark.errors import ValidationError

        with pytest.raises(ValidationError, match="non-aggregate select item"):
            db.query_sql("SELECT count(*) AS n FROM orders GROUP BY ALL").collect()


class TestOrderByAll:
    def test_equals_explicit_order(self, db):
        a = db.query_sql(
            "SELECT o_orderstatus AS s, o_orderpriority AS p FROM orders "
            "WHERE o_orderkey < 100 ORDER BY ALL"
        ).collect()
        b = db.query_sql(
            "SELECT o_orderstatus AS s, o_orderpriority AS p FROM orders "
            "WHERE o_orderkey < 100 ORDER BY s, p"
        ).collect()
        assert a == b and len(a) > 0

    def test_desc_direction(self, db):
        rows = db.query_sql(
            "SELECT o_orderstatus AS s FROM orders GROUP BY ALL ORDER BY ALL DESC"
        ).collect()
        vals = [r["s"] for r in rows]
        assert vals == sorted(vals, reverse=True)
