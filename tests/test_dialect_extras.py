"""Round-4 dialect surfaces: SELECT * EXCLUDE/REPLACE, TRY_CAST, and
LIMIT/FETCH ... WITH TIES (all DuckDB-compatible spellings — the
inventory entries run the identical text in both engines)."""

import pytest
from pyspark.sql import Row

from warpdb_spark.api import WarpDB
from warpdb_spark.errors import ParseError, ValidationError


@pytest.fixture()
def tdb(spark):
    rows = [
        Row(a=1, b="x", c=5.0), Row(a=2, b="y", c=5.0), Row(a=3, b="3", c=2.0),
    ]
    return WarpDB(df=spark.createDataFrame(rows), table_name="t", spark=spark)


class TestStarModifiers:
    def test_exclude(self, tdb):
        out = tdb.query_sql("SELECT * EXCLUDE (b) FROM t ORDER BY a")
        assert out.columns == ["a", "c"]
        assert out.count() == 3

    def test_replace(self, tdb):
        out = tdb.query_sql("SELECT * REPLACE (c * 2 AS c) FROM t ORDER BY a")
        assert out.columns == ["a", "b", "c"]
        assert [r.c for r in out.collect()] == [10.0, 10.0, 4.0]

    def test_exclude_and_replace_compose(self, tdb):
        out = tdb.query_sql(
            "SELECT * EXCLUDE (b) REPLACE (a + 10 AS a) FROM t ORDER BY a"
        )
        assert out.columns == ["a", "c"]
        assert [r.a for r in out.collect()] == [11, 12, 13]

    def test_qualified_star_modifiers(self, tdb):
        out = tdb.query_sql("SELECT t.* EXCLUDE (c) FROM t ORDER BY a")
        assert out.columns == ["a", "b"]

    def test_unknown_exclude_column(self, tdb):
        with pytest.raises(ValidationError, match="Unknown column: zz in EXCLUDE"):
            tdb.query_sql("SELECT * EXCLUDE (zz) FROM t")

    def test_unknown_replace_column(self, tdb):
        with pytest.raises(ValidationError, match="Unknown column: zz in REPLACE"):
            tdb.query_sql("SELECT * REPLACE (1 AS zz) FROM t")

    def test_column_named_exclude_still_works(self, spark):
        db = WarpDB(
            df=spark.createDataFrame([Row(exclude=1)]), table_name="t", spark=spark
        )
        assert db.query_sql("SELECT exclude FROM t").first().exclude == 1


class TestTryCast:
    def test_failure_yields_null(self, tdb):
        out = tdb.query_sql("SELECT b, TRY_CAST(b AS INT) AS bi FROM t ORDER BY b")
        assert [(r.b, r.bi) for r in out.collect()] == [
            ("3", 3), ("x", None), ("y", None),
        ]

    def test_plain_cast_still_errors_under_ansi(self, tdb):
        import pyspark

        with pytest.raises(Exception):
            tdb.query_sql("SELECT CAST(b AS INT) AS bi FROM t").collect()

    def test_text_roundtrip(self):
        from warpdb_spark.plans.parser import parse_query

        ast = parse_query("SELECT TRY_CAST(b AS INT) AS x FROM t")
        assert "TRY_CAST(b AS INT)" in ast.select_items[0][0].text()


class TestWithTies:
    def test_limit_with_ties_keeps_boundary_ties(self, tdb):
        out = tdb.query_sql("SELECT a, c FROM t ORDER BY c DESC LIMIT 1 WITH TIES")
        assert sorted(r.a for r in out.collect()) == [1, 2]

    def test_fetch_with_ties(self, tdb):
        out = tdb.query_sql(
            "SELECT a, c FROM t ORDER BY c DESC FETCH FIRST 1 ROWS WITH TIES"
        )
        assert sorted(r.a for r in out.collect()) == [1, 2]

    def test_no_ties_at_boundary_is_plain_limit(self, tdb):
        out = tdb.query_sql("SELECT a, c FROM t ORDER BY c LIMIT 1 WITH TIES")
        assert [r.a for r in out.collect()] == [3]

    def test_on_setop_tail(self, tdb):
        out = tdb.query_sql(
            "SELECT a, c FROM t UNION ALL SELECT a, c FROM t "
            "ORDER BY c DESC LIMIT 1 WITH TIES"
        )
        assert sorted(r.a for r in out.collect()) == [1, 1, 2, 2]

    def test_requires_order_by(self, tdb):
        with pytest.raises(ValidationError, match="requires ORDER BY"):
            tdb.query_sql("SELECT a FROM t LIMIT 1 WITH TIES").collect()

    def test_rejects_offset(self, tdb):
        with pytest.raises(ValidationError, match="cannot be combined with OFFSET"):
            tdb.query_sql(
                "SELECT a FROM t ORDER BY a LIMIT 1 WITH TIES OFFSET 1"
            ).collect()


class TestStarModifierStrictness:
    """Round-4 self-review: DuckDB rejects these shapes, so identical
    text must not silently succeed here."""

    def test_exclude_everything_rejected(self, tdb):
        with pytest.raises(ValidationError, match="removes every column"):
            tdb.query_sql("SELECT * EXCLUDE (a, b, c) FROM t")

    def test_replace_of_excluded_rejected(self, tdb):
        with pytest.raises(ValidationError, match="also EXCLUDEd"):
            tdb.query_sql("SELECT * EXCLUDE (c) REPLACE (c * 2 AS c) FROM t")

    def test_duplicate_exclude_clause_rejected(self, tdb):
        with pytest.raises(ParseError, match="Duplicate EXCLUDE"):
            tdb.query_sql("SELECT * EXCLUDE (a) EXCLUDE (b) FROM t")

    def test_duplicate_exclude_name_rejected(self, tdb):
        with pytest.raises(ParseError, match="Duplicate column in EXCLUDE"):
            tdb.query_sql("SELECT * EXCLUDE (a, a) FROM t")

    def test_duplicate_replace_target_rejected(self, tdb):
        with pytest.raises(ParseError, match="Duplicate column in REPLACE"):
            tdb.query_sql("SELECT * REPLACE (a + 1 AS a, a + 2 AS a) FROM t")


class TestWithTiesNulls:
    def test_explicit_nulls_last_matches_duckdb_set(self, spark):
        """Nullable sort keys must spell NULLS placement explicitly (the
        dialect's ORDER BY stance) — then both engines return the same
        row set."""
        import duckdb

        db = WarpDB(
            df=spark.createDataFrame(
                [Row(a=1, c=None), Row(a=2, c=1.0), Row(a=3, c=1.0)]
            ),
            table_name="t",
            spark=spark,
        )
        out = db.query_sql(
            "SELECT a FROM t ORDER BY c ASC NULLS LAST LIMIT 1 WITH TIES"
        )
        assert sorted(r.a for r in out.collect()) == [2, 3]


class TestArrayJoinLiterals:
    def test_array_join_over_array_agg(self, spark):
        from pyspark.sql import Row
        from warpdb_spark.api import WarpDB

        db = WarpDB(
            df=spark.createDataFrame([Row(g=1, v=3), Row(g=1, v=1), Row(g=1, v=2)]),
            table_name="t", spark=spark,
        )
        r = db.query_sql(
            "SELECT g, array_join(array_agg(v ORDER BY v), '-') AS s FROM t GROUP BY g"
        ).first()
        assert r.s == "1-2-3"
        # DuckDB-name alias + 3-arg null replacement accepted
        r2 = db.query_sql(
            "SELECT array_to_string(array_agg(v ORDER BY v), ',', '?') AS s FROM t"
        ).first()
        assert r2.s == "1,2,3"

    def test_non_literal_separator_rejected(self, spark):
        import pytest
        from pyspark.sql import Row
        from warpdb_spark.api import WarpDB
        from warpdb_spark.errors import ValidationError

        db = WarpDB(
            df=spark.createDataFrame([Row(g=1, v=1)]), table_name="t", spark=spark
        )
        with pytest.raises(ValidationError, match="string-literal separator"):
            db.query_sql(
                "SELECT array_join(array_agg(v), g) AS s FROM t GROUP BY g"
            )


class TestPivot:
    @pytest.fixture()
    def pdb(self, spark):
        rows = [
            Row(k="a", st="O", v=10.0), Row(k="a", st="F", v=2.0),
            Row(k="b", st="O", v=1.0), Row(k="b", st="O", v=4.0),
        ]
        return WarpDB(df=spark.createDataFrame(rows), table_name="t", spark=spark)

    def test_basic_pivot_with_aliases_and_null_cell(self, pdb):
        got = {
            r["k"]: (r["o_tot"], r["f_tot"])
            for r in pdb.query_sql(
                "SELECT k, o_tot, f_tot FROM t "
                "PIVOT (SUM(v) FOR st IN ('O' AS o_tot, 'F' AS f_tot)) "
                "ORDER BY k"
            ).collect()
        }
        # b has no 'F' rows → NULL cell, the SQL PIVOT contract
        assert got == {"a": (10.0, 2.0), "b": (5.0, None)}

    def test_unaliased_values_name_columns_by_value(self, pdb):
        cols = pdb.query_sql(
            "SELECT * FROM t PIVOT (COUNT(*) FOR st IN ('O', 'F'))"
        ).columns
        assert cols == ["k", "v", "O", "F"]  # v not consumed → a key

    def test_implicit_keys_exclude_agg_inputs(self, pdb):
        # v is consumed by the aggregate → keys are exactly [k]
        rows = pdb.query_sql(
            "SELECT * FROM t PIVOT (SUM(v) FOR st IN ('O')) ORDER BY k"
        ).collect()
        assert [r["k"] for r in rows] == ["a", "b"]
        assert len(rows[0].asDict()) == 2  # k + one pivot column

    def test_pivot_over_derived_table_without_alias(self, pdb):
        rows = pdb.query_sql(
            "SELECT k, o FROM (SELECT k, st, v * 2 AS w FROM t) "
            "PIVOT (SUM(w) FOR st IN ('O' AS o)) ORDER BY k"
        ).collect()
        assert [(r["k"], r["o"]) for r in rows] == [("a", 20.0), ("b", 10.0)]

    def test_where_and_order_apply_after_pivot(self, pdb):
        rows = pdb.query_sql(
            "SELECT k FROM t PIVOT (SUM(v) FOR st IN ('O' AS o)) "
            "WHERE o > 6 ORDER BY k"
        ).collect()
        assert [r["k"] for r in rows] == ["a"]

    def test_bare_alias_named_pivot_still_works(self, pdb):
        # PIVOT is not a keyword: AS pivot aliases; pivot( pivots
        rows = pdb.query_sql("SELECT pivot.k FROM t AS pivot LIMIT 1").collect()
        assert rows[0]["k"] in ("a", "b")

    def test_errors_are_typed(self, pdb):
        with pytest.raises(ValidationError, match="Unknown column: nope in PIVOT"):
            pdb.query_sql("SELECT * FROM t PIVOT (SUM(v) FOR nope IN ('O'))")
        with pytest.raises(ValidationError, match="aggregate expression"):
            pdb.query_sql("SELECT * FROM t PIVOT (v FOR st IN ('O'))")
        with pytest.raises(ValidationError, match="literal"):
            pdb.query_sql("SELECT * FROM t PIVOT (SUM(v) FOR st IN (k))")
        with pytest.raises(ParseError, match="Expected FOR"):
            pdb.query_sql("SELECT * FROM t PIVOT (SUM(v) WHAT st IN ('O'))")
        with pytest.raises(ValidationError, match="no implicit grouping"):
            pdb.query_sql(
                "SELECT * FROM (SELECT st, v FROM t) PIVOT (SUM(v) FOR st IN ('O'))"
            )


class TestUnpivot:
    @pytest.fixture()
    def udb(self, spark):
        rows = [Row(k=1, a=10.0, b=None, c=3.0), Row(k=2, a=None, b=5.0, c=None)]
        return WarpDB(df=spark.createDataFrame(rows), table_name="t", spark=spark)

    def test_excludes_nulls_by_default_and_relabels(self, udb):
        rows = udb.query_sql(
            "SELECT k, m, v FROM t UNPIVOT (v FOR m IN (a, b AS bee, c)) "
            "ORDER BY k, m"
        ).collect()
        assert [(r["k"], r["m"], r["v"]) for r in rows] == [
            (1, "a", 10.0), (1, "c", 3.0), (2, "bee", 5.0)
        ]

    def test_include_nulls(self, udb):
        rows = udb.query_sql(
            "SELECT k, m, v FROM t UNPIVOT INCLUDE NULLS (v FOR m IN (a, b)) "
            "ORDER BY k, m"
        ).collect()
        assert len(rows) == 4
        assert sum(1 for r in rows if r["v"] is None) == 2

    def test_remaining_columns_are_ids(self, udb):
        cols = udb.query_sql(
            "SELECT * FROM t UNPIVOT (v FOR m IN (b))"
        ).columns
        assert cols == ["k", "a", "c", "m", "v"]

    def test_errors_are_typed(self, udb):
        with pytest.raises(ValidationError, match="Unknown column: zz in UNPIVOT"):
            udb.query_sql("SELECT * FROM t UNPIVOT (v FOR m IN (zz))")
        with pytest.raises(ValidationError, match="Duplicate column"):
            udb.query_sql("SELECT * FROM t UNPIVOT (v FOR m IN (a, a))")
        with pytest.raises(ValidationError, match="collides"):
            udb.query_sql("SELECT * FROM t UNPIVOT (k FOR m IN (a))")
        with pytest.raises(ParseError, match="Expected NULLS"):
            udb.query_sql("SELECT * FROM t UNPIVOT EXCLUDE NADA (v FOR m IN (a))")

    def test_incompatible_types_are_validation_error(self, spark):
        db = WarpDB(
            df=spark.createDataFrame([Row(k=1, a=1.0, s="x")]),
            table_name="t",
            spark=spark,
        )
        with pytest.raises(ValidationError, match="no common type"):
            db.query_sql("SELECT * FROM t UNPIVOT (v FOR m IN (a, s))")

    def test_unpivot_as_bare_alias_still_works(self, udb):
        rows = udb.query_sql("SELECT unpivot.k FROM t AS unpivot LIMIT 1").collect()
        assert rows[0]["k"] in (1, 2)


class TestUnpivotMultiMeasure:
    """Multi-measure UNPIVOT (r10): ((v1, v2) FOR name IN ((c1, c2)
    AS label, ...)) — each IN tuple emits one row with BOTH measures;
    EXCLUDE NULLS drops a row only when ALL its measures are NULL."""

    @pytest.fixture()
    def mdb(self, spark):
        rows = [
            Row(k=1, p1=10.0, q1=1.0, p2=None, q2=4.0),
            Row(k=2, p1=None, q1=None, p2=7.0, q2=8.0),
        ]
        return WarpDB(df=spark.createDataFrame(rows), table_name="t", spark=spark)

    def test_tuples_labels_and_all_null_exclusion(self, mdb):
        rows = mdb.query_sql(
            "SELECT k, m, p, q FROM t "
            "UNPIVOT ((p, q) FOR m IN ((p1, q1) AS first, (p2, q2) AS second)) "
            "ORDER BY k, m"
        ).collect()
        # k=1 second tuple has p2 NULL but q2=4.0 -> kept (partial null);
        # k=2 first tuple is all-NULL -> dropped
        assert [(r["k"], r["m"], r["p"], r["q"]) for r in rows] == [
            (1, "first", 10.0, 1.0),
            (1, "second", None, 4.0),
            (2, "second", 7.0, 8.0),
        ]

    def test_include_nulls_and_default_label(self, mdb):
        rows = mdb.query_sql(
            "SELECT k, m, p, q FROM t "
            "UNPIVOT INCLUDE NULLS ((p, q) FOR m IN ((p1, q1), (p2, q2))) "
            "ORDER BY k, m"
        ).collect()
        assert len(rows) == 4  # the all-NULL tuple row survives
        assert {r["m"] for r in rows} == {"p1_q1", "p2_q2"}  # "_"-joined

    def test_position_wise_type_coercion(self, spark):
        db = WarpDB(
            df=spark.createDataFrame([Row(k=1, a=1.5, b=2, c=3.5, d=4)]),
            table_name="t",
            spark=spark,
        )
        rows = db.query_sql(
            "SELECT m, x, y FROM t "
            "UNPIVOT ((x, y) FOR m IN ((a, b) AS ab, (c, d) AS cd)) "
            "ORDER BY m"
        ).collect()
        assert [(r["x"], r["y"]) for r in rows] == [(1.5, 2), (3.5, 4)]

    def test_melted_column_name_is_reusable_for_output(self, mdb):
        """A melted source column is consumed by the unpivot and absent
        from the output, so reusing its name for a value/name output
        column is legal (ANSI / Spark SQL semantics) — only collisions
        with the SURVIVING id columns are errors (r10 advice)."""
        rows = mdb.query_sql(
            "SELECT k, p1, q FROM t "
            "UNPIVOT ((p1, q) FOR m IN ((p1, q1) AS first, (p2, q2) AS second)) "
            "ORDER BY k, m"
        ).collect()
        assert [(r["k"], r["p1"], r["q"]) for r in rows] == [
            (1, 10.0, 1.0),
            (1, None, 4.0),
            (2, 7.0, 8.0),
        ]

    def test_errors_are_typed(self, mdb, spark):
        with pytest.raises(ValidationError, match="1 column"):
            mdb.query_sql(
                "SELECT * FROM t UNPIVOT ((p, q) FOR m IN ((p1) AS only))"
            )
        with pytest.raises(ValidationError, match="single column"):
            mdb.query_sql("SELECT * FROM t UNPIVOT (v FOR m IN ((p1, q1)))")
        with pytest.raises(ValidationError, match="Duplicate value column"):
            mdb.query_sql("SELECT * FROM t UNPIVOT ((p, p) FOR m IN ((p1, q1)))")
        with pytest.raises(ValidationError, match="Unknown column: zz"):
            mdb.query_sql("SELECT * FROM t UNPIVOT ((p, q) FOR m IN ((zz, q1)))")
        with pytest.raises(ValidationError, match="collides"):
            mdb.query_sql("SELECT * FROM t UNPIVOT ((k, q) FOR m IN ((p1, q1)))")
        db = WarpDB(
            df=spark.createDataFrame([Row(k=1, a=1.0, s="x", b=2.0, t="y")]),
            table_name="u",
            spark=spark,
        )
        with pytest.raises(ValidationError, match="no common type"):
            db.query_sql(
                "SELECT * FROM u UNPIVOT ((x, y) FOR m IN ((a, b), (s, t)))"
            )


class TestValuesTable:
    def test_values_with_named_columns(self, tdb):
        rows = tdb.query_sql(
            "SELECT a, b FROM (VALUES (1, 'x'), (2, 'y')) AS v(a, b) ORDER BY a"
        ).collect()
        assert [(r["a"], r["b"]) for r in rows] == [(1, "x"), (2, "y")]

    def test_default_column_names_and_type_widening(self, tdb):
        rows = tdb.query_sql(
            "SELECT col1 FROM (VALUES (1), (2.5)) v ORDER BY col1"
        ).collect()
        assert [r["col1"] for r in rows] == [1.0, 2.5]  # int widened

    def test_join_against_base_table(self, tdb):
        rows = tdb.query_sql(
            "SELECT t.a, names.nm FROM t "
            "JOIN (VALUES (1, 'one'), (3, 'three')) AS names(id, nm) "
            "ON t.a = names.id ORDER BY t.a"
        ).collect()
        assert [(r["a"], r["nm"]) for r in rows] == [(1, "one"), (3, "three")]

    def test_single_partition_plan(self, tdb):
        df = tdb.query_sql("SELECT a FROM (VALUES (1), (2)) v(a)")
        assert df.rdd.getNumPartitions() <= 2  # one per literal row

    def test_errors_are_typed(self, tdb):
        with pytest.raises(ValidationError, match="differ in arity"):
            tdb.query_sql("SELECT * FROM (VALUES (1, 2), (3)) v")
        with pytest.raises(ValidationError, match="Unknown column: a in VALUES"):
            tdb.query_sql("SELECT * FROM (VALUES (a)) v")
        with pytest.raises(ValidationError, match="names 2 columns"):
            tdb.query_sql("SELECT * FROM (VALUES (1)) v(x, y)")
        with pytest.raises(ValidationError, match="Duplicate column name"):
            tdb.query_sql("SELECT * FROM (VALUES (1, 2)) v(x, x)")


class TestPivotUnpivotCollisions:
    """r9 session-2 review: output-name collisions previously surfaced
    as untyped AMBIGUOUS_REFERENCE AnalysisExceptions downstream."""

    def test_pivot_alias_colliding_with_key_is_typed(self, spark):
        db = WarpDB(
            df=spark.createDataFrame([Row(k=1, st="O", v=1.0)]),
            table_name="t",
            spark=spark,
        )
        with pytest.raises(ValidationError, match="collides"):
            db.query_sql("SELECT * FROM t PIVOT (SUM(v) FOR st IN ('O' AS k))")
        with pytest.raises(ValidationError, match="Duplicate value"):
            db.query_sql("SELECT * FROM t PIVOT (SUM(v) FOR st IN ('O', 'O'))")

    def test_unpivot_name_equals_value_is_typed(self, spark):
        db = WarpDB(
            df=spark.createDataFrame([Row(k=1, a=1.0)]),
            table_name="t",
            spark=spark,
        )
        with pytest.raises(ValidationError, match="must differ"):
            db.query_sql("SELECT * FROM t UNPIVOT (m FOR m IN (a))")
