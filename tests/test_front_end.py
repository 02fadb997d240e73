"""Tokenizer/parser unit tests mirroring the reference's test suite
(SURVEY §5): tests/tokenizer_tests.cpp, tests/precedence_tests.cpp,
tests/expression_tests.cpp, tests/parsing_error_tests.cpp,
tests/tokenize_error_test.cpp, tests/parse_query_error_test.cpp,
tests/query_parser_test.cpp — asserted against our AST instead of CUDA
strings."""

import pytest

from warpdb_spark.errors import ParseError, TokenizeError
from warpdb_spark.plans import ast as A
from warpdb_spark.plans.parser import parse_expression, parse_query
from warpdb_spark.plans.tokenizer import tokenize


class TestTokenizer:
    def test_kinds_and_values(self):
        toks = tokenize("price + 3.5 >= quantity")
        assert [(t.kind, t.value) for t in toks[:-1]] == [
            ("IDENT", "price"),
            ("OP", "+"),
            ("NUMBER", "3.5"),
            ("OP", ">="),
            ("IDENT", "quantity"),
        ]

    def test_two_char_ops(self):
        toks = tokenize("a >= b <= c == d != e")
        ops = [t.value for t in toks if t.kind == "OP"]
        assert ops == [">=", "<=", "==", "!="]

    def test_keywords_case_insensitive(self):
        toks = tokenize("select PRICE from T where")
        assert toks[0].is_kw("SELECT")
        assert toks[1].kind == "IDENT"  # PRICE not a keyword
        assert toks[2].is_kw("FROM")
        assert toks[4].is_kw("WHERE")

    def test_qualified_identifier_single_token(self):
        # tokenizer accepts '.' inside identifiers (src/expression.cpp:48-54)
        toks = tokenize("sales.id = items.id")
        assert toks[0].value == "sales.id"
        assert toks[2].value == "items.id"

    def test_position_carrying_error(self):
        with pytest.raises(TokenizeError, match=r"Unknown character '#' at line 1 column 7"):
            tokenize("price # 1")

    def test_error_line_2(self):
        with pytest.raises(TokenizeError, match=r"line 2 column 3"):
            tokenize("price\n  & 5")


class TestExpressionParser:
    def test_precedence_mul_over_add(self):
        # tests/precedence_tests.cpp:5-19
        n = parse_expression("price + quantity * 2")
        assert isinstance(n, A.BinOp) and n.op == "+"
        assert isinstance(n.right, A.BinOp) and n.right.op == "*"

    def test_parentheses_override(self):
        n = parse_expression("(price + quantity) * 2")
        assert isinstance(n, A.BinOp) and n.op == "*"
        assert isinstance(n.left, A.BinOp) and n.left.op == "+"

    def test_equality_aliases(self):
        # '=' and '==' are both equality (src/expression.cpp:85-98)
        for src in ("price = 3", "price == 3"):
            n = parse_expression(src)
            assert isinstance(n, A.BinOp) and n.op == "=="

    def test_and_or_precedence(self):
        n = parse_expression("a > 1 AND b < 2 OR c == 3")
        assert n.op == "OR"
        assert n.left.op == "AND"

    def test_function_call(self):
        n = parse_expression("discount(price, 0.9)")
        assert isinstance(n, A.Func)
        assert n.name == "discount" and len(n.args) == 2

    def test_aggregate(self):
        n = parse_expression("SUM(price * quantity)")
        assert isinstance(n, A.Agg) and n.func == "SUM"
        assert isinstance(n.arg, A.BinOp)

    def test_window_over_parsed(self):
        n = parse_expression("SUM(price) OVER (PARTITION BY quantity ORDER BY price DESC)")
        assert isinstance(n, A.WindowFunc)
        assert len(n.spec.partition_by) == 1
        assert n.spec.order_by[0][1] is False

    def test_trailing_token_rejected(self):
        # "1 2" (tests/expression_tests.cpp:6-18)
        with pytest.raises(ParseError):
            parse_expression("1 2")

    def test_unbalanced_paren(self):
        with pytest.raises(ParseError):
            parse_expression("(price + 5")

    def test_superset_predicates(self):
        assert isinstance(parse_expression("price BETWEEN 1 AND 5"), A.Between)
        assert isinstance(parse_expression("quantity IN (1, 2, 3)"), A.InList)
        assert isinstance(parse_expression("name LIKE 'a%'"), A.Like)
        assert isinstance(parse_expression("price IS NOT NULL"), A.IsNull)
        assert isinstance(parse_expression("NOT price > 1"), A.Not)
        assert isinstance(parse_expression("-price"), A.Neg)
        assert isinstance(
            parse_expression("CASE WHEN price > 1 THEN 1 ELSE 0 END"), A.Case
        )


class TestQueryParser:
    def test_kitchen_sink_shape(self):
        # tests/query_parser_test.cpp:6-15
        q = parse_query(
            "SELECT price, SUM(quantity) FROM sales JOIN items ON sales.id = items.id "
            "WHERE price > 10 GROUP BY price ORDER BY price DESC LIMIT 5"
        )
        assert len(q.select_items) == 2
        assert q.from_table == "sales"
        assert q.joins[0].table == "items"
        assert q.where is not None
        assert len(q.group_by) == 1
        assert q.order_by[0][1] is False
        assert q.limit == 5

    def test_missing_from(self):
        with pytest.raises(ParseError, match="Expected keyword FROM"):
            parse_query("SELECT price")

    def test_trailing_tokens(self):
        # NB: `FROM test EXTRA` is a bare table alias (ANSI), not a
        # trailing token — trail after a complete clause instead
        with pytest.raises(ParseError, match="Unexpected token after query"):
            parse_query("SELECT price FROM test LIMIT 1 EXTRA")

    def test_bare_alias_is_not_trailing(self):
        q = parse_query("SELECT price FROM test t")
        assert (q.from_table, q.from_alias) == ("test", "t")

    def test_limit_offset_both_orders(self):
        q1 = parse_query("SELECT price FROM t LIMIT 2 OFFSET 1")
        q2 = parse_query("SELECT price FROM t OFFSET 1 LIMIT 2")
        assert (q1.limit, q1.offset) == (2, 1) == (q2.limit, q2.offset)

    def test_distinct_and_having(self):
        q = parse_query(
            "SELECT DISTINCT quantity FROM test GROUP BY quantity HAVING COUNT(price) > 1"
        )
        assert q.distinct and q.having is not None

    def test_set_ops(self):
        q = parse_query("SELECT price FROM a UNION ALL SELECT price FROM b")
        assert isinstance(q, A.SetOp) and q.op == "union_all"


class TestSimpleCaseAndIlike:
    """Simple-form CASE (desugars to searched equality) and ILIKE
    (case-insensitive LIKE), both matching DuckDB semantics."""

    def test_simple_case_desugars(self):
        q = parse_query(
            "SELECT CASE quantity WHEN 3 THEN 'three' ELSE 'other' END AS c FROM t"
        )
        item = q.select_items[0][0]
        cond = item.whens[0][0]
        assert cond.op == "==" and cond.right.value == 3

    def test_ilike_parses_and_negates(self):
        q = parse_query("SELECT price FROM t WHERE name NOT ILIKE 'AbC%'")
        like = q.where
        assert like.ci and like.negated and like.pattern == "AbC%"

    def test_ilike_executes_case_insensitively(self, spark):
        from warpdb_spark.api import WarpDB

        df = spark.createDataFrame(
            [("Alpha",), ("BETA",), ("gamma",)], ["name"]
        )
        db = WarpDB.__new__(WarpDB)  # attach-only shell
        db.spark = spark
        db.tables = {"t": df}
        db.registry = None
        got = {r["name"] for r in db.query_sql(
            "SELECT name FROM t WHERE name ILIKE '%a%'"
        ).collect()}
        assert got == {"Alpha", "BETA", "gamma"}


class TestComments:
    """SQL comments (superset): -- line and /* block */. Without these,
    `SELECT 1 --2` silently parsed as double negation (= 3) where SQL
    means `SELECT 1`."""

    def test_line_comment_skipped(self):
        toks = [t.value for t in tokenize("SELECT 1 -- trailing words\n + 2 FROM t")]
        assert toks[:6] == ["SELECT", "1", "+", "2", "FROM", "t"]

    def test_line_comment_is_not_double_negation(self):
        q = parse_query("SELECT price --2\n FROM t")
        assert q.select_items[0][0].text() == "price"

    def test_block_comment_spanning_lines(self):
        toks = [t.value for t in tokenize("SELECT /* pick\n this */ price FROM t")]
        assert toks[:4] == ["SELECT", "price", "FROM", "t"]

    def test_spaced_double_minus_still_negates(self):
        e = parse_expression("- -price")
        assert isinstance(e, A.Neg) and isinstance(e.operand, A.Neg)

    def test_unterminated_block_comment(self):
        with pytest.raises(TokenizeError, match="Unterminated block comment"):
            tokenize("SELECT price /* oops FROM t")

    def test_position_tracking_after_block_comment(self):
        # errors after a multi-line comment must still carry the right line
        with pytest.raises(ParseError) as ei:
            parse_query("SELECT /* a\nb */ FROM t")
        assert "FROM" in str(ei.value)


class TestJsonArrow:
    def test_arrow_desugars_to_get_json_object(self):
        e = parse_expression("props ->> 'k'")
        assert isinstance(e, A.Func) and e.name == "GET_JSON_OBJECT"
        assert e.args[1].value == "$.k"

    def test_chained_arrows_nest(self):
        e = parse_expression("props ->> 'a' ->> 'b'")
        assert isinstance(e, A.Func)
        assert isinstance(e.args[0], A.Func)

    def test_arrow_requires_string_key(self):
        with pytest.raises(ParseError, match="string literal key"):
            parse_expression("props ->> k")

    def test_arrow_binds_tighter_than_comparison(self):
        e = parse_expression("props ->> 'k' == '5'")
        assert isinstance(e, A.BinOp) and e.op == "=="
