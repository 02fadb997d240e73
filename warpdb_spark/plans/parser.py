"""Recursive-descent parser for the WarpDB dialect.

Grammar from the reference (src/expression.cpp):

- expression precedence OR < AND < comparison < additive <
  multiplicative < factor (parse_logical_or/and :169-190,
  parse_comparison :156-166, parse_expression_internal/term/factor
  :144-235; pinned by tests/precedence_tests.cpp:5-19);
- ``=`` and ``==`` are both equality (src/expression.cpp:85-98);
- function calls ``name(arg, ...)`` (:210-223); SUM/AVG/COUNT/MIN/MAX
  become aggregation nodes (:296-337); ``OVER`` after an aggregate makes
  a window function (:301-327 — the reference discards the OVER body,
  we parse it fully);
- query grammar ``SELECT [DISTINCT] item[, ...] FROM t [JOIN t2 ON c]*
  [WHERE c] [GROUP BY k[, ...]] [HAVING c] [ORDER BY e [ASC|DESC]]
  [LIMIT n] [OFFSET n]`` (:270-531), with trailing-token rejection
  (tests/parse_query_error_test.cpp:7-17).

Supersets (SURVEY §2.2/§2.5/§2.7): NOT, unary minus, BETWEEN, IN, LIKE,
IS NULL, CASE, string literals, AS aliases, join types, multi-column
ORDER BY, ranking/analytic window functions with frames, UNION /
INTERSECT / EXCEPT.
"""

from __future__ import annotations

from warpdb_spark.errors import ParseError
from warpdb_spark.plans import ast as A
from warpdb_spark.plans.tokenizer import (
    EOF,
    HINT,
    IDENT,
    KEYWORD,
    NUMBER,
    OP,
    STRING,
    Token,
    tokenize,
)

_WINDOW_ONLY_FUNCS = {
    "ROW_NUMBER", "RANK", "DENSE_RANK", "NTILE", "LAG", "LEAD",
    "FIRST_VALUE", "LAST_VALUE", "PERCENT_RANK", "CUME_DIST",
}

_CMP_OPS = {">", "<", ">=", "<=", "==", "!=", "="}


class _Parser:
    def __init__(self, tokens: list[Token]):
        self.tokens = tokens
        self.pos = 0
        # /*+ ... */ is only meaningful immediately after SELECT; in any
        # other position engines treat a hint-shaped comment as a plain
        # comment. peek/next skip HINT tokens transparently unless
        # parse_select flips this while reading the post-SELECT run.
        self._hint_mode = False

    # -- token helpers -------------------------------------------------
    def _skip_hints(self, i: int) -> int:
        if not self._hint_mode:
            while i < len(self.tokens) - 1 and self.tokens[i].kind == HINT:
                i += 1
        return i

    def peek(self, ahead: int = 0) -> Token:
        i = self._skip_hints(self.pos)
        for _ in range(ahead):
            if self.tokens[i].kind == EOF:
                break
            i = self._skip_hints(i + 1)
        return self.tokens[min(i, len(self.tokens) - 1)]

    def next(self) -> Token:
        self.pos = self._skip_hints(self.pos)
        tok = self.tokens[self.pos]
        if tok.kind != EOF:
            self.pos += 1
        return tok

    def accept_op(self, *ops: str) -> Token | None:
        tok = self.peek()
        if tok.kind == OP and tok.value in ops:
            return self.next()
        return None

    def accept_kw(self, *names: str) -> Token | None:
        tok = self.peek()
        if tok.kind == KEYWORD and tok.value in names:
            return self.next()
        return None

    def expect_op(self, op: str) -> Token:
        tok = self.next()
        if tok.kind != OP or tok.value != op:
            raise ParseError(f"Expected '{op}' but found '{tok.value or 'end of input'}'")
        return tok

    def expect_kw(self, name: str) -> Token:
        tok = self.next()
        if not (tok.kind == KEYWORD and tok.value == name):
            raise ParseError(f"Expected keyword {name}")
        return tok

    def expect_ident(self, what: str = "identifier") -> str:
        tok = self.next()
        if tok.kind != IDENT:
            raise ParseError(f"Expected {what} but found '{tok.value or 'end of input'}'")
        return tok.value

    def expect_int(self, clause: str) -> int:
        tok = self.next()
        if tok.kind != NUMBER or "." in tok.value:
            raise ParseError(f"Expected integer after {clause}")
        return int(tok.value)

    # -- expressions ---------------------------------------------------
    def parse_expr(self) -> A.Node:
        return self.parse_or()

    def parse_or(self) -> A.Node:
        node = self.parse_and()
        while self.accept_kw("OR"):
            node = A.BinOp("OR", node, self.parse_and())
        return node

    def parse_and(self) -> A.Node:
        node = self.parse_not()
        while self.accept_kw("AND"):
            node = A.BinOp("AND", node, self.parse_not())
        return node

    def parse_not(self) -> A.Node:
        if self.accept_kw("NOT"):
            return A.Not(self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self) -> A.Node:
        node = self.parse_additive()
        tok = self.peek()
        if tok.kind == OP and tok.value in _CMP_OPS:
            self.next()
            op = "==" if tok.value == "=" else tok.value
            return A.BinOp(op, node, self.parse_additive())
        negated = False
        if tok.is_kw("NOT") and self.peek(1).is_kw("BETWEEN", "IN", "LIKE", "ILIKE"):
            self.next()
            negated = True
            tok = self.peek()
        if tok.is_kw("BETWEEN"):
            self.next()
            low = self.parse_additive()
            self.expect_kw("AND")
            high = self.parse_additive()
            return A.Between(node, low, high, negated)
        if tok.is_kw("IN"):
            self.next()
            self.expect_op("(")
            if self.peek().is_kw("SELECT", "WITH"):
                sub = self.parse_query_node()
                self.expect_op(")")
                return A.InSubquery(node, sub, negated)
            items = [self.parse_additive()]
            while self.accept_op(","):
                items.append(self.parse_additive())
            self.expect_op(")")
            return A.InList(node, items, negated)
        if tok.is_kw("LIKE", "ILIKE"):
            self.next()
            pat = self.next()
            if pat.kind != STRING:
                raise ParseError(f"Expected string pattern after {tok.value}")
            return A.Like(node, pat.value, negated, tok.value == "ILIKE")
        if tok.is_kw("IS"):
            self.next()
            neg = bool(self.accept_kw("NOT"))
            self.expect_kw("NULL")
            return A.IsNull(node, neg)
        return node

    def parse_additive(self) -> A.Node:
        node = self.parse_term()
        while True:
            tok = self.accept_op("+", "-")
            if not tok:
                return node
            node = A.BinOp(tok.value, node, self.parse_term())

    def parse_term(self) -> A.Node:
        node = self.parse_factor()
        while True:
            tok = self.accept_op("*", "/", "%")
            if not tok:
                return node
            node = A.BinOp(tok.value, node, self.parse_factor())

    def parse_factor(self) -> A.Node:
        node = self._parse_factor_atom()
        # postfix JSON text extraction: expr ->> 'key' (superset;
        # Postgres/DuckDB) — desugars to get_json_object(expr, '$.key'),
        # chainable for nested objects
        while self.accept_op("->>"):
            key = self.next()
            if key.kind != STRING:
                raise ParseError("->> requires a string literal key")
            node = A.Func("GET_JSON_OBJECT", [node, A.Str("$." + key.value)])
        return node

    def _parse_factor_atom(self) -> A.Node:
        tok = self.peek()
        if tok.kind == OP and tok.value == "-":
            self.next()
            return A.Neg(self.parse_factor())
        if tok.kind == OP and tok.value == "(":
            self.next()
            if self.peek().is_kw("SELECT", "WITH"):
                sub = self.parse_query_node()
                self.expect_op(")")
                return A.ScalarSubquery(sub)
            node = self.parse_expr()
            self.expect_op(")")
            return node
        if tok.is_kw("EXISTS"):
            self.next()
            self.expect_op("(")
            sub = self.parse_query_node()
            self.expect_op(")")
            return A.Exists(sub)
        if tok.kind == NUMBER:
            self.next()
            return A.Num(float(tok.value) if "." in tok.value else int(tok.value))
        if tok.kind == STRING:
            self.next()
            return A.Str(tok.value)
        if tok.is_kw("NULL"):
            self.next()
            return A.Null()
        if tok.is_kw("TRUE", "FALSE"):
            self.next()
            return A.Bool(tok.value == "TRUE")
        if tok.is_kw("CASE"):
            return self.parse_case()
        if tok.kind == IDENT:
            self.next()
            # ANSI typed literals: TIMESTAMP '...' / DATE '...' /
            # INTERVAL '...' (superset)
            if tok.value.upper() in ("TIMESTAMP", "DATE", "INTERVAL") and self.peek().kind == STRING:
                return A.TypedLit(tok.value.lower(), self.next().value)
            if self.peek().kind == OP and self.peek().value == "(":
                return self.parse_call(tok.value)
            return A.Var(tok.value)
        raise ParseError(f"Unexpected token '{tok.value or 'end of input'}'")

    def parse_case(self) -> A.Node:
        self.expect_kw("CASE")
        # simple form: CASE operand WHEN value THEN ... — desugars to
        # the searched form with equality conditions (ANSI)
        operand = None
        if not self.peek().is_kw("WHEN"):
            operand = self.parse_expr()
        whens: list[tuple[A.Node, A.Node]] = []
        while self.accept_kw("WHEN"):
            cond = self.parse_expr()
            if operand is not None:
                cond = A.BinOp("==", operand, cond)
            self.expect_kw("THEN")
            whens.append((cond, self.parse_expr()))
        if not whens:
            raise ParseError("Expected WHEN after CASE")
        else_value = self.parse_expr() if self.accept_kw("ELSE") else None
        self.expect_kw("END")
        return A.Case(whens, else_value)

    _CAST_TYPES = {
        "INT": "int", "INTEGER": "int", "BIGINT": "long", "LONG": "long",
        "SMALLINT": "short", "TINYINT": "byte", "FLOAT": "float",
        "REAL": "float", "DOUBLE": "double", "VARCHAR": "string",
        "STRING": "string", "TEXT": "string", "TIMESTAMP": "timestamp",
        "DATE": "date", "BOOLEAN": "boolean", "BOOL": "boolean",
        "DECIMAL": "decimal(38,18)", "NUMERIC": "decimal(38,18)",
        "CHAR": "string",
    }
    # CAST targets that accept a (p[,s]) / (n) suffix
    _PARAM_CAST_TYPES = {"DECIMAL", "NUMERIC", "VARCHAR", "CHAR"}

    def _parse_cast_type(self) -> str:
        t = self.next()
        word = t.value.upper()
        tname = self._CAST_TYPES.get(word)
        if tname is None:
            raise ParseError(f"Unknown CAST target type: {t.value}")
        if self.peek().kind == OP and self.peek().value == "(":
            if word not in self._PARAM_CAST_TYPES:
                raise ParseError(f"CAST type {word} takes no parameters")
            self.next()
            params: list[int] = []
            while True:
                p = self.next()
                if p.kind != NUMBER or "." in p.value:
                    raise ParseError(
                        f"Expected integer type parameter in CAST, got {p.value!r}"
                    )
                params.append(int(p.value))
                if not self.accept_op(","):
                    break
            self.expect_op(")")
            if word in ("DECIMAL", "NUMERIC"):
                if len(params) > 2:
                    raise ParseError("DECIMAL takes at most (precision, scale)")
                prec = params[0]
                scale = params[1] if len(params) > 1 else 0
                tname = f"decimal({prec},{scale})"
            else:  # VARCHAR(n) / CHAR(n): Spark strings are unbounded
                if len(params) != 1:
                    raise ParseError(f"{word} takes exactly one length parameter")
        return tname

    def parse_call(self, name: str) -> A.Node:
        upper = name.upper()
        self.expect_op("(")
        if upper in ("CAST", "TRY_CAST"):
            operand = self.parse_expr()
            self.expect_kw("AS")
            tname = self._parse_cast_type()
            self.expect_op(")")
            return A.Cast(operand, tname, try_=upper == "TRY_CAST")
        if upper == "EXTRACT":
            # EXTRACT(field FROM expr) — ANSI special form (superset);
            # lowers to date_part(field, expr)
            field = self.next()
            if field.kind != IDENT:
                raise ParseError(f"Expected date field in EXTRACT, got {field.value!r}")
            self.expect_kw("FROM")
            operand = self.parse_expr()
            self.expect_op(")")
            return A.Func("date_part", [A.Str(field.value.upper()), operand])
        if upper == "STRING_AGG":
            return self._parse_string_agg()
        if upper == "ARRAY_AGG":
            return self._parse_array_agg()
        distinct = False
        args: list[A.Node] = []
        if self.accept_op("*"):
            args.append(A.Star())
        elif not (self.peek().kind == OP and self.peek().value == ")"):
            if upper in A.AGG_FUNCS and self.accept_kw("DISTINCT"):
                distinct = True
            args.append(self.parse_expr())
            while self.accept_op(","):
                args.append(self.parse_expr())
        self.expect_op(")")

        # ANSI null treatment: func(args) [IGNORE|RESPECT] NULLS OVER ...
        ignore_nulls = False
        if self.peek().kind == IDENT and self.peek().value.upper() in ("IGNORE", "RESPECT"):
            which = self.next().value.upper()
            nxt = self.next()
            if nxt.kind != IDENT or nxt.value.upper() != "NULLS":
                raise ParseError(f"Expected NULLS after {which}")
            ignore_nulls = which == "IGNORE"
            if not self.peek().is_kw("OVER"):
                raise ParseError(f"{which} NULLS requires an OVER clause")

        if self.peek().is_kw("OVER"):
            self.next()
            if self.peek().kind == IDENT:  # OVER w — named window (superset)
                return A.WindowFunc(upper, args, self.next().value, distinct, ignore_nulls)
            spec = self.parse_window_spec()
            return A.WindowFunc(upper, args, spec, distinct, ignore_nulls)
        if upper in _WINDOW_ONLY_FUNCS:
            raise ParseError(f"{upper} requires an OVER clause")
        filter_cond = self._parse_filter_clause()
        if upper in A.AGG_FUNCS:
            if len(args) != 1:
                raise ParseError(f"{upper} takes exactly one argument")
            return A.Agg(upper, args[0], distinct, filter_cond)
        if filter_cond is not None:
            raise ParseError("FILTER (WHERE ...) requires an aggregate function")
        return A.Func(name, args)

    def _parse_string_agg(self) -> A.Node:
        """STRING_AGG(expr, 'sep' [ORDER BY key [ASC|DESC]]) — the
        separator must be a string literal (it becomes the array_join
        delimiter)."""
        arg = self.parse_expr()
        self.expect_op(",")
        sep_tok = self.next()
        if sep_tok.kind != STRING:
            raise ParseError("STRING_AGG separator must be a string literal")
        order_key, key_asc = None, True
        if self.accept_kw("ORDER"):
            self.expect_kw("BY")
            order_key, key_asc = self.parse_order_item()
            if not isinstance(key_asc, bool):
                # values are non-null by construction (nulls skipped),
                # so NULLS placement has nothing to order
                raise ParseError("NULLS FIRST/LAST is not supported in STRING_AGG")
        self.expect_op(")")
        filter_cond = self._parse_filter_clause()
        return A.StringAgg(
            "STRING_AGG", arg, False, filter_cond,
            sep=sep_tok.value, order_key=order_key, key_asc=key_asc,
        )

    def _parse_array_agg(self) -> A.Node:
        """ARRAY_AGG(expr [ORDER BY key [ASC|DESC]]) — ordered array
        collection, native element type, nulls skipped."""
        arg = self.parse_expr()
        order_key, key_asc = None, True
        if self.accept_kw("ORDER"):
            self.expect_kw("BY")
            order_key, key_asc = self.parse_order_item()
            if not isinstance(key_asc, bool):
                raise ParseError("NULLS FIRST/LAST is not supported in ARRAY_AGG")
        self.expect_op(")")
        filter_cond = self._parse_filter_clause()
        return A.ArrayAgg(
            "ARRAY_AGG", arg, False, filter_cond,
            order_key=order_key, key_asc=key_asc,
        )

    def _parse_filter_clause(self):
        """ANSI ``FILTER (WHERE cond)`` after an aggregate call.
        FILTER stays a plain identifier — only the ``FILTER (`` shape
        triggers the clause, so columns named filter keep working."""
        tok = self.peek()
        if (
            tok.kind == IDENT
            and tok.value.upper() == "FILTER"
            and self.peek(1).kind == OP
            and self.peek(1).value == "("
        ):
            self.next()
            self.expect_op("(")
            self.expect_kw("WHERE")
            cond = self.parse_expr()
            self.expect_op(")")
            return cond
        return None

    def parse_window_spec(self) -> A.WindowSpec:
        self.expect_op("(")
        spec = A.WindowSpec()
        if self.accept_kw("PARTITION"):
            self.expect_kw("BY")
            spec.partition_by.append(self.parse_expr())
            while self.accept_op(","):
                spec.partition_by.append(self.parse_expr())
        if self.accept_kw("ORDER"):
            self.expect_kw("BY")
            spec.order_by.append(self.parse_order_item())
            while self.accept_op(","):
                spec.order_by.append(self.parse_order_item())
        kw = self.accept_kw("ROWS", "RANGE")
        if kw:
            self.expect_kw("BETWEEN")
            start = self.parse_frame_bound()
            self.expect_kw("AND")
            end = self.parse_frame_bound()
            spec.frame = (kw.value, start, end)
        self.expect_op(")")
        return spec

    def parse_frame_bound(self):
        if self.accept_kw("UNBOUNDED"):
            tok = self.next()
            if tok.value == "PRECEDING":
                return "unbounded_preceding"
            if tok.value == "FOLLOWING":
                return "unbounded_following"
            raise ParseError("Expected PRECEDING or FOLLOWING after UNBOUNDED")
        if self.accept_kw("CURRENT"):
            self.expect_kw("ROW")
            return "current"
        tok = self.next()
        # INTERVAL '...' PRECEDING/FOLLOWING (event-time RANGE frames,
        # superset) — compiled to a micros offset over the ORDER BY
        # timestamp by the compiler
        if (
            tok.kind == IDENT
            and tok.value.upper() == "INTERVAL"
            and self.peek().kind == STRING
        ):
            value = self.next().value
            tok2 = self.next()
            if tok2.value == "PRECEDING":
                return ("interval", "-", value)
            if tok2.value == "FOLLOWING":
                return ("interval", "+", value)
            raise ParseError("Expected PRECEDING or FOLLOWING after INTERVAL bound")
        if tok.kind != NUMBER:
            raise ParseError("Expected frame bound")
        n = int(tok.value)
        tok = self.next()
        if tok.value == "PRECEDING":
            return -n
        if tok.value == "FOLLOWING":
            return n
        raise ParseError("Expected PRECEDING or FOLLOWING")

    def parse_order_item(self):
        """Returns (expr, direction): direction is True (ASC) / False
        (DESC), or an explicit Column-method name for ``NULLS
        FIRST/LAST`` variants (e.g. 'asc_nulls_last') — engines
        disagree on the default (Spark ASC puts NULLS FIRST, DuckDB
        NULLS LAST), so the explicit forms are the portable spelling."""
        expr = self.parse_expr()
        asc = not self.accept_kw("DESC")
        if asc:
            self.accept_kw("ASC")
        nulls = None
        tok = self.peek()
        if tok.kind == IDENT and tok.value.upper() == "NULLS":
            self.next()
            pos = self.next()
            if pos.kind != IDENT or pos.value.upper() not in ("FIRST", "LAST"):
                raise ParseError("Expected FIRST or LAST after NULLS")
            nulls = pos.value.lower()
        if nulls is None:
            return expr, asc
        return expr, f"{'asc' if asc else 'desc'}_nulls_{nulls}"

    # -- queries -------------------------------------------------------
    def parse_select(self, in_setop: bool = False) -> A.QueryAST:
        self.expect_kw("SELECT")
        q = A.QueryAST()
        # /*+ HINT(args) ... */ right after SELECT (superset). Only
        # BROADCAST/BROADCASTJOIN/MAPJOIN are acted on; other hint
        # names are accepted and ignored (standard engine behavior) —
        # a malformed hint body is a ParseError, not a silent no-op.
        self._hint_mode = True
        while self.peek().kind == HINT:
            body = self.next().value
            import re as _re

            pos = 0
            for m in _re.finditer(r"(\w+)\s*\(([^)]*)\)\s*,?\s*", body):
                if m.start() != pos:
                    raise ParseError(f"Malformed optimizer hint: {body!r}")
                pos = m.end()
                if m.group(1).upper() in ("BROADCAST", "BROADCASTJOIN", "MAPJOIN"):
                    q.broadcast_hints.extend(
                        t.strip() for t in m.group(2).split(",") if t.strip()
                    )
            if pos != len(body):
                raise ParseError(f"Malformed optimizer hint: {body!r}")
        self._hint_mode = False
        q.distinct = bool(self.accept_kw("DISTINCT"))
        if q.distinct and self.accept_kw("ON"):
            # DISTINCT ON (a, b) (superset; Postgres/DuckDB) — a
            # first-row-per-group operator, not row-level DISTINCT
            q.distinct = False
            self.expect_op("(")
            q.distinct_on.append(self.parse_expr())
            while self.accept_op(","):
                q.distinct_on.append(self.parse_expr())
            self.expect_op(")")
        q.select_items.append(self.parse_select_item())
        while self.accept_op(","):
            q.select_items.append(self.parse_select_item())
        self.expect_kw("FROM")
        q.from_subquery, q.from_table, q.from_alias = self.parse_table_ref("FROM")
        if (
            self.peek().kind == IDENT
            and self.peek().value.upper() == "PIVOT"
            and self.peek(1).kind == OP
            and self.peek(1).value == "("
        ):
            self.next()
            q.pivot = self.parse_pivot_clause()
        elif self.peek().kind == IDENT and self.peek().value.upper() == "UNPIVOT":
            self.next()
            q.unpivot = self.parse_unpivot_clause()

        while True:
            how = None
            if self.accept_kw("JOIN"):
                how = "inner"
            elif self.peek().is_kw("INNER", "LEFT", "RIGHT", "FULL", "SEMI", "ANTI", "CROSS"):
                kw = self.next().value
                self.accept_kw("OUTER")
                self.expect_kw("JOIN")
                how = {
                    "INNER": "inner", "LEFT": "left", "RIGHT": "right",
                    "FULL": "full", "SEMI": "left_semi", "ANTI": "left_anti",
                    "CROSS": "cross",
                }[kw]
            if how is None:
                break
            sub, table, alias = self.parse_table_ref("JOIN")
            cond = None
            if how != "cross":
                self.expect_kw("ON")
                cond = self.parse_expr()
            q.joins.append(A.JoinClause(table, cond, how, sub, alias))

        if self.accept_kw("WHERE"):
            q.where = self.parse_expr()
        if self.accept_kw("GROUP"):
            self.expect_kw("BY")
            nxt = self.peek()
            head = nxt.value.upper() if nxt.kind == IDENT else None
            if self.accept_kw("ALL"):
                # GROUP BY ALL (superset; DuckDB) — keys resolved from
                # the select list by the builder
                q.group_by_all = True
            elif head in ("ROLLUP", "CUBE") and self.peek(1).kind == OP and self.peek(1).value == "(":
                # GROUP BY ROLLUP(a, b) / CUBE(a, b) (superset)
                self.next()
                q.group_mode = head.lower()
                self.expect_op("(")
                q.group_by.append(self.parse_expr())
                while self.accept_op(","):
                    q.group_by.append(self.parse_expr())
                self.expect_op(")")
            elif (
                head == "GROUPING"
                and self.peek(1).kind == IDENT
                and self.peek(1).value.upper() == "SETS"
            ):
                # GROUP BY GROUPING SETS ((a, b), (a), ()) (superset);
                # group_by becomes the ordered union of all set members
                self.next()
                self.next()
                q.group_mode = "sets"
                self.expect_op("(")
                while True:
                    self.expect_op("(")
                    s: list[A.Node] = []
                    if not (self.peek().kind == OP and self.peek().value == ")"):
                        s.append(self.parse_expr())
                        while self.accept_op(","):
                            s.append(self.parse_expr())
                    self.expect_op(")")
                    q.grouping_sets.append(s)
                    if not self.accept_op(","):
                        break
                self.expect_op(")")
                seen: dict[str, A.Node] = {}
                for s in q.grouping_sets:
                    for e in s:
                        seen.setdefault(e.text(), e)
                q.group_by = list(seen.values())
            else:
                q.group_by.append(self.parse_expr())
                while self.accept_op(","):
                    q.group_by.append(self.parse_expr())
        if self.accept_kw("HAVING"):
            q.having = self.parse_expr()
        if self.accept_kw("WINDOW"):
            # WINDOW w AS (spec) [, ...] — named windows (superset)
            while True:
                name = self.expect_ident("window name after WINDOW")
                self.expect_kw("AS")
                q.windows[name] = self.parse_window_spec()
                if not self.accept_op(","):
                    break
        if self.accept_kw("QUALIFY"):
            # post-window filter (superset): evaluated against the
            # pre-QUALIFY frame, i.e. window functions see all rows
            q.qualify = self.parse_expr()
        if in_setop:
            # ORDER BY/LIMIT/OFFSET after a set-op operand bind to the
            # combined result (ANSI) — left for parse_query_node
            return q
        if self.accept_kw("ORDER"):
            self.expect_kw("BY")
            if self.accept_kw("ALL"):
                # ORDER BY ALL [ASC|DESC] (superset; DuckDB) — resolved
                # to the select items by the builder
                q.order_by_all = True
                if self.accept_kw("DESC"):
                    q.order_by_all_asc = False
                else:
                    self.accept_kw("ASC")
            else:
                q.order_by.append(self.parse_order_item())
                while self.accept_op(","):
                    q.order_by.append(self.parse_order_item())
        # reference grammar parses LIMIT then OFFSET
        # (src/expression.cpp:497-522); accept either order. OFFSET may
        # carry the ANSI ROW/ROWS noise word.
        for _ in range(2):
            if q.limit is None and self.accept_kw("LIMIT"):
                q.limit = self.expect_int("LIMIT")
                q.limit_with_ties = self._accept_with_ties()
            if q.offset is None and self.accept_kw("OFFSET"):
                q.offset = self.expect_int("OFFSET")
                self._accept_rows_word()
        # ANSI spelling: FETCH FIRST|NEXT n ROWS ONLY (superset)
        if q.limit is None and self.accept_kw("FETCH"):
            which = self.next()
            if which.kind != IDENT or which.value.upper() not in ("FIRST", "NEXT"):
                raise ParseError("Expected FIRST or NEXT after FETCH")
            q.limit = self.expect_int("FETCH")
            if not self._accept_rows_word():
                raise ParseError("Expected ROW or ROWS in FETCH clause")
            if self._accept_with_ties():
                q.limit_with_ties = True
            else:
                only = self.next()
                if only.kind != IDENT or only.value.upper() != "ONLY":
                    raise ParseError("Expected ONLY or WITH TIES in FETCH clause")
        return q

    def _accept_with_ties(self) -> bool:
        """``WITH TIES`` after LIMIT n / FETCH ... ROWS (superset;
        ANSI/DuckDB) — rows tying the boundary on the ORDER BY keys are
        kept."""
        if self.peek().is_kw("WITH") and (
            self.peek(1).kind == IDENT and self.peek(1).value.upper() == "TIES"
        ):
            self.next()
            self.next()
            return True
        return False

    def _accept_rows_word(self) -> bool:
        # ROW/ROWS are KEYWORD tokens (window-frame grammar)
        if self.peek().is_kw("ROW", "ROWS"):
            self.next()
            return True
        return False

    def _parse_star_modifiers(self, star: "A.Star") -> "A.Star":
        """DuckDB-style ``* EXCLUDE (a, b)`` / ``* REPLACE (expr AS c)``
        star modifiers (superset). EXCLUDE/REPLACE stay plain
        identifiers — only the ``NAME (`` shape right after a star
        triggers the clause, so columns with those names keep working."""
        while True:
            tok = self.peek()
            if (
                tok.kind == IDENT
                and tok.value.upper() in ("EXCLUDE", "REPLACE")
                and self.peek(1).kind == OP
                and self.peek(1).value == "("
            ):
                kind = self.next().value.upper()
                if (kind == "EXCLUDE" and star.exclude) or (
                    kind == "REPLACE" and star.replace
                ):
                    raise ParseError(f"Duplicate {kind} clause after *")
                self.expect_op("(")
                if kind == "EXCLUDE":
                    star.exclude.append(self.expect_ident("column name in EXCLUDE"))
                    while self.accept_op(","):
                        star.exclude.append(self.expect_ident("column name in EXCLUDE"))
                    dupes = [c for i, c in enumerate(star.exclude) if c in star.exclude[:i]]
                    if dupes:
                        raise ParseError(f"Duplicate column in EXCLUDE: {dupes[0]}")
                else:
                    while True:
                        expr = self.parse_expr()
                        self.expect_kw("AS")
                        name = self.expect_ident("column name in REPLACE")
                        if any(n == name for _, n in star.replace):
                            raise ParseError(f"Duplicate column in REPLACE: {name}")
                        star.replace.append((expr, name))
                        if not self.accept_op(","):
                            break
                self.expect_op(")")
                continue
            return star

    def parse_table_ref(self, clause: str):
        """``name [[AS] alias]`` or ``(SELECT ...) [AS] alias`` (derived
        table — superset; the reference only parses bare identifiers,
        src/expression.cpp:363-372). Returns (subquery|None, name,
        alias|None); for a derived table the name IS the alias."""
        tok = self.peek()
        if tok.kind == OP and tok.value == "(":
            self.next()
            if self.peek().kind == IDENT and self.peek().value.upper() == "VALUES":
                # (VALUES (e, ...), ...) [AS] v[(c1, ...)] — inline
                # literal table (superset; VALUES is not a keyword, so
                # a table named values stays legal — in table position
                # it is never followed by '(' without this meaning)
                self.next()
                rows: list[list[A.Node]] = []
                while True:
                    self.expect_op("(")
                    row = [self.parse_expr()]
                    while self.accept_op(","):
                        row.append(self.parse_expr())
                    self.expect_op(")")
                    rows.append(row)
                    if not self.accept_op(","):
                        break
                self.expect_op(")")
                self.accept_kw("AS")
                alias = self.expect_ident(f"alias for VALUES table in {clause}")
                col_names = None
                if self.peek().kind == OP and self.peek().value == "(":
                    self.next()
                    col_names = [self.expect_ident("column name in VALUES alias")]
                    while self.accept_op(","):
                        col_names.append(
                            self.expect_ident("column name in VALUES alias")
                        )
                    self.expect_op(")")
                return A.ValuesTable(rows, col_names), alias, None
            sub = self.parse_query_node()
            self.expect_op(")")
            self.accept_kw("AS")
            nxt = self.peek()
            if nxt.kind == IDENT and nxt.value.upper() in ("PIVOT", "UNPIVOT") and (
                (self.peek(1).kind == OP and self.peek(1).value == "(")
                or (nxt.value.upper() == "UNPIVOT" and self.peek(1).kind == IDENT
                    and self.peek(1).value.upper() in ("INCLUDE", "EXCLUDE"))
            ):
                # FROM (SELECT ...) [UN]PIVOT (...): the pivot output
                # is the frame, so the usually-mandatory derived-table
                # alias is optional (Spark SQL/DuckDB agree)
                return sub, "_pivot_src", None
            return sub, self.expect_ident(f"alias for derived table in {clause}"), None
        name = self.expect_ident(f"table name after {clause}")
        if self.peek().kind == OP and self.peek().value == "(":
            # table-valued function: FROM split_ngrams(documents.text, 2)
            # (superset; reference call syntax generalized to table
            # position, src/expression.cpp:210-223)
            self.next()
            args: list[A.Node] = []
            if not (self.peek().kind == OP and self.peek().value == ")"):
                args.append(self.parse_expr())
                while self.accept_op(","):
                    args.append(self.parse_expr())
            self.expect_op(")")
            alias = None
            if self.accept_kw("AS"):
                alias = self.expect_ident(f"alias after AS in {clause}")
            elif self.peek().kind == IDENT:
                alias = self.next().value
            tfc = A.TableFuncCall(name.lower(), args)
            return tfc, alias or name.lower(), None
        alias = None
        if self.accept_kw("AS"):
            alias = self.expect_ident(f"alias after AS in {clause}")
        elif self.peek().kind == IDENT and not (
            self.peek().value.upper() in ("PIVOT", "UNPIVOT")
            and (
                (self.peek(1).kind == OP and self.peek(1).value == "(")
                or (
                    self.peek().value.upper() == "UNPIVOT"
                    and self.peek(1).kind == IDENT
                    and self.peek(1).value.upper() in ("INCLUDE", "EXCLUDE")
                )
            )
        ):
            # bare alias: FROM edges e — unambiguous, every clause that
            # can follow a table ref starts with a keyword or operator
            # (PIVOT is deliberately NOT a keyword — a column named
            # pivot stays legal — so the one ambiguous spelling,
            # ``FROM t PIVOT (``, is carved out of the bare-alias rule;
            # ``FROM t AS pivot`` still aliases)
            alias = self.next().value
        return None, name, alias

    def parse_pivot_clause(self) -> "A.PivotClause":
        """``PIVOT (agg FOR col IN (value [AS alias], ...))`` — caller
        has already consumed the PIVOT identifier."""
        self.expect_op("(")
        agg = self.parse_expr()
        nxt = self.peek()
        if not (nxt.kind == IDENT and nxt.value.upper() == "FOR"):
            raise ParseError(
                f"Expected FOR after PIVOT aggregate at {nxt.line}:{nxt.column}"
            )
        self.next()
        col = self.expect_ident("pivot column after FOR")
        self.expect_kw("IN")
        self.expect_op("(")
        values: list[tuple[A.Node, str | None]] = []
        while True:
            v = self.parse_expr()
            alias = None
            if self.accept_kw("AS"):
                alias = self.expect_ident("alias in PIVOT IN list")
            values.append((v, alias))
            if not self.accept_op(","):
                break
        self.expect_op(")")
        self.expect_op(")")
        return A.PivotClause(agg, col, values)

    def parse_unpivot_clause(self) -> "A.UnpivotClause":
        """``UNPIVOT [INCLUDE NULLS | EXCLUDE NULLS] (value_col FOR
        name_col IN (col [AS label], ...))`` — caller has consumed the
        UNPIVOT identifier. Multi-measure form (Spark SQL/ANSI):
        ``((v1, v2) FOR name IN ((c1, c2) [AS label], ...))`` — a
        parenthesized ident tuple in value or IN position; arity is
        validated by the builder where it can name both sides."""
        include_nulls = False
        nxt = self.peek()
        if nxt.kind == IDENT and nxt.value.upper() in ("INCLUDE", "EXCLUDE"):
            include_nulls = self.next().value.upper() == "INCLUDE"
            marker = self.peek()
            if not (marker.kind == IDENT and marker.value.upper() == "NULLS"):
                raise ParseError(
                    f"Expected NULLS after {nxt.value.upper()} in UNPIVOT "
                    f"at {marker.line}:{marker.column}"
                )
            self.next()
        self.expect_op("(")
        # multi-measure form: (v1, v2, ...) FOR name IN ((c1, c2), ...)
        value_col: "str | list[str]"
        if self.peek().kind == OP and self.peek().value == "(":
            self.next()
            vlist = [self.expect_ident("value column in UNPIVOT")]
            while self.accept_op(","):
                vlist.append(self.expect_ident("value column in UNPIVOT"))
            self.expect_op(")")
            value_col = vlist
        else:
            value_col = self.expect_ident("value column in UNPIVOT")
        nxt = self.peek()
        if not (nxt.kind == IDENT and nxt.value.upper() == "FOR"):
            raise ParseError(
                f"Expected FOR after UNPIVOT value column at {nxt.line}:{nxt.column}"
            )
        self.next()
        name_col = self.expect_ident("name column after FOR")
        self.expect_kw("IN")
        self.expect_op("(")
        cols: list[tuple["str | list[str]", str | None]] = []
        while True:
            c: "str | list[str]"
            if self.peek().kind == OP and self.peek().value == "(":
                self.next()
                clist = [self.expect_ident("column in UNPIVOT IN list")]
                while self.accept_op(","):
                    clist.append(self.expect_ident("column in UNPIVOT IN list"))
                self.expect_op(")")
                c = clist
            else:
                c = self.expect_ident("column in UNPIVOT IN list")
            alias = None
            if self.accept_kw("AS"):
                alias = self.next()
                if alias.kind == STRING:
                    alias = alias.value
                elif alias.kind == IDENT:
                    alias = alias.value
                else:
                    raise ParseError(
                        "Expected label after AS in UNPIVOT IN list at "
                        f"{alias.line}:{alias.column}"
                    )
            cols.append((c, alias))
            if not self.accept_op(","):
                break
        self.expect_op(")")
        self.expect_op(")")
        return A.UnpivotClause(value_col, name_col, cols, include_nulls)

    def parse_select_item(self) -> tuple[A.Node, str | None]:
        # SELECT * / SELECT t.* (superset) — no alias allowed
        tok = self.peek()
        if tok.kind == OP and tok.value == "*":
            self.next()
            return self._parse_star_modifiers(A.Star()), None
        if (
            tok.kind == IDENT
            and tok.value.endswith(".")
            and self.peek(1).kind == OP
            and self.peek(1).value == "*"
        ):
            self.next()
            self.next()
            return self._parse_star_modifiers(A.Star(tok.value[:-1])), None
        expr = self.parse_expr()
        if self.accept_kw("AS"):
            return expr, self.expect_ident("alias after AS")
        tok = self.peek()
        if tok.kind == IDENT:  # bare alias: SELECT price p
            self.next()
            return expr, tok.value
        return expr, None

    def parse_intersect_chain(self, first: bool):
        """One set-op operand: a SELECT plus any INTERSECT [ALL] chain —
        INTERSECT binds tighter than UNION/EXCEPT (ANSI precedence, as
        DuckDB and Spark SQL resolve it). Returns (node, chained)."""
        node: A.QueryAST | A.SetOp = self.parse_select(in_setop=not first)
        chained = False
        while self.peek().is_kw("INTERSECT"):
            self.next()
            op = "intersect_all" if self.accept_kw("ALL") else "intersect"
            if (
                first
                and not chained
                and (node.order_by or node.limit is not None or node.offset is not None)
            ):
                raise ParseError(
                    "ORDER BY/LIMIT/OFFSET must follow the last query of a set operation"
                )
            chained = True
            node = A.SetOp(op, node, self.parse_select(in_setop=True))
        return node, chained

    def parse_query_node(self):
        if self.accept_kw("WITH"):
            recursive = bool(self.accept_kw("RECURSIVE"))
            ctes: list[tuple[str, object]] = []
            while True:
                name = self.expect_ident("CTE name after WITH")
                self.expect_kw("AS")
                self.expect_op("(")
                ctes.append((name, self.parse_query_node()))
                self.expect_op(")")
                if not self.accept_op(","):
                    break
            return A.WithQuery(ctes, self.parse_query_node(), recursive)
        node, is_setop = self.parse_intersect_chain(first=True)
        while True:
            tok = self.peek()
            if tok.is_kw("UNION"):
                self.next()
                op = "union_all" if self.accept_kw("ALL") else "union"
            elif tok.is_kw("EXCEPT"):
                self.next()
                op = "except_all" if self.accept_kw("ALL") else "except"
            else:
                break
            if not is_setop and (node.order_by or node.limit is not None or node.offset is not None):
                raise ParseError(
                    "ORDER BY/LIMIT/OFFSET must follow the last query of a set operation"
                )
            is_setop = True
            right, _ = self.parse_intersect_chain(first=False)
            node = A.SetOp(op, node, right)
        if is_setop:
            if self.accept_kw("ORDER"):
                self.expect_kw("BY")
                node.order_by.append(self.parse_order_item())
                while self.accept_op(","):
                    node.order_by.append(self.parse_order_item())
            for _ in range(2):
                if node.limit is None and self.accept_kw("LIMIT"):
                    node.limit = self.expect_int("LIMIT")
                    node.limit_with_ties = self._accept_with_ties()
                if node.offset is None and self.accept_kw("OFFSET"):
                    node.offset = self.expect_int("OFFSET")
        return node


def parse_expression(text: str) -> A.Node:
    """Parse a bare expression; rejects trailing tokens (the reference's
    ``"1 2"`` case, tests/expression_tests.cpp:6-18)."""
    p = _Parser(tokenize(text))
    node = p.parse_expr()
    tok = p.peek()
    if tok.kind != EOF:
        raise ParseError(f"Unexpected token '{tok.value}' after expression")
    return node


def parse_query(text: str):
    """Parse a full SELECT (or set-op chain); rejects trailing tokens
    (tests/parse_query_error_test.cpp:7-17)."""
    p = _Parser(tokenize(text))
    node = p.parse_query_node()
    tok = p.peek()
    if tok.kind != EOF:
        raise ParseError(f"Unexpected token after query: '{tok.value}'")
    return node
