"""Logical IR for the WarpDB dialect.

The reference's IR layers (SURVEY §3): token stream → expression AST
(Constant/Variable/BinaryOp/FunctionCall/Aggregation/WindowFunction,
include/expression.hpp:20-121) → clause-level QueryAST
(include/expression.hpp:132-143). We keep the same two levels; instead
of stringifying to CUDA (``to_cuda_expr``, include/expression.hpp:32-78)
the compiler emits PySpark Columns and Catalyst does the codegen.

Every node renders a canonical text via ``text()`` (used for
substitution during grouped compilation) and a column-name-safe alias
via ``auto_alias()``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

_OP_WORDS = {
    "+": "add",
    "-": "sub",
    "*": "mul",
    "/": "div",
    ">": "gt",
    "<": "lt",
    ">=": "ge",
    "<=": "le",
    "==": "eq",
    "!=": "ne",
    "AND": "and",
    "OR": "or",
}


def _safe(name: str) -> str:
    out = []
    for ch in name.lower():
        out.append(ch if ch.isalnum() else "_")
    s = "".join(out)
    while "__" in s:
        s = s.replace("__", "_")
    return s.strip("_") or "expr"


class Node:
    def text(self) -> str:
        raise NotImplementedError

    def auto_alias(self) -> str:
        return _safe(self.text())

    def children(self) -> list["Node"]:
        return []

    def walk(self):
        yield self
        for c in self.children():
            yield from c.walk()


@dataclass
class Num(Node):
    value: float | int

    def text(self) -> str:
        return repr(self.value)


@dataclass
class Str(Node):
    value: str

    def text(self) -> str:
        return f"'{self.value}'"


@dataclass
class Bool(Node):
    value: bool

    def text(self) -> str:
        return "TRUE" if self.value else "FALSE"


@dataclass
class TypedLit(Node):
    """ANSI typed literal: ``TIMESTAMP '...'``, ``DATE '...'``,
    ``INTERVAL '...'`` (superset — the reference grammar has untyped
    literals only, src/expression.cpp)."""

    kind: str  # "timestamp" | "date" | "interval"
    value: str

    def text(self) -> str:
        return f"{self.kind.upper()} '{self.value}'"


@dataclass
class Null(Node):
    def text(self) -> str:
        return "NULL"


@dataclass
class Var(Node):
    name: str  # may be qualified: "orders.o_orderkey"

    def text(self) -> str:
        return self.name

    def auto_alias(self) -> str:
        return self.name.split(".")[-1]


@dataclass
class Star(Node):
    """``*`` — inside COUNT(*), or as a select item (superset:
    ``SELECT *`` / ``SELECT t.*``, expanded by the builder to the
    in-scope columns in declaration order)."""

    table: str | None = None  # qualified star: t.*
    # SELECT * EXCLUDE (a, b) / REPLACE (expr AS col) (superset; DuckDB)
    exclude: list = field(default_factory=list)  # column names to drop
    replace: list = field(default_factory=list)  # (expr, col-name) pairs

    def text(self) -> str:
        base = f"{self.table}.*" if self.table else "*"
        if self.exclude:
            base += f" EXCLUDE ({', '.join(self.exclude)})"
        if self.replace:
            base += (
                " REPLACE ("
                + ", ".join(f"{e.text()} AS {n}" for e, n in self.replace)
                + ")"
            )
        return base

    def children(self):
        return [e for e, _ in self.replace]

    def auto_alias(self) -> str:
        return "*"


@dataclass
class BinOp(Node):
    op: str  # + - * / > < >= <= == != AND OR
    left: Node
    right: Node

    def text(self) -> str:
        return f"({self.left.text()} {self.op} {self.right.text()})"

    def auto_alias(self) -> str:
        word = _OP_WORDS.get(self.op, _safe(self.op))
        return f"{word}_{_safe(self.left.text())}_{_safe(self.right.text())}"

    def children(self):
        return [self.left, self.right]


@dataclass
class Not(Node):
    operand: Node

    def text(self) -> str:
        return f"(NOT {self.operand.text()})"

    def children(self):
        return [self.operand]


@dataclass
class Neg(Node):
    operand: Node

    def text(self) -> str:
        return f"(- {self.operand.text()})"

    def children(self):
        return [self.operand]


@dataclass
class Between(Node):
    operand: Node
    low: Node
    high: Node
    negated: bool = False

    def text(self) -> str:
        neg = "NOT " if self.negated else ""
        return f"({self.operand.text()} {neg}BETWEEN {self.low.text()} AND {self.high.text()})"

    def children(self):
        return [self.operand, self.low, self.high]


@dataclass
class InList(Node):
    operand: Node
    items: list[Node]
    negated: bool = False

    def text(self) -> str:
        neg = "NOT " if self.negated else ""
        inner = ", ".join(i.text() for i in self.items)
        return f"({self.operand.text()} {neg}IN ({inner}))"

    def children(self):
        return [self.operand, *self.items]


@dataclass
class Like(Node):
    operand: Node
    pattern: str
    negated: bool = False
    # ILIKE: case-insensitive match (superset)
    ci: bool = False

    def text(self) -> str:
        neg = "NOT " if self.negated else ""
        kw = "ILIKE" if self.ci else "LIKE"
        return f"({self.operand.text()} {neg}{kw} '{self.pattern}')"

    def children(self):
        return [self.operand]


@dataclass
class IsNull(Node):
    operand: Node
    negated: bool = False

    def text(self) -> str:
        neg = "NOT " if self.negated else ""
        return f"({self.operand.text()} IS {neg}NULL)"

    def children(self):
        return [self.operand]


@dataclass
class Case(Node):
    # list of (condition, value); else_value may be None
    whens: list[tuple[Node, Node]]
    else_value: Node | None = None

    def text(self) -> str:
        parts = ["CASE"]
        for c, v in self.whens:
            parts.append(f"WHEN {c.text()} THEN {v.text()}")
        if self.else_value is not None:
            parts.append(f"ELSE {self.else_value.text()}")
        parts.append("END")
        return "(" + " ".join(parts) + ")"

    def auto_alias(self) -> str:
        return "case_" + _safe(self.whens[0][0].text())

    def children(self):
        out = []
        for c, v in self.whens:
            out += [c, v]
        if self.else_value is not None:
            out.append(self.else_value)
        return out


@dataclass
class Func(Node):
    """Generic function-call node (src/expression.cpp:210-223,
    include/expression.hpp:64-80). Resolution order at compile time:
    UDF registry (the custom.cu analog) then pyspark.sql.functions."""

    name: str
    args: list[Node]

    def text(self) -> str:
        return f"{self.name.lower()}({', '.join(a.text() for a in self.args)})"

    def children(self):
        return list(self.args)


@dataclass
class Cast(Node):
    """CAST(expr AS type) — explicit typing (superset; the reference
    coerces everything to float32 instead, SURVEY §1.2)."""

    operand: Node
    type_name: str  # normalized lower-case spark type name
    # TRY_CAST (superset; DuckDB/Spark): NULL on failure instead of an
    # ANSI runtime error
    try_: bool = False

    def text(self) -> str:
        fn = "TRY_CAST" if self.try_ else "CAST"
        return f"{fn}({self.operand.text()} AS {self.type_name.upper()})"

    def auto_alias(self) -> str:
        return self.operand.auto_alias()

    def children(self):
        return [self.operand]


# GROUPING is aggregate-LIKE (computed in the agg, only legal under
# ROLLUP/CUBE/GROUPING SETS — the builder validates the mode and wires
# its argument to the pre-projected grouping column)
AGG_FUNCS = {"SUM", "AVG", "COUNT", "MIN", "MAX", "GROUPING", "BOOL_AND", "BOOL_OR"}


@dataclass
class Agg(Node):
    """SUM/AVG/COUNT/MIN/MAX over an arbitrary expression argument
    (include/expression.hpp:86, src/expression.cpp:296-337); plus the
    COUNT(*) / COUNT(DISTINCT x) supersets."""

    func: str  # upper-case
    arg: Node
    distinct: bool = False
    # ANSI FILTER (WHERE cond) — rows failing cond are excluded from
    # this aggregate only (superset)
    filter: "Node | None" = None

    def text(self) -> str:
        d = "DISTINCT " if self.distinct else ""
        base = f"{self.func}({d}{self.arg.text()})"
        if self.filter is not None:
            base += f" FILTER (WHERE {self.filter.text()})"
        return base

    def auto_alias(self) -> str:
        return f"{self.func.lower()}_{_safe(self.arg.text())}"

    def children(self):
        if self.filter is not None:
            return [self.arg, self.filter]
        return [self.arg]


@dataclass
class OrderedAgg(Agg):
    """Base for aggregates carrying an optional ``ORDER BY key`` —
    children() must include the order key so walk()/validate() see it
    (an unknown column in the ORDER BY must raise ValidationError, not
    a raw AnalysisException at build time)."""

    order_key: "Node | None" = None
    key_asc: bool = True

    def children(self):
        out = [self.arg]
        if self.order_key is not None:
            out.append(self.order_key)
        if self.filter is not None:
            out.append(self.filter)
        return out


@dataclass
class StringAgg(OrderedAgg):
    """``STRING_AGG(expr, 'sep' [ORDER BY key [ASC|DESC]])`` (superset)
    — ordered string concatenation. NULL values are skipped (ANSI);
    ties on the order key break deterministically by the element value
    (a superset guarantee — use a unique key for engine parity)."""

    sep: str = ","

    def text(self) -> str:
        base = f"STRING_AGG({self.arg.text()}, {self.sep!r}"
        if self.order_key is not None:
            base += f" ORDER BY {self.order_key.text()} {'ASC' if self.key_asc else 'DESC'}"
        base += ")"
        if self.filter is not None:
            base += f" FILTER (WHERE {self.filter.text()})"
        return base

    def auto_alias(self) -> str:
        return f"string_agg_{_safe(self.arg.text())}"


@dataclass
class ArrayAgg(OrderedAgg):
    """``ARRAY_AGG(expr [ORDER BY key [ASC|DESC]])`` (superset) —
    ordered array collection keeping the element's native type. NULL
    values are skipped (same contract as STRING_AGG — DuckDB's
    array_agg keeps NULLs, so oracles add FILTER (x IS NOT NULL));
    order-key ties break by element value."""

    def text(self) -> str:
        base = f"ARRAY_AGG({self.arg.text()}"
        if self.order_key is not None:
            base += f" ORDER BY {self.order_key.text()} {'ASC' if self.key_asc else 'DESC'}"
        base += ")"
        if self.filter is not None:
            base += f" FILTER (WHERE {self.filter.text()})"
        return base

    def auto_alias(self) -> str:
        return f"array_agg_{_safe(self.arg.text())}"


@dataclass
class WindowSpec:
    partition_by: list[Node] = field(default_factory=list)
    order_by: list[tuple[Node, bool]] = field(default_factory=list)  # (expr, asc)
    # frame: None or (kind, start, end); start/end are ints or
    # "unbounded"/"current"; negative = preceding.
    frame: tuple | None = None

    def text(self) -> str:
        parts = []
        if self.partition_by:
            parts.append("PARTITION BY " + ", ".join(p.text() for p in self.partition_by))
        if self.order_by:
            parts.append(
                "ORDER BY "
                + ", ".join(f"{e.text()} {'ASC' if asc else 'DESC'}" for e, asc in self.order_by)
            )
        if self.frame:
            parts.append(f"{self.frame[0]} BETWEEN {self.frame[1]} AND {self.frame[2]}")
        return " ".join(parts)


@dataclass
class WindowFunc(Node):
    """``AGG(expr) OVER (...)`` — the reference parses this shape but
    discards the OVER body and never executes it
    (include/expression.hpp:112-121, src/expression.cpp:301-327); here
    the clause body is honored, plus ranking/analytic supersets
    (ROW_NUMBER/RANK/DENSE_RANK/NTILE/LAG/LEAD/FIRST_VALUE/LAST_VALUE)."""

    func: str  # upper-case
    args: list[Node]
    spec: "WindowSpec | str"  # str = named window, resolved by the builder
    distinct: bool = False
    # ANSI null treatment: func(args) IGNORE NULLS OVER (...) (superset)
    ignore_nulls: bool = False

    def text(self) -> str:
        inner = ", ".join(a.text() for a in self.args)
        body = self.spec if isinstance(self.spec, str) else self.spec.text()
        nulls = " IGNORE NULLS" if self.ignore_nulls else ""
        return f"{self.func}({inner}){nulls} OVER ({body})"

    def auto_alias(self) -> str:
        base = self.func.lower()
        if self.args:
            base += "_" + _safe(self.args[0].text())
        return base + "_w"

    def children(self):
        if isinstance(self.spec, str):
            return list(self.args)
        out = list(self.args) + list(self.spec.partition_by)
        out += [e for e, _ in self.spec.order_by]
        return out


class _SubqueryNode(Node):
    """Base for expression nodes that embed a query. ``children()``
    deliberately does NOT descend into the query — the subquery has its
    own scope and is validated/built separately by the builder."""

    def text(self) -> str:  # unique per node object; stable within a parse
        return f"(subquery#{id(self)})"


@dataclass(eq=False)
class ScalarSubquery(_SubqueryNode):
    """``(SELECT ...)`` used as a value (superset — the reference has no
    subqueries at all, src/expression.cpp:58-62). The builder admits it
    in WHERE and requires a provably single-row query (a global
    aggregate or LIMIT 1), realized as a one-row broadcast cross-join —
    never a driver-side collect."""

    query: "QueryAST | SetOp | WithQuery"

    def auto_alias(self) -> str:
        return "scalar_subquery"


@dataclass(eq=False)
class InSubquery(_SubqueryNode):
    """``expr [NOT] IN (SELECT ...)`` — rewritten to a left-semi
    (anti for NOT, with ANSI null semantics) join."""

    operand: Node
    query: "QueryAST | SetOp | WithQuery"
    negated: bool = False

    def children(self):
        return [self.operand]


@dataclass(eq=False)
class Exists(_SubqueryNode):
    """``EXISTS (SELECT ...)`` — correlated comparisons in the
    subquery's WHERE become join conditions of a left-semi join
    (left-anti under NOT)."""

    query: "QueryAST | SetOp | WithQuery"


@dataclass
class TableFuncCall(Node):
    """Table-valued function call in FROM position (superset — the
    reference's generic call syntax src/expression.cpp:210-223
    generalized to table position): ``FROM split_ngrams(documents.text,
    2)``. The first argument must be a qualified ``table.column``
    reference naming the lateral source table; remaining arguments are
    literals. Executes as ``source, LATERAL udtf(col, ...)`` — source
    columns plus the UDTF's output columns are visible downstream."""

    name: str  # lower-cased function name
    args: list = field(default_factory=list)

    def text(self) -> str:
        return f"{self.name}({', '.join(a.text() for a in self.args)})"

    def children(self):
        return list(self.args)


@dataclass
class JoinClause:
    """JOIN <table> ON <cond> (src/expression.cpp:375-401,
    include/expression.hpp:123-126); ``how`` generalizes the
    reference's implicit inner join."""

    table: str  # table name, or the alias when ``subquery`` is set
    condition: Node | None
    how: str = "inner"
    # derived table: JOIN (SELECT ...) alias ON ... (superset)
    subquery: "QueryAST | SetOp | WithQuery | None" = None
    # base-table alias: JOIN t [AS] a ON ... (superset) — qualified
    # names then resolve against the alias, shadowing the table name
    alias: str | None = None


@dataclass
class QueryAST:
    """Clause-level logical plan (include/expression.hpp:132-143)."""

    select_items: list[tuple[Node, str | None]] = field(default_factory=list)
    distinct: bool = False
    # DISTINCT ON (exprs) (superset; Postgres/DuckDB): keep the first
    # row per ON-group under the query's ORDER BY, which must lead with
    # the ON expressions (Postgres rule, enforced)
    distinct_on: list[Node] = field(default_factory=list)
    from_table: str = ""  # table name, or the alias when from_subquery is set
    # derived table: FROM (SELECT ...) alias (superset)
    from_subquery: "QueryAST | SetOp | WithQuery | None" = None
    joins: list[JoinClause] = field(default_factory=list)
    where: Node | None = None
    group_by: list[Node] = field(default_factory=list)
    having: Node | None = None
    order_by: list[tuple[Node, bool]] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    # LIMIT n WITH TIES / FETCH ... WITH TIES (superset)
    limit_with_ties: bool = False
    # named windows: WINDOW w AS (...) [, ...] (superset)
    windows: dict[str, WindowSpec] = field(default_factory=dict)
    # QUALIFY: post-window row filter (superset; DuckDB/Snowflake/BigQuery)
    qualify: Node | None = None
    # GROUP BY ROLLUP(...) / CUBE(...) / GROUPING SETS(...) (superset):
    # "plain" | "rollup" | "cube" | "sets". For "sets", grouping_sets
    # holds the explicit key subsets and group_by the ordered union.
    group_mode: str = "plain"
    grouping_sets: list[list[Node]] = field(default_factory=list)
    # base-table alias: FROM t [AS] a (superset)
    from_alias: str | None = None
    # /*+ BROADCAST(t, ...) */ optimizer hint after SELECT (superset):
    # table names / aliases whose side should broadcast-join
    broadcast_hints: list[str] = field(default_factory=list)
    # GROUP BY ALL (superset; DuckDB): group by every non-aggregate
    # select item — resolved by the builder once select items are known
    group_by_all: bool = False
    # ORDER BY ALL [ASC|DESC] (superset; DuckDB): sort by every select
    # item left-to-right
    order_by_all: bool = False
    order_by_all_asc: bool = True
    # FROM t PIVOT (agg FOR col IN (v [AS name], ...)) (superset;
    # Spark SQL/DuckDB/Snowflake spelling): applied to the FROM frame
    # before joins; implicit keys = remaining columns
    pivot: "PivotClause | None" = None
    # FROM t UNPIVOT (val FOR name IN (c1, c2, ...)) (superset)
    unpivot: "UnpivotClause | None" = None


@dataclass
class ValuesTable:
    """``FROM (VALUES (e, ...), ...) [AS] v[(c1, ...)]`` — an inline
    literal table (superset). Rows are constant expressions (a column
    reference is a ValidationError); unnamed columns default to
    col1..colN (the ANSI/DuckDB rule)."""

    rows: list  # list[list[Node]]
    col_names: "list[str] | None" = None


@dataclass
class UnpivotClause:
    """``UNPIVOT [INCLUDE NULLS | EXCLUDE NULLS] (value_col FOR
    name_col IN (col [AS label], ...))`` — melt the listed columns
    into (name, value) rows; ids = the remaining columns. NULL values
    are EXCLUDED by default (the ANSI/Spark SQL rule — DataFrame
    .unpivot keeps them, so the builder filters).

    MULTI-MEASURE form (Spark SQL / ANSI): ``UNPIVOT ((v1, v2) FOR
    name_col IN ((c1, c2) [AS label], ...))`` — value_col is then a
    list[str] and each IN item's column a same-arity list[str]; a row
    is excluded only when ALL its measures are NULL."""

    value_col: "str | list[str]"
    name_col: str
    # list[tuple[str | list[str], str | None]] — (column(s), label|None)
    cols: list
    include_nulls: bool = False


@dataclass
class PivotClause:
    """``PIVOT (agg_expr FOR pivot_col IN (value [AS alias], ...))``.
    ``values`` holds (Literal node, alias|None) pairs; the output
    column for a value is its alias, else the literal's string form
    (the Spark SQL naming rule for a single un-aliased aggregate)."""

    agg: Node
    pivot_col: str
    values: list  # list[tuple[Node, str | None]]


@dataclass
class SetOp:
    """UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL] between two queries
    (superset — absent from the reference keyword set,
    src/expression.cpp:58-62). INTERSECT binds tighter than
    UNION/EXCEPT (ANSI precedence); trailing ORDER BY/LIMIT/OFFSET bind
    to the combined result (ANSI)."""

    op: str  # union, union_all, intersect, intersect_all, except, except_all
    left: "QueryAST | SetOp"
    right: "QueryAST | SetOp"
    order_by: list[tuple[Node, bool]] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    # LIMIT n WITH TIES on the combined result (superset)
    limit_with_ties: bool = False


@dataclass
class WithQuery:
    """``WITH [RECURSIVE] name AS (query) [, ...] <body>`` — common
    table expressions (superset). Each CTE sees the tables plus all
    earlier CTEs; the body sees all of them. Under RECURSIVE, a CTE of
    the form ``base UNION [ALL] step`` whose step references the CTE's
    own name evaluates iteratively (bounded fixpoint)."""

    ctes: list[tuple[str, "QueryAST | SetOp | WithQuery"]]
    body: "QueryAST | SetOp | WithQuery"
    recursive: bool = False
