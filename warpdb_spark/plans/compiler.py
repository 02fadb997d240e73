"""AST → PySpark Column compiler + semantic validation.

The reference stringifies its AST into CUDA C and NVRTC-compiles a fused
kernel per query (include/expression.hpp:32-78, src/jit.cpp:48-174).
Here the same tree becomes a Catalyst expression tree; Tungsten's
WholeStageCodegen is the JIT (and unlike the reference it is cached).

Semantic validation mirrors ``validate_ast``: every variable reference
is checked against the visible columns and failures carry clause
context — ``Unknown column: X in WHERE clause``
(src/warpdb.cpp:17-44,309-334).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec as SparkWindowSpec

from warpdb_spark.errors import ValidationError
from warpdb_spark.plans import ast as A

# pyspark.sql.functions names resolvable from the dialect's generic
# function-call syntax. getattr(F, name) covers nearly all of them; this
# maps the few dialect aliases that differ.
_FUNC_ALIASES = {
    "substr": "substring",
    "ceiling": "ceil",
    "char_length": "length",
    "lcase": "lower",
    "ucase": "upper",
    "ln": "log",
    # DuckDB/ANSI spelling of the array-to-rows generator; Spark
    # requires generators at the top level of a SELECT item — nesting
    # one inside an expression surfaces Spark's own error
    "unnest": "explode",
}

_AGG_IMPL = {
    "SUM": F.sum,
    "AVG": F.avg,
    "COUNT": F.count,
    "MIN": F.min,
    "MAX": F.max,
    # ANSI boolean aggregates (superset; identical in DuckDB)
    "BOOL_AND": F.bool_and,
    "BOOL_OR": F.bool_or,
}


def order_col(col: Column, d) -> Column:
    """Apply an order direction from parse_order_item: True/False for
    plain ASC/DESC, or an explicit nulls-placement method name."""
    if d is True:
        return col.asc()
    if d is False:
        return col.desc()
    return getattr(col, d)()


def _frame_bound(b, is_start: bool) -> int:
    if b == "unbounded_preceding":
        return Window.unboundedPreceding
    if b == "unbounded_following":
        return Window.unboundedFollowing
    if b == "current":
        return Window.currentRow
    return int(b)


_INTERVAL_BOUND_RE = __import__("re").compile(
    r"^\s*(\d+)\s+(second|minute|hour|day)s?\s*$", __import__("re").IGNORECASE
)
_UNIT_MICROS = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def _interval_bound_micros(b) -> int:
    """('interval', sign, 'N unit') → signed microseconds. Day-time
    units only: a month/year RANGE offset has no fixed width, so it
    cannot be a rangeBetween distance."""
    _tag, sign, value = b
    m = _INTERVAL_BOUND_RE.match(value)
    if not m:
        raise ValidationError(
            f"Unsupported INTERVAL frame bound: {value!r} "
            "(expected 'N second|minute|hour|day[s]')"
        )
    us = int(m.group(1)) * _UNIT_MICROS[m.group(2).lower()]
    return -us if sign == "-" else us


class Compiler:
    """Compiles nodes to Columns.

    ``env`` maps a node's canonical ``text()`` to a pre-computed Column —
    used by the builder to substitute grouped aggregates and group keys
    during HAVING/ORDER BY compilation, the Spark analog of the
    reference's aggregate-substituting HAVING evaluator
    (src/warpdb.cpp:387-427).
    """

    def __init__(self, registry=None, env: dict[str, Column] | None = None):
        self.registry = registry
        self.env = env or {}

    def compile(self, node: A.Node) -> Column:
        key = node.text()
        if key in self.env:
            return self.env[key]
        method = getattr(self, "_c_" + type(node).__name__.lower(), None)
        if method is None:
            raise ValidationError(f"Cannot compile node type {type(node).__name__}")
        return method(node)

    # -- leaves ---------------------------------------------------------
    def _c_num(self, n: A.Num) -> Column:
        return F.lit(n.value)

    def _c_str(self, n: A.Str) -> Column:
        return F.lit(n.value)

    def _c_bool(self, n: A.Bool) -> Column:
        return F.lit(n.value)

    def _c_null(self, n: A.Null) -> Column:
        return F.lit(None)

    def _c_var(self, n: A.Var) -> Column:
        return F.col(n.name)

    _INTERVAL_RE = __import__("re").compile(r"^[A-Za-z0-9 :.\-]+$")
    # Spark's cast grammar subset the dialect documents (zoneless,
    # 4-digit years — Python's calendar check caps at 9999):
    # yyyy[-[m]m[-[d]d[ |T[h]h[:[m]m[:[s]s[.f…]]]]]] — single-digit
    # fields and hour-only times allowed, week-dates and zone ids not
    _DATETIME_RE = __import__("re").compile(
        r"^(\d{4})(?:-(\d{1,2})(?:-(\d{1,2})"
        r"(?:[ T](\d{1,2})(?::(\d{1,2})(?::(\d{1,2})(?:\.(\d{1,9}))?)?)?)?)?)?$"
    )

    def _validate_datetime_literal(self, value: str, kind: str) -> None:
        """Eager validation: under Spark's default non-ANSI mode a bad
        literal cast silently becomes NULL (empty result, no
        diagnostic) — the dialect's contract is position-carrying
        errors. The accepted grammar mirrors Spark's cast (single-digit
        month/day/hour allowed — fromisoformat would wrongly reject
        those and wrongly accept ISO week dates Spark can't cast)."""
        import datetime as _dt

        m = self._DATETIME_RE.match(value.strip())
        if m is not None:
            y, mo, d = int(m[1]), int(m[2] or 1), int(m[3] or 1)
            h, mi, s = int(m[4] or 0), int(m[5] or 0), int(m[6] or 0)
            try:
                _dt.datetime(y, mo, d, h, mi, s)
                return
            except ValueError:
                pass
        raise ValidationError(f"Malformed {kind} literal: {value!r}")

    def _c_typedlit(self, n: A.TypedLit) -> Column:
        if n.kind == "timestamp":
            self._validate_datetime_literal(n.value, "TIMESTAMP")
            return F.lit(n.value).cast("timestamp")
        if n.kind == "date":
            self._validate_datetime_literal(n.value, "DATE")
            return F.lit(n.value).cast("date")
        # interval: Spark has no interval lit(); go through a guarded
        # expr() — the value came from a quoted token, so reject anything
        # that could escape the literal
        if not self._INTERVAL_RE.match(n.value):
            raise ValidationError(f"Malformed INTERVAL literal: {n.value!r}")
        return F.expr(f"INTERVAL '{n.value}'")

    def _c_star(self, n: A.Star) -> Column:
        return F.lit(1)

    # -- operators ------------------------------------------------------
    def _c_binop(self, n: A.BinOp) -> Column:
        left, right = self.compile(n.left), self.compile(n.right)
        op = n.op
        if op == "+":
            return left + right
        if op == "-":
            return left - right
        if op == "*":
            return left * right
        if op == "/":
            return left / right
        if op == "%":
            return left % right
        if op in ("=", "=="):
            return left == right
        if op == "!=":
            return left != right
        if op == ">":
            return left > right
        if op == "<":
            return left < right
        if op == ">=":
            return left >= right
        if op == "<=":
            return left <= right
        if op == "AND":
            return left & right
        if op == "OR":
            return left | right
        raise ValidationError(f"Unknown operator: {op}")

    def _c_not(self, n: A.Not) -> Column:
        return ~self.compile(n.operand)

    def _c_neg(self, n: A.Neg) -> Column:
        return -self.compile(n.operand)

    def _c_between(self, n: A.Between) -> Column:
        col = self.compile(n.operand).between(self.compile(n.low), self.compile(n.high))
        return ~col if n.negated else col

    def _c_inlist(self, n: A.InList) -> Column:
        col = self.compile(n.operand).isin([self.compile(i) for i in n.items])
        return ~col if n.negated else col

    def _c_like(self, n: A.Like) -> Column:
        operand = self.compile(n.operand)
        col = operand.ilike(n.pattern) if n.ci else operand.like(n.pattern)
        return ~col if n.negated else col

    def _c_isnull(self, n: A.IsNull) -> Column:
        col = self.compile(n.operand)
        return col.isNotNull() if n.negated else col.isNull()

    def _c_case(self, n: A.Case) -> Column:
        col = None
        for cond, val in n.whens:
            c, v = self.compile(cond), self.compile(val)
            col = F.when(c, v) if col is None else col.when(c, v)
        if n.else_value is not None:
            col = col.otherwise(self.compile(n.else_value))
        return col

    # -- calls ------------------------------------------------------------
    def _c_func(self, n: A.Func) -> Column:
        """Registry first (custom.cu analog, src/jit.cpp:65-81), then
        pyspark.sql.functions builtins. A few datetime builtins take a
        Python format/unit STRING (not a Column) in their signature —
        pass string literals through raw for those."""
        lname = n.name.lower()
        in_registry = self.registry is not None and lname in self.registry
        if not in_registry:
            # date_trunc(unit, ts): unit string is the FIRST parameter
            if lname == "date_trunc" and len(n.args) == 2 and isinstance(n.args[0], A.Str):
                return F.date_trunc(n.args[0].value, self.compile(n.args[1]))
            # trunc(date, fmt) / date_format(ts, fmt): string is SECOND
            if lname in ("trunc", "date_format") and len(n.args) == 2 and isinstance(n.args[1], A.Str):
                return getattr(F, lname)(self.compile(n.args[0]), n.args[1].value)
            # get_json_object(col, path): JSONPath is a Python string
            if lname == "get_json_object" and len(n.args) == 2 and isinstance(n.args[1], A.Str):
                return F.get_json_object(self.compile(n.args[0]), n.args[1].value)
            # array_join(arr, sep[, null_repl]): sep/null_repl are
            # Python strings in the pyspark signature, not Columns —
            # reject non-literal separators loudly (the fallthrough
            # would be a raw Py4J NOT_ITERABLE error)
            if lname in ("array_join", "array_to_string"):
                if len(n.args) not in (2, 3) or not all(
                    isinstance(a, A.Str) for a in n.args[1:]
                ):
                    raise ValidationError(
                        f"{n.name} expects (array, separator[, null_replacement]) "
                        "with string-literal separator/replacement"
                    )
                return F.array_join(
                    self.compile(n.args[0]), *[a.value for a in n.args[1:]]
                )
        args = [self.compile(a) for a in n.args]
        if in_registry:
            return self.registry.call(lname, *args)
        fname = _FUNC_ALIASES.get(lname, lname)
        fn = getattr(F, fname, None)
        if fn is None:
            raise ValidationError(f"Unknown function: {n.name}")
        return fn(*args)

    def _c_agg(self, n: A.Agg) -> Column:
        if n.func == "GROUPING":
            # valid GROUPING() calls are wired to the pre-projected
            # grouping column by the builder and never reach here
            raise ValidationError(
                "GROUPING() is only valid in SELECT/HAVING/ORDER BY with "
                "GROUP BY ROLLUP, CUBE, or GROUPING SETS"
            )
        # FILTER (WHERE c): agg(CASE WHEN c THEN arg END) — aggregates
        # ignore NULLs, which is exactly the ANSI FILTER semantics
        fcond = self.compile(n.filter) if n.filter is not None else None
        if isinstance(n.arg, A.Star):
            if n.func != "COUNT":
                raise ValidationError(f"{n.func}(*) is not supported")
            if fcond is not None:
                return F.count(F.when(fcond, F.lit(1)))
            return F.count(F.lit(1))
        arg = self.compile(n.arg)
        if fcond is not None:
            arg = F.when(fcond, arg)
        if n.distinct:
            if n.func == "COUNT":
                return F.countDistinct(arg)
            if n.func == "SUM":
                return F.sum_distinct(arg)
            raise ValidationError(f"{n.func}(DISTINCT ...) is not supported")
        return _AGG_IMPL[n.func](arg)

    @staticmethod
    def _ordered_pairs(pairs: Column, key_asc: bool) -> Column:
        """Sort an array of (k, v) structs by k ASC|DESC with ties
        broken by v ASCENDING in both directions (the documented
        contract). Both directions use a comparator so NULL keys (order
        key evaluating NULL on a non-null value) sort LAST as their own
        group in BOTH directions (DuckDB's default NULLS LAST — plain
        array_sort's struct-lexicographic order would put them FIRST
        under ASC, a cross-engine set divergence), value-ascending
        within it. The null branches are explicit because a null
        comparison falling through to the value branches would make the
        comparator non-transitive (arbitrary interleaving; TimSort
        contract violations on frames ≥32). DESC cannot be a reverse()
        of ASC — that would also flip the value tie-break. The
        comparator is a Catalyst lambda, still codegen'd and
        map-side-combinable."""

        def vcmp(a, b):
            return (
                F.when(a["v"] < b["v"], F.lit(-1))
                .when(a["v"] > b["v"], F.lit(1))
                .otherwise(F.lit(0))
            )

        lt, gt = (F.lit(-1), F.lit(1)) if key_asc else (F.lit(1), F.lit(-1))

        def cmp(a, b):
            return (
                F.when(a["k"].isNull() & b["k"].isNull(), vcmp(a, b))
                .when(a["k"].isNull(), F.lit(1))
                .when(b["k"].isNull(), F.lit(-1))
                .when(a["k"] < b["k"], lt)
                .when(a["k"] > b["k"], gt)
                .otherwise(vcmp(a, b))
            )

        return F.array_sort(pairs, cmp)

    def _c_stringagg(self, n: A.StringAgg) -> Column:
        """Ordered string concatenation without a Spark string_agg:
        collect (key, value) structs, sort (key direction, value
        ascending tie-break), project values, join. Stays one
        map-side-combinable aggregate; NULL values (and FILTER-failing
        rows) become NULL structs, which collect_list skips — exactly
        the ANSI skip-nulls contract."""
        val = self.compile(n.arg).cast("string")
        key = self.compile(n.order_key) if n.order_key is not None else val
        pair = F.struct(key.alias("k"), val.alias("v"))
        keep = val.isNotNull()
        if n.filter is not None:
            keep = keep & self.compile(n.filter)
        arr = self._ordered_pairs(F.collect_list(F.when(keep, pair)), n.key_asc)
        return F.array_join(F.transform(arr, lambda s: s["v"]), n.sep)

    def _c_arrayagg(self, n: A.ArrayAgg) -> Column:
        """Ordered array collection: collect (key, value) structs, sort
        (key direction, value ascending tie-break), project values —
        native element type preserved, one map-side-combinable
        aggregate, nulls skipped (ANSI-style, matching STRING_AGG)."""
        val = self.compile(n.arg)
        key = self.compile(n.order_key) if n.order_key is not None else val
        pair = F.struct(key.alias("k"), val.alias("v"))
        keep = val.isNotNull()
        if n.filter is not None:
            keep = keep & self.compile(n.filter)
        arr = self._ordered_pairs(F.collect_list(F.when(keep, pair)), n.key_asc)
        return F.transform(arr, lambda s: s["v"])

    def _c_cast(self, n: A.Cast) -> Column:
        c = self.compile(n.operand)
        # TRY_CAST: NULL on conversion failure (vs the session's ANSI
        # runtime error) — Column.try_cast, same semantics as DuckDB's
        return c.try_cast(n.type_name) if n.try_ else c.cast(n.type_name)

    def _c_scalarsubquery(self, n: A.ScalarSubquery) -> Column:
        raise ValidationError(
            "Scalar subqueries are only supported in WHERE, SELECT, HAVING, "
            "and ORDER BY (not inside aggregates, GROUP BY, or JOIN ON)"
        )

    def _c_insubquery(self, n: A.InSubquery) -> Column:
        raise ValidationError("IN (SELECT ...) is only supported as a top-level WHERE conjunct")

    def _c_exists(self, n: A.Exists) -> Column:
        raise ValidationError("EXISTS is only supported as a top-level WHERE conjunct")

    def _c_windowfunc(self, n: A.WindowFunc) -> Column:
        spec = self._window_spec(n.spec)
        fname = n.func
        if n.distinct:
            # Spark (like most engines) has no DISTINCT window aggregates
            raise ValidationError(f"{fname}(DISTINCT ...) OVER (...) is not supported")
        args = [self.compile(a) for a in n.args if not isinstance(a, A.Star)]
        if n.ignore_nulls and fname not in ("LAG", "LEAD", "FIRST_VALUE", "LAST_VALUE"):
            raise ValidationError(
                "IGNORE NULLS is only supported for lag/lead/first_value/last_value"
            )
        if fname in A.AGG_FUNCS:
            if fname == "COUNT" and (not args or isinstance(n.args[0], A.Star)):
                base = F.count(F.lit(1))
            else:
                base = _AGG_IMPL[fname](args[0])
        elif fname in ("ROW_NUMBER", "RANK", "DENSE_RANK", "PERCENT_RANK", "CUME_DIST"):
            base = getattr(F, fname.lower())()
        elif fname == "NTILE":
            if not isinstance(n.args[0], A.Num):
                raise ValidationError("NTILE requires an integer literal")
            base = F.ntile(int(n.args[0].value))
        elif fname in ("LAG", "LEAD"):
            offset = self._int_literal(n.args[1], f"{fname} offset") if len(n.args) > 1 else 1
            default = None
            if len(n.args) > 2:
                d = n.args[2]
                if not isinstance(d, (A.Num, A.Str, A.Bool, A.Null)):
                    raise ValidationError(f"{fname} default must be a literal")
                default = None if isinstance(d, A.Null) else d.value
            if n.ignore_nulls:
                # PySpark's lag/lead wrappers don't expose the ANSI
                # ignoreNulls flag; the Scala overload does. Under
                # Spark Connect there is no _jvm — fail with a clear
                # message instead of an opaque AttributeError.
                from pyspark.sql import SparkSession

                jvm = getattr(SparkSession.active(), "_jvm", None)
                if jvm is None:
                    raise ValidationError(
                        f"{fname} ... IGNORE NULLS requires a classic (JVM) "
                        "SparkSession; it is not available over Spark Connect"
                    )
                jfn = jvm.org.apache.spark.sql.functions
                jc = getattr(jfn, fname.lower())(args[0]._jc, offset, default, True)
                base = Column(jc)
            else:
                base = getattr(F, fname.lower())(args[0], offset, default)
        elif fname in ("FIRST_VALUE", "LAST_VALUE"):
            base = (F.first if fname == "FIRST_VALUE" else F.last)(
                args[0], ignorenulls=n.ignore_nulls
            )
        else:
            raise ValidationError(f"Unknown window function: {fname}")
        return base.over(spec)

    @staticmethod
    def _int_literal(node: A.Node, what: str) -> int:
        if isinstance(node, A.Num) and isinstance(node.value, int):
            return node.value
        if isinstance(node, A.Neg) and isinstance(node.operand, A.Num) and isinstance(node.operand.value, int):
            return -node.operand.value
        raise ValidationError(f"{what} must be an integer literal")

    def _window_spec(self, spec: A.WindowSpec) -> SparkWindowSpec:
        has_interval = bool(spec.frame) and any(
            isinstance(b, tuple) for b in spec.frame[1:]
        )
        if has_interval:
            # event-time RANGE frame: Spark's rangeBetween takes long
            # offsets, so order by unix_micros(ts) and express the
            # interval as a micros distance — exact to the µs, no
            # second-truncation drift
            kind = spec.frame[0]
            if kind != "RANGE":
                raise ValidationError("INTERVAL frame bounds require RANGE")
            if len(spec.order_by) != 1:
                raise ValidationError(
                    "RANGE with INTERVAL bounds requires exactly one ORDER BY expression"
                )
            if any(
                isinstance(b, int) for b in spec.frame[1:]
            ):
                raise ValidationError(
                    "Cannot mix numeric and INTERVAL bounds in one RANGE frame"
                )
        w = None
        if spec.partition_by:
            w = Window.partitionBy(*[self.compile(p) for p in spec.partition_by])
        if spec.order_by:
            if has_interval:
                e, asc = spec.order_by[0]
                oc = F.unix_micros(self.compile(e).cast("timestamp"))
                order_cols = [order_col(oc, asc)]
            else:
                order_cols = [
                    order_col(self.compile(e), asc) for e, asc in spec.order_by
                ]
            w = w.orderBy(*order_cols) if w is not None else Window.orderBy(*order_cols)
        if w is None:
            if has_interval:
                raise ValidationError(
                    "RANGE with INTERVAL bounds requires exactly one ORDER BY expression"
                )
            w = Window.partitionBy(F.lit(1))
        if spec.frame:
            kind, start, end = spec.frame
            lo = (
                _interval_bound_micros(start)
                if isinstance(start, tuple)
                else _frame_bound(start, True)
            )
            hi = (
                _interval_bound_micros(end)
                if isinstance(end, tuple)
                else _frame_bound(end, False)
            )
            w = w.rowsBetween(lo, hi) if kind == "ROWS" else w.rangeBetween(lo, hi)
        return w


def compile_expr(node: A.Node, registry=None, env: dict[str, Column] | None = None) -> Column:
    return Compiler(registry, env).compile(node)


def validate(node: A.Node, columns, clause: str, extra_ok: set[str] | None = None) -> None:
    """Check every Var against visible columns; qualified names check the
    column part against the named table when table→columns mapping is
    given (``columns`` may be a set of names or dict[table] -> names)."""
    if node is None:
        return
    if isinstance(columns, dict):
        flat = {c for cols in columns.values() for c in cols}
    else:
        flat, columns = set(columns), None
    for sub in node.walk():
        if isinstance(sub, A.Var):
            name = sub.name
            if "." in name and columns is not None:
                table, col = name.rsplit(".", 1)
                if table in columns:
                    if col not in columns[table]:
                        raise ValidationError(f"Unknown column: {name} in {clause} clause")
                    continue
            if name in flat:
                continue
            if extra_ok and name in extra_ok:
                continue
            raise ValidationError(f"Unknown column: {name} in {clause} clause")
