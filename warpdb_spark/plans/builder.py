"""QueryAST → DataFrame pipeline builder.

Implements the reference's clause pipeline (SURVEY §3, entry point 2 —
src/warpdb.cpp:297-498) as one Catalyst logical plan:

    join* → filter(WHERE) → groupBy().agg() → filter(HAVING) →
    project(SELECT) → distinct → orderBy → offset → limit

with the reference's quirks generalized: multi-key GROUP BY and
multi-item SELECT (grammar allowed both, execution used only the first —
src/expression.cpp:339-361,417-443 vs src/warpdb.cpp:350-362), HAVING
over aggregates not present in SELECT (tests/having_distinct_test.cpp:7),
OFFSET applied before LIMIT (src/warpdb.cpp:485-495), and executed joins
(the reference only parses them — include/warpdb.hpp:22).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from pyspark.sql import functions as F

from warpdb_spark.errors import ValidationError
from warpdb_spark.plans import ast as A
from warpdb_spark.plans.compiler import Compiler, validate


def _collect_aggs(node: A.Node | None) -> list[A.Agg]:
    """Aggregate nodes NOT nested inside a window function."""
    if node is None:
        return []
    out: list[A.Agg] = []

    def rec(n: A.Node):
        if isinstance(n, A.WindowFunc):
            return
        if isinstance(n, A.Agg):
            out.append(n)
        for c in n.children():
            rec(c)

    rec(node)
    return out


def _check_grouped(node: A.Node, env_texts: set[str], clause: str) -> None:
    """In grouped mode every column reference must be covered by a group
    key expression or sit inside an aggregate (ANSI rule; the reference
    never checks because it only evaluates one aggregate)."""

    def rec(n: A.Node):
        if n.text() in env_texts or isinstance(n, (A.Agg, A.WindowFunc)):
            return
        if isinstance(n, A.Var):
            raise ValidationError(
                f"Column {n.name} in {clause} clause must appear in GROUP BY or an aggregate"
            )
        for c in n.children():
            rec(c)

    rec(node)


def _unique_name(base: str, used: set[str]) -> str:
    name, i = base, 1
    while name in used:
        i += 1
        name = f"{base}_{i}"
    used.add(name)
    return name


def build_dataframe(tables: dict[str, DataFrame], q, registry=None) -> DataFrame:
    if isinstance(q, A.SetOp):
        left = build_dataframe(tables, q.left, registry)
        right = build_dataframe(tables, q.right, registry)
        if q.op == "union_all":
            out = left.union(right)
        elif q.op == "union":
            out = left.union(right).distinct()
        elif q.op == "intersect":
            out = left.intersect(right)
        elif q.op == "except":
            out = left.subtract(right)
        else:
            raise ValidationError(f"Unknown set operation: {q.op}")
        if q.order_by:
            # tail clauses sort the COMBINED result by its output columns
            for e, _ in q.order_by:
                validate(e, set(out.columns), "ORDER BY")
            comp = Compiler(registry)
            out = out.orderBy(
                *[
                    comp.compile(e).asc() if asc else comp.compile(e).desc()
                    for e, asc in q.order_by
                ]
            )
        if q.offset is not None:
            out = out.offset(q.offset)
        if q.limit is not None:
            out = out.limit(q.limit)
        return out
    return _build_select(tables, q, registry)


def _resolve_table(tables: dict[str, DataFrame], name: str) -> DataFrame:
    if name in tables:
        return tables[name]
    # The reference ignores the FROM identifier and always scans its one
    # loaded table (src/warpdb.cpp:159-190); match that leniency only in
    # the single-table case.
    if len(tables) == 1:
        return next(iter(tables.values()))
    raise ValidationError(f"Unknown table: {name}")


def _build_select(tables: dict[str, DataFrame], q: A.QueryAST, registry=None) -> DataFrame:
    base = _resolve_table(tables, q.from_table)
    scope: dict[str, set[str]] = {q.from_table: set(base.columns)}
    df = base.alias(q.from_table)

    for j in q.joins:
        right = _resolve_table(tables, j.table)
        if j.table in scope:
            raise ValidationError(f"Duplicate table in joins: {j.table}")
        scope[j.table] = set(right.columns)
        right = right.alias(j.table)
        if j.condition is None:
            df = df.crossJoin(right)
        else:
            validate(j.condition, scope, "JOIN ON")
            cond = Compiler(registry).compile(j.condition)
            df = df.join(right, on=cond, how=j.how)
        if j.how in ("left_semi", "left_anti"):
            scope.pop(j.table)  # semi/anti joins expose only left columns

    if q.where is not None:
        validate(q.where, scope, "WHERE")
        df = df.filter(Compiler(registry).compile(q.where))

    aggs: list[A.Agg] = []
    for item, _ in q.select_items:
        aggs += _collect_aggs(item)
    aggs += _collect_aggs(q.having)
    for e, _ in q.order_by:
        aggs += _collect_aggs(e)
    grouped_mode = bool(q.group_by) or bool(aggs)

    env: dict[str, Column] = {}
    if grouped_mode:
        plain = Compiler(registry)
        for i, k in enumerate(q.group_by):
            validate(k, scope, "GROUP BY")
        # one column per distinct aggregate expression, computed once
        agg_by_text: dict[str, A.Agg] = {}
        for a in aggs:
            agg_by_text.setdefault(a.text(), a)
        for a in agg_by_text.values():
            if not isinstance(a.arg, A.Star):
                validate(a.arg, scope, "aggregate")
        key_aliases = {k.text(): f"__k{i}" for i, k in enumerate(q.group_by)}
        agg_aliases = {t: f"__a{i}" for i, t in enumerate(agg_by_text)}
        key_cols = [plain.compile(k).alias(key_aliases[k.text()]) for k in q.group_by]
        agg_cols = [
            plain.compile(a).alias(agg_aliases[t]) for t, a in agg_by_text.items()
        ]
        if q.group_by:
            df = df.groupBy(*key_cols).agg(*agg_cols)
        else:
            df = df.agg(*agg_cols)
        env = {t: F.col(a) for t, a in key_aliases.items()}
        env.update({t: F.col(a) for t, a in agg_aliases.items()})
        env_texts = set(env)
        for item, _ in q.select_items:
            _check_grouped(item, env_texts, "SELECT")
        if q.having is not None:
            _check_grouped(q.having, env_texts, "HAVING")
            df = df.filter(Compiler(registry, env).compile(q.having))
        for e, _ in q.order_by:
            _check_grouped(e, env_texts, "ORDER BY")
    else:
        for item, _ in q.select_items:
            validate(item, scope, "SELECT")
        if q.having is not None:
            raise ValidationError("HAVING requires GROUP BY or an aggregate")
        for e, _ in q.order_by:
            validate(e, scope, "ORDER BY")

    comp = Compiler(registry, env)
    used: set[str] = set()
    names: list[str] = []
    proj: list[Column] = []
    for item, alias in q.select_items:
        name = _unique_name(alias or item.auto_alias(), used)
        names.append(name)
        proj.append(comp.compile(item).alias(name))

    if q.distinct:
        out = df.select(*proj).distinct()
        if q.order_by:
            # post-DISTINCT sort can only reference the projected values
            # (matches the reference's dedup-then-sort on the output
            # column, src/warpdb.cpp:463-476)
            proj_env = {
                item.text(): F.col(name)
                for (item, _), name in zip(q.select_items, names)
            }
            sort_cols = []
            for e, asc in q.order_by:
                if e.text() not in proj_env and not (
                    isinstance(e, A.Var) and e.name in names
                ):
                    raise ValidationError(
                        "ORDER BY with DISTINCT must reference selected expressions"
                    )
                c = proj_env.get(e.text(), F.col(e.text()))
                sort_cols.append(c.asc() if asc else c.desc())
            out = out.orderBy(*sort_cols)
    elif q.order_by:
        sort_names = [f"__s{i}" for i in range(len(q.order_by))]
        sort_proj = [comp.compile(e).alias(n) for (e, _), n in zip(q.order_by, sort_names)]
        out = df.select(*proj, *sort_proj)
        out = out.orderBy(
            *[
                F.col(n).asc() if asc else F.col(n).desc()
                for (e, asc), n in zip(q.order_by, sort_names)
            ]
        ).drop(*sort_names)
    else:
        out = df.select(*proj)

    # reference applies OFFSET before LIMIT (src/warpdb.cpp:485-495);
    # df.offset(m).limit(n) has identical semantics.
    if q.offset is not None:
        out = out.offset(q.offset)
    if q.limit is not None:
        out = out.limit(q.limit)
    return out
