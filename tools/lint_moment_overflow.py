"""Static plan lint for int64-overflow-prone aggregate moments.

The class this catches (found the hard way in round 6): a SUM over a
product of two BIGINT column expressions — Σ i·xᵢ rank moments, Σ x²
second moments — grows with rows², so it blows past int64 at a few
million rows per group even when every per-row product fits
comfortably. Under ANSI mode that's a runtime crash at scale; with
ANSI off it is a silent wrap. The repo's rule is that such moments
multiply AND accumulate in DECIMAL(38,0) (exact,
aggregation-order-proof, ~1e38 headroom; DuckDB oracles widen with
native HUGEINT sums so results stay bit-identical).

This lint walks the ANALYZED plan's expression trees via py4j (no
execution — schema resolution only; no string regex, so CASE-wrapped
products, try_sum, oversized expressions, and cast chains are all
covered) and flags any Sum/TrySum aggregate — in Aggregate or Window
nodes — whose operand subtree contains a bigint-typed Multiply with
both factors non-foldable (two data-sized integers; literal scalings
like value*100 are foldable on one side and pass). The Multiply check
applies whatever the accumulator type, so a decimal Sum over a
still-long product (cast AFTER the multiply — the per-row overflow
hazard) is flagged too.

Usage:
    PYTHONPATH=/root/repo python tools/lint_moment_overflow.py [name ...]
Exit code 1 if anything is flagged.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF_DIR", "/root/testdata/sf0.001")

_SUM_CLASSES = {"Sum", "TrySum"}


def _seq(scala_seq):
    for i in range(scala_seq.size()):
        yield scala_seq.apply(i)


def _cls(jexpr) -> str:
    return jexpr.getClass().getSimpleName()


def _is_bigint(jexpr) -> bool:
    try:
        return jexpr.dataType().simpleString() == "bigint"
    except Exception:
        return False


def _find_long_products(jexpr, out: list, aliases: dict, seen: set):
    """Collect bigint-typed Multiply nodes with both factors
    non-foldable anywhere under ``jexpr``, chasing projected aliases
    (a Window's sum references `_wN#idL`, whose Multiply definition
    lives in a child Project)."""
    cls = _cls(jexpr)
    if cls == "Multiply" and _is_bigint(jexpr):
        kids = list(_seq(jexpr.children()))
        if len(kids) == 2 and not kids[0].foldable() and not kids[1].foldable():
            out.append(jexpr.sql())
            return  # factors of a flagged product need no re-report
    if cls == "AttributeReference":
        eid = jexpr.exprId().id()
        if eid not in seen and eid in aliases:
            seen.add(eid)
            _find_long_products(aliases[eid], out, aliases, seen)
        return
    for child in _seq(jexpr.children()):
        _find_long_products(child, out, aliases, seen)


def _collect_aliases(jexpr, aliases: dict):
    if _cls(jexpr) == "Alias":
        aliases[jexpr.exprId().id()] = jexpr.child()
    for child in _seq(jexpr.children()):
        _collect_aliases(child, aliases)


def _walk_expr(jexpr, findings: list, aliases: dict):
    if _cls(jexpr) in _SUM_CLASSES:
        products: list = []
        for child in _seq(jexpr.children()):
            _find_long_products(child, products, aliases, set())
        for p in products:
            findings.append(f"{jexpr.sql()} <- long product {p}")
    for child in _seq(jexpr.children()):
        _walk_expr(child, findings, aliases)


def _walk_plan(jplan, visit, *args):
    for e in _seq(jplan.expressions()):
        visit(e, *args)
    for child in _seq(jplan.children()):
        _walk_plan(child, visit, *args)
    # subquery expressions live off the expression tree; innerChildren
    # covers CTEs/views if present
    try:
        for child in _seq(jplan.innerChildren()):
            _walk_plan(child, visit, *args)
    except Exception:
        pass


def lint_df(df) -> list[str]:
    """Findings for one DataFrame's analyzed plan (deduplicated)."""
    plan = df._jdf.queryExecution().analyzed()
    aliases: dict = {}
    _walk_plan(plan, _collect_aliases, aliases)
    findings: list[str] = []
    _walk_plan(plan, _walk_expr, findings, aliases)
    seen, out = set(), []
    for f in findings:
        if f not in seen:
            seen.add(f)
            out.append(f)
    return out


def main(names: list[str]) -> int:
    from warpdb_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("lint-moment-overflow")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    targets = names or sorted(queries)
    flagged = 0
    for name in targets:
        try:
            findings = lint_df(queries[name](spark, SF_DIR))
        except Exception as exc:  # streaming entries etc.
            print(f"skip  {name}: {type(exc).__name__}")
            continue
        if findings:
            flagged += 1
            print(f"FLAG  {name}:")
            for f in findings:
                print(f"      {f}")
    print(f"\n{flagged} flagged / {len(targets)} checked")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
