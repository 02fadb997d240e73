"""Static plan lint for int64-overflow-prone aggregate moments.

The class this catches (found the hard way in round 6): a SUM over a
product of two BIGINT expressions — Σ i·xᵢ rank moments, Σ x² second
moments — grows with rows², so it blows past int64 at a few million
rows per group even when every per-row product fits comfortably.
Under ANSI mode that's a runtime crash at scale; with ANSI off it is
a silent wrap. The repo's rule is that such moments accumulate in
DECIMAL(38,0) (exact, aggregation-order-proof, ~1e38 headroom;
DuckDB's BIGINT SUM widens to HUGEINT natively so oracles stay
bit-identical).

This lint walks the ANALYZED plan of every inventory entry (no
execution — schema resolution only) and flags:
  1. sum((a * b)) where the product is long-typed (no decimal cast),
     in Aggregate or Window nodes;
  2. Window sums over a projected alias `_wN` whose definition is a
     long product.

Heuristic on plan text by design — it catches the mechanical shape of
the class. Usage:
    PYTHONPATH=/root/repo python tools/lint_moment_overflow.py [name ...]
Exit code 1 if anything is flagged.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF_DIR", "/root/testdata/sf0.001")


def _sum_args(plan: str):
    """Yield the balanced-paren argument of every sum( / try_sum( call."""
    for m in re.finditer(r"\bsum\(", plan):
        depth, start = 1, m.end()
        for i in range(start, min(start + 4000, len(plan))):
            c = plan[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    yield plan[start:i]
                    break


def _split_top_product(arg: str):
    """Split a top-level `A * B` at paren depth 0; None if not a
    product at top level (after stripping one outer paren pair)."""
    s = arg.strip()
    if s.startswith("(") and s.endswith(")"):
        depth = 0
        for i, c in enumerate(s):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0 and i < len(s) - 1:
                    break  # outer parens don't wrap the whole expr
        else:
            s = s[1:-1]
    depth = 0
    for i in range(len(s) - 2):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and s[i : i + 3] == " * ":
            return s[:i], s[i + 3 :]
    return None


def _is_long_operand(op: str) -> bool:
    """A data-sized integer operand: references a long column and is
    not widened to double/decimal."""
    if "as double" in op or "decimal" in op:
        return False
    return bool(re.search(r"#\d+L", op))


def _is_long_product(arg: str) -> bool:
    """True for Σ(A*B) where BOTH operands are long-typed column
    expressions (the rows²-growth class) with no decimal widening.
    Linear scalings (col * literal), double math, and decimal
    accumulators all pass."""
    if "decimal" in arg:
        return False
    parts = _split_top_product(arg)
    if not parts:
        return False
    return _is_long_operand(parts[0]) and _is_long_operand(parts[1])


def lint_plan(plan: str) -> list[str]:
    findings = []
    # pass 1: direct sum over a long product
    for arg in _sum_args(plan):
        if _is_long_product(arg):
            findings.append(f"sum({arg})")
        # pass 2: sum over a projected window operand (_wN#idL) whose
        # definition is a long product
        m = re.fullmatch(r"(_w\d+)#(\d+)L?", arg.strip())
        if m:
            ref = f"{m.group(1)}#{m.group(2)}"
            d = re.search(r"\(([^()]*(?:\([^()]*\))?[^()]*)\) AS " + re.escape(ref),
                          plan)
            if d and _is_long_product(d.group(1)):
                findings.append(f"sum({arg}) <- ({d.group(1)})")
    return findings


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
            df = queries[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().analyzed().toString()
        except Exception as exc:  # streaming entries etc.
            print(f"skip  {name}: {type(exc).__name__}")
            continue
        findings = lint_plan(plan)
        if findings:
            flagged += 1
            print(f"FLAG  {name}:")
            for f in findings:
                print(f"      {f}")
    print(f"\n{flagged} flagged / {len(targets)} checked")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
