"""Capture .explain("formatted") for headline queries into plans/<tag>/.

Usage: PYTHONPATH=/root/repo python tools/capture_plans.py <tag> [suffix] [name ...]
Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to "before").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warpdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    import __spark_entry__ as entry
    import bench

    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("warpdb-capture-plans")
    qs = entry.queries()
    if not names:
        names = [n for n in bench.HEADLINE if n in qs]
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
