"""Plan-quality sweep over EVERY inventory entry.

Builds each declared entry's DataFrame at sf0.001 (construction only,
like audit_window_plans) and records plan-shape facts the optimization
round cares about:

- n_exchange:      shuffle Exchange nodes (not broadcast)
- n_broadcast:     BroadcastExchange nodes
- joins:           join strategies used (BroadcastHashJoin / SortMergeJoin /
                   ShuffledHashJoin / BroadcastNestedLoopJoin / CartesianProduct)
- n_python:        BatchEvalPython nodes (row-at-a-time Python UDFs)
- n_arrow_python:  ArrowEvalPython / MapInArrow / MapInPandas /
                   FlatMapGroupsInPandas / FlatMapCoGroupsInPandas nodes
- n_scan:          parquet scans; n_scan_nofilter: scans directly under a
                   Filter whose plan shows no PushedFilters entry
- n_window / n_sort / n_expand / n_generate

Output: one JSON line per entry to stdout (and a summary to stderr).
Usage: PYTHONPATH=/root/repo python tools/sweep_plan_quality.py [sf_dir] > plans/r12/sweep.jsonl
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_facts(df) -> dict:
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    facts = {
        "n_exchange": len(re.findall(r"^\s*(?::?\s*[+:]-\s*)?Exchange ", plan, re.M))
        + plan.count("+- Exchange (")
        + plan.count(":- Exchange ("),
        "n_broadcast": plan.count("BroadcastExchange ("),
        "n_python": plan.count("BatchEvalPython"),
        "n_arrow_python": sum(
            plan.count(t)
            for t in (
                "ArrowEvalPython",
                "MapInArrow",
                "MapInPandas (",
                "FlatMapGroupsInPandas",
                "FlatMapCoGroupsInPandas",
                "PythonUDTF",
            )
        ),
        "n_window": plan.count("Window ("),
        "n_sort": plan.count("Sort ("),
        "n_expand": plan.count("Expand ("),
        "n_generate": plan.count("Generate ("),
        "n_scan": plan.count("Scan parquet"),
        "n_inmemory": plan.count("InMemoryTableScan"),
    }
    joins = {}
    for jt in (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        c = plan.count(jt + " ")
        if c:
            joins[jt] = c
    facts["joins"] = joins
    # Exchange count: the regex above is fragile across layouts; recount
    # simply — every shuffle exchange prints as "Exchange (N)" in the
    # formatted numbered list header "(N) Exchange".
    facts["n_exchange"] = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))
    facts["n_scan_nopush"] = len(
        re.findall(r"^\(\d+\) Scan parquet[\s\S]{0,400}?PushedFilters: \[\]", plan, re.M)
    )
    return facts


def main() -> None:
    from warpdb_spark.session import get_spark
    from warpdb_spark import inventory

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("sweep-plan-quality", shuffle_partitions=8)
    q, _ = inventory.load_all()
    n_err = 0
    try:
        for name, fn in q.items():
            try:
                facts = plan_facts(fn(spark, sf_dir))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"name": name, "error": f"{type(e).__name__}: {e}"[:160]}))
                n_err += 1
                continue
            facts["name"] = name
            print(json.dumps(facts, sort_keys=True))
    finally:
        spark.catalog.clearCache()
    print(f"# swept {len(q)} entries, {n_err} errors", file=sys.stderr)


if __name__ == "__main__":
    main()
