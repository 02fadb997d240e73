"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with the noop sink (full execution, no driver
collect) so the measured time is scan+compute+shuffle, the same work a
cluster run would do per partition.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from warpdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: scan-bound (q1/q6), join-heavy (q3/q5/q18), row-level
# expression (flagship), window (running_sum), plus the pipeline
# superset ops when present (dedup/similarity/text).
HEADLINE = [
    "flagship_filter_project",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_profit",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume_customer",
    "tpch_q21_single_return_supplier",
    "window_running_sum",
    "join_theta",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_score",
    "similarity_topk_bruteforce",
]


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    import __spark_entry__ as entry

    spark = get_spark("warpdb-bench")
    qs = entry.queries()
    names = [n for n in HEADLINE if n in qs]

    # Warm the JVM/codegen path of every headline plan once at the
    # smallest scale (sf0.001) — standard engine benchmarking: measure
    # steady-state execution, not first-call JIT compilation. The
    # measured runs below still do all planning + execution at SF_DIR.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    for name in names:
        try:
            _force(qs[name](spark, warm_dir))
        except Exception as e:  # noqa: BLE001
            print(f"# warmup {name} failed: {e}", file=sys.stderr)

    # best-of-2: report steady-state per query (single runs on a busy
    # local JVM carry multi-second GC/scheduler noise)
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _force(qs[name](spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    record = {
        "metric": "warpdb_spark_headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(record))
    # Append to the per-round history so later rounds can diff
    # regressions query-by-query (methodology above stays frozen).
    try:
        hist = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_HISTORY.jsonl")
        with open(hist, "a") as f:
            f.write(json.dumps({"ts": int(time.time()), **record}) + "\n")
    except OSError as e:
        print(f"# bench history append failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
