"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with the noop sink (full execution, no driver
collect) so the measured time is scan+compute+shuffle, the same work a
cluster run would do per partition.

Variance hardening (round 7): the suite runs THREE full interleaved
passes in one JVM; ``value`` is the sum of per-query minima (the
steady-state figure), with ``single_pass`` (pass-1 total),
``pass_totals`` and a fixed-cost ``calib_sec`` probe recorded
alongside so a load-contaminated run is self-evident from the
artifact instead of needing a re-run to diagnose (r6's driver run
read 18.5s on code that brackets at 10.4-12.6s).
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

    # Calibration probe: a fixed CPU-bound JVM job whose cost is
    # load-sensitive but code-invariant. Its reading contextualizes the
    # suite numbers — a calib 2x its quiet-machine envelope (~0.4-0.6s
    # on this sandbox) means the run was contaminated by external load,
    # not a plan regression.
    from pyspark.sql import functions as F  # noqa: E402

    def _calibrate() -> float:
        t0 = time.perf_counter()
        # sum of small residues, not raw hashes: |residue| < 1e3 so the
        # 50M-row sum stays ~5e10, far from int64 under ANSI mode
        spark.range(0, 50_000_000, 1, 32).select(
            F.sum(F.xxhash64("id") % 1000).alias("h")
        ).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # min-of-3, pass-interleaved: run the WHOLE suite three times in
    # one JVM and take each query's min across passes. Interleaving at
    # the pass level means a transient sandbox load spike contaminates
    # one pass, not the same query three times — the per-query min is
    # the steady-state number a quiet machine would produce. The
    # single-pass (pass-1) total is kept alongside as the honest
    # "one cold-ish sweep" figure.
    PASSES = 3
    per_pass: list[dict[str, float]] = []
    calibs = [_calibrate()]
    for p in range(PASSES):
        pass_times: dict[str, float] = {}
        for name in names:
            t0 = time.perf_counter()
            _force(qs[name](spark, SF_DIR))
            pass_times[name] = time.perf_counter() - t0
        per_pass.append(pass_times)
        calibs.append(_calibrate())
        print(
            f"# pass {p + 1}: {round(sum(pass_times.values()), 3)}s"
            f" (calib {calibs[-1]}s)",
            file=sys.stderr,
        )

    timings = {
        name: round(min(pt[name] for pt in per_pass), 3) for name in names
    }
    for name in names:
        print(f"# {name}: {timings[name]}s", file=sys.stderr)
    pass_totals = [round(sum(pt.values()), 3) for pt in per_pass]

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    record = {
        "metric": "warpdb_spark_headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "method": "min_of_3_interleaved",
        # single_pass IS pass_totals[0], derived once here so the two
        # can never disagree
        "single_pass": pass_totals[0],
        "pass_totals": pass_totals,
        "calib_sec": calibs,
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
