"""Replay: chunked vs naive grouped-lead edge derivation at 20M events.

The r8 plan audit flagged ``_user_edges``'s single
``lead() OVER (PARTITION BY event_type ORDER BY ts, event_id)`` as a
corpus-scale sort on a 5-value key: at any scale the shuffle has
exactly |event_type| = 5 tasks doing work, so local[32] idles 27 cores
and a 1000-executor cluster idles ~995 — and each task must sort (and
at 100 TB, spill) ~20% of the corpus. The rewrite
(operators/sequence.grouped_lead_pairs) chunks by hour: the heavy
window runs per (type, hour) — ~27.8k keys at this replay's 231-day
span — and the boundary stitch windows over one aggregated row per
chunk.

This tool times both derivations on the shared 20M-event corpus
(tools/replay_corpus.build_events) with full materialization and
verifies they produce the IDENTICAL canonical edge set (count +
xor-hash), so the speed comparison is apples-to-apples.

Usage: PYTHONPATH=/root/repo python tools/replay_chunked_lead.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from tools import replay_corpus as rc
from warpdb_spark.operators.sequence import grouped_lead_pairs, hour_chunk
from warpdb_spark.session import get_spark
from warpdb_spark.sources.readers import ns_to_timestamp

OUT = "/tmp/replay_r8_chunked_lead"


def canonical_edges(nx):
    return (
        nx.filter(F.col("dst") != F.col("src"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )


def naive_pairs(ev):
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return ev.select(
        F.col("user_id").alias("src"), F.lead("user_id").over(w).alias("dst")
    ).where(F.col("dst").isNotNull())


def summarize(df):
    """count + order-free xor-hash of the edge set (forces full work)."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("a", "b") % 1_000_003).alias("h"),
    ).first()
    return row["n"], row["h"]


def main():
    spark = get_spark("replay-chunked-lead")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    if not os.path.exists(f"{OUT}/events.parquet/_SUCCESS"):
        t0 = time.time()
        rc.build_events(spark, OUT)
        print(f"corpus build: {time.time()-t0:.1f}s")
    ev = ns_to_timestamp(spark.read.parquet(f"{OUT}/events.parquet"), "ts")

    variants = [
        ("naive_5_task_window", lambda: canonical_edges(naive_pairs(ev))),
        (
            "chunked_two_pass",
            lambda: canonical_edges(
                grouped_lead_pairs(
                    ev, "event_type", ["ts", "event_id"], "user_id", hour_chunk("ts")
                )
            ),
        ),
    ]
    # min-of-2, interleaved (the bench.py discipline): single-shot
    # readings on this sandbox swing ~20% between runs.
    results = {name: (None, None, float("inf")) for name, _ in variants}
    for _pass in range(2):
        for name, fn in variants:
            t0 = time.time()
            n, h = summarize(fn())
            dt = time.time() - t0
            if dt < results[name][2]:
                results[name] = (n, h, dt)
            print(f"pass {_pass + 1} {name}: {n} edges, hash {h}, {dt:.1f}s")

    (n1, h1, _), (n2, h2, _) = results.values()
    assert (n1, h1) == (n2, h2), "edge sets diverge — rewrite is WRONG"
    print("edge sets identical; naive/chunked (min-of-2) = "
          f"{results['naive_5_task_window'][2] / results['chunked_two_pass'][2]:.2f}x")


if __name__ == "__main__":
    main()
