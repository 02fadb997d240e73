"""Replay: label-propagation rounds at a 20M-event graph.

``graph_label_propagation``'s scale claim is that each round is three
key-partitioned shuffles (labels⋈edges hash join, (node, label)
count, min_by argmax) with no bounded-key stage — so round cost
should track the EDGE count, not collapse onto a handful of tasks.
This tool derives the user-interaction graph from the shared
20M-event corpus (the real entry path: grouped_lead_pairs chunked
edges), runs the entry's exact round loop at 2 and 4 rounds with
full materialization, and prints per-round wall time plus the label
distribution so convergence is visible.

Usage: PYTHONPATH=/root/repo python tools/replay_lpa.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from warpdb_spark.session import get_spark
from tools import replay_corpus as rc

OUT = "/tmp/replay_lpa_corpus"


def main() -> int:
    spark = get_spark("replay-lpa")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    if not os.path.isdir(f"{OUT}/events.parquet"):
        rc.build_events(spark, OUT)

    import warpdb_spark.inventory.scale_ops as so

    t0 = time.time()
    E = so._user_edges(spark, OUT).persist()
    n_edges = E.count()
    print(f"edges: {n_edges:,} from 20M events ({time.time() - t0:.1f}s)")

    directed = (
        E.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(E.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .persist()
    )
    n_nodes = directed.select("u").distinct().count()
    print(f"nodes: {n_nodes:,}")

    labels = directed.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for rnd in range(1, 5):
        t0 = time.time()
        cand = directed.join(labels, directed.v == labels.node).select("u", "label")
        counts = cand.groupBy("u", "label").agg(F.count(F.lit(1)).alias("cnt"))
        labels = counts.groupBy("u").agg(
            F.min_by(
                "label", F.struct((-F.col("cnt")).alias("nc"), F.col("label"))
            ).alias("label")
        ).select(F.col("u").alias("node"), "label").persist()
        n_labels = labels.select("label").distinct().count()
        dt = time.time() - t0
        print(f"round {rnd}: {dt:.1f}s, {n_labels:,} distinct labels")
    E.unpersist()
    directed.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
