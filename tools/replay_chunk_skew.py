"""Replay: hot-chunk skew inside the chunked sequence primitives.

``hour_chunk`` notes the chunk width is the parallelism knob — but a
burst that lands most of one group in ONE hour re-creates the hot-task
problem inside the primitive built to prevent it (r8 verdict item #4).
This replay builds a pathological corpus — 20M events, 5 groups, with
50% of one group's rows at a single IDENTICAL timestamp — and shows:

1. ``chunk_skew_stats`` flags it: the burst group's hot_share ~= 0.5
   and ``hot_chunk_advisory`` fires, while the healthy groups stay
   quiet. (One map-side-combined aggregate — the guard costs one cheap
   diagnostic pass, not a per-query job.)
2. ``max_chunk_rows_col`` on ``grouped_prefix_sum`` exposes the same
   signal inline, riding the offsets aggregate the primitive already
   computes.
3. The FIX: a burst of identical leading order values cannot be split
   by any function of that value alone — the chunk must extend to the
   tiebreaker. ``struct(second(ts), floor(id / W))`` is monotone under
   the full (ts, id) lexicographic order for ANY data (ties split by
   id range; distinct ts ordered by the first field), so the auto-split
   chunk is always legal. Results are HASH-IDENTICAL to the hour-chunk
   spelling (integer prefix sums; unique full order) while the hot task
   disappears (max_chunk_rows: ~2M -> ~W).

Usage: PYTHONPATH=/root/repo python tools/replay_chunk_skew.py [n_rows]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from warpdb_spark.operators.sequence import (
    chunk_skew_stats,
    grouped_prefix_sum,
    hour_chunk,
)
from warpdb_spark.session import get_spark

BURST_GROUP = "g0"


def corpus(spark, n_rows: int):
    """(grp, ts, event_id, w): 5 groups; half of g0's rows collapse to
    one identical timestamp (the un-splittable burst), the rest spread
    uniformly over ~230 days of hours."""
    d = spark.range(n_rows).withColumnRenamed("id", "event_id")
    h = F.abs(F.xxhash64("event_id"))
    grp = F.concat(F.lit("g"), (h % 5).cast("string"))
    spread_sec = (F.abs(F.xxhash64("event_id", F.lit(1))) % 20_000_000)
    burst = (grp == BURST_GROUP) & (h % 2 == 0)
    ts = F.to_timestamp(
        F.from_unixtime(F.when(burst, F.lit(1_700_000_000)).otherwise(
            1_700_000_000 + spread_sec
        ))
    )
    return d.select(
        grp.alias("grp"), ts.alias("ts"), "event_id",
        (h % 97).cast("int").alias("w"),
    )


def _summ(df):
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns]) % 1_000_003
        ).alias("h"),
    ).first()
    return row["n"], row["h"]


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("replay-chunk-skew", shuffle_partitions=64)
    base = corpus(spark, n_rows)
    base.write.mode("overwrite").parquet("/tmp/replay_chunk_skew")
    base = spark.read.parquet("/tmp/replay_chunk_skew")

    # 1. the diagnostic flags the burst group (advisory at 1M rows/chunk)
    print(f"# chunk_skew_stats @ {n_rows:,} rows (hour chunks, advisory 1M)")
    stats = chunk_skew_stats(
        base, "grp", hour_chunk("ts"), advisory_rows=1_000_000
    ).orderBy("group")
    stats.show(truncate=False)
    hot = {r["group"]: r["hot_chunk_advisory"] for r in stats.collect()}
    flagged_only_burst = hot.get(BURST_GROUP) is True and sum(hot.values()) == 1
    print(f"  advisory fires for {BURST_GROUP} only: {flagged_only_burst}")

    # 2 + 3. prefix sum: hour chunk (hot task) vs tie-splitting struct
    # chunk (burst spread over ~rows/W sub-chunks) — hash-identical
    order = ["ts", "event_id"]
    split_chunk = F.struct(
        F.unix_timestamp("ts").alias("s"),
        F.floor(F.col("event_id") / 65536).alias("b"),
    )

    def run(tag, chunk):
        t0 = time.time()
        out = grouped_prefix_sum(
            base, "grp", order, chunk, "w",
            prefix_col="cum", total_col=None, max_chunk_rows_col="mx",
        )
        mx = out.select(F.max("mx")).first()[0]
        n, h = _summ(out.select("grp", "event_id", "cum"))
        dt = time.time() - t0
        print(f"  {tag:>12}: {dt:6.1f}s  n={n}  hash={h}  max_chunk_rows={mx:,}")
        return n, h

    print("# grouped_prefix_sum: hour chunk vs tie-splitting struct chunk")
    a = run("hour", hour_chunk("ts"))
    b = run("global-split", split_chunk)

    # adaptive: refine ONLY the advisory-flagged (group, hour) pairs —
    # quiet hours keep one chunk each, so the offsets frame stays small
    from warpdb_spark.operators.sequence import refine_hot_chunks

    # fine = unix seconds is legal HERE because corpus ts is generated
    # at second resolution (from_unixtime); sub-second orders must pass
    # the exact value instead — see refine_hot_chunks' legality note
    refined = refine_hot_chunks(
        base, "grp", hour_chunk("ts"), F.unix_timestamp("ts"),
        "event_id", advisory_rows=1_000_000,
    )
    t0 = time.time()
    out = grouped_prefix_sum(
        refined, "grp", order, F.col("__rchunk"), "w",
        prefix_col="cum", total_col=None, max_chunk_rows_col="mx",
    )
    mx = out.select(F.max("mx")).first()[0]
    n, h = _summ(out.select("grp", "event_id", "cum"))
    print(
        f"  {'auto-split':>12}: {time.time() - t0:6.1f}s  n={n}  hash={h}  "
        f"max_chunk_rows={mx:,}"
    )
    same = a == b == (n, h)
    print(f"  hash-identical (all three): {same}")
    return 0 if (flagged_only_burst and same) else 1


if __name__ == "__main__":
    raise SystemExit(main())
