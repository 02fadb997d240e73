"""Replay: events_sessionize_by_type at 20M events vs its naive twin.

The r9 entry composes grouped_lag + grouped_prefix_sum; its building
blocks were replayed individually at 20M rows (replay_events_chunked,
replay_chunk_skew) but not the composition. This replay also drove the
entry's respell: the first spelling (grouped_global_rank + a (type,
rank) row-volume self-join) measured 0.51x naive at 20M; grouped_lag
removes the join and a rank pass -> 0.82x naive at local[32] with no
task ever holding 1/5 of the corpus (the cusum precedent: local cost
parity-ish, the win is the absent hot task at 1000 executors). This tool builds a BURSTY 20M-event corpus — the shape
type-level episode detection actually sees: 4000-event activity hours
separated by 4h quiet gaps (~800 events per (type, hour) inside an
episode, ~5000 episodes per type) — writes it in the testdata layout,
and times the IMPORTED entry function against an inline naive
lag+cumsum twin (both its windows partitioned by the bare 5-value
event_type — the one-task-per-type shape the entry exists to avoid),
with a row-count + value-hash equivalence check.

Chunk-width honesty: an earlier cut placed events UNIFORMLY over 63
years (mean per-type gap ~500s). That is the chunking WORST case —
~0.7 events per (type, hour) makes the offsets frame nearly
corpus-sized and the entry ran 2.7x SLOWER than naive — and it is
also not a 100 TB shape (a stream sparse enough to have 1800s gaps
everywhere is a small table by construction). Density inside activity
periods is what grows with scale; the hour chunk is sized for it, and
``chunk_skew_stats`` is the sizing diagnostic when it is not.

Usage: PYTHONPATH=/root/repo python tools/replay_sessionize.py [n_events]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from tools.replay_corpus import EVENT_TYPES
from warpdb_spark.inventory.scale_ops import _t, events_sessionize_by_type
from warpdb_spark.session import get_spark

OUT = "/tmp/replay_sessionize"


def build_corpus(spark, n_events: int) -> None:
    base_ns = 1_700_000_000_000_000_000
    # 4000 consecutive ids share one ACTIVE hour (~800 per type, gaps
    # ~4.5s inside); active hours sit 5h apart, so the 4h+ quiet gap
    # between them breaks every type's stream at the 1800s threshold
    spread = (
        F.floor(F.col("id") / 4000) * (5 * 3600)
        + F.pmod(F.xxhash64(F.col("id") * 3), F.lit(3600))
    )
    events = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        (F.lit(base_ns) + spread * 1_000_000_000).alias("ts"),
        F.pmod(F.xxhash64(F.col("id") * 7), F.lit(200_000)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in EVENT_TYPES]),
            (F.pmod(F.col("id"), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    events.write.mode("overwrite").parquet(f"{OUT}/events.parquet")


def naive(spark, sf_dir):
    """The classic lag -> flag -> cumsum spelling, every window
    partitioned by the bare event_type (5 tasks forever)."""
    ev = _t(spark, sf_dir, "events").select("event_type", "event_id", "ts")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    sec = F.col("ts").cast("long")
    prev = F.lag(sec).over(w)
    flagged = ev.withColumn(
        "new_s",
        F.when(prev.isNull() | ((sec - prev) > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    s = flagged.withColumn(
        "session_seq",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )
    return s.groupBy("event_type", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.max(sec) - F.min(sec)).cast("bigint").alias("duration_secs"),
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
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("replay-sessionize", shuffle_partitions=64)
    build_corpus(spark, n_events)

    t0 = time.time()
    n1, h1 = _summ(naive(spark, OUT))
    t_naive = time.time() - t0
    print(f"  naive lag+cumsum (5 tasks): {t_naive:6.1f}s  sessions={n1}  hash={h1}")

    t0 = time.time()
    n2, h2 = _summ(events_sessionize_by_type(spark, OUT))
    t_entry = time.time() - t0
    print(f"  chunked entry composition:  {t_entry:6.1f}s  sessions={n2}  hash={h2}")
    same = (n1, h1) == (n2, h2)
    print(f"  hash-identical: {same}   speedup: {t_naive / t_entry:.2f}x")
    return 0 if same else 1


if __name__ == "__main__":
    raise SystemExit(main())
