"""operators/sequence: two-pass chunked lead must be pair-for-pair
identical to the naive single-window lead (the spelling it replaces
for scale reasons — see tools/audit_window_plans.py)."""

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from warpdb_spark.operators.sequence import grouped_lead_pairs, hour_chunk


def _naive_pairs(df, group, order, value):
    w = Window.partitionBy(group).orderBy(*order)
    return (
        df.select(
            F.col(group),
            F.col(value).alias("src"),
            F.lead(value).over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
    )


@pytest.fixture(scope="module")
def events(spark):
    import random

    rng = random.Random(8)
    rows = [
        Row(
            event_id=i,
            ts=rng.randint(0, 5 * 3600 - 1),  # 5 hour-chunks
            event_type=rng.choice(["a", "b", "c"]),
            user_id=rng.randint(1, 20),
        )
        for i in range(400)
    ]
    return spark.createDataFrame(rows).withColumn(
        "ts", F.timestamp_seconds("ts")
    )


def test_chunked_lead_equals_naive_window(events):
    got = grouped_lead_pairs(
        events, "event_type", ["ts", "event_id"], "user_id", hour_chunk("ts")
    )
    want = _naive_pairs(events, "event_type", ["ts", "event_id"], "user_id")
    # multiset equality: same (group, src, dst) with same multiplicity
    agg = lambda df: sorted(
        map(tuple, df.groupBy("event_type", "src", "dst").count().collect())
    )
    assert agg(got) == agg(want)


def test_chunked_lead_handles_sparse_and_single_row_chunks(spark):
    # chunks 0 and 7 only; chunk 7 has a single row -> pure boundary
    rows = [
        Row(event_id=1, ts=10, event_type="x", user_id=1),
        Row(event_id=2, ts=20, event_type="x", user_id=2),
        Row(event_id=3, ts=7 * 3600 + 5, event_type="x", user_id=3),
        Row(event_id=4, ts=50, event_type="y", user_id=9),  # lone row, no pair
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.timestamp_seconds("ts"))
    got = {
        (r.event_type, r.src, r.dst)
        for r in grouped_lead_pairs(
            df, "event_type", ["ts", "event_id"], "user_id", hour_chunk("ts")
        ).collect()
    }
    assert got == {("x", 1, 2), ("x", 2, 3)}


def test_chunked_lead_tie_order_uses_full_order_key(spark):
    # equal ts: event_id breaks the tie, inside one chunk
    rows = [
        Row(event_id=2, ts=100, event_type="x", user_id=22),
        Row(event_id=1, ts=100, event_type="x", user_id=11),
        Row(event_id=3, ts=101, event_type="x", user_id=33),
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.timestamp_seconds("ts"))
    got = {
        (r.src, r.dst)
        for r in grouped_lead_pairs(
            df, "event_type", ["ts", "event_id"], "user_id", hour_chunk("ts")
        ).collect()
    }
    assert got == {(11, 22), (22, 33)}


def test_grouped_global_rank_equals_naive_row_number(events):
    from warpdb_spark.operators.sequence import grouped_global_rank

    w = Window.partitionBy("event_type").orderBy("user_id", "event_id")
    want = sorted(
        map(
            tuple,
            events.select(
                "event_type",
                "event_id",
                F.row_number().over(w).alias("rnk"),
                F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            grouped_global_rank(
                events,
                "event_type",
                ["user_id", "event_id"],
                F.col("user_id"),  # identity chunk on the leading order col
                rank_col="rnk",
                n_col="n",
            )
            .select("event_type", "event_id", "rnk", "n")
            .collect(),
        )
    )
    assert got == want


def test_grouped_prefix_sum_equals_naive_running_sum(events):
    from warpdb_spark.operators.sequence import grouped_prefix_sum

    ev = events.withColumn("wt", (F.col("user_id") % 3 + 1))
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = sorted(
        map(
            tuple,
            ev.select(
                "event_type",
                "event_id",
                F.sum("wt").over(w).alias("cum"),
                F.sum("wt").over(Window.partitionBy("event_type")).alias("tot"),
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            grouped_prefix_sum(
                ev,
                "event_type",
                ["ts", "event_id"],
                hour_chunk("ts"),
                "wt",
                prefix_col="cum",
                total_col="tot",
            )
            .select("event_type", "event_id", "cum", "tot")
            .collect(),
        )
    )
    assert got == want


def test_null_chunk_rows_are_kept_not_dropped(spark):
    """r8 review finding: the stitch join must be NULL-SAFE — a NULL
    chunk (floor() of a NULL value) is a legal chunk that sorts first
    (Spark's plain-asc NULLS FIRST), not a row silently dropped by a
    null-rejecting equi-join while n still counts it."""
    from warpdb_spark.operators.sequence import (
        grouped_global_rank,
        grouped_prefix_sum,
    )

    rows = [
        Row(g="a", id=1, v=None),
        Row(g="a", id=2, v=5.0),
        Row(g="a", id=3, v=105.0),
    ]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {
        r.id: (r.rnk, r.n)
        for r in grouped_global_rank(
            df, "g", ["v", "id"], F.floor("v").cast("long"),
            rank_col="rnk", n_col="n",
        ).collect()
    }
    # NULL sorts first under plain asc; all three rows present, n = 3
    assert got == {1: (1, 3), 2: (2, 3), 3: (3, 3)}
    ps = {
        r.id: (r.cum, r.tot)
        for r in grouped_prefix_sum(
            df.withColumn("w", F.lit(1)),
            "g", ["v", "id"], F.floor("v").cast("long"), "w",
            prefix_col="cum", total_col="tot",
        ).collect()
    }
    assert ps == {1: (1, 3), 2: (2, 3), 3: (3, 3)}
