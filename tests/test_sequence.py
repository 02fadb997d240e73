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


def test_reserved_name_collision_raises(events):
    from warpdb_spark.operators.sequence import (
        grouped_global_rank,
        grouped_prefix_sum,
    )

    bad = events.withColumn("__chunk", F.lit(1))
    with pytest.raises(ValueError, match="__chunk"):
        grouped_lead_pairs(bad, "event_type", ["ts", "event_id"], "user_id",
                           hour_chunk("ts"))
    with pytest.raises(ValueError, match="__chunk"):
        grouped_global_rank(bad, "event_type", ["ts", "event_id"],
                            hour_chunk("ts"))
    # output-name collisions are refused too (silent overwrite before)
    with pytest.raises(ValueError, match="user_id"):
        grouped_prefix_sum(events, "event_type", ["ts", "event_id"],
                           hour_chunk("ts"), "user_id", prefix_col="user_id")


def test_lead_pairs_drop_null_valued_successors(spark):
    """Documented contract (r8 advice): a pair whose NEXT row has a
    NULL value never appears as dst — same as the naive lead +
    dst-not-null filter."""
    rows = [
        Row(g="a", ts=1, v=10),
        Row(g="a", ts=2, v=None),
        Row(g="a", ts=3, v=30),
    ]
    df = spark.createDataFrame(rows, "g string, ts int, v int")
    got = grouped_lead_pairs(
        df, "g", ["ts"], "v", (F.col("ts") / 2).cast("long")
    ).collect()
    naive = _naive_pairs(df, "g", ["ts"], "v").collect()
    assert sorted(
        ((r.src is None, r.src), r.dst) for r in got
    ) == sorted(((r.src is None, r.src), r.dst) for r in naive)
    # the (10 -> NULL) pair is dropped by BOTH spellings
    assert None not in {r.dst for r in got}
    # the NULL-valued row DOES appear as src of the next pair
    assert (None, 30) in {(r.src, r.dst) for r in got}


def test_chunk_skew_stats_flags_hot_chunk(spark):
    from warpdb_spark.operators.sequence import chunk_skew_stats

    rows = [Row(g="hot", ts=100, i=i) for i in range(50)]  # one chunk
    rows += [Row(g="cold", ts=i * 7200, i=i) for i in range(50)]  # spread
    df = spark.createDataFrame(rows, "g string, ts long, i long")
    stats = {
        r["group"]: r
        for r in chunk_skew_stats(
            df, "g", (F.col("ts") / 3600).cast("long"), advisory_rows=10
        ).collect()
    }
    assert stats["hot"]["hot_chunk_advisory"] is True
    assert stats["hot"]["max_chunk_rows"] == 50
    assert stats["hot"]["hot_share"] == 1.0
    assert stats["cold"]["hot_chunk_advisory"] is False
    assert stats["cold"]["n_chunks"] == 50


def test_refine_hot_chunks_splits_only_hot_and_stays_exact(spark):
    """Auto-split: the burst group's identical-ts run splits by the
    tiebreaker; quiet (group, chunk) pairs keep one chunk; prefix sums
    are identical to the naive single-window spelling."""
    from warpdb_spark.operators.sequence import (
        grouped_prefix_sum,
        refine_hot_chunks,
    )

    rows = [Row(g="b", ts=100, i=i, w=i % 7) for i in range(200)]  # burst
    rows += [Row(g="q", ts=i * 3600, i=i, w=i % 5) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, ts long, i long, w long")
    hour = (F.col("ts") / 3600).cast("long")
    refined = refine_hot_chunks(
        df, "g", hour, F.col("ts"), "i", advisory_rows=50, width=16
    )
    out = grouped_prefix_sum(
        refined, "g", ["ts", "i"], F.col("__rchunk"), "w",
        prefix_col="cum", total_col=None, max_chunk_rows_col="mx",
    )
    # burst split into ceil(200/16) sub-chunks of <= 16 rows
    mx = {r["g"]: r["mx"] for r in out.select("g", "mx").distinct().collect()}
    assert mx["b"] <= 16 and mx["q"] == 1
    w_naive = (
        Window.partitionBy("g")
        .orderBy("ts", "i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = df.withColumn("cum", F.sum("w").over(w_naive))
    got = {(r.g, r.i): r.cum for r in out.collect()}
    want = {(r.g, r.i): r.cum for r in naive.collect()}
    assert got == want


def test_max_chunk_rows_col_rides_offsets(events):
    from warpdb_spark.operators.sequence import grouped_global_rank

    out = grouped_global_rank(
        events, "event_type", ["ts", "event_id"], hour_chunk("ts"),
        max_chunk_rows_col="mx",
    )
    per_chunk = (
        events.groupBy("event_type", hour_chunk("ts").alias("c"))
        .count()
        .groupBy("event_type")
        .agg(F.max("count").alias("mx"))
    )
    want = {r["event_type"]: r["mx"] for r in per_chunk.collect()}
    got = {r["event_type"]: r["mx"]
           for r in out.select("event_type", "mx").distinct().collect()}
    assert got == want


def test_nulls_last_value_chunk_survives_huge_doubles(spark):
    """r8 advice: the old 1<<62 integer sentinel ordered a double >=
    2^62 AFTER NULLs, corrupting the asc_nulls_last prefix walk. The
    struct(is_null, floor) chunk has no reachable sentinel."""
    from warpdb_spark.inventory.scale_ops import _nulls_last_value_chunk
    from warpdb_spark.operators.sequence import grouped_prefix_sum

    rows = [
        Row(g="a", i=1, value=1.0, w=1),
        Row(g="a", i=2, value=float(5e18), w=2),  # > 2^62 ~ 4.6e18
        Row(g="a", i=3, value=None, w=4),
        Row(g="a", i=4, value=9.0e18, w=8),
        Row(g="a", i=5, value=float("nan"), w=16),  # sorts after +inf
        Row(g="a", i=6, value=float("inf"), w=32),
    ]
    df = spark.createDataFrame(rows, "g string, i int, value double, w int")
    out = grouped_prefix_sum(
        df, "g", [F.asc_nulls_last("value"), "i"],
        _nulls_last_value_chunk("value"), "w",
        prefix_col="cum", total_col=None,
    )
    got = {r.i: r.cum for r in out.collect()}
    # asc_nulls_last order: 1.0(w1), 5e18(w2), 9e18(w8), inf(w32),
    # NaN(w16), NULL(w4) — NaN after inf, NULL last
    assert got == {1: 1, 2: 3, 4: 11, 6: 43, 5: 59, 3: 63}


def test_refine_hot_chunks_subsecond_ts_needs_exact_fine_value(spark):
    """r9 review: fine_chunk must separate every distinct leading-order
    value. With sub-second timestamps, the exact value (cast double)
    is the legal fine chunk; results must match the naive window."""
    from warpdb_spark.operators.sequence import (
        grouped_prefix_sum,
        refine_hot_chunks,
    )

    # burst inside one hour with DISTINCT sub-second ts whose id order
    # opposes ts order — the truncation trap
    rows = [
        Row(g="b", us=1_700_000_000_000_000 + (199 - i) * 1000, i=i, w=1 + i % 3)
        for i in range(200)
    ]
    df = (
        spark.createDataFrame(rows, "g string, us long, i long, w long")
        .withColumn("ts", F.timestamp_micros("us"))
        .drop("us")
    )
    hour = (F.unix_timestamp("ts") / 3600).cast("long")
    refined = refine_hot_chunks(
        df, "g", hour, F.col("ts").cast("double"), "i",
        advisory_rows=50, width=16,
    )
    out = grouped_prefix_sum(
        refined, "g", ["ts", "i"], F.col("__rchunk"), "w",
        prefix_col="cum", total_col=None,
    )
    w_naive = (
        Window.partitionBy("g")
        .orderBy("ts", "i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = df.withColumn("cum", F.sum("w").over(w_naive))
    got = {(r.g, r.i): r.cum for r in out.collect()}
    want = {(r.g, r.i): r.cum for r in naive.collect()}
    assert got == want


def test_grouped_lag_equals_naive_lag(events):
    from warpdb_spark.operators.sequence import grouped_lag

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    want = sorted(
        map(
            tuple,
            events.select(
                "event_type", "event_id",
                F.lag("user_id").over(w).alias("prev"),
            ).collect(),
        ),
        key=lambda t: (t[0], t[1]),
    )
    got = sorted(
        map(
            tuple,
            grouped_lag(
                events, "event_type", ["ts", "event_id"], "user_id",
                hour_chunk("ts"), out_col="prev",
            ).select("event_type", "event_id", "prev").collect(),
        ),
        key=lambda t: (t[0], t[1]),
    )
    assert got == want


def test_grouped_lag_sparse_and_single_row_chunks(spark):
    from warpdb_spark.operators.sequence import grouped_lag

    rows = [
        Row(event_id=1, ts=10, event_type="x", user_id=1),
        Row(event_id=2, ts=20, event_type="x", user_id=2),
        Row(event_id=3, ts=7 * 3600 + 5, event_type="x", user_id=3),  # lone chunk
        Row(event_id=4, ts=50, event_type="y", user_id=9),  # lone row
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.timestamp_seconds("ts"))
    got = {
        (r.event_type, r.event_id): r.prev
        for r in grouped_lag(
            df, "event_type", ["ts", "event_id"], "user_id",
            hour_chunk("ts"), out_col="prev",
        ).collect()
    }
    # chunk-first rows reach back across the 7-chunk gap; group firsts NULL
    assert got == {("x", 1): None, ("x", 2): 1, ("x", 3): 2, ("y", 4): None}


class TestGroupedCarry:
    """grouped_carry (two-pass LOCF/NOCB, r11) must match the naive
    per-group ignorenulls window scan value-for-value, including
    all-null leading runs, null chunks' carry-in, and struct values."""

    @pytest.fixture(scope="class")
    def sparse(self, spark):
        import random

        rng = random.Random(11)
        rows = []
        for g in ["a", "b", "c"]:
            for i in range(200):
                rows.append(
                    Row(
                        g=g,
                        pos=i,
                        # ~70% missing, and group 'c' starts with a long
                        # null run so the first chunks carry NULL
                        v=(
                            None
                            if rng.random() < 0.7 or (g == "c" and i < 60)
                            else float(i)
                        ),
                    )
                )
        return spark.createDataFrame(rows)

    def _naive(self, df, backward=False):
        w = Window.partitionBy("g").orderBy("pos")
        if backward:
            exp = F.first("v", ignorenulls=True).over(
                w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            )
        else:
            exp = F.last("v", ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        return {(r["g"], r["pos"]): r["c"] for r in df.select("g", "pos", exp.alias("c")).collect()}

    @pytest.mark.parametrize("backward", [False, True])
    def test_matches_naive_window(self, sparse, backward):
        from warpdb_spark.operators.sequence import grouped_carry

        got = grouped_carry(
            sparse,
            "g",
            ["pos"],
            value="v",
            chunk_expr=F.floor(F.col("pos") / 16),
            out_col="c",
            backward=backward,
        )
        got_map = {(r["g"], r["pos"]): r["c"] for r in got.collect()}
        assert got_map == self._naive(sparse, backward)

    def test_struct_values_carry_order_and_value(self, sparse):
        """The interpolation pattern: carry struct(pos, v) of observed
        rows both directions; struct fields must come from the same
        observation (no cross-row mixing)."""
        from warpdb_spark.operators.sequence import grouped_carry

        obs = F.when(F.col("v").isNotNull(), F.struct("pos", "v"))
        chunk = F.floor(F.col("pos") / 16)
        out = grouped_carry(sparse, "g", ["pos"], value=obs, chunk_expr=chunk, out_col="p")
        out = grouped_carry(out, "g", ["pos"], value=obs, chunk_expr=chunk, out_col="n", backward=True)
        for r in out.collect():
            for s in (r["p"], r["n"]):
                if s is not None:
                    assert s["v"] == float(s["pos"])  # fields travel together
            if r["v"] is not None:  # observed row carries itself both ways
                assert r["p"]["pos"] == r["pos"] and r["n"]["pos"] == r["pos"]

    def test_reserved_name_collision_raises(self, sparse):
        from warpdb_spark.operators.sequence import grouped_carry

        with pytest.raises(ValueError, match="reserved"):
            grouped_carry(
                sparse.withColumn("__v", F.lit(1)),
                "g",
                ["pos"],
                value="v",
                chunk_expr=F.floor(F.col("pos") / 16),
            )
