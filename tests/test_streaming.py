"""Structured Streaming tests (SURVEY §2.9): real readStream micro-batch
execution — the principled version of the reference's chunked CSV loop
(src/csv_loader.cpp:186-223, src/warpdb.cpp:544-590) — plus the
batch/stream-identical window helpers."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from warpdb_spark.streaming.windows import (
    read_csv_stream,
    run_to_memory_sink,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("key", StringType()),
        StructField("value", DoubleType()),
    ]
)


@pytest.fixture()
def csv_stream_dir(tmp_path):
    """Three CSV 'chunks' — the stream reads them as micro-batches."""
    lines = {
        "part1.csv": [
            "ts,key,value",
            "2024-01-01 00:05:00,a,1.0",
            "2024-01-01 00:20:00,a,2.0",
        ],
        "part2.csv": [
            "ts,key,value",
            "2024-01-01 01:05:00,a,3.0",
            "2024-01-01 01:10:00,b,4.0",
        ],
        "part3.csv": [
            "ts,key,value",
            "2024-01-01 02:30:00,b,5.0",
        ],
    }
    for name, ls in lines.items():
        (tmp_path / name).write_text("\n".join(ls) + "\n")
    return str(tmp_path)


class TestRealStreaming:
    def test_tumbling_stream_to_memory(self, spark, csv_stream_dir):
        stream = read_csv_stream(spark, csv_stream_dir, SCHEMA)
        assert stream.isStreaming
        agg = tumbling_window_agg(
            stream,
            "ts",
            "1 hour",
            keys=["key"],
            aggs=[F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")],
            watermark="2 hours",
        )
        q = run_to_memory_sink(agg, "tumbling_test", timeout_sec=120)
        try:
            rows = {
                (r.window_start.hour, r.key): (r.n, r.total)
                for r in spark.sql("SELECT * FROM tumbling_test").collect()
            }
        finally:
            q.stop()
        assert rows[(0, "a")] == (2, 3.0)
        assert rows[(1, "a")] == (1, 3.0)
        assert rows[(1, "b")] == (1, 4.0)
        assert rows[(2, "b")] == (1, 5.0)

    def test_ohlc_order_statistics_stream_to_memory(self, spark, csv_stream_dir):
        """min_by/max_by in a watermarked streaming window — the live
        twin of the stream_ohlc_hourly entry: order-statistic
        aggregates have composable partial states, so OHLC runs as a
        plain windowed agg with no custom state."""
        stream = read_csv_stream(spark, csv_stream_dir, SCHEMA)
        k = F.struct(F.col("ts"))
        agg = tumbling_window_agg(
            stream,
            "ts",
            "1 hour",
            keys=["key"],
            aggs=[
                F.min_by("value", k).alias("open_v"),
                F.max("value").alias("high_v"),
                F.min("value").alias("low_v"),
                F.max_by("value", k).alias("close_v"),
            ],
            watermark="2 hours",
        )
        q = run_to_memory_sink(agg, "ohlc_test", timeout_sec=120)
        try:
            rows = {
                (r.window_start.hour, r.key): (r.open_v, r.high_v, r.low_v, r.close_v)
                for r in spark.sql("SELECT * FROM ohlc_test").collect()
            }
        finally:
            q.stop()
        assert rows[(0, "a")] == (1.0, 2.0, 1.0, 2.0)  # open≠close
        assert rows[(1, "a")] == (3.0, 3.0, 3.0, 3.0)
        assert rows[(1, "b")] == (4.0, 4.0, 4.0, 4.0)
        assert rows[(2, "b")] == (5.0, 5.0, 5.0, 5.0)

    def test_foreach_batch_parquet_sink(self, spark, csv_stream_dir, tmp_path):
        """foreachBatch: stream → per-batch transformation → parquet."""
        out_dir = str(tmp_path / "out")
        stream = read_csv_stream(spark, csv_stream_dir, SCHEMA)

        def handle(batch_df, batch_id):
            batch_df.withColumn("doubled", F.col("value") * 2).write.mode(
                "append"
            ).parquet(out_dir)

        q = (
            stream.writeStream.foreachBatch(handle)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        result = spark.read.parquet(out_dir)
        assert result.count() == 5
        assert result.filter(F.col("doubled") == 10.0).count() == 1


class TestBatchWindows:
    @pytest.fixture(scope="class")
    def ev(self, spark):
        rows = [
            Row(ts="2024-01-01 00:05:00", key="a", value=1.0),
            Row(ts="2024-01-01 00:20:00", key="a", value=2.0),
            Row(ts="2024-01-01 00:50:00", key="a", value=3.0),
            Row(ts="2024-01-01 02:00:00", key="a", value=4.0),
        ]
        return spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))

    def test_tumbling_batch(self, ev):
        out = tumbling_window_agg(ev, "ts", "1 hour", keys=["key"])
        assert {(r.window_start.hour, r.n) for r in out.collect()} == {(0, 3), (2, 1)}

    def test_sliding_batch(self, ev):
        out = sliding_window_agg(ev, "ts", "1 hour", "30 minutes", keys=["key"])
        by_start = {
            (r.window_start.hour, r.window_start.minute): r.n for r in out.collect()
        }
        assert by_start[(0, 0)] == 3  # 00:00-01:00 covers 00:05, 00:20, 00:50
        assert by_start[(23, 30)] == 2  # 23:30-00:30 covers 00:05, 00:20
        assert by_start[(0, 30)] == 1  # 00:30-01:30 covers 00:50

    def test_session_batch(self, ev):
        out = session_window_agg(ev, "ts", "30 minutes", keys=["key"])
        sessions = sorted(
            (r.session_start.hour, r.session_start.minute, r.n) for r in out.collect()
        )
        # the 00:20 -> 00:50 gap is exactly 30min: Spark merges at
        # equality (gap is inclusive), so 00:05/00:20/00:50 is ONE session
        assert sessions == [(0, 5, 3), (2, 0, 1)]


class TestStatefulStreaming:
    def test_running_totals_across_microbatches(self, spark, csv_stream_dir, tmp_path):
        """applyInPandasWithState: per-key state must accumulate across
        the three file micro-batches."""
        from warpdb_spark.streaming.stateful import running_totals

        stream = read_csv_stream(spark, csv_stream_dir, SCHEMA)
        out = running_totals(stream, "key", "value")
        q = (
            out.writeStream.format("memory")
            .queryName("stateful_test")
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        # last update per key reflects the full history
        rows = spark.sql(
            "SELECT key, max(n_events) AS n, max(total) AS total "
            "FROM stateful_test GROUP BY key"
        ).collect()
        got = {r.key: (r.n, r.total) for r in rows}
        assert got["a"] == (3, 6.0)
        assert got["b"] == (2, 9.0)


class TestFirstSeenStatefulDedup:
    """streaming/stateful.py::first_seen driving incremental MinHash
    dedup over real micro-batches must emit the same novelty set as
    the batch-identical inventory entry (stream_incremental_dedup)."""

    T1 = "alpha beta gamma delta epsilon zeta eta theta"
    T2 = "completely different words in this one here now"
    T3 = "yet another unrelated document body text sample"

    def test_stateful_matches_batch_novelty(self, spark, tmp_path):
        import unittest.mock as mock

        import warpdb_spark.inventory.analytics_ext as ax
        from warpdb_spark.operators.dedup import portable_band_keys
        from warpdb_spark.streaming.stateful import first_seen

        d = tmp_path / "docs"
        d.mkdir()
        import os
        import time

        (d / "b1.csv").write_text(
            f"doc_id,text\n1,{self.T1}\n2,{self.T2}\n3,{self.T1}\n"
        )
        (d / "b2.csv").write_text(f"doc_id,text\n4,{self.T1}\n5,{self.T3}\n")
        # the file source orders micro-batches by modification time —
        # pin b1 strictly earlier so arrival order matches doc_id order
        now = time.time()
        os.utime(d / "b1.csv", (now - 10, now - 10))
        os.utime(d / "b2.csv", (now, now))
        schema = "doc_id LONG, text STRING"
        stream = (
            spark.readStream.option("header", True)
            .option("maxFilesPerTrigger", 1)
            .schema(schema)
            .csv(str(d))
        )
        keyed = portable_band_keys(stream, "doc_id", "text", n_bands=4)
        out = first_seen(keyed, "key", "doc_id")
        q = (
            out.writeStream.format("memory")
            .queryName("first_seen_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        live = spark.sql(
            "SELECT doc_id, bool_and(novel_for_key) AS is_novel "
            "FROM first_seen_out GROUP BY doc_id"
        )
        got = {r.doc_id: r.is_novel for r in live.collect()}

        docs = spark.read.option("header", True).schema(schema).csv(str(d))
        with mock.patch.object(ax, "_t", lambda s, sd, n: docs):
            want = {
                r.doc_id: r.is_novel
                for r in ax.stream_incremental_dedup(spark, "x").collect()
            }
        assert got == want
        # 3 is a within-batch dup of 1; 4 is a cross-batch dup of 1
        assert want[1] and want[2] and want[5]
        assert not want[3] and not want[4]


class TestWatermarkLateData:
    def test_late_event_dropped_in_append_mode(self, spark, tmp_path):
        """Files arrive as separate micro-batches; the watermark advances
        past an old window, so a very-late event must NOT resurrect it
        (append mode emits each window once, finalized)."""
        d = tmp_path / "stream"
        d.mkdir()

        out_dir = str(tmp_path / "late_out")

        def run_once():
            stream = read_csv_stream(spark, str(d), SCHEMA)
            agg = (
                stream.withWatermark("ts", "1 hour")
                .groupBy(F.window("ts", "1 hour").alias("win"), "key")
                .agg(F.sum("value").alias("total"))
                .select(F.col("win.start").alias("ws"), "key", "total")
            )
            # file sink: supports checkpoint recovery across restarts
            # (memory sink does not)
            q = (
                agg.writeStream.format("parquet")
                .option("path", out_dir)
                .outputMode("append")
                .trigger(availableNow=True)
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .start()
            )
            q.awaitTermination(120)
            q.stop()

        # run 1: events at 00:10/00:20, then 06:00 — the checkpointed
        # watermark ends at 05:00, past the hour-0 window's end
        (d / "f1.csv").write_text(
            "ts,key,value\n2024-01-01 00:10:00,a,1.0\n2024-01-01 00:20:00,a,2.0\n"
        )
        (d / "f2.csv").write_text("ts,key,value\n2024-01-01 06:00:00,a,10.0\n")
        run_once()
        # run 2: a very-late event (00:05 << watermark 05:00) must be
        # dropped, not resurrect the finalized hour-0 window
        (d / "f3.csv").write_text("ts,key,value\n2024-01-01 00:05:00,a,100.0\n")
        run_once()
        rows = {r.ws.hour: r.total for r in spark.read.parquet(out_dir).collect()}
        assert rows.get(0) == 3.0


class TestIntervalJoin:
    """interval_join: batch/stream-identical key-equality + time-bound
    join; on streams it is a watermarked stream-stream join."""

    @staticmethod
    def _dirs(tmp_path):
        clicks = tmp_path / "clicks"
        purchases = tmp_path / "purchases"
        clicks.mkdir()
        purchases.mkdir()
        (clicks / "c1.csv").write_text(
            "ts,key,value\n"
            "2024-01-01 00:00:00,u1,0.0\n"
            "2024-01-01 02:00:00,u2,0.0\n"
        )
        (clicks / "c2.csv").write_text(
            "ts,key,value\n2024-01-01 03:00:00,u1,0.0\n"
        )
        (purchases / "p1.csv").write_text(
            "ts,key,value\n"
            "2024-01-01 00:30:00,u1,10.0\n"  # within 1h of u1 click@00:00
            "2024-01-01 01:30:00,u1,20.0\n"  # outside 1h of any u1 click
        )
        (purchases / "p2.csv").write_text(
            "ts,key,value\n"
            "2024-01-01 02:10:00,u2,30.0\n"  # within 1h of u2 click@02:00
            "2024-01-01 03:05:00,u1,40.0\n"  # within 1h of u1 click@03:00
        )
        return str(clicks), str(purchases)

    @pytest.mark.slow
    def test_stream_stream_interval_join(self, spark, tmp_path):
        from warpdb_spark.streaming.windows import interval_join

        cdir, pdir = self._dirs(tmp_path)
        clicks = read_csv_stream(spark, cdir, SCHEMA).select(
            F.col("ts").alias("cts"), F.col("key")
        )
        purchases = read_csv_stream(spark, pdir, SCHEMA).select(
            F.col("ts").alias("pts"), F.col("key"), F.col("value")
        )
        out = interval_join(
            clicks, purchases, "cts", "pts", ["key"],
            lower="0 seconds", upper="1 hour", watermark="2 hours",
        )
        q = run_to_memory_sink(out, "ssjoin", output_mode="append")
        q.stop()
        rows = {
            (r["key"], r["value"])
            for r in spark.table("ssjoin").collect()
        }
        assert rows == {("u1", 10.0), ("u2", 30.0), ("u1", 40.0)}

    def test_batch_matches_stream_semantics(self, spark, tmp_path):
        from warpdb_spark.streaming.windows import interval_join

        cdir, pdir = self._dirs(tmp_path)
        clicks = spark.read.schema(SCHEMA).option("header", True).csv(cdir).select(
            F.col("ts").alias("cts"), F.col("key")
        )
        purchases = spark.read.schema(SCHEMA).option("header", True).csv(pdir).select(
            F.col("ts").alias("pts"), F.col("key"), F.col("value")
        )
        out = interval_join(
            clicks, purchases, "cts", "pts", ["key"],
            lower="0 seconds", upper="1 hour",
        )
        rows = {(r["key"], r["value"]) for r in out.collect()}
        assert rows == {("u1", 10.0), ("u2", 30.0), ("u1", 40.0)}

    def test_ambiguous_columns_rejected(self, spark, tmp_path):
        from warpdb_spark.streaming.windows import interval_join

        cdir, pdir = self._dirs(tmp_path)
        df = spark.read.schema(SCHEMA).option("header", True).csv(cdir)
        right = spark.read.schema(SCHEMA).option("header", True).csv(pdir).select(
            F.col("ts").alias("pts"), F.col("key"), F.col("value")
        )
        with pytest.raises(ValueError, match="ambiguous"):
            interval_join(df, right.withColumn("value", F.lit(1.0)).union(right), "ts", "pts", ["key"])


class TestStreamingDedup:
    def test_duplicates_across_microbatches_dropped(self, spark, tmp_path):
        from warpdb_spark.streaming.windows import dedup_stream

        d = tmp_path / "dup"
        d.mkdir()
        (d / "b1.csv").write_text(
            "ts,key,value\n"
            "2024-01-01 00:00:00,k1,1.0\n"
            "2024-01-01 00:01:00,k1,1.0\n"  # dup within batch
            "2024-01-01 00:02:00,k2,2.0\n"
        )
        (d / "b2.csv").write_text(
            "ts,key,value\n"
            "2024-01-01 00:10:00,k1,1.0\n"  # dup across batches, within watermark
            "2024-01-01 00:11:00,k3,3.0\n"
        )
        stream = read_csv_stream(spark, str(d), SCHEMA)
        out = dedup_stream(stream, ["key"], "ts", "1 hour")
        q = run_to_memory_sink(out, "dedupstream", output_mode="append")
        q.stop()
        keys = sorted(r["key"] for r in spark.table("dedupstream").collect())
        assert keys == ["k1", "k2", "k3"]

    def test_batch_fallback(self, spark):
        from warpdb_spark.streaming.windows import dedup_stream

        df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], ["k", "v"])
        assert dedup_stream(df, ["k"]).count() == 2


class TestExactlyOnceSink:
    def test_replay_is_idempotent(self, spark, csv_stream_dir, tmp_path_factory):
        """foreachBatch is at-least-once: a crash replays the last batch
        with the same batch_id. write_exactly_once lands each batch in
        its own dynamically-overwritten partition, so a FULL replay
        (checkpoint wiped, same batch ids re-emitted) converges to the
        same table instead of duplicating — the plain-parquet analog of
        a transactional sink."""
        import shutil

        from warpdb_spark.streaming.windows import write_exactly_once

        base = tmp_path_factory.mktemp("eo_sink")  # outside the stream's source dir
        out = str(base / "out")
        ckpt = str(base / "ckpt")

        def run_once():
            stream = read_csv_stream(spark, csv_stream_dir, SCHEMA)
            q = write_exactly_once(stream, out, ckpt)
            q.awaitTermination(120)
            q.stop()

        run_once()
        first = sorted(
            (r["key"], r["value"]) for r in spark.read.parquet(out).collect()
        )
        assert len(first) == 5
        batches = spark.read.parquet(out).select("__batch_id").distinct().count()
        assert batches == 3  # one file per trigger -> one partition per batch

        # simulate the worst replay: lose the checkpoint, rerun the
        # whole stream into the same path (same batch ids re-emitted)
        shutil.rmtree(ckpt)
        run_once()
        second = sorted(
            (r["key"], r["value"]) for r in spark.read.parquet(out).collect()
        )
        assert second == first  # no duplication, no loss


class TestStreamStaticEnrich:
    def test_static_dim_joins_each_microbatch(self, spark, csv_stream_dir):
        from warpdb_spark.streaming.windows import enrich_static

        stream = read_csv_stream(spark, csv_stream_dir, SCHEMA)
        assert stream.isStreaming
        dim = spark.createDataFrame(
            [Row(key="a", region="north"), Row(key="b", region="south")]
        )
        enriched = enrich_static(stream, dim, keys=["key"], how="left")
        assert enriched.isStreaming
        q = run_to_memory_sink(
            enriched.select("key", "value", "region"), "enrich_test", timeout_sec=120
        )
        try:
            rows = {
                (r.key, r.value): r.region
                for r in spark.sql("SELECT * FROM enrich_test").collect()
            }
        finally:
            q.stop()
        # all 5 events arrive enriched; every key resolves its region
        assert len(rows) == 5
        assert rows[("a", 1.0)] == "north" and rows[("b", 5.0)] == "south"

    def test_batch_plan_broadcasts_dim(self, spark, sf_dir):
        from warpdb_spark.streaming.windows import enrich_static

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            F.col("user_id").alias("c_custkey"), "value"
        )
        dim = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_nationkey"
        )
        plan = (
            enrich_static(ev, dim, keys=["c_custkey"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        # the stream/fact side must not shuffle for the join
        assert "Exchange hashpartitioning" not in plan


class TestIncrementalDedup:
    """Streaming MinHash-LSH dedup against a standing band-key store
    (streaming/incremental.py): within-batch collisions resolve to the
    lowest id, cross-batch collisions reject against the store, and a
    replayed batch is idempotent."""

    DOC_SCHEMA = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("text", StringType()),
        ]
    )

    T1 = "the quick brown fox jumps over the lazy dog every single day"
    T2 = "completely different content about distributed query engines and shuffles"
    T3 = "yet another unrelated document describing parquet row group statistics"

    def _mkdocs(self, tmp_path):
        d = tmp_path / "docs"
        d.mkdir()
        (d / "batch1.csv").write_text(
            "doc_id,text\n" + f'"1","{self.T1}"\n' + f'"2","{self.T2}"\n' + f'"3","{self.T1}"\n'
        )
        (d / "batch2.csv").write_text(
            "doc_id,text\n" + f'"4","{self.T1}"\n' + f'"5","{self.T3}"\n'
        )
        return str(d)

    def test_cross_and_within_batch_dedup(self, spark, tmp_path):
        from warpdb_spark.streaming.incremental import run_incremental_dedup
        from warpdb_spark.streaming.windows import read_csv_stream

        docs = self._mkdocs(tmp_path)
        store = str(tmp_path / "store")
        out = str(tmp_path / "out")
        stream = read_csv_stream(spark, docs, self.DOC_SCHEMA)
        q = run_incremental_dedup(
            stream, store, out, checkpoint=str(tmp_path / "ckpt")
        )
        q.awaitTermination(120)
        q.stop()

        admitted = {
            r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
        }
        # 3 is a within-batch dup of 1; 4 is a cross-batch dup of 1
        assert admitted == {"1", "2", "5"}
        # the store holds band keys ONLY for admitted docs
        store_ids = {
            r["id"] for r in spark.read.parquet(store).select("id").distinct().collect()
        }
        assert store_ids == {"1", "2", "5"}

    def test_replayed_batch_is_idempotent(self, spark, tmp_path):
        from warpdb_spark.streaming.incremental import admit_batch

        store = str(tmp_path / "store")
        batch = spark.createDataFrame(
            [("1", self.T1), ("2", self.T2)], ["doc_id", "text"]
        )
        first = {r["doc_id"] for r in admit_batch(batch, 0, store).collect()}
        n_store = spark.read.parquet(store).count()
        # replay the SAME batch id (foreachBatch at-least-once contract)
        again = {r["doc_id"] for r in admit_batch(batch, 0, store).collect()}
        assert first == again == {"1", "2"}
        assert spark.read.parquet(store).count() == n_store

    def test_next_batch_rejects_against_store(self, spark, tmp_path):
        from warpdb_spark.streaming.incremental import admit_batch

        store = str(tmp_path / "store")
        b0 = spark.createDataFrame([("1", self.T1)], ["doc_id", "text"])
        admit_batch(b0, 0, store)
        b1 = spark.createDataFrame(
            [("9", self.T1), ("10", self.T3)], ["doc_id", "text"]
        )
        got = {r["doc_id"] for r in admit_batch(b1, 1, store).collect()}
        assert got == {"10"}


class TestPQDeltaEncodeStream:
    """Streaming PQ index refresh (streaming/pq_refresh.py): encoding
    micro-batches of new vectors with a FROZEN codebook must produce
    byte-identical codes to one batch encode of the same delta —
    assignment is row-local, so batch boundaries cannot change any
    code — and batches must land in per-batch partitions."""

    def test_streamed_delta_codes_equal_batch(self, spark, sf_dir, tmp_path):
        from warpdb_spark.operators import similarity as S
        from warpdb_spark.streaming.pq_refresh import BATCH_COL, run_pq_delta_encode

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cutoff = 400
        cb = S.pq_train(
            emb.filter(F.col("vec_id") < cutoff),
            m_subs=16, n_codes=32, train_iters=0, seed=42,
        )
        delta = emb.filter(F.col("vec_id") >= cutoff)
        src = str(tmp_path / "arrivals")
        delta.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = str(tmp_path / "delta_codes")
        q = run_pq_delta_encode(stream, cb, out, checkpoint=str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        q.stop()

        got = spark.read.parquet(out)
        # maxFilesPerTrigger=1 over 3 files -> >= 2 real micro-batches
        assert got.select(BATCH_COL).distinct().count() >= 2
        streamed = {(r["vec_id"], tuple(r["codes"])) for r in got.collect()}
        batch = {
            (r["vec_id"], tuple(r["codes"]))
            for r in S.pq_encode(delta, cb).collect()
        }
        assert streamed == batch and len(streamed) == delta.count()

    def test_replayed_batch_is_idempotent(self, spark, sf_dir, tmp_path):
        """foreachBatch is at-least-once: re-running a batch id must
        atomically replace its own partition, not duplicate it, and
        leave other batches' partitions untouched."""
        from warpdb_spark.operators import similarity as S
        from warpdb_spark.streaming.pq_refresh import encode_batch

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cb = S.pq_train(
            emb.filter(F.col("vec_id") < 400),
            m_subs=16, n_codes=32, train_iters=0, seed=42,
        )
        out = str(tmp_path / "delta")
        b0 = emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 420))
        b1 = emb.filter((F.col("vec_id") >= 420) & (F.col("vec_id") < 430))
        encode_batch(b0, 0, cb, out)
        encode_batch(b1, 1, cb, out)
        first = sorted(
            (r["vec_id"], tuple(r["codes"]))
            for r in spark.read.parquet(out).collect()
        )
        encode_batch(b0, 0, cb, out)  # replay batch 0
        again = sorted(
            (r["vec_id"], tuple(r["codes"]))
            for r in spark.read.parquet(out).collect()
        )
        assert first == again and len(first) == 30


class TestSketchRollup:
    """Streaming HLL sketch store (streaming/sketches.py): per-day
    sketches merged across micro-batches must equal sketching the whole
    input in one batch — the mergeable-state contract."""

    def _events_csv(self, tmp_path):
        d = tmp_path / "ev"
        d.mkdir()
        (d / "b1.csv").write_text(
            "ts,key,value\n"
            + "\n".join(
                f"2024-01-0{1 + i % 2} 0{i % 10}:00:00,u{i % 7},1.0" for i in range(40)
            )
            + "\n"
        )
        (d / "b2.csv").write_text(
            "ts,key,value\n"
            + "\n".join(
                f"2024-01-0{1 + i % 3} 1{i % 10}:00:00,u{i % 11},1.0" for i in range(40)
            )
            + "\n"
        )
        return str(d)

    def test_streamed_store_equals_batch_sketch(self, spark, tmp_path):
        from warpdb_spark.streaming.sketches import (
            batch_day_sketches,
            read_estimates,
            run_sketch_rollup,
        )
        from warpdb_spark.streaming.windows import read_csv_stream

        src = self._events_csv(tmp_path)
        store = str(tmp_path / "store")
        stream = read_csv_stream(spark, src, SCHEMA)
        q = run_sketch_rollup(
            stream, store, checkpoint=str(tmp_path / "ck"), key_col="key"
        )
        q.awaitTermination(120)
        q.stop()

        got = {
            str(r["day"]): (r["est_distinct"], r["n_rows"])
            for r in read_estimates(spark, store).collect()
        }
        whole = spark.read.option("header", True).schema(SCHEMA).csv(src)
        want = {
            str(r["day"]): (r["est"], r["n"])
            for r in batch_day_sketches(whole, key_col="key")
            .select(
                "day",
                F.hll_sketch_estimate("sketch").alias("est"),
                F.col("n_rows").alias("n"),
            )
            .collect()
        }
        assert got == want and len(got) >= 2

    def test_range_estimate_from_store(self, spark, tmp_path):
        from warpdb_spark.streaming.sketches import run_sketch_rollup
        from warpdb_spark.streaming.windows import read_csv_stream

        src = self._events_csv(tmp_path)
        store = str(tmp_path / "store")
        q = run_sketch_rollup(
            read_csv_stream(spark, src, SCHEMA),
            store,
            checkpoint=str(tmp_path / "ck"),
            key_col="key",
        )
        q.awaitTermination(120)
        q.stop()
        est = (
            spark.read.parquet(store)
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("e"))
            .collect()[0]["e"]
        )
        whole = spark.read.option("header", True).schema(SCHEMA).csv(src)
        exact = whole.select("key").distinct().count()
        assert abs(est - exact) <= max(1, 0.05 * exact)


class TestStreamPsiDrift:
    """Live foreachBatch PSI monitor (streaming/drift.py) pinned to the
    batch-replay entry (analytics_ext.stream_psi_drift_by_batch): same
    buckets, same micro-snap, same structural-zero rule."""

    @staticmethod
    def _value(i: int, shift: int) -> float:
        # bucket = floor(value/25): base pattern covers buckets 0-3,
        # shift=2 moves it to 2-5
        return 25.0 * (i % 4 + shift) + 10.0

    @staticmethod
    def _skewed(i: int) -> float:
        # same-support reshape: 80% bucket 0 / 20% bucket 1 vs the
        # uniform base — mass moves WITHIN shared buckets, so psi
        # itself fires (≈0.645); buckets 2-3 empty on the batch side
        # land in n_buckets_zero
        return 35.0 if i % 5 == 0 else 10.0

    def test_monitor_matches_batch_entry(self, spark, tmp_path):
        import os
        import time
        import unittest.mock as mock

        import warpdb_spark.inventory.analytics_ext as ax
        from warpdb_spark.streaming.drift import (
            attach_psi_monitor,
            value_bucket_counts,
        )

        d = tmp_path / "ev"
        d.mkdir()
        # batch 0 (ids 0-249) is the BASELINE; batches 1 (shifted
        # distribution) and 2 (identical to baseline -> psi == 0)
        # arrive as separate files
        rows0 = [(i, self._value(i, 0)) for i in range(0, 250)]
        rows1 = [(i, self._skewed(i)) for i in range(250, 500)]
        rows2 = [(i, self._value(i, 0)) for i in range(500, 750)]
        for name, rows in [("b1.csv", rows1), ("b2.csv", rows2)]:
            (d / name).write_text(
                "event_id,value\n"
                + "\n".join(f"{i},{v}" for i, v in rows)
            )
        now = time.time()
        os.utime(d / "b1.csv", (now - 10, now - 10))
        os.utime(d / "b2.csv", (now, now))

        schema = "event_id LONG, value DOUBLE"
        base_df = spark.createDataFrame(rows0, schema)
        stream = (
            spark.readStream.option("header", True)
            .option("maxFilesPerTrigger", 1)
            .schema(schema)
            .csv(str(d))
        )
        out_dir = str(tmp_path / "psi_out")
        q = attach_psi_monitor(
            stream,
            value_bucket_counts(base_df),
            out_dir,
            checkpoint_dir=str(tmp_path / "ckpt"),
            available_now=True,
        )
        q.awaitTermination(120)
        q.stop()
        live = {
            r.batch_id: r for r in spark.read.parquet(out_dir).collect()
        }
        assert set(live) == {0, 1}

        # batch entry over the SAME rows (entry batch b <-> live file b-1)
        all_rows = [
            (i, "purchase", v) for i, v in rows0 + rows1 + rows2
        ]
        ev = spark.createDataFrame(
            all_rows, "event_id LONG, event_type STRING, value DOUBLE"
        )
        with mock.patch.object(ax, "_t", lambda s, sd, n: ev):
            want = {
                r.batch_id: r
                for r in ax.stream_psi_drift_by_batch(spark, "x").collect()
            }
        assert set(want) == {1, 2}
        for live_id, entry_id in [(0, 1), (1, 2)]:
            lv, wt = live[live_id], want[entry_id]
            assert lv.psi == wt.psi
            assert lv.n_cur == wt.n_batch and lv.n_base == wt.n_base
            assert lv.n_buckets_used == wt.n_buckets_used
            assert lv.n_buckets_zero == wt.n_buckets_zero
        # the reshaped batch drifts hard (within shared buckets) and
        # also empties two baseline buckets; the identical batch is
        # clean on both signals
        assert want[1].psi > 0.25 and want[1].n_buckets_zero == 2
        assert want[2].psi == 0.0 and want[2].n_buckets_zero == 0


class TestPsiBetween:
    def test_hand_computed_psi(self, spark):
        from warpdb_spark.streaming.drift import psi_between

        # cur: bucket0=8, bucket1=2 (tc=10); base: 5/5 (tb=10)
        # term0 = (0.8-0.5)*ln(1.6) = 0.3*0.470004 = 0.141001
        # term1 = (0.2-0.5)*ln(0.4) = 0.274887 -> psi = 0.415888
        cur = spark.createDataFrame([(0, 8), (1, 2)], "bucket long, n long")
        base = spark.createDataFrame([(0, 5), (1, 5)], "bucket long, n long")
        r = psi_between(cur, base).collect()[0]
        assert r["n_cur"] == 10 and r["n_base"] == 10
        assert r["n_buckets_used"] == 2 and r["n_buckets_zero"] == 0
        assert r["psi"] == 0.415888

    def test_structural_zero_excluded_and_counted(self, spark):
        from warpdb_spark.streaming.drift import psi_between

        cur = spark.createDataFrame([(0, 10)], "bucket long, n long")
        base = spark.createDataFrame([(0, 10), (1, 5)], "bucket long, n long")
        r = psi_between(cur, base).collect()[0]
        assert r["n_buckets_zero"] == 1 and r["n_buckets_used"] == 1
        # shared bucket: pc=1.0 vs pb=10/15 -> (1-2/3)*ln(1.5)
        assert r["psi"] == round(
            round((1 - 10 / 15) * math.log(1.5) * 1e6) / 1e6, 6
        )


class TestPsiBetweenFuzz:
    """Engine-parity fuzz: psi_between's micro-snapped fold vs an
    independent DuckDB computation of the same discipline on random
    count tables — the property the fixed-data oracle sweep can't
    cover (arbitrary support overlap, empty sides, heavy skew)."""

    def test_random_count_tables_match_duckdb(self, spark):
        import duckdb
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from warpdb_spark.streaming.drift import psi_between

        counts = st.lists(
            st.tuples(st.integers(0, 12), st.integers(1, 50)),
            min_size=1,
            max_size=8,
            unique_by=lambda t: t[0],
        )

        @settings(
            max_examples=12,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        @given(cur=counts, base=counts)
        def check(cur, base):
            c = spark.createDataFrame(cur, "bucket long, n long")
            b = spark.createDataFrame(base, "bucket long, n long")
            got = psi_between(c, b).collect()[0]
            want = duckdb.sql(
                "WITH c AS (SELECT * FROM (VALUES "
                + ", ".join(f"({k}, {n})" for k, n in cur)
                + ") v(bucket, n_c)), "
                "b AS (SELECT * FROM (VALUES "
                + ", ".join(f"({k}, {n})" for k, n in base)
                + ") v(bucket, n_b)), "
                "j AS (SELECT coalesce(c.n_c, 0) AS n_c, "
                "coalesce(b.n_b, 0) AS n_b FROM c FULL JOIN b USING (bucket)), "
                "t AS (SELECT sum(n_c) AS tc, sum(n_b) AS tb FROM j) "
                "SELECT CAST(sum(CASE WHEN n_c > 0 AND n_b > 0 THEN 1 "
                "ELSE 0 END) AS BIGINT) AS used, "
                "CAST(sum(CASE WHEN n_c > 0 AND n_b > 0 THEN 0 ELSE 1 END) "
                "AS BIGINT) AS zero, "
                "round(CAST(sum(CASE WHEN n_c > 0 AND n_b > 0 THEN "
                "CAST(round((CAST(n_c AS DOUBLE) / tc - "
                "CAST(n_b AS DOUBLE) / tb) * ln((CAST(n_c AS DOUBLE) / tc) / "
                "(CAST(n_b AS DOUBLE) / tb)) * 1e6, 0) AS BIGINT) "
                "ELSE 0 END) AS DOUBLE) / 1e6, 6) AS psi "
                "FROM j CROSS JOIN t"
            ).fetchone()
            assert (got["n_buckets_used"], got["n_buckets_zero"]) == want[:2]
            assert got["psi"] == want[2]

        check()


class TestStreamUnifiedDrift:
    """Live unified monitor (streaming/drift.py::attach_drift_monitor —
    ONE foreachBatch writing PSI + KS together) pinned to the joined
    batch-replay entry (stream_unified_drift_by_batch)."""

    def test_unified_monitor_matches_joined_entry(self, spark, tmp_path):
        import os
        import time
        import unittest.mock as mock

        import warpdb_spark.inventory.analytics_ext as ax
        from warpdb_spark.streaming.drift import (
            attach_drift_monitor,
            value_bucket_counts,
            value_cent_counts,
        )

        mk = TestStreamPsiDrift
        d = tmp_path / "ev"
        d.mkdir()
        rows0 = [(i, mk._value(i, 0)) for i in range(0, 250)]
        rows1 = [(i, mk._skewed(i)) for i in range(250, 500)]
        rows2 = [(i, mk._value(i, 0)) for i in range(500, 750)]
        for name, rows in [("b1.csv", rows1), ("b2.csv", rows2)]:
            (d / name).write_text(
                "event_id,value\n" + "\n".join(f"{i},{v}" for i, v in rows)
            )
        now = time.time()
        os.utime(d / "b1.csv", (now - 10, now - 10))
        os.utime(d / "b2.csv", (now, now))

        schema = "event_id LONG, value DOUBLE"
        base_df = spark.createDataFrame(rows0, schema)
        stream = (
            spark.readStream.option("header", True)
            .option("maxFilesPerTrigger", 1)
            .schema(schema)
            .csv(str(d))
        )
        out_dir = str(tmp_path / "drift_out")
        q = attach_drift_monitor(
            stream,
            value_bucket_counts(base_df),
            value_cent_counts(base_df),
            out_dir,
            checkpoint_dir=str(tmp_path / "ckpt_u"),
            available_now=True,
        )
        q.awaitTermination(120)
        q.stop()
        live = {r.batch_id: r for r in spark.read.parquet(out_dir).collect()}
        assert set(live) == {0, 1}

        all_rows = [(i, "purchase", v) for i, v in rows0 + rows1 + rows2]
        ev = spark.createDataFrame(
            all_rows, "event_id LONG, event_type STRING, value DOUBLE"
        )
        with mock.patch.object(ax, "_t", lambda s, sd, n: ev):
            want = {
                r.batch_id: r
                for r in ax.stream_unified_drift_by_batch(spark, "x").collect()
            }
        assert set(want) == {1, 2}
        for live_id, entry_id in [(0, 1), (1, 2)]:
            lv, wt = live[live_id], want[entry_id]
            assert lv.psi == wt.psi
            assert lv.n_cur == wt.n_batch and lv.n_base == wt.n_base
            assert lv.n_buckets_used == wt.n_buckets_used
            assert lv.n_buckets_zero == wt.n_buckets_zero
            assert lv.ks_d == wt.ks_d
            assert lv.ks_at_value == wt.ks_at_value
            assert lv.ks_stat == wt.ks_stat
        # the reshaped batch: mass moves between buckets AND reshapes
        # the ECDF — both legs fire; the identical batch is clean on
        # both
        assert want[1].psi > 0.25 and want[1].ks_d > 0.1
        assert want[2].psi == 0.0 and want[2].ks_d == 0.0


def test_ks_between_empty_current_batch_emits_no_row(spark):
    """r8 advice: an empty current micro-batch used to emit one row
    with NULL ks_d/ks_stat (0/(0*tb)) — ambiguous for alerting. No
    rows is the explicit empty-batch signal, same as no-baseline."""
    from pyspark.sql import functions as F

    from warpdb_spark.streaming.drift import ks_between

    base = spark.createDataFrame(
        [(100, 5), (200, 7)], "cents long, n long"
    )
    empty = base.filter(F.lit(False))
    assert ks_between(empty, base).count() == 0
    assert ks_between(base, empty).count() == 0
    assert ks_between(base, base).count() == 1
