"""Incremental (streaming) near-duplicate dedup against a standing
corpus — the continuous-ingestion counterpart of the batch MinHash-LSH
pipeline (operators/dedup.py). Superset: the reference has no dedup or
streaming facilities (SURVEY §2.9 ❌ rows).

The standing state is a *band-key store*: a parquet table of
``(doc_id, band, bucket)`` LSH band keys for every admitted document,
partitioned by ingest batch. A new document is a near-dup candidate iff
ANY of its band keys collides with the store (the banded-LSH decision
rule — same bands/rows trade-off as the batch path). Per micro-batch:

1. band-key the batch (same ``minhash_signature`` banding — one
   shuffle of 64 longs/doc, never the text);
2. ONE hash semi-join of batch keys against the store on
   (band, bucket) → colliding doc ids;
3. within-batch self-collisions resolve to the lowest id per bucket;
4. admitted docs' band keys append to the store into a
   ``__batch_id=N`` partition via dynamic partition overwrite, so a
   replayed batch (foreachBatch is at-least-once) atomically replaces
   its own partition — the same exactly-once upgrade as
   ``streaming/windows.py::write_exactly_once``.

100 TB stance: the store is only ~bands rows per admitted doc, keyed
and joinable on (band, bucket) — at scale it is bucketed on that key
so step 2 never shuffles the store; the raw corpus is never rejoined.
Band collision IS the admit/reject decision (no exact-verify rejoin):
tune precision with bands/rows like any LSH deployment; the batch
pipeline's verified variant remains for offline re-certification.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from warpdb_spark.operators.dedup import minhash_signature

BATCH_COL = "__batch_id"


def band_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """(id, band, bucket) LSH band keys; bucket is the xxhash64 of the
    band's row-slice of the MinHash signature."""
    rows = num_hashes // bands
    sig = minhash_signature(F.col(text_col), num_hashes=num_hashes)
    banded = df.select(F.col(id_col).alias("id"), sig.alias("__sig")).select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice("__sig", b * rows + 1, rows),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    )
    return banded.select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def _store_exists(spark, store_path: str) -> bool:
    try:
        return bool(os.listdir(store_path))
    except FileNotFoundError:
        return False


def admit_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Admit the batch's non-near-dup documents and append their band
    keys to the store (idempotently, into this batch's partition).
    Returns the admitted subset of ``batch_df``."""
    spark = batch_df.sparkSession
    keys = band_keys(batch_df, id_col, text_col, num_hashes, bands).persist()
    keys.count()

    hit_ids = None
    if _store_exists(spark, store_path):
        store = spark.read.parquet(store_path).filter(
            F.col(BATCH_COL) != batch_id  # a replayed batch must not self-collide
        )
        hit_ids = (
            keys.join(store, ["band", "bucket"], "left_semi").select("id").distinct()
        )

    # within-batch: any doc sharing a bucket with a LOWER id loses
    min_per_bucket = keys.groupBy("band", "bucket").agg(F.min("id").alias("min_id"))
    self_dups = (
        keys.join(min_per_bucket, ["band", "bucket"])
        .filter(F.col("id") > F.col("min_id"))
        .select("id")
        .distinct()
    )
    dropped = self_dups if hit_ids is None else hit_ids.union(self_dups).distinct()

    admitted = batch_df.join(
        dropped.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )
    admitted_keys = keys.join(
        dropped, keys["id"] == dropped["id"], "left_anti"
    )

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            admitted_keys.withColumn(BATCH_COL, F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy(BATCH_COL)
            .parquet(store_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    keys.unpersist()
    return admitted


def run_incremental_dedup(
    stream_df: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
):
    """Wire the admit step into a foreachBatch pipeline: admitted docs
    land in ``out_path`` (partitioned by batch, exactly-once), the band
    store grows at ``store_path``. Returns the StreamingQuery."""

    def handle(batch_df: DataFrame, batch_id: int):
        admitted = admit_batch(
            batch_df, batch_id, store_path, id_col, text_col, num_hashes, bands
        )
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                admitted.withColumn(BATCH_COL, F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy(BATCH_COL)
                .parquet(out_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
