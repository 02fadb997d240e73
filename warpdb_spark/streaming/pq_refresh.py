"""Streaming PQ index refresh — the LIVE deployment of the delta leg
that ``inventory.analytics_ext.similarity_pq_index_refresh`` runs in
batch (reference seam: the reference has no index or streaming
facilities at all — SURVEY §2.9 ❌ rows; this is the LLM-pipeline
superset's ANN-index maintenance story).

Deployment shape: the base index (codes + codebook parquet) is built
once offline; new vectors then arrive on a stream. Each micro-batch is
encoded with the FROZEN base codebook — standard PQ practice: new rows
ride the existing codebook, retraining is a rebuild, not a refresh —
and its codes land in a ``__batch_id=N`` partition of the delta table
via dynamic partition overwrite, so a replayed batch (foreachBatch is
at-least-once) atomically replaces its own partition: the same
exactly-once upgrade as ``streaming/windows.py::write_exactly_once``
and ``streaming/incremental.py``. The base files are never touched.

100 TB stance: per batch the only work is one Arrow-batched map pass
over the NEW rows (``pq_encode`` is zero-shuffle; the codebook is a
broadcast of m_subs x n_codes small vectors) — refresh cost is
O(delta per trigger), never O(corpus). Queries run over
base UNION delta exactly as the batch entry demonstrates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BATCH_COL = "__batch_id"


def encode_batch(
    batch_df: DataFrame,
    batch_id: int,
    codebooks,
    delta_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One micro-batch of the delta encode: frozen-codebook pq_encode,
    landed in ``delta_path/__batch_id=N`` via dynamic partition
    overwrite — a REPLAYED batch id (foreachBatch is at-least-once)
    atomically replaces its own partition and touches nothing else,
    so the delta table holds each batch's codes exactly once."""
    from warpdb_spark.operators.similarity import pq_encode

    spark = batch_df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            pq_encode(batch_df, codebooks, id_col=id_col, vec_col=vec_col)
            .withColumn(BATCH_COL, F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy(BATCH_COL)
            .parquet(delta_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def run_pq_delta_encode(
    stream_df: DataFrame,
    codebooks,
    delta_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Wire the frozen-codebook delta encode into foreachBatch:
    each micro-batch's codes land in ``delta_path/__batch_id=N``
    (exactly-once via dynamic partition overwrite — see encode_batch).
    Returns the StreamingQuery (availableNow trigger — drains the
    source then stops, the bounded-replay idiom the tests pin)."""

    def handle(batch_df: DataFrame, batch_id: int):
        encode_batch(batch_df, batch_id, codebooks, delta_path, id_col, vec_col)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
