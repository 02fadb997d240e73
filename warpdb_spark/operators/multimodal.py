"""Multimodal (binary) column plumbing (SURVEY §7 Phase 3).

Images/audio/video are opaque ``binary`` payloads plus a typed metadata
struct. The Spark-side machinery — schema, partition-parallel Arrow
batches via mapInPandas, UDF signatures, batch shapes — is real and
tested; the actual media decoding is stubbed (image/audio libraries are
not in this container) behind ``decoder=`` hooks: pass a real decoder
(e.g. PIL-based) in production, the deterministic fake otherwise.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOB_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("n_bytes", LongType()),
                    StructField("source", StringType()),
                ]
            ),
        ),
    ]
)


def attach_blob(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                source_col: str = "source", fmt: str = "utf8-text") -> DataFrame:
    """Build a blob table from any table with an encodable column —
    payload = utf-8 bytes, metadata struct typed per BLOB_SCHEMA. With
    real media, payload comes straight off `spark.read.format('binaryFile')`."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(fmt).alias("format"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.col(source_col).alias("source"),
        ).alias("meta"),
    )


def real_decode_stub(payload: bytes, fmt: str):
    """Placeholder for a real media decoder. Wire PIL/librosa/pyav here
    in production."""
    raise NotImplementedError(
        f"media decoding for format {fmt!r} requires an image/audio library "
        "not present in this environment; pass decoder=fake_feature_decoder "
        "or a real decoder callable"
    )


def fake_feature_decoder(payload: bytes, fmt: str) -> np.ndarray:
    """Deterministic stand-in 'decoder': 8-bucket byte histogram,
    L1-normalized — exercises the exact batch shape a real feature
    extractor would produce."""
    if not payload:
        return np.zeros(8, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 5, minlength=8).astype(np.float32)
    return hist / max(hist.sum(), 1.0)


def extract_features(
    blobs: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] | None = None,
    feature_dim: int = 8,
) -> DataFrame:
    """Partition-parallel feature extraction over binary payloads via
    mapInPandas (Arrow batches; one Python worker per partition — the
    pattern scales to any corpus size because batches stream).

    ``decoder`` defaults to a locally-defined copy of
    ``fake_feature_decoder`` so the closure pickles BY VALUE —
    a module-level default would make workers import ``warpdb_spark``,
    which isn't on their path under an arbitrary harness session."""
    if decoder is None:

        def decoder(payload: bytes, fmt: str) -> np.ndarray:
            if not payload:
                return np.zeros(8, dtype=np.float32)
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(arr >> 5, minlength=8).astype(np.float32)
            return hist / max(hist.sum(), 1.0)
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_bytes", LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(p if p is not None else b"", m["format"]).tolist()
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return blobs.mapInPandas(gen, out_schema)


def sample_frames(
    blobs: DataFrame, frame_size: int = 64, every_n: int = 4
) -> DataFrame:
    """'Frame sampling' plumbing: split payload into fixed-size frames,
    keep every n-th — the byte-level shape of video frame extraction,
    entirely with JVM-side functions (no Python)."""
    n_frames = F.ceil(F.octet_length("payload") / frame_size).cast("int")
    idx = F.filter(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: i % every_n == 0,
    )
    return blobs.select(
        "doc_id",
        F.explode(
            F.transform(idx, lambda i: F.struct(
                i.alias("frame_no"),
                F.substring(F.col("payload"), i * frame_size + 1, frame_size).alias("frame"),
            ))
        ).alias("fr"),
    ).select(
        "doc_id",
        F.col("fr.frame_no").cast("int").alias("frame_no"),
        F.col("fr.frame").alias("frame"),
    ).filter(F.octet_length("frame") > 0)
