"""Multimodal (binary) column plumbing (SURVEY §7 Phase 3).

Images/audio/video are opaque ``binary`` payloads plus a typed metadata
struct. The Spark-side machinery — schema, partition-parallel Arrow
batches via mapInPandas, UDF signatures, batch shapes — is real and
tested. Decoding: PPM images and PCM16 WAV audio decode for REAL with
pure-numpy/stdlib codecs in any environment; PIL-class formats
(png/jpeg/webp) decode for real through the feature-checked
``pil_decode`` path when Pillow is installed and raise with install
guidance when not. ``decoder=`` hooks let callers swap any of these
for their own (or for ``fake_feature_decoder``, the deterministic
byte-histogram stand-in used by shape tests).
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


def pil_decode(payload: bytes, fmt: str) -> np.ndarray:
    """Optional real-codec path for PIL-class image formats (png/jpeg/
    webp/...): decodes to an (h, w, 3) uint8 RGB array — the same
    output contract as ``ppm_decode`` — when Pillow is installed
    (feature-checked import; Pillow is not in this container, so this
    path is exercised only where it is). Raises RuntimeError, never a
    silent fake, when the library is absent: a caller who wants a
    deterministic stand-in passes ``decoder=fake_feature_decoder``
    explicitly."""
    try:
        from PIL import Image  # noqa: PLC0415 — feature-checked import
    except ImportError as e:
        raise RuntimeError(
            f"decoding format {fmt!r} requires Pillow (pip install pillow); "
            "PPM/WAV decode without it, or pass a custom decoder callable"
        ) from e
    import io

    img = Image.open(io.BytesIO(payload))
    return np.asarray(img.convert("RGB"), dtype=np.uint8)


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


# --- real image codec: PPM (pure numpy — no external libraries) -------------

def _make_ppm_codec():
    """Build the P6 codec pair as NESTED functions: cloudpickle then
    serializes them BY VALUE into mapInPandas closures, so Python
    workers never need ``warpdb_spark`` on their import path (the same
    by-value rule extract_features follows for its default decoder)."""
    import numpy as np

    def ppm_encode(arr) -> bytes:
        """Encode an (h, w, 3) uint8 array as a binary P6 PPM image."""
        if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
            raise ValueError("ppm_encode expects an (h, w, 3) uint8 array")
        h, w = arr.shape[:2]
        return f"P6\n{w} {h}\n255\n".encode("ascii") + arr.tobytes()

    def ppm_decode(payload: bytes):
        """Decode a binary P6 PPM to an (h, w, 3) uint8 array. A REAL
        decoder (header grammar incl. comments, maxval check,
        payload-size validation) — PPM needs no imaging library, so
        this format decodes for real in any environment; PIL-class
        formats route through the feature-checked ``pil_decode``."""
        if not payload.startswith(b"P6"):
            raise ValueError("not a binary PPM (P6) payload")
        # header = magic, width, height, maxval as whitespace-separated
        # tokens; '#' starts a comment running to end of line
        pos, fields = 2, []
        while len(fields) < 3:
            if pos >= len(payload):
                raise ValueError("truncated PPM header")
            c = payload[pos : pos + 1]
            if c == b"#":
                nl = payload.find(b"\n", pos)
                pos = len(payload) if nl == -1 else nl + 1
            elif c.isspace():
                pos += 1
            else:
                end = pos
                while end < len(payload) and not payload[end : end + 1].isspace():
                    end += 1
                fields.append(int(payload[pos:end]))
                pos = end
        pos += 1  # single whitespace after maxval
        w, h, maxval = fields
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval} (only 8-bit)")
        data = payload[pos : pos + w * h * 3]
        if len(data) != w * h * 3:
            raise ValueError("PPM payload size does not match header dims")
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3).copy()

    return ppm_encode, ppm_decode


ppm_encode, ppm_decode = _make_ppm_codec()


def decode_media(payload: bytes, fmt: str) -> "np.ndarray":
    """Format dispatch: PPM decodes for real with the pure-numpy codec;
    PIL-class formats decode for real via ``pil_decode`` when Pillow is
    installed (RuntimeError with install guidance when not)."""
    if fmt == "ppm":
        return ppm_decode(payload)
    return pil_decode(payload, fmt)


def resize_nearest(arr: "np.ndarray", out_h: int, out_w: int) -> "np.ndarray":
    """Nearest-neighbor resize via index mapping — the standard
    preprocessing step, pure numpy."""
    h, w = arr.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return arr[rows][:, cols]


def image_stats(
    blobs: DataFrame,
) -> DataFrame:
    """Decode PPM payloads for REAL (mapInPandas, Arrow batches) and
    emit (doc_id, width, height, mean_r, mean_g, mean_b). Non-PPM rows
    raise — this is the production shape with an actual decoder in the
    loop, streaming batch-at-a-time like every multimodal op here."""
    from pyspark.sql.types import DoubleType

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            # double, not float: integer pixel sums are exact in f64, so
            # the means replay bit-for-bit in any engine
            StructField("mean_r", DoubleType()),
            StructField("mean_g", DoubleType()),
            StructField("mean_b", DoubleType()),
        ]
    )

    decode = ppm_decode  # nested-def closure — pickles by value

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                img = decode(bytes(p))
                means = img.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (doc_id, img.shape[1], img.shape[0], *means)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mean_r", "mean_g", "mean_b"]
            )

    return blobs.mapInPandas(gen, out_schema)


# --- real audio codec: WAV/PCM16 (pure numpy — no external libraries) -------

def _make_wav_codec():
    """RIFF/WAVE PCM16 codec pair, nested-def for by-value pickling
    into worker closures (same rule as the PPM codec)."""
    import struct

    import numpy as np

    def wav_encode(samples, sample_rate: int = 8000) -> bytes:
        """Encode an int16 1-D array as a mono PCM16 WAV file."""
        if samples.dtype != np.int16 or samples.ndim != 1:
            raise ValueError("wav_encode expects a 1-D int16 array")
        data = samples.tobytes()
        fmt = struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
        )
        hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
        return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data

    def wav_decode(payload: bytes):
        """Decode a mono PCM16 WAV to (samples int16 array, rate). A
        REAL parser: walks RIFF chunks (skipping unknown ones), checks
        the fmt tag/bit depth, validates the data length."""
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE payload")
        pos, rate, channels, bits = 12, None, None, None
        data = None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
                (bits,) = struct.unpack("<H", body[14:16])
                if audio_fmt != 1:
                    raise ValueError(f"unsupported WAV format tag {audio_fmt} (PCM only)")
            elif cid == b"data":
                data = body
            pos += 8 + size + (size % 2)  # chunks are word-aligned
        if rate is None or data is None:
            raise ValueError("WAV missing fmt or data chunk")
        if channels != 1 or bits != 16:
            raise ValueError(f"unsupported WAV layout: {channels}ch {bits}-bit (mono 16-bit only)")
        if len(data) % 2:
            raise ValueError("WAV data chunk length is odd")
        return np.frombuffer(data, dtype="<i2"), rate

    return wav_encode, wav_decode


wav_encode, wav_decode = _make_wav_codec()


def audio_stats(blobs: DataFrame) -> DataFrame:
    """Decode WAV payloads for REAL (mapInPandas) and emit
    (doc_id, n_samples, sample_rate, rms, zero_crossings). Integer
    sample sums/squares are exact in f64, so the stats replay in any
    engine from the sample formula alone."""
    from pyspark.sql.types import DoubleType

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_samples", IntegerType()),
            StructField("sample_rate", IntegerType()),
            StructField("rms", DoubleType()),
            StructField("zero_crossings", IntegerType()),
        ]
    )
    decode = wav_decode  # nested-def closure — pickles by value

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                s, rate = decode(bytes(p))
                f = s.astype(np.float64)
                rms = float(np.sqrt(np.mean(f * f))) if len(s) else 0.0
                zc = int(np.sum(f[:-1] * f[1:] < 0)) if len(s) > 1 else 0
                rows.append((doc_id, len(s), rate, rms, zc))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "sample_rate", "rms", "zero_crossings"],
            )

    return blobs.mapInPandas(gen, out_schema)
