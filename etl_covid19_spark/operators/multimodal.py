"""Multimodal (binary) column operators.

Extension surface: image/audio/video payloads as opaque `binary`
columns with typed metadata, processed with Arrow-batched
`mapInPandas` — the Spark-side plumbing (schema, batch shape,
partition sizing) is real; the actual media decoding is stubbed
behind `decode_stub` because codec libraries aren't in this
container (clearly marked; swap in PIL/torchaudio/av in production).

At 100 TB the parquet layout matters more than the UDF: binary blobs
live in their own column chunks, so metadata-only queries never read
them (column pruning), and `spark.sql.files.maxPartitionBytes`
bounds the per-task batch footprint.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("magic", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def decode_stub(payload: bytes) -> tuple[int, int]:
    """STUB — deterministic fake decoder standing in for a real image
    decode (PIL/libvips not installed here). Derives a fake
    (width, height) from the payload so tests are stable. Replace the
    body with e.g. ``PIL.Image.open(io.BytesIO(payload)).size`` in a
    real deployment; the mapInPandas plumbing is unchanged."""
    if not payload:
        raise NotImplementedError("real media decode not available in this env")
    w = 64 + payload[0] % 64
    h = 64 + payload[-1] % 64
    return w, h


def extract_media_meta(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Arrow-batched metadata extraction over a binary column: one
    pandas batch per partition chunk, vectorized byte ops in pandas,
    decode per item (the irreducible per-media-file work)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[bin_col]
            dims = [decode_stub(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.str.len().astype("int64"),
                    "magic": [bytes(p[:2]).hex().upper() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(batches, MEDIA_META_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
    ]
)


def resize_stub(payload: bytes, max_side: int) -> tuple[bytes, int, int]:
    """STUB — deterministic fake resize (PIL absent here). Real
    deployment: decode, `Image.thumbnail((max_side, max_side))`,
    re-encode; the plumbing below is unchanged. The fake keeps the
    aspect contract (w,h ≤ max_side) and shrinks the payload so
    batch-size accounting downstream is realistic."""
    if not payload:
        raise NotImplementedError("real media decode not available in this env")
    w, h = decode_stub(payload)
    scale = max(w, h) / max_side
    tw, th = max(int(w / scale), 1), max(int(h / scale), 1)
    return payload[: max(len(payload) // 4, 1)], tw, th


def resize_images(
    df: DataFrame, id_col: str, bin_col: str, max_side: int = 32
) -> DataFrame:
    """Thumbnail pass over a binary image column. Same mapInPandas
    shape as extract_media_meta: Arrow batches in, per-item decode
    (irreducible), Arrow batches out. `spark.sql.files.
    maxPartitionBytes` bounds how many blobs one task holds."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [resize_stub(p, max_side) for p in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "thumb": [t[0] for t in out],
                    "thumb_w": [t[1] for t in out],
                    "thumb_h": [t[2] for t in out],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(batches, RESIZE_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def audio_features(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Feature extraction over a binary audio column. The signal math
    runs vectorized on the raw bytes interpreted as PCM8 — a stand-in
    for torchaudio/librosa features; swap the inner function, keep
    the mapInPandas contract (schema, batching, partitioning)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                if not payload:
                    raise NotImplementedError("real audio decode unavailable")
                pcm = np.frombuffer(payload, dtype=np.int8).astype(np.float64)
                rows.append(
                    (
                        int(doc_id),
                        len(pcm) / 8000.0,  # fake 8 kHz sample rate
                        float(np.sqrt(np.mean(pcm**2))),
                        int(np.sum(np.signbit(pcm[1:]) != np.signbit(pcm[:-1]))),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return df.select(id_col, bin_col).mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, id_col: str, bin_col: str, every_n: int = 30) -> DataFrame:
    """STUB plumbing for video frame sampling: emits (doc_id,
    frame_idx) rows for frames 0, n, 2n… of a fake 300-frame video.
    Real implementation decodes container metadata for the frame
    count; the explode-based fan-out shape is what matters here."""
    n_frames = F.lit(300)
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(idx).alias("frame_idx")
    )


def blob_stats_arrow(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Blob stats via ``mapInArrow`` — the zero-conversion Arrow
    path. Where `extract_media_meta` (mapInPandas) materializes each
    batch as pandas objects (one Python bytes object per blob), this
    operates on the raw Arrow RecordBatch: `binary_length` and
    `binary_slice` are columnar C++ kernels over the value buffer, so
    a batch of 100 MB of blobs is processed without creating a single
    Python object per row. That is the right shape for cheap
    per-blob byte accounting at 100 TB; mapInPandas remains the tool
    once a real per-item decoder (PIL/av) needs the bytes in Python
    anyway. The 2-byte magic is returned as binary and hex-encoded
    JVM-side — no Python string building."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            payload = batch.column(bin_col)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(id_col).cast(pa.int64()),
                    pc.binary_length(payload).cast(pa.int64()),
                    pc.binary_slice(payload, 0, 2),
                ],
                names=["doc_id", "n_bytes", "magic_bytes"],
            )

    out = df.mapInArrow(batches, schema="doc_id long, n_bytes long, magic_bytes binary")
    return out.select(
        "doc_id", "n_bytes", F.upper(F.hex("magic_bytes")).alias("magic")
    )
