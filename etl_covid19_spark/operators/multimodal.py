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
