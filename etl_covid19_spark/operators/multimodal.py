"""Multimodal (binary) column operators.

Extension surface: image/audio/video payloads as opaque `binary`
columns with typed metadata, processed with Arrow-batched
`mapInPandas`. Decoding is tiered (functions/media.py): PIL /
soundfile when importable, REAL pure-stdlib PNG/WAV codecs
otherwise, and only payloads in neither format fall back to the
deterministic `decode_stub` (kept so text-as-payload plumbing
queries remain runnable and oracle-mirrorable). The real-decode path
is oracle-verified end-to-end by the `media_pixel_stats` /
`media_audio_stats` registry queries, whose fixtures are generated
from arithmetic formulas the DuckDB oracle re-derives independently.

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
from etl_covid19_spark.operators.parallelism import fan_out
from pyspark.sql import types as T

from etl_covid19_spark.functions import media

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
    """Deterministic fake decoder for payloads in no real-decodable
    format (kept for text-as-payload plumbing queries whose oracle
    mirrors this math). Real formats never reach it — see
    `decode_dims`."""
    if not payload:
        raise NotImplementedError("media payload is empty")
    w = 64 + payload[0] % 64
    h = 64 + payload[-1] % 64
    return w, h


def decode_dims(payload: bytes) -> tuple[int, int]:
    """(width, height): REAL decode for PNG (header peek — stdlib,
    no inflate) and for whatever PIL handles when importable; the
    deterministic fake only for unrecognized formats."""
    if media.is_png(payload):
        return media.png_dimensions(payload)
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]

        return Image.open(io.BytesIO(payload)).size
    except Exception:
        # PIL absent, or present but the payload isn't an image it
        # recognizes — same deterministic fallback either way so
        # text-as-payload queries behave identically across envs
        return decode_stub(payload)


def extract_media_meta(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Arrow-batched metadata extraction over a binary column: one
    pandas batch per partition chunk, vectorized byte ops in pandas,
    decode per item (the irreducible per-media-file work)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[bin_col]
            dims = [decode_dims(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.str.len().astype("int64"),
                    "magic": [bytes(p[:2]).hex().upper() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return fan_out(df.select(id_col, bin_col)).mapInPandas(batches, MEDIA_META_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
    ]
)


def resize_stub(payload: bytes, max_side: int) -> tuple[bytes, int, int]:
    """Deterministic fake resize for non-image payloads (text-as-
    payload plumbing; its oracle mirrors this math). Keeps the aspect
    contract (w,h ≤ max_side) and shrinks the payload so batch-size
    accounting downstream is realistic."""
    if not payload:
        raise NotImplementedError("media payload is empty")
    w, h = decode_stub(payload)
    scale = max(w, h) / max_side
    tw, th = max(int(w / scale), 1), max(int(h / scale), 1)
    return payload[: max(len(payload) // 4, 1)], tw, th


def resize_real(payload: bytes, max_side: int) -> tuple[bytes, int, int]:
    """REAL thumbnail for decodable images: decode (stdlib PNG / PIL
    tier), nearest-neighbor downscale keeping aspect, re-encode as
    PNG. Falls back to `resize_stub` for unrecognized payloads so
    mixed batches never fail."""
    if media.is_png(payload):
        thumb = media.resize_nearest(media.decode_png(payload), max_side)
        return media.encode_png(thumb), thumb.shape[1], thumb.shape[0]
    try:
        arr = media.decode_image(payload)
    except ValueError:
        return resize_stub(payload, max_side)
    thumb = media.resize_nearest(arr, max_side)
    return media.encode_png(thumb), thumb.shape[1], thumb.shape[0]


def resize_images(
    df: DataFrame, id_col: str, bin_col: str, max_side: int = 32
) -> DataFrame:
    """Thumbnail pass over a binary image column. Same mapInPandas
    shape as extract_media_meta: Arrow batches in, per-item decode
    (irreducible), Arrow batches out. `spark.sql.files.
    maxPartitionBytes` bounds how many blobs one task holds."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [resize_real(p, max_side) for p in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "thumb": [t[0] for t in out],
                    "thumb_w": [t[1] for t in out],
                    "thumb_h": [t[2] for t in out],
                }
            )

    return fan_out(df.select(id_col, bin_col)).mapInPandas(batches, RESIZE_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def audio_features(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Feature extraction over a binary audio column. RIFF/WAVE
    payloads get a REAL decode (soundfile when importable, stdlib
    `wave` otherwise — functions/media.decode_wav): duration from
    the container's sample rate, RMS computed over exact int-domain
    sums (bit-identical under any batch order, so the SQL oracle can
    reproduce it), zero crossings on the raw samples. Non-WAV
    payloads keep the PCM8 interpretation as the deterministic
    plumbing fallback."""
    import numpy as np

    def one(doc_id, payload) -> tuple[int, float, float, int]:
        if not payload:
            raise NotImplementedError("media payload is empty")
        if media.is_wav(payload):
            samples, rate = media.decode_wav(payload)
            # PCM16 samples are k/2^15 with k integral: recover k
            # exactly and accumulate the square-sum in int64 so RMS
            # is sqrt(exact_rational) — deterministic to the bit
            ints = np.round(samples * 32768.0).astype(np.int64)
            ssq = int((ints * ints).sum())
            rms = float(np.sqrt(ssq / len(ints)) / 32768.0)
            zc = int(np.sum((ints[1:] < 0) != (ints[:-1] < 0)))
            return int(doc_id), len(ints) / float(rate), rms, zc
        pcm = np.frombuffer(payload, dtype=np.int8).astype(np.float64)
        return (
            int(doc_id),
            len(pcm) / 8000.0,  # fake 8 kHz sample rate
            float(np.sqrt(np.mean(pcm**2))),
            int(np.sum(np.signbit(pcm[1:]) != np.signbit(pcm[:-1]))),
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                one(doc_id, payload)
                for doc_id, payload in zip(pdf[id_col], pdf[bin_col])
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return fan_out(df.select(id_col, bin_col)).mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def image_pixel_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Per-image channel means via the REAL decode path (stdlib PNG
    inflate+unfilter, or PIL when importable) — the operator the
    `media_pixel_stats` oracle checks pixel-for-pixel. Channel sums
    accumulate in int64 and divide once, so the mean is exact-over-n
    and reproducible by integer SQL arithmetic. Grayscale images
    report the same mean on all three channels."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                arr = media.decode_image(bytes(payload))
                if arr.shape[2] == 2:  # gray+alpha: drop alpha
                    arr = arr[:, :, :1]
                elif arr.shape[2] == 4:  # rgba: drop alpha
                    arr = arr[:, :, :3]
                h, w = arr.shape[:2]
                n = h * w
                sums = arr.astype(np.int64).sum(axis=(0, 1))
                means = [float(s) / n for s in sums]
                if len(means) == 1:
                    means = means * 3
                rows.append((int(doc_id), w, h, *means))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PIXEL_STATS_SCHEMA.fields]
            )

    return fan_out(df.select(id_col, bin_col)).mapInPandas(batches, PIXEL_STATS_SCHEMA)


def frame_sample_plan(df: DataFrame, id_col: str, bin_col: str, every_n: int = 30) -> DataFrame:
    """Plumbing-only frame sampling: emits (doc_id, frame_idx) rows
    for frames 0, n, 2n… of a fake 300-frame video — the
    explode-based fan-out shape, payload untouched. The REAL
    container path is `video_frame_stats` (round 6), which reads
    the AVI header for the true frame count and seeks only the
    sampled frames."""
    n_frames = F.lit(300)
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(idx).alias("frame_idx")
    )


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def video_frame_stats(
    df: DataFrame, id_col: str, bin_col: str, every_n: int = 30
) -> DataFrame:
    """REAL video frame sampling (round 6): per sampled frame
    (0, n, 2n… of the container's TRUE frame count), channel means
    from actually-decoded pixels. The container tier is the
    pure-stdlib AVI parser (`media.avi_metadata` / `avi_index` /
    `decode_avi_frames`); compressed codecs raise to the av/PIL
    tier. The scale property: decoding seeks straight to the
    idx1-listed chunks of sampled frames — a 1-in-30 sample touches
    ~3% of each blob's frame bytes, and channel sums accumulate in
    int64 so the mean is exact-over-n (oracle-reproducible by
    integer SQL arithmetic, like `image_pixel_stats`)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                p = bytes(payload)
                meta = media.avi_metadata(p)
                idxs = list(range(0, meta["n_frames"], every_n))
                frames = media.decode_avi_frames(p, idxs)
                n_px = meta["width"] * meta["height"]
                for fi, arr in zip(idxs, frames):
                    sums = arr.astype(np.int64).sum(axis=(0, 1))
                    rows.append(
                        (
                            int(doc_id),
                            fi,
                            meta["width"],
                            meta["height"],
                            meta["n_frames"],
                            meta["fps"],
                            *(float(s) / n_px for s in sums),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_FRAME_SCHEMA.fields]
            )

    return fan_out(df.select(id_col, bin_col)).mapInPandas(
        batches, VIDEO_FRAME_SCHEMA
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

    out = fan_out(df).mapInArrow(batches, schema="doc_id long, n_bytes long, magic_bytes binary")
    return out.select(
        "doc_id", "n_bytes", F.upper(F.hex("magic_bytes")).alias("magic")
    )


def image_ahash_bands(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Perceptual average-hash over the REAL decode path: each image
    decodes (stdlib PNG inflate+unfilter, PIL tier when importable),
    each pixel's gray sum (r+g+b) compares against the image mean, and
    the 64 bits pack into four 16-bit band keys (rows 2k..2k+1) —
    the SimHash-style pigeonhole blocking unit: hamming ≤ 3 over 4
    bands guarantees an identical band, so near-dup candidate
    generation is an equi-join on (band_idx, band_val), never
    images². All arithmetic is integer-exact (64·g > Σg avoids the
    mean division), so the SQL oracle reproduces every bit.

    Returns (id_col, bands array<int>) with bands[k] ∈ [0, 65535].
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                arr = media.decode_image(bytes(payload)).astype(np.int64)
                if arr.shape[2] == 2:
                    arr = arr[:, :, :1]
                elif arr.shape[2] == 4:
                    arr = arr[:, :, :3]
                g = arr.sum(axis=2)
                n = g.shape[0] * g.shape[1]
                bits = (n * g > g.sum()).astype(np.int64)
                bands = []
                for k in range(4):
                    block = bits[2 * k : 2 * k + 2, :].flatten()
                    bands.append(int((block << np.arange(block.size)).sum()))
                rows.append((int(doc_id), bands))
            yield pd.DataFrame(rows, columns=[id_col, "bands"])

    return fan_out(df.select(id_col, bin_col)).mapInPandas(
        batches, schema=f"{id_col} long, bands array<int>"
    )


def audio_fingerprint_bands(
    df: DataFrame, id_col: str, bin_col: str, n_frames: int = 16
) -> DataFrame:
    """Acoustic fingerprint over the REAL WAV decode path: samples
    recover to exact int16, the clip splits into `n_frames` equal
    frames, and bit f = (n_frames · frame_energy > total_energy) —
    the integer-exact energy-profile analogue of the image
    average-hash (no division, so the SQL oracle reproduces every
    bit). The n_frames bits pack into four band keys for
    SimHash-style pigeonhole blocking: hamming ≤ 3 over 4 bands
    guarantees a shared band, so near-dup candidates come from an
    equi-join on (band_idx, band_val), never clips².

    Returns (id_col, bands array<int>)."""
    import numpy as np

    per_band = n_frames // 4

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                samples, _rate = media.decode_wav(bytes(payload))
                ints = np.round(samples * 32768.0).astype(np.int64)
                n = len(ints) - (len(ints) % n_frames)
                e = (ints[:n] ** 2).reshape(n_frames, -1).sum(axis=1)
                bits = (n_frames * e > e.sum()).astype(np.int64)
                bands = []
                for k in range(4):
                    block = bits[per_band * k : per_band * (k + 1)]
                    bands.append(int((block << np.arange(block.size)).sum()))
                rows.append((int(doc_id), bands))
            yield pd.DataFrame(rows, columns=[id_col, "bands"])

    return fan_out(df.select(id_col, bin_col)).mapInPandas(
        batches, schema=f"{id_col} long, bands array<int>"
    )
