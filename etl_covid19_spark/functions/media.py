"""Real media codecs behind optional dependencies.

The multimodal operators' decode step was a documented stub in
rounds 1-2 (no codec libraries in the container). This module closes
that residual with a tiered decoder:

1. **PIL / soundfile when importable** — the production path.
2. **Pure-stdlib codecs** — a real PNG decoder/encoder (zlib inflate,
   scanline unfiltering per the PNG spec, CRC-checked chunks) and a
   real WAV reader (stdlib `wave`), so REAL pixel/sample math runs
   even in codec-less environments like this one.
3. **Deterministic fake** (`operators.multimodal.decode_stub`) for
   payloads in neither library's formats — kept so text-as-payload
   plumbing queries stay runnable and oracle-mirrorable.

The PNG subset implemented is the one the engine emits and the
fixtures use: 8-bit depth, grayscale / RGB / RGBA, non-interlaced —
but unfiltering handles all five spec filters, so thumbnails from
real-world encoders (which usually emit Sub/Up/Paeth) decode too.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # colortype -> samples/pixel


def is_png(payload: bytes) -> bool:
    return payload[:8] == PNG_SIGNATURE


def is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def _chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        crc = payload[pos + 8 + length : pos + 12 + length]
        if len(crc) == 4 and struct.unpack(">I", crc)[0] != zlib.crc32(
            ctype + data
        ):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return


def png_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR — a header peek, no inflate."""
    if not is_png(payload):
        raise ValueError("not a PNG payload")
    w, h = struct.unpack(">II", payload[16:24])
    return int(w), int(h)


def _unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Undo per-scanline filtering (PNG spec §9): each line is one
    filter-type byte + w*ch filtered bytes. Sub/Average/Paeth are
    sequential in x, so the inner reconstruction loops per pixel —
    fine for thumbnail-sized media inside an Arrow batch."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth need the reconstructed left pixel
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0  # left
                b = prev[x]  # up
                if ftype == 1:  # Sub
                    rec[x] = (line[x] + a) & 0xFF
                elif ftype == 3:  # Average
                    rec[x] = (line[x] + (a + b) // 2) & 0xFF
                elif ftype == 4:  # Paeth
                    c = prev[x - ch] if x >= ch else 0  # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    rec[x] = (line[x] + pred) & 0xFF
                else:
                    raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, ch)


def decode_png(payload: bytes) -> np.ndarray:
    """Full decode to a (h, w, channels) uint8 array — stdlib only
    (zlib inflate + spec unfiltering). 8-bit non-interlaced
    grayscale/gray+alpha/RGB/RGBA."""
    if not is_png(payload):
        raise ValueError("not a PNG payload")
    w = h = None
    ch = 0
    idat = b""
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, colortype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or colortype not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={colortype} "
                    f"interlace={interlace})"
                )
            ch = _CHANNELS[colortype]
        elif ctype == b"IDAT":
            idat += data
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    return _unfilter(zlib.decompress(idat), int(w), int(h), ch)


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal spec-compliant PNG writer: filter-0 scanlines, one
    zlib IDAT, CRC'd chunks. Accepts (h, w) grayscale or (h, w, ch)
    uint8 with ch ∈ {1, 2, 3, 4}."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_nearest(pixels: np.ndarray, max_side: int) -> np.ndarray:
    """Nearest-neighbor thumbnail keeping aspect (the PIL.thumbnail
    contract): output fits in max_side × max_side, never upscales."""
    h, w = pixels.shape[:2]
    scale = max(h, w) / float(max_side)
    if scale <= 1.0:
        return pixels
    th = max(int(h / scale), 1)
    tw = max(int(w / scale), 1)
    ys = (np.arange(th) * (h / th)).astype(np.int64)
    xs = (np.arange(tw) * (w / tw)).astype(np.int64)
    return pixels[ys][:, xs]


def decode_image(payload: bytes) -> np.ndarray:
    """Tiered real image decode: PIL when importable, stdlib PNG
    otherwise. Raises ValueError for formats neither tier handles —
    callers decide whether to fall back to the deterministic stub."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError:
        pass
    return decode_png(payload)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """(samples float64 in [-1, 1] — first channel, sample_rate) via
    soundfile when importable, stdlib `wave` otherwise. PCM 8/16/32."""
    import io

    try:
        import soundfile  # type: ignore[import-not-found]

        data, rate = soundfile.read(io.BytesIO(payload))
        mono = data[:, 0] if getattr(data, "ndim", 1) > 1 else data
        return np.asarray(mono, dtype=np.float64), int(rate)
    except ImportError:
        pass
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate = wf.getframerate()
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width {width}")
    samples = np.frombuffer(frames, dtype=dtype).reshape(-1, nch)[:, 0]
    if width == 1:  # PCM8 is unsigned, centered at 128
        return (samples.astype(np.float64) - 128.0) / 128.0, rate
    return samples.astype(np.float64) / float(2 ** (8 * width - 1)), rate


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal mono PCM16 WAV writer (stdlib `wave`) for fixtures.
    Integer input is written verbatim as int16 (no float rounding —
    lets fixtures pin exact sample values); float input is clipped
    to [-1, 1] and scaled."""
    import io
    import wave

    arr = np.asarray(samples)
    if np.issubdtype(arr.dtype, np.integer):
        ints = arr.astype("<i2")
    else:
        pcm = np.clip(arr.astype(np.float64), -1.0, 1.0)
        ints = np.round(pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(ints.tobytes())
    return buf.getvalue()
