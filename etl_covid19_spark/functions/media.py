"""Real media codecs behind optional dependencies.

The multimodal operators' decode step was a documented stub in
rounds 1-2 (no codec libraries in the container). This module closes
that residual with a tiered decoder:

1. **PIL / soundfile when importable** — the production path.
2. **Pure-stdlib codecs** — a real PNG decoder/encoder (zlib inflate,
   scanline unfiltering per the PNG spec, CRC-checked chunks), a
   real WAV reader (stdlib `wave`), and (round 6) a real baseline
   JPEG encoder/decoder (Annex K tables, Huffman entropy coding,
   DCT/IDCT, restart markers, sampling-factor upsample), and a real
   AVI/RIFF video container parser (uncompressed 24-bit DIB frames,
   idx1-indexed frame seeking), so REAL pixel/sample math runs even
   in codec-less environments like this one. Only compressed video
   codecs (MJPEG/H.264) and non-baseline JPEG (progressive /
   arithmetic) remain PIL/av-gated.
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
    grayscale/gray+alpha/RGB/RGBA.  Malformed/truncated payloads
    raise ValueError (never zlib.error/struct.error/IndexError) so
    mixed-batch fallbacks survive corrupt blobs."""
    if not is_png(payload):
        raise ValueError("not a PNG payload")
    return _as_valueerror(_decode_png_impl, payload)


def _decode_png_impl(payload: bytes) -> np.ndarray:
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
    """Tiered real image decode: PIL when importable, stdlib
    PNG/baseline-JPEG otherwise. Raises ValueError for formats no
    tier handles (e.g. progressive JPEG without PIL, video) —
    callers decide whether to fall back to the deterministic stub."""
    try:
        from PIL import Image  # type: ignore[import-not-found]
    except ImportError:
        Image = None
    if Image is not None:
        import io

        try:
            return np.asarray(
                Image.open(io.BytesIO(payload)).convert("RGB")
            )
        except Exception as exc:  # UnidentifiedImageError/OSError/...
            # PIL handles a superset of the stdlib tiers, so a PIL
            # failure is a corrupt/unsupported payload — surface it
            # as the documented ValueError contract, never as a
            # PIL-internal class the mixed-batch fallbacks can't see.
            raise ValueError(
                f"undecodable image payload: {type(exc).__name__}: {exc}"
            ) from exc
    if is_jpeg(payload):
        rgb = decode_jpeg(payload)
        if rgb.ndim == 2:  # grayscale JPEG → RGB like PIL's convert
            rgb = np.repeat(rgb[:, :, None], 3, axis=2)
        return rgb
    return decode_png(payload)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """(samples float64 in [-1, 1] — first channel, sample_rate) via
    soundfile when importable, stdlib `wave` otherwise. PCM 8/16/32.
    Malformed/truncated payloads raise ValueError (never wave.Error/
    EOFError/struct.error)."""
    return _as_valueerror(_decode_wav_impl, payload)


def _decode_wav_impl(payload: bytes) -> tuple[np.ndarray, int]:
    import io

    try:
        import soundfile  # type: ignore[import-not-found]
    except ImportError:
        soundfile = None
    if soundfile is not None:
        try:
            data, rate = soundfile.read(io.BytesIO(payload))
        except Exception as exc:  # LibsndfileError/RuntimeError/...
            raise ValueError(
                f"undecodable audio payload: {type(exc).__name__}: {exc}"
            ) from exc
        mono = data[:, 0] if getattr(data, "ndim", 1) > 1 else data
        return np.asarray(mono, dtype=np.float64), int(rate)
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


# --------------------------------------------------------------------------
# JPEG (baseline sequential, ITU-T T.81) — the round-6 tier closing
# the last import-gated image format. Pure stdlib + numpy on both
# sides: the ENCODER (fixtures) writes JFIF 4:4:4 with the Annex K
# quantization tables (IJG quality scaling) and Annex K Huffman
# tables; the DECODER handles any baseline SOF0 stream — multiple
# quant/huffman tables, arbitrary h/v sampling factors (nearest-
# neighbor chroma upsample), restart markers, byte stuffing. PIL
# remains the production tier (`decode_image` prefers it when
# importable); this path makes REAL DCT/Huffman pixel math run in
# codec-less environments, same posture as the PNG/WAV tiers.
#
# Rounding is pinned to floor(x+0.5) (half-up) at every lossy
# boundary — color convert, quantize, final pixel — so fixture
# oracles can re-derive decoded constants exactly (DuckDB has no
# banker's-rounding surprises to fight).

JPEG_SOI = b"\xff\xd8"

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_Q_LUMA_BASE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

_Q_CHROMA_BASE = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    A = np.cos((2 * x + 1) * u * np.pi / 16.0) / 2.0
    A[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return A


_DCT_A = _dct_matrix()


def _half_up(x):
    """floor(x + 0.5) — the pinned rounding at every lossy boundary
    (symmetric for quantization via sign-split at the call sites that
    need it)."""
    return np.floor(np.asarray(x, dtype=np.float64) + 0.5)


def is_jpeg(payload: bytes) -> bool:
    return payload[:2] == JPEG_SOI


def jpeg_quant_tables(quality: int = 75) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables under IJG quality scaling (the de-facto
    standard: scale = 5000/q below 50 else 200−2q, floor((b·s+50)/
    100) clipped to [1, 255])."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUMA_BASE, _Q_CHROMA_BASE):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF color convert, half-up rounded to uint8 planes."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(_half_up(out), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_half_up(out), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _huff_encode_table(spec) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical assignment."""
    bits, vals = spec
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """(category, raw bits) for a DC diff / AC coefficient value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg(
    pixels: np.ndarray, quality: int = 90, restart: int = 0
) -> bytes:
    """Baseline JFIF encoder: 8-bit RGB (h, w, 3) or grayscale
    (h, w) → 4:4:4 (resp. single-component) SOF0 stream with Annex K
    quantization (IJG-scaled) and Huffman tables. Quantization is
    symmetric half-up (sign·floor(|F|/Q + 0.5)) so fixture oracles
    can reproduce coefficients exactly. `restart` > 0 emits a DRI
    segment and RSTn markers every `restart` MCUs — the resync
    points that let a cluster decoder split one entropy stream
    across workers."""
    arr = np.asarray(pixels)
    gray = arr.ndim == 2
    if gray:
        planes = [arr.astype(np.uint8)]
    else:
        ycc = rgb_to_ycbcr(arr[..., :3])
        planes = [ycc[..., i] for i in range(3)]
    h, w = planes[0].shape
    qt_l, qt_c = jpeg_quant_tables(quality)
    qts = [qt_l] + ([] if gray else [qt_c])

    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    padded = []
    for p in planes:
        pp = np.empty((ph, pw), dtype=np.uint8)
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1 : h, :]
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)

    dc_tabs = [_huff_encode_table(_HUFF_DC_LUMA)] + (
        [] if gray else [_huff_encode_table(_HUFF_DC_CHROMA)]
    )
    ac_tabs = [_huff_encode_table(_HUFF_AC_LUMA)] + (
        [] if gray else [_huff_encode_table(_HUFF_AC_CHROMA)]
    )
    bw = _BitWriter()
    pred = [0] * len(planes)
    A = _DCT_A
    scan_parts: list[bytes] = []
    mcu_idx = 0
    rst_n = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart and mcu_idx and mcu_idx % restart == 0:
                scan_parts.append(bw.flush())
                scan_parts.append(bytes([0xFF, 0xD0 + rst_n]))
                rst_n = (rst_n + 1) % 8
                bw = _BitWriter()
                pred = [0] * len(planes)
            mcu_idx += 1
            for ci, plane in enumerate(padded):
                ti = 0 if ci == 0 else 1
                block = plane[by : by + 8, bx : bx + 8].astype(
                    np.float64
                ) - 128.0
                Fc = A @ block @ A.T
                # exact DC: Σ(pixels−128)/8 is dyadic (int/8) so the
                # quantizer's half-up sees the true value, not the
                # float DCT's ±1e-13 residual — (v−128)/2 lands ON
                # the .5 boundary for every odd v, where that
                # residual would otherwise flip the rounding
                Fc[0, 0] = float(
                    int(
                        plane[by : by + 8, bx : bx + 8].astype(np.int64).sum()
                    )
                    - 64 * 128
                ) / 8.0
                q = qts[ti].astype(np.float64)
                coef = (
                    np.sign(Fc) * np.floor(np.abs(Fc) / q + 0.5)
                ).astype(np.int64)
                zz = coef.reshape(-1)[_ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size, bits = _magnitude(diff)
                code, ln = dc_tabs[ti][size]
                bw.write(code, ln)
                if size:
                    bw.write(bits, size)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for idx in range(1, 64):
                    v = int(zz[idx])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, ln = ac_tabs[ti][0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    size, bits = _magnitude(v)
                    code, ln = ac_tabs[ti][(run << 4) | size]
                    bw.write(code, ln)
                    bw.write(bits, size)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_tabs[ti][0x00]  # EOB
                    bw.write(code, ln)
    scan_parts.append(bw.flush())
    scan = b"".join(scan_parts)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(JPEG_SOI)
    out += seg(
        0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    for tid, qt in enumerate(qts):
        out += seg(
            0xDB,
            bytes([tid]) + bytes(int(x) for x in qt.reshape(-1)[_ZIGZAG]),
        )
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    huffs = [(0x00, _HUFF_DC_LUMA), (0x10, _HUFF_AC_LUMA)]
    if not gray:
        huffs += [(0x01, _HUFF_DC_CHROMA), (0x11, _HUFF_AC_CHROMA)]
    for tclass_id, (bits, vals) in huffs:
        out += seg(0xC4, bytes([tclass_id]) + bytes(bits) + bytes(vals))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_dimensions(payload: bytes) -> tuple[int, int]:
    """(height, width) from the SOF header — no entropy decode, the
    cheap metadata path for scan-level stats at scale.  Truncated
    headers raise ValueError, never struct.error."""
    return _as_valueerror(_jpeg_dimensions_impl, payload)


def _jpeg_dimensions_impl(payload: bytes) -> tuple[int, int]:
    i = 2
    n = len(payload)
    while i + 3 < n:
        if payload[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        ln = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
            return h, w
        i += 2 + ln
    raise ValueError("no SOF marker")


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops (and
    reports) at any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0


class _MarkerHit(ValueError):
    """A non-stuffed marker inside entropy data.  Subclasses
    ValueError (round-7 ADVICE): when a corrupt stream lets one
    escape the scan loop, callers' documented mixed-batch fallback
    (`except ValueError → resize_stub`, multimodal.py) must catch it
    — a bare-Exception escape kills the whole Spark task, and at
    100 TB corrupt payloads with a valid FFD8 prefix are a
    certainty."""

    def __init__(self, marker: int):
        super().__init__(f"unexpected marker 0x{marker:02x} in entropy data")
        self.marker = marker


def _huff_decode_table(bits, vals) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_read(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _as_valueerror(fn, *args):
    """Run a decode stage, converting the exception classes a
    truncated/corrupt stream can raise from the raw byte math —
    IndexError (short reads), struct.error (short unpacks), KeyError
    (references to tables the corrupt header never defined) — into
    ValueError, the documented 'malformed media' contract that the
    mixed-batch fallbacks key on (multimodal.resize_real /
    extract_media_meta catch ValueError only)."""
    import struct as _struct
    import wave as _wave
    import zlib as _zlib

    try:
        return fn(*args)
    except ValueError:
        raise  # includes _MarkerHit; already contract-shaped
    except (
        IndexError,
        KeyError,
        EOFError,
        _struct.error,
        _zlib.error,
        _wave.Error,
    ) as exc:
        raise ValueError(
            f"malformed media stream: {type(exc).__name__}: {exc}"
        ) from exc


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential (SOF0) JPEG decoder, pure stdlib+numpy:
    marker parse → per-MCU Huffman entropy decode → dequantize →
    IDCT → nearest-neighbor chroma upsample → JFIF YCbCr→RGB
    (half-up, clipped). Supports multiple quant/Huffman tables,
    arbitrary h/v sampling factors, restart intervals, and 1- or
    3-component frames; progressive (SOF2) and arithmetic streams
    raise ValueError (PIL tier handles them where importable).

    Exception contract: EVERY malformed input — truncated entropy
    data, short headers, references to undefined tables, stray
    markers — raises ValueError, never IndexError/KeyError/
    struct.error, so one corrupt payload with a valid FFD8 prefix
    degrades to the callers' stub fallback instead of killing the
    Spark task (round-7 ADVICE, medium)."""
    if not is_jpeg(payload):
        raise ValueError("not a JPEG stream")
    return _as_valueerror(_decode_jpeg_impl, payload)


def _decode_jpeg_impl(payload: bytes) -> np.ndarray:
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    i = 2
    n = len(payload)
    while i + 3 < n:
        if payload[i] != 0xFF:
            raise ValueError("bad marker stream")
        marker = payload[i + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        ln = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        body = payload[i + 4 : i + 2 + ln]
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                flat = np.frombuffer(
                    body[j + 1 : j + 65], dtype=np.uint8
                ).astype(np.int64)
                qt = np.zeros(64, dtype=np.int64)
                qt[_ZIGZAG] = flat
                qts[tq] = qt.reshape(8, 8)
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                cnt = sum(bits)
                vals = list(body[j + 17 : j + 17 + cnt])
                huff[(tc, th)] = _huff_decode_table(bits, vals)
                j += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline JPEG (progressive/etc.)")
        elif marker == 0xDD:
            restart = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_tabs = {}
            for c in range(ns):
                cs, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan_tabs[cs] = (tabs >> 4, tabs & 0x0F)
            return _decode_scan(
                payload, i + 2 + ln, frame, qts, huff, scan_tabs, restart
            )
        i += 2 + ln
    raise ValueError("no scan data")


def _decode_scan(data, pos, frame, qts, huff, scan_tabs, restart):
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for cid, hs, vs, tq in comps:
        planes.append(
            np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        )
    A = _DCT_A
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                # RSTn: discard pad bits, scan to the marker (a pad
                # byte of 0xFF arrives stuffed as FF00 and must be
                # skipped, not decoded), consume it, reset DC preds
                br.align()
                p = br.pos
                while not (
                    data[p] == 0xFF and data[p + 1] != 0x00
                ):
                    p += 2 if data[p] == 0xFF else 1
                if 0xD0 <= data[p + 1] <= 0xD7:
                    p += 2
                br.pos = p
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                dct, act = scan_tabs[cid]
                dc_tab = huff[(0, dct)]
                ac_tab = huff[(1, act)]
                q = qts[tq]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _huff_read(br, dc_tab)
                        diff = (
                            _extend(br.read_bits(size), size)
                            if size
                            else 0
                        )
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = _huff_read(br, ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        if not zz[1:].any():
                            # DC-only shortcut (flat block): exact
                            # int·q/8 — bit-reproducible by integer
                            # SQL oracles, and faster than the IDCT
                            block = np.full(
                                (8, 8),
                                float(int(zz[0]) * int(q[0, 0])) / 8.0
                                + 128.0,
                            )
                        else:
                            coef = np.zeros(64, dtype=np.float64)
                            coef[_ZIGZAG] = zz
                            block = (
                                A.T @ (coef.reshape(8, 8) * q) @ A
                                + 128.0
                            )
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    out_planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        p = planes[ci]
        if hs != hmax or vs != vmax:
            p = np.repeat(
                np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1
            )
        out_planes.append(p[:fh, :fw])
    if len(out_planes) == 1:
        return np.clip(_half_up(out_planes[0]), 0, 255).astype(np.uint8)
    ycc = np.stack(out_planes, axis=-1)
    return ycbcr_to_rgb(np.clip(ycc, 0.0, 255.0))


# --------------------------------------------------------------------------
# AVI (RIFF, uncompressed 24-bit DIB frames) — the round-6 tier
# closing the video-container gap. Pure stdlib struct parsing on
# both sides: the ENCODER (fixtures) writes a spec-shaped RIFF
# ('hdrl' with avih/strh/strf, 'movi' with '00db' frame chunks,
# an 'idx1' index), the DECODER parses any BI_RGB 24-bit AVI —
# bottom-up BGR rows, 4-byte row padding, odd-chunk pad bytes.
# Compressed codecs (MJPEG/H.264) stay av/PIL-gated: this tier makes
# REAL container parsing and frame-pixel math run in codec-less
# environments, same posture as the PNG/WAV/JPEG tiers. The
# scale-relevant property is `avi_index` + `decode_avi_frames`:
# frame SAMPLING seeks straight to the idx1-listed chunks of the
# wanted frames and never touches the others' bytes — at 100 TB a
# 1-in-30 sample reads ~3% of the movi payload, not 100%.


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def _dib_stride(width: int) -> int:
    return (width * 3 + 3) & ~3  # BGR rows padded to 4 bytes


def encode_avi(frames: "np.ndarray", fps: int = 30) -> bytes:
    """Minimal uncompressed AVI writer for fixtures: frames is
    (n, h, w, 3) uint8 RGB; each frame becomes one '00db' chunk of
    bottom-up, 4-byte-padded BGR rows (BITMAPINFOHEADER BI_RGB),
    indexed in 'idx1'."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    stride = _dib_stride(w)
    frame_bytes = []
    for f in range(n):
        bgr = frames[f, ::-1, :, ::-1]  # bottom-up rows, RGB->BGR
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        frame_bytes.append(rows.tobytes())
    size_image = stride * h

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        size_image * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        size_image,  # dwSuggestedBufferSize
        w,
        h,
        0,
        0,
        0,
        0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IHHIIIIIIII4h",
            0,  # dwFlags
            0,
            0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (fps = rate/scale)
            0,  # dwStart
            n,  # dwLength (frames)
            size_image,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (-1 default)
            0,  # dwSampleSize
            0,
            0,
            w,
            h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40,  # biSize
        w,
        h,  # positive = bottom-up
        1,  # biPlanes
        24,  # biBitCount
        0,  # biCompression = BI_RGB
        size_image,
        0,
        0,
        0,
        0,
    )

    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def lst(four: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", four + data)

    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00db", fb) for fb in frame_bytes)
    movi = lst(b"movi", movi_body)
    # idx1 offsets are relative to the 'movi' fourcc position
    idx_entries = []
    off = 4  # past the 'movi' fourcc
    for fb in frame_bytes:
        idx_entries.append(
            b"00db" + struct.pack("<III", 0x10, off, len(fb))  # AVIIF_KEYFRAME
        )
        off += 8 + len(fb) + (len(fb) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_walk(payload: bytes, pos: int = 12, end: int | None = None):
    """Recursive RIFF chunk walk yielding (fourcc_or_list_type,
    data, abs_offset_of_data). Descends into 'hdrl'/'strl' LISTs;
    'movi' is yielded whole so frame bytes stay untouched until a
    caller seeks them via the index."""
    if end is None:
        end = len(payload)  # default skips RIFF header + 'AVI '
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        data_at = pos + 8
        if cid == b"LIST":
            ltype = payload[data_at : data_at + 4]
            yield ltype, payload[data_at : data_at + length], data_at
            if ltype in (b"hdrl", b"strl"):
                yield from _avi_walk(payload, data_at + 4, data_at + length)
        else:
            yield cid, payload[data_at : data_at + length], data_at
        pos = data_at + length + (length % 2)


def avi_metadata(payload: bytes) -> dict:
    """Header peek — width/height/n_frames/fps/bit_count without
    touching a single frame byte (the property that makes metadata
    queries free at scale: blob column chunks holding the frames are
    never materialized past the header pages)."""
    if not is_avi(payload):
        raise ValueError("not an AVI payload")
    meta: dict = {}
    for cid, data, _ in _avi_walk(payload):
        if cid == b"avih":
            vals = struct.unpack("<14I", data[:56])
            meta["n_frames"] = vals[4]
            meta["width"] = vals[8]
            meta["height"] = vals[9]
        elif cid == b"strh" and data[:4] == b"vids":
            scale, rate = struct.unpack("<II", data[20:28])
            meta["fps"] = rate // max(scale, 1)
        elif cid == b"strf" and "bit_count" not in meta:
            meta["bit_count"] = struct.unpack("<H", data[14:16])[0]
            meta["compression"] = struct.unpack("<I", data[16:20])[0]
        if cid == b"movi":
            break
    if "width" not in meta:
        raise ValueError("AVI missing avih header")
    return meta


def avi_index(payload: bytes) -> list[tuple[int, int]]:
    """[(abs_offset_of_frame_data, length)] per frame, from 'idx1'
    (falling back to a movi scan when the index is absent). This is
    the seek table frame sampling uses to read ONLY wanted frames."""
    movi_at = None
    idx = None
    for cid, data, off in _avi_walk(payload):
        if cid == b"movi":
            movi_at = off  # offset of the 'movi' fourcc
        elif cid == b"idx1":
            idx = data
    frames: list[tuple[int, int]] = []
    if idx is not None and movi_at is not None:
        base = None
        for e in range(0, len(idx) - 15, 16):
            ckid = idx[e : e + 4]
            if ckid[2:4] not in (b"db", b"dc"):
                continue
            off, ln = struct.unpack("<II", idx[e + 8 : e + 16])
            if base is None:
                # Two idx1 conventions exist in the wild: offsets
                # relative to the 'movi' fourcc (the spec) and
                # absolute file offsets (a common encoder variant).
                # Sniff with the first entry — whichever base lands
                # on this entry's own chunk id wins (ffmpeg does the
                # same); spec-relative is the tie-break default.
                if payload[movi_at + off : movi_at + off + 4] == ckid:
                    base = movi_at
                elif payload[off : off + 4] == ckid:
                    base = 0
                else:
                    base = movi_at
            frames.append((base + off + 8, ln))  # +8 skips ck header
        return frames
    # no index: linear scan of movi children
    if movi_at is None:
        raise ValueError("AVI missing movi list")
    pos = movi_at + 4
    (movi_len,) = struct.unpack("<I", payload[movi_at - 4 : movi_at])
    end = movi_at + movi_len
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid[2:4] in (b"db", b"dc"):
            frames.append((pos + 8, ln))
        pos += 8 + ln + (ln % 2)
    return frames


def _dib_to_rgb(data: bytes, w: int, h: int) -> "np.ndarray":
    stride = _dib_stride(w)
    rows = np.frombuffer(data, np.uint8, stride * h).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()  # bottom-up -> top-down, BGR -> RGB


def decode_avi_frames(payload: bytes, indices=None) -> "np.ndarray":
    """Decode SELECTED frames to (k, h, w, 3) uint8 RGB. `indices`
    None decodes all. Only BI_RGB 24-bit is handled here — anything
    else raises for the av/PIL tier. Sampling cost is proportional
    to len(indices), not n_frames: each wanted frame is one slice at
    its idx1 offset."""
    meta = avi_metadata(payload)
    if meta.get("compression", 0) != 0 or meta.get("bit_count") != 24:
        raise ValueError(
            "only uncompressed 24-bit AVI decodes without av/PIL "
            f"(compression={meta.get('compression')}, bits={meta.get('bit_count')})"
        )
    table = avi_index(payload)
    w, h = meta["width"], meta["height"]
    wanted = list(range(len(table)) if indices is None else indices)
    out = np.empty((len(wanted), h, w, 3), dtype=np.uint8)
    for i, fi in enumerate(wanted):
        off, ln = table[fi]
        out[i] = _dib_to_rgb(payload[off : off + ln], w, h)
    return out
