"""Real media codec tier (functions/media.py): pure-Python round
trips (no Spark needed) plus the Spark operators driven over real
PNG/WAV payloads mixed with non-media payloads."""

import numpy as np
import pytest

from etl_covid19_spark.functions import media


def test_png_round_trip_all_color_types():
    rng = np.random.default_rng(7)
    for shape in [(1, 1, 1), (2, 2, 3), (5, 9, 4), (16, 16, 2), (33, 7, 3)]:
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        png = media.encode_png(arr)
        assert media.is_png(png)
        assert media.png_dimensions(png) == (shape[1], shape[0])
        back = media.decode_png(png)
        assert back.shape == arr.shape
        assert (back == arr).all()


def test_png_unfilter_handles_all_spec_filters():
    """Our encoder emits filter 0 only; real encoders emit Sub/Up/
    Average/Paeth. Re-filter a known image each way and check the
    decoder reconstructs it."""
    import struct
    import zlib

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (6, 4, 3), dtype=np.uint8)
    h, w, ch = arr.shape
    stride = w * ch

    def refilter(ftype: int) -> bytes:
        raw = b""
        prev = np.zeros(stride, np.int32)
        for y in range(h):
            line = arr[y].reshape(-1).astype(np.int32)
            if ftype == 0:
                filt = line
            elif ftype == 1:  # Sub
                left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
                filt = (line - left) & 0xFF
            elif ftype == 2:  # Up
                filt = (line - prev) & 0xFF
            elif ftype == 3:  # Average
                left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
                filt = (line - (left + prev) // 2) & 0xFF
            else:  # Paeth
                filt = np.zeros(stride, np.int32)
                for xi in range(stride):
                    a = int(line[xi - ch]) if xi >= ch else 0
                    b = int(prev[xi])
                    c = int(prev[xi - ch]) if xi >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    filt[xi] = (line[xi] - pred) & 0xFF
            raw += bytes([ftype]) + bytes(filt.astype(np.uint8))
            prev = line
        return raw

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    for ftype in range(5):
        png = (
            media.PNG_SIGNATURE
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(refilter(ftype)))
            + chunk(b"IEND", b"")
        )
        back = media.decode_png(png)
        assert (back == arr).all(), f"filter {ftype}"


def test_png_crc_corruption_detected():
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    png = bytearray(media.encode_png(arr))
    png[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises((ValueError, Exception)):
        media.decode_png(bytes(png))


def test_resize_nearest_contract():
    arr = np.arange(48 * 64 * 3, dtype=np.uint8).reshape(48, 64, 3)
    th = media.resize_nearest(arr, 16)
    assert th.shape == (12, 16, 3)  # aspect kept, max side = 16
    # upscale never happens
    small = np.zeros((4, 4, 3), np.uint8)
    assert media.resize_nearest(small, 16).shape == (4, 4, 3)
    # corner pixel maps to source origin (nearest semantics)
    assert (th[0, 0] == arr[0, 0]).all()


def test_wav_round_trip_int_and_float():
    ints = (np.arange(4000) % 400 - 200) * 50
    wav = media.encode_wav(ints, rate=16000)
    back, rate = media.decode_wav(wav)
    assert rate == 16000
    assert np.array_equal(np.round(back * 32768).astype(np.int64), ints)
    s = np.sin(np.arange(800) / 30.0) * 0.25
    back2, rate2 = media.decode_wav(media.encode_wav(s, rate=8000))
    assert rate2 == 8000 and np.abs(back2 - s).max() < 1e-3


def test_decode_dims_routes_real_vs_stub():
    from etl_covid19_spark.operators.multimodal import decode_dims, decode_stub

    arr = np.zeros((5, 9, 3), dtype=np.uint8)
    assert decode_dims(media.encode_png(arr)) == (9, 5)  # real header
    text = b"not an image at all"
    assert decode_dims(text) == decode_stub(text)  # deterministic fake


def test_extract_media_meta_mixed_batch(spark):
    """One Arrow batch holding a real PNG AND a text payload: the
    real one reports true dimensions, the text one the stub's."""
    from etl_covid19_spark.operators import multimodal

    png = media.encode_png(np.zeros((3, 7, 3), dtype=np.uint8))
    rows = [(1, bytearray(png)), (2, bytearray(b"plain text payload"))]
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r.doc_id: r
        for r in multimodal.extract_media_meta(d, "doc_id", "payload").collect()
    }
    assert (out[1].width, out[1].height) == (7, 3)
    assert out[2].width == 64 + ord("p") % 64


def test_resize_images_real_png_pixels(spark):
    """resize_images on a real PNG must produce a real, decodable PNG
    thumbnail whose pixels are the nearest-neighbor selection."""
    from etl_covid19_spark.operators import multimodal

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    d = spark.createDataFrame(
        [(1, bytearray(media.encode_png(arr)))], "doc_id long, payload binary"
    )
    r = multimodal.resize_images(d, "doc_id", "payload", max_side=8).collect()[0]
    assert (r.thumb_w, r.thumb_h) == (8, 4)
    back = media.decode_png(bytes(r.thumb))
    assert (back == media.resize_nearest(arr, 8)).all()


def test_audio_features_real_wav(spark):
    from etl_covid19_spark.operators import multimodal

    ints = np.where(np.arange(4000) % 8 < 4, 1000, -1000)
    d = spark.createDataFrame(
        [(1, bytearray(media.encode_wav(ints, rate=8000)))],
        "doc_id long, payload binary",
    )
    r = multimodal.audio_features(d, "doc_id", "payload").collect()[0]
    assert r.duration_s == 0.5  # 4000 samples @ 8 kHz, real rate
    assert abs(r.rms - 1000 / 32768.0) < 1e-12
    assert r.zero_crossings == 999  # sign flips every 4 samples


def test_jpeg_round_trip_color_and_gray():
    """Baseline JPEG codec (round 6): full encode→decode through
    marker parse, Huffman entropy, dequant, IDCT. Smooth content at
    q90 must land within a couple of levels; noise at q95 within
    classic JPEG bounds; flat color is exact (DC-only path)."""
    yy, xx = np.meshgrid(np.arange(40), np.arange(56), indexing="ij")
    img = np.stack(
        [(yy * 3 + xx) % 256, (yy + xx * 2) % 256, (yy * 2 + xx * 2) % 256],
        axis=-1,
    ).astype(np.uint8)
    dec = media.decode_jpeg(media.encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4

    rng = np.random.default_rng(1)
    noise = rng.integers(0, 256, (24, 33, 3), dtype=np.uint8)
    dec = media.decode_jpeg(media.encode_jpeg(noise, quality=95))
    err = np.abs(dec.astype(int) - noise.astype(int))
    assert err.max() <= 40 and err.mean() <= 8

    flat = np.full((16, 24, 3), (200, 100, 50), dtype=np.uint8)
    assert (media.decode_jpeg(media.encode_jpeg(flat, 75)) == flat).all()

    gray = np.clip(yy * 2 + xx, 0, 255).astype(np.uint8)  # smooth ramp
    dec = media.decode_jpeg(media.encode_jpeg(gray, quality=90))
    assert dec.shape == gray.shape
    assert np.abs(dec.astype(int) - gray.astype(int)).max() <= 4


def test_jpeg_restart_markers_round_trip():
    """DRI/RSTn: predictor resets and byte-realign at every restart
    interval must reproduce the no-restart decode exactly — restart
    points are what make one entropy stream splittable across
    cluster workers."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    plain = media.decode_jpeg(media.encode_jpeg(img, quality=80))
    for interval in (1, 3, 7):
        with_rst = media.decode_jpeg(
            media.encode_jpeg(img, quality=80, restart=interval)
        )
        assert (with_rst == plain).all(), f"restart={interval}"


def test_jpeg_dimensions_and_tier_routing():
    img = np.zeros((24, 17, 3), dtype=np.uint8)
    payload = media.encode_jpeg(img, 85)
    assert media.jpeg_dimensions(payload) == (24, 17)
    assert media.is_jpeg(payload) and not media.is_png(payload)
    # decode_image routes JPEG through the baseline tier (PIL absent
    # in this container) and grayscale expands to 3 channels
    assert media.decode_image(payload).shape == (24, 17, 3)
    g = media.encode_jpeg(np.full((8, 8), 9, dtype=np.uint8), 85)
    assert media.decode_image(g).shape == (8, 8, 3)


def test_jpeg_rejects_non_baseline():
    with pytest.raises(ValueError):
        media.decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # progressive SOF2 marker stream
    fake = b"\xff\xd8" + b"\xff\xc2" + b"\x00\x08" + b"\x08\x00\x10\x00\x10\x01"
    with pytest.raises(ValueError):
        media.decode_jpeg(fake)


def _formula_video(n=5, h=12, w=15):
    f = np.arange(n)[:, None, None, None]
    y = np.arange(h)[None, :, None, None]
    x = np.arange(w)[None, None, :, None]
    c = np.arange(3)[None, None, None, :]
    return ((f * 13 + y * 5 + x * 3 + c * 17) % 256).astype(np.uint8)


def test_avi_round_trip_and_metadata():
    # w=15 exercises the 4-byte DIB row padding (stride 48 != 45)
    frames = _formula_video()
    payload = media.encode_avi(frames, fps=10)
    assert media.is_avi(payload) and not media.is_wav(payload)
    meta = media.avi_metadata(payload)
    assert (meta["width"], meta["height"], meta["n_frames"], meta["fps"]) == (
        15,
        12,
        5,
        10,
    )
    assert (media.decode_avi_frames(payload) == frames).all()


def test_avi_indexed_sampling_reads_only_wanted_frames():
    frames = _formula_video(n=9)
    payload = media.encode_avi(frames, fps=30)
    table = media.avi_index(payload)
    assert len(table) == 9
    sampled = media.decode_avi_frames(payload, [0, 3, 6])
    assert (sampled == frames[[0, 3, 6]]).all()
    # the seek table is exact: corrupting an UNSAMPLED frame's bytes
    # must not change a sampled decode (proof nothing else is read)
    corrupt = bytearray(payload)
    off, ln = table[1]
    corrupt[off : off + ln] = b"\xff" * ln
    assert (
        media.decode_avi_frames(bytes(corrupt), [0, 3, 6]) == frames[[0, 3, 6]]
    ).all()


def test_avi_no_idx1_fallback_scans_movi():
    frames = _formula_video(n=4)
    payload = media.encode_avi(frames, fps=5)
    cut = payload.rindex(b"idx1")
    truncated = payload[:cut]
    assert (media.decode_avi_frames(truncated, [2]) == frames[[2]]).all()


def test_avi_rejects_compressed():
    frames = _formula_video(n=2)
    payload = bytearray(media.encode_avi(frames, fps=5))
    # flip biCompression (strf offset: find the BITMAPINFOHEADER)
    at = payload.index(b"strf") + 8 + 16
    payload[at : at + 4] = (1).to_bytes(4, "little")  # BI_RLE8
    with pytest.raises(ValueError):
        media.decode_avi_frames(bytes(payload))


def test_video_frame_stats_real_decode(spark):
    from etl_covid19_spark.operators.multimodal import video_frame_stats

    frames = _formula_video(n=7, h=8, w=8)
    d = spark.createDataFrame(
        [(1, bytearray(media.encode_avi(frames, fps=10)))],
        "doc_id long, payload binary",
    )
    rows = video_frame_stats(d, "doc_id", "payload", every_n=2).orderBy(
        "frame_idx"
    ).collect()
    assert [r.frame_idx for r in rows] == [0, 2, 4, 6]
    for r in rows:
        arr = frames[r.frame_idx].astype(np.int64)
        assert r.n_frames == 7 and r.fps == 10
        assert r.mean_r == arr[:, :, 0].sum() / 64.0
        assert r.mean_b == arr[:, :, 2].sum() / 64.0


def test_avi_malformed_inputs_raise_cleanly():
    """Truncated/corrupt containers must raise ValueError/IndexError
    promptly — never hang or return garbage frames."""
    frames = _formula_video(n=3)
    payload = media.encode_avi(frames, fps=5)
    with pytest.raises(ValueError):
        media.avi_metadata(b"RIFF\x00\x00\x00\x00AVI ")  # headerless
    with pytest.raises(ValueError):
        media.avi_metadata(payload[:8])  # not even a RIFF body
    # truncation inside the movi payload: the indexed frame slice is
    # short -> numpy reshape fails loudly
    table = media.avi_index(payload)
    off, ln = table[2]
    with pytest.raises(ValueError):
        media.decode_avi_frames(payload[: off + ln // 2], [2])
    # index out of range is an explicit error, not a wrap-around
    with pytest.raises(IndexError):
        media.decode_avi_frames(payload, [3])


def test_jpeg_malformed_inputs_raise_valueerror():
    """Round-7 ADVICE (medium): every corrupt payload with a valid
    FFD8 prefix must raise ValueError — never IndexError/KeyError/
    struct.error/_MarkerHit-as-bare-Exception — so the mixed-batch
    fallback (`except ValueError` in multimodal.resize_real) keeps
    the Spark task alive. At 100 TB corrupt payloads are a
    certainty."""
    img = np.arange(16 * 24 * 3, dtype=np.uint8).reshape(16, 24, 3)
    payload = media.encode_jpeg(img, quality=80)

    # truncated mid-entropy: _BitReader._fill runs off the end
    with pytest.raises(ValueError):
        media.decode_jpeg(payload[:-20])
    # truncated inside the header segments
    with pytest.raises(ValueError):
        media.decode_jpeg(payload[:16])
    # SOI followed by garbage (no marker structure at all)
    with pytest.raises(ValueError):
        media.decode_jpeg(b"\xff\xd8" + b"\x00" * 64)
    # a stray marker planted inside the entropy segment (_MarkerHit
    # is now a ValueError, not a bare Exception)
    sos = payload.find(b"\xff\xda")
    assert sos > 0
    corrupted = bytearray(payload)
    corrupted[sos + 20 : sos + 22] = b"\xff\xc7"
    with pytest.raises(ValueError):
        media.decode_jpeg(bytes(corrupted))
    # DHT segments stripped: the scan references undefined Huffman
    # tables (KeyError internally → ValueError contract)
    stripped = bytearray()
    i = 0
    import struct as _s

    stripped += payload[:2]
    i = 2
    while i + 3 < len(payload):
        marker = payload[i + 1]
        if marker == 0xDA:
            stripped += payload[i:]
            break
        ln = _s.unpack(">H", payload[i + 2 : i + 4])[0]
        if marker != 0xC4:
            stripped += payload[i : i + 2 + ln]
        i += 2 + ln
    with pytest.raises(ValueError):
        media.decode_jpeg(bytes(stripped))
    # the cheap metadata path honors the same contract
    with pytest.raises(ValueError):
        media.jpeg_dimensions(payload[: payload.find(b"\xff\xc0") + 6])


def test_png_wav_malformed_inputs_raise_valueerror():
    """Same contract for the other stdlib tiers: zlib/wave/struct
    internals never escape as their own exception classes."""
    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    png = media.encode_png(img)
    with pytest.raises(ValueError):
        media.decode_png(png[:40])  # truncated IHDR/IDAT
    corrupt = bytearray(png)
    corrupt[-20:] = b"\x00" * 20  # smash IDAT zlib stream + CRC
    with pytest.raises(ValueError):
        media.decode_png(bytes(corrupt))

    wav = media.encode_wav(np.sin(np.linspace(0, 20, 800)), rate=8000)
    with pytest.raises(ValueError):
        media.decode_wav(wav[:12])  # RIFF header only


def test_resize_real_survives_poisoned_batch(spark):
    """One corrupt JPEG in a batch degrades to the stub fallback; the
    decodable rows still resize for real (the round-7 ADVICE failure
    was the whole task dying)."""
    from etl_covid19_spark.operators import multimodal

    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    good_png = media.encode_png(img)
    bad_jpeg = media.encode_jpeg(img, 80)[:-24]  # valid FFD8, truncated
    d = spark.createDataFrame(
        [(1, bytearray(good_png)), (2, bytearray(bad_jpeg))],
        "doc_id long, payload binary",
    )
    rows = {
        r.doc_id: r
        for r in multimodal.resize_images(
            d, "doc_id", "payload", max_side=8
        ).collect()
    }
    assert len(rows) == 2
    assert media.is_png(bytes(rows[1].thumb))  # real path
    assert max(rows[1].thumb_w, rows[1].thumb_h) == 8
    assert rows[2].thumb_w >= 1 and rows[2].thumb_h >= 1  # stub path


def test_avi_index_absolute_offset_variant():
    """idx1 offsets come in two wild conventions: movi-relative (the
    spec, what encode_avi writes) and absolute file offsets (common
    encoder variant). avi_index must sniff and decode both to the
    same frames."""
    frames = _formula_video(n=4)
    payload = media.encode_avi(frames, fps=10)
    rel_table = media.avi_index(payload)

    # rewrite idx1 in the absolute-offset convention
    idx_at = payload.rfind(b"idx1")
    assert idx_at > 0
    (idx_len,) = __import__("struct").unpack(
        "<I", payload[idx_at + 4 : idx_at + 8]
    )
    body = bytearray(payload[idx_at + 8 : idx_at + 8 + idx_len])
    movi_at = None
    for cid, data, off in media._avi_walk(payload):
        if cid == b"movi":
            movi_at = off
    assert movi_at is not None
    import struct as _s

    for e in range(0, len(body) - 15, 16):
        off, ln = _s.unpack("<II", bytes(body[e + 8 : e + 16]))
        body[e + 8 : e + 12] = _s.pack("<I", off + movi_at)
    abs_payload = (
        payload[: idx_at + 8] + bytes(body) + payload[idx_at + 8 + idx_len :]
    )
    abs_table = media.avi_index(abs_payload)
    assert abs_table == rel_table
    got = media.decode_avi_frames(abs_payload, [0, 3])
    assert (got[0] == frames[0]).all() and (got[1] == frames[3]).all()
