"""Structured Streaming windows (batch/stream parity) and the
multimodal binary-column plumbing."""

import pytest
from pyspark.sql import functions as F

from etl_covid19_spark.operators import multimodal
from etl_covid19_spark.sources.catalog import load_table
from etl_covid19_spark.streaming import windows

SF = "/root/testdata/sf0.001"


def test_tumbling_batch_counts(spark):
    ev = load_table(spark, "events", SF)
    out = windows.tumbling(
        ev, "ts", "1 hour", ["event_type"], {"n": F.count(F.lit(1))}
    )
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == ev.count()  # tumbling windows partition events


def test_session_windows_merge_gap(spark):
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),   # same session (10 min gap)
        (1, "2024-01-01 01:00:00"),   # new session (50 min gap)
        (2, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    out = windows.session(df, "ts", "30 minutes", ["user_id"],
                          {"n": F.count(F.lit(1))})
    got = sorted((r.user_id, r.n) for r in out.collect())
    assert got == [(1, 1), (1, 2), (2, 1)]


def test_streaming_tumbling_equals_batch(spark, tmp_path):
    """The same window expression must produce identical results via
    readStream + availableNow as in batch — the engine's streaming
    contract (SURVEY.md §2.9)."""
    ev = load_table(spark, "events", SF).select("ts", "event_type", "value")
    src = str(tmp_path / "events_src")
    ev.write.parquet(src)

    stream = windows.stream_events(
        spark, src, ev.schema, ts_col="ts", watermark="1 hour"
    )
    agg = windows.tumbling(
        stream, "ts", "1 hour", ["event_type"], {"n": F.count(F.lit(1))}
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT sum(n) FROM tumbling_test"
    ).collect()[0][0]
    # append mode emits exactly the watermark-closed windows:
    # window_end <= max(event time) - watermark delay
    batch = windows.tumbling(
        ev, "ts", "1 hour", ["event_type"], {"n": F.count(F.lit(1))}
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    expected = (
        batch.filter(
            F.col("window_end")
            <= F.lit(max_ts) - F.expr("INTERVAL 1 HOUR")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert got == expected


def test_media_meta_stub_plumbing(spark):
    docs = load_table(spark, "documents", SF).limit(50).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    meta = multimodal.extract_media_meta(docs, "doc_id", "payload")
    rows = meta.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.n_bytes > 0
        assert len(r.magic) == 4
        assert 64 <= r.width < 128 and 64 <= r.height < 128


def test_decode_stub_raises_on_empty():
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"")


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, b"xx")], "doc_id long, payload binary")
    out = multimodal.frame_sample_plan(df, "doc_id", "payload", every_n=30)
    assert out.count() == 10  # frames 0,30,...,270


def test_resize_stub_plumbing(spark):
    from pyspark.sql import functions as F

    from etl_covid19_spark.operators.multimodal import resize_images

    d = spark.createDataFrame(
        [(1, "some image bytes here"), (2, "tiny")], "doc_id long, body string"
    ).select("doc_id", F.encode("body", "UTF-8").alias("payload"))
    out = {r.doc_id: r for r in resize_images(d, "doc_id", "payload", 32).collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        assert 1 <= r.thumb_w <= 32 and 1 <= r.thumb_h <= 32
        assert isinstance(r.thumb, (bytes, bytearray)) and len(r.thumb) >= 1


def test_audio_features_plumbing(spark):
    from pyspark.sql import functions as F

    from etl_covid19_spark.operators.multimodal import audio_features

    d = spark.createDataFrame(
        [(7, "abcdefgh" * 100)], "doc_id long, body string"
    ).select("doc_id", F.encode("body", "UTF-8").alias("payload"))
    r = audio_features(d, "doc_id", "payload").collect()[0]
    assert r.doc_id == 7 and r.duration_s == 800 / 8000.0 and r.rms > 0
