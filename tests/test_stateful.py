"""Sessionization via the custom stateful path: batch applyInPandas
vs streaming applyInPandasWithState over the same events."""

import datetime as dt

import pytest
from pyspark.sql import Row

from etl_covid19_spark.streaming.stateful import (
    sessionize_batch,
    sessionize_stream,
)


def ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 9, minute, second)


EVENTS = [
    # user 1: two sessions (gap 600 s at 09:20)
    Row(user_id=1, ts=ts(0), value=1.0),
    Row(user_id=1, ts=ts(5), value=2.0),
    Row(user_id=1, ts=ts(20), value=4.0),
    Row(user_id=1, ts=ts(21), value=8.0),
    # user 2: one session
    Row(user_id=2, ts=ts(3), value=1.5),
    Row(user_id=2, ts=ts(4), value=2.5),
]


@pytest.fixture(scope="module")
def events_df(spark):
    return spark.createDataFrame(EVENTS)


def us(t: dt.datetime) -> int:
    return int(t.timestamp() * 1_000_000)


def test_sessionize_batch_splits_on_gap(events_df):
    out = sessionize_batch(events_df, gap_s=600)
    got = {
        (r.user_id, r.session_start_us): (r.n_events, r.sum_value)
        for r in out.collect()
    }
    assert got == {
        (1, us(ts(0))): (2, 3.0),
        (1, us(ts(20))): (2, 12.0),
        (2, us(ts(3))): (2, 4.0),
    }


def test_sessionize_batch_boundary_exact_gap(spark):
    # event exactly gap seconds after the previous one opens a new session
    df = spark.createDataFrame(
        [Row(user_id=9, ts=ts(0), value=1.0), Row(user_id=9, ts=ts(10), value=2.0)]
    )
    out = sessionize_batch(df, gap_s=600).collect()
    assert len(out) == 2


def test_sessionize_stream_emits_closed_sessions(spark, tmp_path):
    """Drive applyInPandasWithState with a 2-batch file stream: every
    session closed by a later event must be emitted; each user's
    trailing session stays in state (documented semantics)."""
    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [e for e in EVENTS if e.ts <= ts(5)]
    batch2 = [e for e in EVENTS if e.ts > ts(5)]
    # one file per intended micro-batch (maxFilesPerTrigger=1 below)
    spark.createDataFrame(batch1).coalesce(1).write.parquet(f"{src}/b1")
    spark.createDataFrame(batch2).coalesce(1).write.parquet(f"{src}/b2")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
        .withWatermark("ts", "1 second")
    )
    q = (
        sessionize_stream(stream, gap_s=600)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, r.session_start_us): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out_dir).collect()
    }
    # user 1's first session closes when the 09:20 event arrives;
    # user 2's session closes via event-time TIMEOUT once the final
    # watermark (09:20:59) passes its end+gap (09:14). User 1's
    # trailing session (end+gap = 09:31) stays open in state.
    assert got == {
        (1, us(ts(0))): (2, 3.0),
        (2, us(ts(3))): (2, 4.0),
    }


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Streaming exact dedup with bounded state:
    dropDuplicatesWithinWatermark keeps one row per event_id while
    the watermark allows state cleanup — the streaming twin of the
    exact-dedup operator."""
    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    rows1 = [(1, ts(0), 1.0), (2, ts(1), 2.0), (1, ts(2), 1.0)]  # dup id 1
    rows2 = [(2, ts(3), 2.0), (3, ts(4), 3.0)]                   # dup id 2
    schema = "event_id long, ts timestamp, value double"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(f"{src}/b1")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(f"{src}/b2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.event_id for r in spark.read.parquet(out_dir).collect())
    assert got == [1, 2, 3]  # one row per id across batches


def test_stream_stream_join_matches_batch_interval_join(spark):
    """The watermarked stream-stream join drained with AvailableNow
    must produce exactly the batch interval join's pairs (inner joins
    emit on match; the watermark bounds state, not output)."""
    from pyspark.sql import functions as F

    from etl_covid19_spark.operators import joins as J
    from etl_covid19_spark.queries import REGISTRY
    from etl_covid19_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    streamed = {
        (r.user_id, r.click_us, r.purchase_us, r.purchase_value)
        for r in REGISTRY["stream_stream_join"].fn(spark, sf).collect()
    }
    ev = load_table(spark, "events", sf)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), "value"
    )
    batch = {
        (r.user_id, r.click_us, r.purchase_us, r.purchase_value)
        for r in J.range_join(
            clicks, purchases, on=["user_id"],
            left_ts="click_ts", right_ts="purchase_ts",
            lower_s=0, upper_s=300,
        )
        .select(
            "user_id",
            F.unix_micros("click_ts").alias("click_us"),
            F.unix_micros("purchase_ts").alias("purchase_us"),
            F.col("value").alias("purchase_value"),
        )
        .collect()
    }
    assert streamed == batch


def _drive_running_stats(spark, tmp_path, build):
    """Drive a running-user-stats builder over a 2-batch file stream
    and return {(user, total_events): (batch_events, total_value)}."""
    import uuid

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [Row(user_id=1, value=1.0), Row(user_id=1, value=2.0),
         Row(user_id=2, value=5.0)]
    ).coalesce(1).write.parquet(f"{src}/b1")
    spark.createDataFrame(
        [Row(user_id=1, value=4.0)]
    ).coalesce(1).write.parquet(f"{src}/b2")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        name = f"tws_{uuid.uuid4().hex[:8]}"
        q = (
            build(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r.user_id, r.total_events): (r.batch_events, r.total_value)
            for r in spark.table(name).collect()
        }
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


# user 1: batch1 emits totals (2 events, 3.0); batch2 accumulates
# on state -> (3 events, 7.0). user 2: single batch1 emission.
_RUNNING_STATS_EXPECTED = {
    (1, 2): (2, 3.0),
    (1, 3): (1, 7.0),
    (2, 1): (1, 5.0),
}


def test_running_stats_auto_accumulates_across_batches(spark, tmp_path):
    """Drive the detect-and-degrade running-totals operator live: the
    transformWithStateInPandas path when its protobuf state protocol
    is importable, else the applyInPandasWithState twin — SAME rows
    either way, no environment skip. (The tws protocol speaks
    protobuf between the JVM and its Python state server; without
    google.protobuf the worker cannot start, verified via
    StateMessage_pb2 import.)"""
    from etl_covid19_spark.streaming.stateful import running_user_stats_auto

    rows = _drive_running_stats(spark, tmp_path, running_user_stats_auto)
    assert rows == _RUNNING_STATS_EXPECTED


def test_running_stats_apply_twin_parity(spark, tmp_path):
    """The degrade target holds the exact per-batch emission contract
    the transformWithState processor defines — pinned so the two
    implementations can't drift apart silently."""
    from etl_covid19_spark.streaming.stateful import running_user_stats_apply

    rows = _drive_running_stats(spark, tmp_path, running_user_stats_apply)
    assert rows == _RUNNING_STATS_EXPECTED


def test_transform_with_state_live_when_protocol_present(spark, tmp_path):
    """Live transformWithStateInPandas drive — exercised whenever the
    protobuf runtime exists; otherwise asserts the dispatcher's
    detection says so (a real assertion, not a skip: the auto test
    above already proved the degraded live path)."""
    from etl_covid19_spark.streaming import stateful

    if not stateful.has_transform_with_state_support():
        with pytest.raises(ImportError):
            import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401
        return
    rows = _drive_running_stats(
        spark, tmp_path, stateful.running_user_stats
    )
    assert rows == _RUNNING_STATS_EXPECTED


def test_zscore_stream_matches_batch_operator(spark, tmp_path):
    """Batch/stream parity for anomaly detection: the same bucketed
    series — split across TWO micro-batches so state must carry —
    scores identically to timeseries.rolling_zscore (modulo the
    decimal-vs-fsum accumulation, < 1e-9)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from etl_covid19_spark.operators.timeseries import rolling_zscore
    from etl_covid19_spark.streaming.stateful import zscore_stream

    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            "k",
            base + dt.timedelta(hours=i),
            10.0 + (i % 5) * 0.7 + (300.0 if i == 40 else 0.0),
        )
        for i in range(48)
    ]
    series = spark.createDataFrame(
        rows, "event_type string, bucket_ts timestamp, v double"
    )
    batch = {
        r.bucket_ts: r
        for r in rolling_zscore(series, "event_type").collect()
    }

    # two files -> maxFilesPerTrigger=1 forces two micro-batches
    src = tmp_path / "buckets"
    series.where(F.col("bucket_ts") < base + dt.timedelta(hours=24)).coalesce(
        1
    ).write.parquet(str(src / "p1"))
    series.where(
        F.col("bucket_ts") >= base + dt.timedelta(hours=24)
    ).coalesce(1).write.parquet(str(src / "p2"))

    stream = (
        spark.readStream.schema(
            "event_type string, bucket_ts timestamp, v double"
        )
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        zscore_stream(stream)
        .writeStream.format("memory")
        .queryName("zs_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=r.bucket_us): r
        for r in spark.table("zs_out").collect()
    }
    assert len(got) == 48
    n_flagged = 0
    for ts_key, b in batch.items():
        s = got[ts_key]
        if b.zscore is None:
            assert s.zscore is None, ts_key
        else:
            assert abs(s.zscore - b.zscore) < 1e-9, ts_key
            assert s.is_anomaly == b.is_anomaly, ts_key
            n_flagged += 1 if b.is_anomaly else 0
    assert n_flagged >= 1  # the hour-40 spike is flagged in BOTH paths


def test_sessionize_heavy_key_group_capped_before_python(spark):
    """A bot key's whole timeline would otherwise ship into ONE pandas
    frame; the JVM-side cap must bound the group at the 100k earliest
    events, keep light keys exact, and surface `truncated`."""
    heavy = spark.range(150_000).selectExpr(
        "CAST(1 AS LONG) AS user_id",
        # 1s cadence with a 20-min gap after the first 50k events ->
        # two sessions inside the kept window
        "timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,"
        "CASE WHEN id < 50000 THEN id ELSE id + 1200 END) AS ts",
        "CAST(1.0 AS DOUBLE) AS value",
    )
    light = spark.range(2).selectExpr(
        "CAST(2 AS LONG) AS user_id",
        "timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,id) AS ts",
        "CAST(2.0 AS DOUBLE) AS value",
    )
    out = sessionize_batch(
        heavy.unionAll(light), gap_s=600
    ).collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    # bot: capped at 100k events total across its sessions, flagged
    assert sum(r.n_events for r in by_user[1]) == 100_000
    assert len(by_user[1]) == 2  # the gap at 50k survives the cap
    assert all(r.truncated for r in by_user[1])
    # light key: exact and unflagged
    assert len(by_user[2]) == 1
    assert by_user[2][0].n_events == 2
    assert not by_user[2][0].truncated
