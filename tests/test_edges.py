"""Tests for the JDBC edge option plumbing and streaming alerts."""

import time

import pytest
from pyspark.sql import functions as F

from etl_covid19_spark.sources.jdbc import jdbc_read_options
from etl_covid19_spark.streaming.observability import (
    attach_alerts,
    detach_alerts,
)

URL = "jdbc:postgresql://wh:5432/warehouse"


def test_jdbc_query_pushdown_options():
    opts = jdbc_read_options(
        url=URL,
        query="SELECT json_data FROM covid19_stage WHERE date_of_data = '2023-03-02'",
    )
    assert opts["url"] == URL and "query" in opts and "dbtable" not in opts


def test_jdbc_partitioned_scan_options():
    opts = jdbc_read_options(
        url=URL, dbtable="covid19_warehouse",
        partition_column="date_key", lower_bound=20230101,
        upper_bound=20231231, num_partitions=16,
    )
    assert opts["numPartitions"] == "16"
    assert opts["partitionColumn"] == "date_key"


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(url=URL),  # neither query nor dbtable
        dict(url=URL, query="SELECT 1", dbtable="t"),  # both
        dict(url=URL, query="SELECT 1", partition_column="k"),
        dict(url=URL, dbtable="t", partition_column="k"),  # no bounds
    ],
)
def test_jdbc_option_validation(kwargs):
    with pytest.raises(ValueError):
        jdbc_read_options(**kwargs)


def test_streaming_listener_sees_lifecycle(spark, tmp_path):
    events = []
    listener = attach_alerts(spark, lambda kind, e: events.append(kind))
    try:
        df = spark.readStream.format("rate").option("rowsPerSecond", 10).load()
        q = (
            df.select(F.col("value"))
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="1 second")
            .start()
        )
        time.sleep(4)
        q.stop()
        q.awaitTermination(60)
        deadline = time.time() + 30
        while "terminated" not in events and time.time() < deadline:
            time.sleep(0.5)
    finally:
        detach_alerts(spark, listener)
    assert "started" in events
    assert "terminated" in events


def test_alert_sink_datasource_delivers_and_commits(spark, tmp_path):
    """The Python DataSource WRITER path (S9 at scale): rows are
    delivered executor-side in per-task batches; the driver's commit
    record carries the total, completing the two-phase protocol."""
    import glob
    import json

    from etl_covid19_spark.sources.alert_datasource import AlertSinkDataSource

    spool = str(tmp_path / "spool")
    spark.dataSource.register(AlertSinkDataSource)
    alerts = spark.createDataFrame(
        [(i, f"check_{i % 3}", "FAILED") for i in range(20)],
        "alert_id long, check string, status string",
    ).repartition(4)
    alerts.write.format("alert_sink").option("spool_dir", spool).mode(
        "append"
    ).save()

    rows, commits = [], []
    for path in glob.glob(f"{spool}/alerts-*.jsonl"):
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                (commits if rec.get("_commit") else rows).append(rec)
    assert len(rows) == 20
    assert {r["alert_id"] for r in rows} == set(range(20))
    assert commits and commits[-1]["n_rows"] == 20
