"""End-to-end runner tests: daily run, idempotent retry, serial
backfill, and the streaming-ingest twin."""

import pytest
from pyspark.sql import functions as F

from etl_covid19_spark.plans.quality import QualityCheckError
from etl_covid19_spark.plans.runner import backfill, run_day, run_stream_ingest
from etl_covid19_spark.sources.rest import fake_fetch


def test_run_day_end_to_end(spark, tmp_path):
    base = str(tmp_path / "wh")
    counts = run_day(spark, "2023-03-02", base)
    assert counts == {"raw": 5, "clean": 240, "fact": 240}
    fact = spark.read.parquet(f"{base}/mart/fact_covid19")
    dim = spark.read.parquet(f"{base}/mart/region_dimension")
    assert fact.count() == 240 and dim.count() == 240
    # every fact row resolves a region key (referential integrity)
    assert fact.join(dim, "region_key", "left_anti").count() == 0


def test_run_day_retry_is_idempotent(spark, tmp_path):
    base = str(tmp_path / "wh")
    run_day(spark, "2023-03-02", base)
    run_day(spark, "2023-03-02", base)  # the O5 retry
    clean = spark.read.parquet(f"{base}/clean")
    assert clean.filter(F.col("ds") == "2023-03-02").count() == 240


def test_backfill_isolates_partitions(spark, tmp_path):
    base = str(tmp_path / "wh")
    out = backfill(spark, "2023-01-01", "2023-01-03", base)
    assert list(out) == ["2023-01-01", "2023-01-02", "2023-01-03"]
    clean = spark.read.parquet(f"{base}/clean")
    # partition-column type inference reads ds back as a date
    per_day = {
        str(r.ds): r.n
        for r in clean.groupBy("ds").agg(F.count("*").alias("n")).collect()
    }
    assert per_day == {f"2023-01-0{d}": 240 for d in (1, 2, 3)}


def test_quality_gate_blocks_downstream(spark, tmp_path):
    base = str(tmp_path / "wh")
    failures = []

    def bad_fetch(ds, iso):  # half the regions → count gate fails
        return fake_fetch(ds, iso, n_regions=24)

    with pytest.raises(QualityCheckError):
        run_day(
            spark, "2023-03-02", base,
            fetch=bad_fetch, on_failure=failures.append,
        )
    assert len(failures) == 1  # S9 hook fired
    import os
    assert not os.path.exists(f"{base}/clean")  # O6 barrier held


def test_stream_ingest_matches_batch(spark, tmp_path):
    base = str(tmp_path / "wh")
    backfill(spark, "2023-01-01", "2023-01-02", base)
    batch_clean = spark.read.parquet(f"{base}/clean")
    expected = batch_clean.count()
    # wipe the clean zone, rebuild it through the streaming path
    import shutil
    shutil.rmtree(f"{base}/clean")
    run_stream_ingest(spark, base, str(tmp_path / "ckpt"))
    streamed = spark.read.parquet(f"{base}/clean")
    assert streamed.count() == expected
    assert set(streamed.columns) == set(batch_clean.columns)


def test_stream_ingest_restart_resumes_without_duplicates(spark, tmp_path):
    """Checkpointed restart semantics: a second run_stream_ingest over
    the same checkpoint (a) does not re-process or duplicate the
    already-committed days, and (b) picks up files landed since —
    the exactly-once contract frequent incremental commits rely on."""
    base = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    backfill(spark, "2023-01-01", "2023-01-02", base)

    import shutil

    shutil.rmtree(f"{base}/clean")
    run_stream_ingest(spark, base, ckpt)
    first = spark.read.parquet(f"{base}/clean")
    n_first = first.count()
    assert n_first > 0

    # restart with NO new input: nothing may change
    run_stream_ingest(spark, base, ckpt)
    assert spark.read.parquet(f"{base}/clean").count() == n_first

    # land one more day, restart: only the new day is added
    run_day(spark, "2023-01-03", base)
    # run_day wrote day 3's clean partition already; wipe it so the
    # streaming path must rebuild it from the raw zone
    shutil.rmtree(f"{base}/clean/ds=2023-01-03")
    run_stream_ingest(spark, base, ckpt)
    after = spark.read.parquet(f"{base}/clean")
    assert after.count() == n_first + after.filter("ds = '2023-01-03'").count()
    assert after.filter("ds = '2023-01-03'").count() > 0
    # earlier days untouched (no duplicates from reprocessing)
    assert after.filter("ds != '2023-01-03'").count() == n_first
