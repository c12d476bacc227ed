"""Pipeline runner — the engine-native replacement for the Airflow
DAG layer (SURVEY.md §2.8 O1-O6, §3.1).

One `run_day` call is the whole reference DAG for one logical date:

  extract (O1 fan-out) → land raw zone → clean → quality gate (O6
  barrier: raises BEFORE anything downstream is written) → clean
  zone → star schema refresh.

Retry safety (O5) comes from storage semantics, not orchestration:
every write is a dynamic partition overwrite keyed by `ds`, so
re-running a day replaces that day instead of duplicating it
(reference quirk Q1 fixed). `backfill` is the `catchup=True,
max_active_runs=1` serial loop (O2); `run_stream_ingest` is the same
incremental contract expressed as Structured Streaming +
`foreachBatch` + `Trigger.AvailableNow`.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_covid19_spark.plans import covid
from etl_covid19_spark.plans.quality import FailureHook
from etl_covid19_spark.sources import rest
from etl_covid19_spark.sources.parquet_zone import read_zone, write_zone


def run_day(
    spark: SparkSession,
    ds: str,
    base_dir: str,
    isos: Iterable[str] = rest.ISO_COUNTRIES,
    fetch: rest.Fetcher = rest.fake_fetch,
    on_failure: FailureHook | None = None,
) -> dict[str, int]:
    """Execute the reference pipeline for one run date. Returns row
    counts per stage (the observability the reference gets from task
    logs)."""
    from pyspark.sql import Observation

    try:
        # stage counts ride the write jobs via observe() — no stage
        # is ever scanned twice just for observability
        raw_obs = Observation()
        raw = (
            rest.extract(spark, ds, isos, fetch)
            .withColumn("ds", F.lit(ds))
            .observe(raw_obs, F.count(F.lit(1)).alias("n"))
        )
        write_zone(raw, f"{base_dir}/raw")

        landed = read_zone(spark, f"{base_dir}/raw", ds=ds)
        # O6: the gate runs BEFORE the clean zone commits — a bad day
        # never becomes visible downstream. The gated frame is
        # persisted across (count, write) so the barrier costs one
        # compute pass, not two; a day's slice is bounded, so the
        # cache footprint is too. (observed_write is the zero-cache
        # alternative when gate-after-write + rollback is acceptable.)
        clean = covid.clean(landed).withColumn("ds", F.lit(ds)).persist()
        try:
            n_clean = covid.quality_gate(clean, ds)
            write_zone(clean, f"{base_dir}/clean")
        finally:
            clean.unpersist(blocking=False)

        star = covid.build_star(read_zone(spark, f"{base_dir}/clean", ds=ds))
        # dims are rebuilt per day from that day's slice and written
        # un-partitioned-overwrite; facts land in the day's partition
        write_zone(
            star["region_dimension"],
            f"{base_dir}/mart/region_dimension",
            partition_by=(),
        )
        fact_obs = Observation()
        fact = (
            star["fact_covid19"]
            .withColumn("ds", F.lit(ds))
            .observe(fact_obs, F.count(F.lit(1)).alias("n"))
        )
        write_zone(fact, f"{base_dir}/mart/fact_covid19")
        return {
            "raw": int(raw_obs.get["n"]),
            "clean": n_clean,
            "fact": int(fact_obs.get["n"]),
        }
    except Exception as exc:  # noqa: BLE001 — hook = Telegram analog (S9)
        if on_failure is not None:
            on_failure(exc)
        raise


def backfill(
    spark: SparkSession,
    start_ds: str,
    end_ds: str,
    base_dir: str,
    **kwargs,
) -> dict[str, dict[str, int]]:
    """O2 — serial catchup over [start_ds, end_ds], matching the
    reference's `catchup=True, max_active_runs=1`
    (``dags/ETL_covid19_pandas.py:116-121``). Idempotent: re-running
    a span rewrites the same partitions."""
    start = dt.date.fromisoformat(start_ds)
    end = dt.date.fromisoformat(end_ds)
    out: dict[str, dict[str, int]] = {}
    for d in range((end - start).days + 1):
        ds = (start + dt.timedelta(days=d)).isoformat()
        out[ds] = run_day(spark, ds, base_dir, **kwargs)
    return out


def run_stream_ingest(
    spark: SparkSession,
    base_dir: str,
    checkpoint_dir: str,
) -> None:
    """The same raw→clean increment as Structured Streaming: watch
    the raw zone, clean each micro-batch, commit per-ds partitions
    via foreachBatch dynamic overwrite. `Trigger.AvailableNow`
    drains the backlog then stops — the streaming form of catchup.

    foreachBatch (not a direct parquet sink) because the commit is a
    *partition overwrite* keyed by the batch's ds values — exactly
    the idempotent semantics of the batch path, so a crashed/retried
    micro-batch rewrites rather than duplicates."""
    raw_schema = (
        "ds string, iso_country string, json_data string"
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(f"{base_dir}/raw")
    )

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        clean = covid.clean(batch_df).withColumn(
            "ds", F.date_format("day_of_data", "yyyy-MM-dd")
        )
        write_zone(clean, f"{base_dir}/clean")

    q = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
