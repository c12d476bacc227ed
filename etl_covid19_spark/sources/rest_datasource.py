"""REST API as a Spark 4 Python DataSource — the scale path for
SURVEY.md §2.1 S1.

The reference fans out one Airflow task per ISO country
(``dags/ETL_covid19_pandas.py:125-130``) and fetches on the
scheduler's workers. Here the same fan-out is native Spark
parallelism: every (run date, iso) pair becomes an `InputPartition`,
so fetches run ON EXECUTORS — a 10-year × 200-country backfill is
~730k partitions of I/O-bound work spread across the cluster, not a
driver-side loop (`sources.rest.extract` remains the tiny-edge
variant).

Usage::

    spark.dataSource.register(RestReportsDataSource)
    df = (spark.read.format("rest_reports")
          .option("ds_start", "2023-01-01").option("ds_end", "2023-01-05")
          .option("isos", "CHN,RUS,USA,IND,BRA").load())

Network access isn't assumed here: the default fetcher is the
deterministic fake from `sources.rest`; a real deployment overrides
`fetch_fn` with a requests-backed callable of the same signature
(the partition/read plumbing is identical).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from etl_covid19_spark.sources.rest import ISO_COUNTRIES, fake_fetch


class ReportPartition(InputPartition):
    def __init__(self, ds: str, iso: str):
        self.ds = ds
        self.iso = iso


class RestReportsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.ds_start = options.get("ds_start", options.get("ds"))
        self.ds_end = options.get("ds_end", self.ds_start)
        if self.ds_start is None:
            raise ValueError("rest_reports requires option 'ds' or 'ds_start'")
        isos = options.get("isos")
        self.isos = isos.split(",") if isos else list(ISO_COUNTRIES)
        # swap in a requests-backed fetcher in production; must be
        # picklable (top-level callable) — it ships to executors
        self.fetch_fn = fake_fetch

    def partitions(self) -> list[InputPartition]:
        """One partition per (date, iso): the unit of retry and of
        parallelism. Spark schedules these like any other task set —
        stragglers, retries, and speculative execution come free."""
        start = dt.date.fromisoformat(self.ds_start)
        end = dt.date.fromisoformat(self.ds_end)
        days = (end - start).days + 1
        return [
            ReportPartition((start + dt.timedelta(days=d)).isoformat(), iso)
            for d in range(days)
            for iso in self.isos
        ]

    def read(self, partition: ReportPartition) -> Iterator[tuple]:
        yield (
            partition.ds,
            partition.iso,
            self.fetch_fn(partition.ds, partition.iso),
        )


class RestReportsDataSource(DataSource):
    """`format("rest_reports")` — executor-side REST extraction."""

    @classmethod
    def name(cls) -> str:
        return "rest_reports"

    def schema(self) -> str:
        # raw-zone shape: postgres/pg_init_covid19.sql:4-10
        return "ds string, iso_country string, json_data string"

    def reader(self, schema) -> RestReportsReader:
        return RestReportsReader(self.options)
