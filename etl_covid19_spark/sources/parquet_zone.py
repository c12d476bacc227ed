"""Date-partitioned Parquet zones — the engine-native raw/clean/mart
storage replacing the reference's Postgres tables.

Reference semantics being reproduced (SURVEY.md §2.1):
- S2 raw-JSON sink: append-only landing of (ds, iso, json) rows
  (``dags/ETL_covid19_pandas.py:49-51``) → `write_zone(mode='append')`.
- S6 cleaned sink: ``spark_transform_data.py:60-66`` writes the clean
  frame; here it's a *dynamic partition overwrite* so an orchestrator
  retry rewrites the same ds partition instead of duplicating it
  (fixes reference quirk Q1, SURVEY.md §8).
- F4/S3 date-sliced reads become partition-pruned scans: filtering on
  the partition column `ds` never touches other days' files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_zone(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("ds",),
    mode: str = "overwrite",
) -> None:
    """Write a zone. `overwrite` + partitionOverwriteMode=dynamic
    (set in session.py) only replaces the partitions present in `df`
    — the idempotent-retry contract (SURVEY.md §7.2 step 1)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_zone(
    spark: SparkSession,
    path: str,
    ds: str | None = None,
    columns: tuple[str, ...] | None = None,
) -> DataFrame:
    """Partition-pruned scan of a zone; ``ds`` narrows to one day the
    way every reference read does (``WHERE date_of_data = '<ds>'``,
    ``spark_transform_data.py:24``)."""
    df = spark.read.parquet(path)
    if ds is not None:
        df = df.filter(F.col("ds") == F.lit(ds))
    if columns:
        df = df.select(*columns)
    return df
