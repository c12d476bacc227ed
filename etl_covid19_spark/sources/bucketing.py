"""Bucketed tables — co-located joins and aggregations without
shuffles (SURVEY.md §7.2 step 1's "bucketing for co-located joins").

At 100 TB the dominant cost of fact⋈fact joins and repeated
same-key aggregations is the shuffle. Writing both sides bucketed by
the join key (same bucket count) pins rows to hash-determined files,
so Catalyst plans a SortMergeJoin with NO Exchange on either side —
the join runs bucket-by-bucket, and a groupBy on the bucket key
skips its shuffle too. The write pays one shuffle once; every
downstream join/agg on that key is shuffle-free forever.

Spark only tracks bucket metadata through the session catalog, so
these are `saveAsTable` tables (parquet files + catalog entry), not
bare paths."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize `df` bucketed (and optionally sorted) by key.
    Sorting within buckets lets the SortMergeJoin skip its sort as
    well — the plan degenerates to a streaming merge.

    A managed table's warehouse directory OUTLIVES an in-memory
    catalog: a fresh process re-creating the same table name hits
    LOCATION_ALREADY_EXISTS on saveAsTable (the catalog forgot the
    table, the directory did not). Clear both the catalog entry and
    any stale unregistered location before writing, so the operation
    is idempotent across process restarts."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    if wh:
        shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
