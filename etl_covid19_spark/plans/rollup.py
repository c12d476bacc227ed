"""Incrementally-maintained aggregate tables over the fact zone.

The reference's mart exists "to serve group-by-dimension
aggregations" (SURVEY.md §2.5, ``README.md:18``) but recomputes
nothing incrementally — every consumer re-aggregates the fact table.
At 100 TB a daily-grain aggregate must be MAINTAINED, not recomputed:
each day's load touches exactly one day of fact data, so the rollup
refresh should too.

`refresh_daily_rollup` recomputes only the run date's aggregate from
the fact zone's pruned ds partition and dynamic-partition-overwrites
that one rollup partition — idempotent under retries and under
fact-partition rewrites, cost proportional to one day, never to
history.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_covid19_spark.sources.parquet_zone import read_zone, write_zone


def refresh_daily_rollup(
    spark: SparkSession,
    fact_path: str,
    rollup_path: str,
    ds: str,
    group_cols: list[str],
    aggs: Mapping[str, Column],
) -> DataFrame:
    """Recompute the `ds` slice of a (ds, *group_cols) rollup from
    the fact zone and replace that rollup partition. Returns the
    day's aggregate frame.

    Whole-slice replacement (partition overwrite), deliberately NOT
    a keyed merge: a merge can only update keys present in the new
    aggregate, so a group that vanished from the day's facts (a
    late correction removing a region) would survive as a stale
    rollup row. Replacing the partition deletes it; and there are no
    read-modify-write increments that could double-count under
    retries — re-running any day converges to its current facts."""
    day = read_zone(spark, fact_path, ds=ds)
    day_agg = (
        day.groupBy(*group_cols)
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
        .withColumn("ds", F.lit(ds))
    )
    write_zone(day_agg, rollup_path)
    return day_agg
