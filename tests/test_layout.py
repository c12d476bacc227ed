"""Data-layout operators: clustered writes (min/max data skipping)
and small-file compaction — the parquet-zone maintenance surface a
100 TB deployment lives on.
"""

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_covid19_spark.sources.parquet_zone import (
    clustered_write,
    compact_zone,
    write_zone,
)


def _file_ranges(path: str, column: str) -> list[tuple[int, int]]:
    """(min, max) of `column` per parquet file, from footer stats."""
    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column)
        lo = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    return ranges


def test_clustered_write_yields_disjoint_file_ranges(spark, tmp_path):
    path = str(tmp_path / "clustered")
    df = spark.range(100_000).selectExpr(
        "pmod(xxhash64(id), 10000) AS user_id", "id AS payload"
    )
    clustered_write(df, path, cluster_by=["user_id"], n_files=8)
    ranges = sorted(_file_ranges(path, "user_id"))
    assert len(ranges) >= 4
    # disjoint: every file owns its own key range (footer-skippable)
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo
    # a point filter matches exactly one file's [min, max] interval
    probe = 5000
    assert sum(1 for lo, hi in ranges if lo <= probe <= hi) == 1


def test_unclustered_write_overlaps_everywhere(spark, tmp_path):
    """Control: the same data written unclustered has every file
    spanning the whole key space — nothing is footer-skippable."""
    path = str(tmp_path / "plain")
    df = spark.range(100_000).selectExpr(
        "pmod(xxhash64(id), 10000) AS user_id", "id AS payload"
    )
    df.repartition(8).write.parquet(path)
    ranges = _file_ranges(path, "user_id")
    probe = 5000
    assert sum(1 for lo, hi in ranges if lo <= probe <= hi) == len(ranges)


def test_compact_zone_collapses_small_files(spark, tmp_path):
    path = str(tmp_path / "zone")
    df = spark.range(1000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN '2023-01-01' ELSE '2023-01-02' END AS ds",
        "id AS v",
    )
    # fragment: many small files per partition
    write_zone(df.repartition(16), path)
    frag = len(glob.glob(f"{path}/ds=2023-01-01/*.parquet"))
    assert frag > 4

    n = compact_zone(spark, path, target_files=1)
    assert n == 2
    for ds in ("2023-01-01", "2023-01-02"):
        files = glob.glob(f"{path}/ds={ds}/*.parquet")
        assert len(files) <= 2  # hash-repartition may split ~evenly
    total = spark.read.parquet(path).count()
    assert total == 1000
    assert spark.read.parquet(path).agg(F.sum("v")).collect()[0][0] == sum(
        range(1000)
    )


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """Morton clustering must make point predicates on EACH of the
    two cluster columns footer-skippable (match only a minority of
    files), which single-column range clustering cannot do for the
    secondary column."""
    from etl_covid19_spark.sources.parquet_zone import zorder_write

    path = str(tmp_path / "zordered")
    df = spark.range(200_000).selectExpr(
        "pmod(xxhash64(id), 1024) AS x",
        "pmod(xxhash64(id + 99), 1024) AS y",
        "id AS payload",
    )
    zorder_write(df, path, "x", "y", n_files=16, bits=10)

    for col in ("x", "y"):
        ranges = _file_ranges(path, col)
        n = len(ranges)
        assert n >= 8
        probe = 512
        matching = sum(1 for lo, hi in ranges if lo <= probe <= hi)
        # blocky locality in BOTH dimensions: an unclustered (or
        # single-column-clustered) layout has the secondary dimension
        # matching 100% of files; the z-grid bounds it well below
        # that even though quantile-sampled range boundaries don't
        # align exactly to z-cells (files straddling a cell edge
        # widen their min/max)
        assert matching <= (2 * n) // 3, (col, matching, n)


def test_write_zone_caps_records_per_file(spark, tmp_path):
    """maxRecordsPerFile splits a single hot task's output into
    bounded files — the upper-bound half of file-size governance
    (compact_zone merges the small-file lower bound)."""
    import glob

    from etl_covid19_spark.sources.parquet_zone import write_zone

    df = (
        spark.range(1000)
        .withColumn("ds", F.lit("2020-01-01"))
        .coalesce(1)  # one task: without the cap, one file
    )
    path = str(tmp_path / "capped")
    write_zone(df, path, max_records_per_file=100)
    files = glob.glob(f"{path}/ds=2020-01-01/*.parquet")
    assert len(files) == 10
    total = spark.read.parquet(path).count()
    assert total == 1000


def test_footer_stats_profile_reads_no_data_pages(spark, tmp_path):
    """MIN/MAX/COUNT from parquet footers via DSv2 aggregate
    pushdown: the helper asserts PushedAggregation engaged (raising
    otherwise), results match a full scan, and the session confs are
    restored afterwards."""
    from etl_covid19_spark.sources.parquet_zone import footer_stats_profile

    path = str(tmp_path / "statszone")
    spark.range(0, 50_000, 1, 8).selectExpr(
        "id", "CAST(id % 997 AS DOUBLE) AS v"
    ).write.parquet(path)

    prev_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    stats = footer_stats_profile(spark, path, ["id", "v"])
    assert stats["count"] == 50_000
    assert stats["id"] == (0, 49_999)
    assert stats["v"] == (0.0, 996.0)
    # conf restored: parquet back on the V1 list, pushdown off
    assert spark.conf.get("spark.sql.sources.useV1SourceList") == prev_v1
    assert spark.conf.get("spark.sql.parquet.aggregatePushdown") == "false"
