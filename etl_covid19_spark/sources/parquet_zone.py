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
    max_records_per_file: int | None = None,
) -> None:
    """Write a zone. `overwrite` + partitionOverwriteMode=dynamic
    (set in session.py) only replaces the partitions present in `df`
    — the idempotent-retry contract (SURVEY.md §7.2 step 1).

    ``max_records_per_file`` caps file sizes independently of task
    parallelism — the upper-bound half of file-size governance
    (`compact_zone` is the lower-bound half): one hot task writing a
    skewed partition otherwise emits one giant file that a later scan
    can't split across row-group boundaries cheaply. Off by default;
    size it so files land near the scan's maxPartitionBytes."""
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_zone(
    spark: SparkSession,
    path: str,
    ds: str | None = None,
    columns: tuple[str, ...] | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Partition-pruned scan of a zone; ``ds`` narrows to one day the
    way every reference read does (``WHERE date_of_data = '<ds>'``,
    ``spark_transform_data.py:24``).

    ``merge_schema`` handles additive schema evolution: a zone whose
    later days gained columns (the API added a field) reads as the
    UNION schema, old partitions null-filling the new columns —
    instead of silently projecting only whichever file's schema the
    reader sampled. Off by default: schema merging reads every file
    footer up front, which at 100 TB is a planning cost to pay only
    when evolution actually happened."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(path)
    if ds is not None:
        df = df.filter(F.col("ds") == F.lit(ds))
    if columns:
        df = df.select(*columns)
    return df


_REWRITE_FAN = 4


def _align_rewrite(df: DataFrame, partition_col: str) -> DataFrame:
    """Shuffle a partition-rewrite slice into write-layout-aligned
    tasks before a dynamic-partition overwrite: without this, every
    upstream task holding rows for k partitions opens k writers and
    the rewrite emits tasks×partitions files — hundreds of tiny
    files per mutation on a many-day zone, and (as round 9's one red
    driver row showed) the widest possible exposure to transient
    task-side write failures. Hashing on (partition, salt) bounds
    output to `_REWRITE_FAN` files per rewritten partition while
    keeping a skewed hot day from serializing through one task."""
    # Salt only over HASHABLE columns: xxhash64 rejects MapType (maps
    # are unorderable in Spark), and a zone is allowed to carry one.
    # Dropping unhashable columns from the salt only affects how rows
    # spread across the ≤ _REWRITE_FAN files per partition, never
    # which rows land in which partition directory.
    def _hashable(dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _hashable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        return True

    salt_cols = [
        F.col(f.name) for f in df.schema.fields if _hashable(f.dataType)
    ] or [F.lit(0)]
    salt = F.pmod(F.xxhash64(F.struct(*salt_cols)), F.lit(_REWRITE_FAN))
    # spark.sql.shuffle.partitions may be non-numeric on managed
    # platforms (e.g. "auto" under Databricks AQE) — fall back to the
    # slice's current parallelism rather than hard-failing the DELETE.
    raw = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    try:
        n_parts = int(raw)
    except (TypeError, ValueError):
        n_parts = max(df.rdd.getNumPartitions(), _REWRITE_FAN)
    return df.repartition(n_parts, F.col(partition_col), salt)


def delete_where(
    spark: SparkSession,
    path: str,
    predicate: F.Column,
    partition_col: str = "ds",
) -> int:
    """Row-level DELETE on an immutable parquet zone — the engine's
    honest equivalent of the reference's ``DELETE FROM covid19_table
    WHERE region_name IN (...)`` (``dags/ETL_covid19_SQL.py:96-97``,
    F3) without a mutable table format.

    Mechanics: (1) one column-pruned scan finds the PARTITIONS that
    contain matching rows; (2) only those partitions are read back,
    filtered to the survivors, and dynamic-partition-overwritten in
    place. Untouched partitions are never rewritten (test-pinned on
    file listings), so cost is proportional to affected data, not
    zone size. Commit is atomic per partition via Spark's rename
    protocol; a crash mid-delete leaves whole partitions either old
    or new, and re-running converges (idempotent).

    Returns the number of deleted rows.
    """
    zone = spark.read.parquet(path)
    affected = [
        r[0]
        for r in zone.filter(predicate).select(partition_col).distinct().collect()
    ]
    if not affected:
        return 0
    slice_df = zone.filter(F.col(partition_col).isin(affected)).persist()
    try:
        n_deleted = slice_df.filter(predicate).count()
        kept = slice_df.filter(~predicate)
        write_zone(
            _align_rewrite(kept, partition_col),
            path,
            partition_by=(partition_col,),
        )
    finally:
        slice_df.unpersist(blocking=False)
    return n_deleted


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    partition_col: str = "ds",
) -> None:
    """MERGE (upsert) into a parquet zone: zone rows whose `keys`
    match an update row are replaced; unmatched update rows are
    inserted — WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN
    INSERT, as partition rewrites.

    `updates` must carry `partition_col`, and keys are assumed
    partition-stable (a fact keyed by (ds, region) never moves
    between ds partitions — true for every reference table; a
    migrating key needs a delete in the old partition first).

    Only the partitions present in `updates` are rewritten: their
    current rows are anti-joined against the update keys (dropping
    superseded versions) and unioned with the updates. At 100 TB the
    anti-join shuffles one affected partition's keys, not the zone.
    """
    affected = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if not affected:
        return
    zone = spark.read.parquet(path)
    current = zone.filter(F.col(partition_col).isin(affected))
    merged = current.join(
        updates.select(*keys), on=keys, how="left_anti"
    ).unionByName(updates.select(*current.columns))
    write_zone(
        _align_rewrite(merged, partition_col),
        path,
        partition_by=(partition_col,),
    )


def clustered_write(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    partition_by: tuple[str, ...] = (),
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a zone CLUSTERED on `cluster_by`: range-repartition so
    each output file owns a disjoint key range, then sort within
    partitions so parquet row-group min/max statistics are tight.

    This is the table-format-free form of data clustering (Delta
    OPTIMIZE ZORDER / Iceberg sort orders): a later scan filtered on
    the cluster keys skips whole files/row-groups on footer stats
    alone — at 100 TB the difference between reading one file and
    reading ten thousand. Test-pinned in ``tests/test_layout.py``:
    per-file key ranges are disjoint and a point filter's matching
    files shrink to 1.

    `n_files` bounds output file count (range partitioner splits the
    key space that many ways); leave None to keep the input
    parallelism.
    """
    keys = [F.col(c) for c in cluster_by]
    clustered = (
        df.repartitionByRange(n_files, *keys)
        if n_files
        else df.repartitionByRange(*keys)
    )
    clustered = clustered.sortWithinPartitions(*keys)
    writer = clustered.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact_zone(
    spark: SparkSession,
    path: str,
    partition_col: str = "ds",
    partitions: list[str] | None = None,
    target_files: int = 1,
) -> int:
    """Small-file compaction: rewrite each (selected) partition into
    `target_files` files. Streaming ingest and frequent incremental
    commits accumulate many small files per partition; at scale the
    file count — not the byte count — dominates planning and open()
    cost, and the fix is a periodic partition-local rewrite, which
    dynamic partition overwrite makes idempotent and atomic per
    partition (same contract as delete_where).

    Returns the number of partitions compacted.
    """
    zone = spark.read.parquet(path)
    if partitions is None:
        partitions = [
            r[0] for r in zone.select(partition_col).distinct().collect()
        ]
    if not partitions:
        return 0
    slice_df = zone.filter(F.col(partition_col).isin(partitions))
    # shuffle on (partition, salt): each partition fans across up to
    # `target_files` tasks, so the writer emits that many files per
    # partition directory (hash repartition on the partition column
    # alone would serialize each partition through one task)
    salt = F.pmod(
        F.xxhash64(F.struct(*[F.col(c) for c in slice_df.columns])),
        F.lit(target_files),
    )
    write_zone(
        slice_df.repartition(
            target_files * len(partitions), F.col(partition_col), salt
        ),
        path,
        partition_by=(partition_col,),
    )
    return len(partitions)


def footer_stats_profile(
    spark: SparkSession,
    path: str,
    columns: list[str],
) -> dict:
    """MIN/MAX per column + row COUNT computed entirely from parquet
    FOOTER statistics — zero data pages read. This is the zone-
    maintenance fast path at 100 TB: freshness checks, partition
    registration, and layout audits need these three numbers per
    column, and scanning petabytes to recompute what every footer
    already stores is the difference between seconds and hours.

    Mechanics: Spark's DSv2 parquet scan supports aggregate pushdown
    (`spark.sql.parquet.aggregatePushdown`) for MIN/MAX/COUNT over
    un-nested, non-filtered scans; the plan shows
    ``PushedAggregation: [MIN(..), MAX(..), COUNT(*)]`` and the scan
    returns one pre-aggregated row per file from footer metadata.
    The V1 file source ignores the conf, so the helper briefly routes
    parquet through DSv2 (`useV1SourceList`), restoring both confs
    after the action — scoped to this call, documented session-level
    visibility during it.

    Returns {"count": n, "<col>": (min, max), ...}.
    """
    conf = spark.conf
    prev_push = conf.get("spark.sql.parquet.aggregatePushdown")
    prev_v1 = conf.get("spark.sql.sources.useV1SourceList")
    try:
        conf.set("spark.sql.parquet.aggregatePushdown", "true")
        conf.set(
            "spark.sql.sources.useV1SourceList",
            ",".join(
                s for s in prev_v1.split(",") if s.strip() != "parquet"
            ),
        )
        aggs = [F.count(F.lit(1)).alias("count")]
        for c in columns:
            aggs.append(F.min(c).alias(f"{c}__min"))
            aggs.append(F.max(c).alias(f"{c}__max"))
        df = spark.read.parquet(path).agg(*aggs)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "PushedAggregation: [" not in plan or "COUNT(*)" not in plan:
            raise RuntimeError(
                "footer-stats pushdown did not engage; plan:\n" + plan
            )
        row = df.collect()[0]
    finally:
        conf.set("spark.sql.parquet.aggregatePushdown", prev_push)
        conf.set("spark.sql.sources.useV1SourceList", prev_v1)
    out: dict = {"count": row["count"]}
    for c in columns:
        out[c] = (row[f"{c}__min"], row[f"{c}__max"])
    return out


def morton_key(a: F.Column | str, b: F.Column | str, bits: int = 16) -> F.Column:
    """Z-order (Morton) interleave of two non-negative int columns,
    `bits` bits each → one long. Range-partitioning + sorting on this
    key gives BLOCKY locality in BOTH dimensions, so parquet footer
    min/max stats prune files for predicates on either column — the
    table-format-free core of Delta's OPTIMIZE ZORDER.

    Built from shift/and/or Catalyst expressions (codegen'd, no UDF);
    values are clamped into [0, 2^bits) so outliers degrade locality
    rather than corrupt the key."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    lim = F.lit((1 << bits) - 1)
    ca = F.least(F.greatest(ca.cast("long"), F.lit(0)), lim)
    cb = F.least(F.greatest(cb.cast("long"), F.lit(0)), lim)
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(ca, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(cb, i).bitwiseAND(F.lit(1))
        key = (
            key
            + (abit * F.lit(1 << (2 * i)))
            + (bbit * F.lit(1 << (2 * i + 1)))
        )
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write clustered on the Morton interleave of (col_a, col_b):
    predicates on EITHER column skip most files on footer stats —
    single-column range clustering (`clustered_write`) only helps its
    own column. Test-pinned in ``tests/test_layout.py``: point
    filters on each dimension individually match a small fraction of
    files."""
    keyed = df.withColumn("_zkey", morton_key(col_a, col_b, bits))
    (
        keyed.repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )
