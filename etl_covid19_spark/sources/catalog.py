"""Parquet table catalog over the driver's synthetic warehouse.

The reference reads its zones over JDBC with hand-written pushdown
queries (``spark_transform_data.py:17-25``). Here every zone is a
columnar Parquet scan: Catalyst pushes predicates and prunes columns
into the scan automatically, which is the scale-relevant property —
a 2-column projection of a 100 TB table reads 2 column chunks, not
the table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Runtime confs the query surface depends on, applied defensively on
# every load: a HOST-built SparkSession (the verification driver's,
# a notebook's) won't have gone through session.get_spark, and
# without these (a) the INT64 TIMESTAMP(NANOS) events parquet fails
# the vectorized reader outright, and (b) a non-UTC session timezone
# shifts string→timestamp casts against the NTZ parquet values.
_REQUIRED_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — a locked conf is non-fatal
            pass


def _normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to the engine's TIMESTAMP
    regardless of how the parquet writer encoded it. The warehouse
    has shipped `events.ts` two ways across generations — INT64
    TIMESTAMP(NANOS) (arrives as epoch-nanos under nanosAsLong) and
    plain TIMESTAMP_MICROS with isAdjustedToUTC=false (arrives as
    TIMESTAMP_NTZ) — so every consumer goes through this one
    adapter instead of baking in a physical encoding. With the
    session timezone pinned to UTC (ensure_runtime_confs) the
    NTZ→LTZ cast is value-preserving and matches how DuckDB's
    naive TIMESTAMP reads the same column."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    field = next((f for f in df.schema.fields if f.name == col), None)
    if field is None:
        return df
    if isinstance(field.dataType, T.LongType):
        # epoch-nanos → truncate to micros (DuckDB does the same
        # truncation reading nanos into its micro-precision type)
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(field.dataType, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


# Driver-side schema cache — what a real metastore/catalog provides.
# `spark.read.parquet(path)` re-infers the schema from the footer on
# EVERY call (~80 ms per table on this host: file listing + footer
# fetch + merge); passing the schema explicitly skips that (~13 ms).
# Queries re-read their tables on every invocation, so the inference
# tax was paid 25+ times per bench pass. Keyed on a stat() snapshot
# of the backing file(s) — size + mtime_ns — so rewriting a parquet
# at the same path misses the cache instead of serving a stale
# schema (same invalidation idea as operators/df_cache). This caches
# METADATA only, never data or results: every scan still reads the
# parquet.
_SCHEMA_CACHE: dict[tuple, object] = {}
_SCHEMA_CACHE_MAX = 512


def _local_fingerprint(path: str):
    """(size, mtime_ns) snapshot of a local file, or the sorted
    per-file snapshot of a local directory tree; None when the path
    is not local-stat-able (object stores / HDFS: schema caching is
    skipped, Spark infers as before). Directories are walked
    RECURSIVELY (round-11 ADVICE): a partitioned layout (key=value
    subdirs) rewritten in place changes neither the subdir entry's
    size nor its mtime_ns, so a non-recursive snapshot could serve a
    stale schema after a data rewrite."""
    if "://" in path and not path.startswith("file:"):
        return None
    p = path.removeprefix("file://").removeprefix("file:")
    try:
        if os.path.isdir(p):
            snap = []
            for root, _dirs, files in os.walk(p):
                rel = os.path.relpath(root, p)
                for f in files:
                    st = os.stat(os.path.join(root, f))
                    snap.append(
                        (os.path.join(rel, f), st.st_size, st.st_mtime_ns)
                    )
            return tuple(sorted(snap))
        st = os.stat(p)
        return (st.st_size, st.st_mtime_ns)
    except OSError:
        return None


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Columnar scan of one warehouse table (predicate/column pushdown free)."""
    ensure_runtime_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    fp = _local_fingerprint(path)
    if fp is None:
        df = spark.read.parquet(path)
    else:
        key = (path, fp)
        schema = _SCHEMA_CACHE.get(key)
        if schema is None:
            schema = spark.read.parquet(path).schema
            if len(_SCHEMA_CACHE) >= _SCHEMA_CACHE_MAX:
                _SCHEMA_CACHE.clear()
            _SCHEMA_CACHE[key] = schema
        df = spark.read.schema(schema).parquet(path)
    if name == "events":
        df = _normalize_ts(df)
    return df


def events_stream(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """`readStream` over the events parquet with `ts` normalized to
    TIMESTAMP. The file source needs an explicit schema, and that
    schema must match the file's physical encoding, so the footer is
    probed driver-side (pyarrow, no Spark job) and the matching DDL
    is generated; `_normalize_ts` then converts whatever arrived.
    All streaming registry queries come through here so a warehouse
    re-generation can't strand five hand-written schemas.

    The pyarrow probe only understands local filesystem paths; for an
    object-store / HDFS `sf_dir` (s3a://, hdfs://, …) it falls back
    to a Spark-side schema probe — a footer read through Hadoop's
    filesystem layer, still no data scan."""
    ensure_runtime_confs(spark)
    path = f"{sf_dir}/events.parquet"
    ts_ddl = None
    if "://" not in sf_dir or sf_dir.startswith("file:"):
        try:
            import pyarrow.parquet as pq

            phys = pq.read_schema(
                path.removeprefix("file://").removeprefix("file:")
            ).field("ts").type
            if str(phys) == "int64":
                ts_ddl = "long"
            elif getattr(phys, "tz", None):
                ts_ddl = "timestamp"
            else:
                ts_ddl = "timestamp_ntz"
        except (ImportError, OSError):
            ts_ddl = None  # fall through to the Spark probe
    if ts_ddl is None:
        spark_ts = spark.read.parquet(path).schema["ts"].dataType
        ts_ddl = spark_ts.simpleString()
    stream = (
        spark.readStream.schema(
            f"event_id long, ts {ts_ddl}, user_id long, "
            "event_type string, value double, props string"
        )
        # the file source wants a directory; glob down to events
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return _normalize_ts(stream)


def documents_stream(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR
) -> DataFrame:
    """`readStream` over the documents parquet — the ingest edge for
    streaming corpus curation (score/filter at arrival time instead
    of in a nightly batch). Fixed schema: the documents table has no
    timestamp column, so no physical-encoding probe is needed."""
    ensure_runtime_confs(spark)
    return (
        spark.readStream.schema(
            "doc_id long, text string, lang string, "
            "source string, n_chars long"
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Expose every table as a temp view so `spark.sql(...)` works —
    the engine's equivalent of the reference's in-database SQL flavor
    (SURVEY.md §3.3)."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
