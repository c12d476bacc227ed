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


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Columnar scan of one warehouse table (predicate/column pushdown free)."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is INT64 TIMESTAMP(NANOS) parquet; with
        # nanosAsLong it arrives as epoch-nanos — truncate to the
        # engine's microsecond timestamp (same truncation DuckDB
        # applies reading nanos into its micro-precision TIMESTAMP).
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_field = next(f for f in df.schema.fields if f.name == "ts")
        if isinstance(ts_field.dataType, T.LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    return df


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
