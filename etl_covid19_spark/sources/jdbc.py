"""JDBC edge source/sink — SURVEY.md §2.1 S3/S6.

The reference reads staging and writes the warehouse over JDBC
(`spark.read.format('jdbc').option('query', …)`,
``spark_transform_data.py:17-25``; `DataFrameWriter.jdbc(mode=
'append')`, ``spark_transform_data.py:60-66``). The engine keeps
JDBC strictly at the edges — Parquet zones are the center — but
exposes the same surface, upgraded for scale:

- reads take either a pushed-down `query` (the reference's pattern)
  or a `(dbtable, partition_column, bounds, num_partitions)` spec so
  a big table scan becomes N parallel range queries instead of one
  executor pulling everything through a single connection;
- writes batch with `batchsize` (vs the reference's pandas
  row-at-a-time `insert_rows`, ``dags/ETL_covid19_pandas.py:88-94``)
  and default to append-only at the edge, with idempotency handled
  engine-side (partition overwrite in the Parquet zones) rather than
  by blind re-INSERT (reference quirk Q1).

The wire path is integration-tested end-to-end against embedded
Apache Derby (which ships on Spark's JVM classpath): write → read
round-trip, query pushdown, filter pushdown into the scan, and
partitioned parallel reads — see ``tests/test_jdbc_wire.py``. Server
databases (the reference's Postgres) differ only in URL/driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_read_options(
    url: str,
    query: str | None = None,
    dbtable: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    driver: str | None = None,
) -> dict[str, str]:
    """Build the option map for a JDBC scan. Exactly one of `query`
    (pushdown, reference-style S3) or `dbtable` must be given;
    partitioned reads require dbtable + a numeric/date column with
    bounds (Spark generates one range predicate per partition).

    Note this is the V1 `format("jdbc")` path: filters push down,
    aggregates do NOT. For aggregate/limit pushdown use
    `register_jdbc_catalog` (DSv2)."""
    if (query is None) == (dbtable is None):
        raise ValueError("exactly one of query/dbtable required")
    if query is not None and partition_column is not None:
        raise ValueError("partitioned reads require dbtable, not query")
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetchsize)}
    if driver:
        opts["driver"] = driver
    if query is not None:
        opts["query"] = query
    else:
        opts["dbtable"] = dbtable  # type: ignore[assignment]
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound/upper_bound/num_partitions"
            )
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrameReader:
    """Configured JDBC reader (call `.load()` to run). Kept as a
    reader so callers can layer extra options."""
    return spark.read.format("jdbc").options(**jdbc_read_options(**kwargs))


def read_jdbc_equidepth(
    spark: SparkSession,
    url: str,
    dbtable: str,
    partition_column: str,
    num_partitions: int,
    driver: str | None = None,
    fetchsize: int = 10_000,
    probe_buckets: int | None = None,
) -> DataFrame:
    """Skew-aware partitioned JDBC scan: equi-DEPTH range predicates
    derived from an in-database histogram probe.

    Spark's `partitionColumn`/`lowerBound`/`upperBound` reader slices
    the key range into equal-WIDTH strides — on a skewed table (ids
    clustered low, a hot tenant range, time-ordered keys with a busy
    week) one stride holds most rows and its task becomes the
    straggler pulling 90% of the data through one connection. This
    reader instead:

    1. probes the table ONCE in-database (a pushed-down group-by over
       `probe_buckets` equal-width micro-buckets — returns ≤ buckets
       rows over the wire, never data);
    2. greedy-packs contiguous micro-buckets into `num_partitions`
       ranges of ~equal ROW COUNT (cut points at depth boundaries);
    3. issues one range predicate per partition
       (`spark.read.jdbc(predicates=...)`), NULLs routed to the first.

    Partition row counts are balanced to within ~one micro-bucket.
    The default probe (1024 buckets, or 64 × num_partitions if
    larger) is deliberately fine-grained: a dense region occupying
    1% of the key span needs bucket width ≲ dense-width/partitions
    to be divisible at all, and the probe's cost is bounded by its
    ROW count (≤ buckets rows over the wire), not the table.
    Indivisible single-value hot keys are a real floor: a range on
    the partition column cannot split one value — same physics as
    shuffle-key skew; pick a higher-cardinality column or composite
    key for those tables (`key_skew_report` surfaces them).

    The probe uses integer bucket arithmetic `((col-min)*B)/span`,
    portable to Derby/Postgres/Oracle (no percentile functions
    required); (max-min)·B must fit the column's integer type —
    true for surrogate keys and epoch timestamps with B ≤ 2^20.
    """
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    b = probe_buckets or max(num_partitions * 64, 1024)
    q = partition_column  # caller passes the exact (quoted) identifier

    stats = (
        read_jdbc(
            spark,
            url=url,
            query=(
                f'SELECT MIN({q}) AS "lo", MAX({q}) AS "hi", '
                f'COUNT(*) AS "n" FROM {dbtable}'
            ),
            driver=driver,
        )
        .load()
        .collect()[0]
    )
    lo, hi, total = stats.lo, stats.hi, stats.n
    props = {"fetchsize": str(fetchsize)}
    if driver:
        props["driver"] = driver
    if total == 0 or lo is None or lo == hi or num_partitions == 1:
        return spark.read.jdbc(url, dbtable, properties=props)

    span = int(hi) - int(lo) + 1
    b = min(b, span)  # never finer than one value per bucket
    hist_rows = (
        read_jdbc(
            spark,
            url=url,
            query=(
                f'SELECT "bucket", COUNT(*) AS "n" FROM ('
                f"SELECT (({q} - {int(lo)}) * {b}) / {span} AS \"bucket\" "
                f"FROM {dbtable}) x GROUP BY \"bucket\""
            ),
            driver=driver,
        )
        .load()
        .collect()
    )
    hist = {int(r.bucket): int(r.n) for r in hist_rows}

    # greedy depth packing: cut whenever the running count passes the
    # per-partition target (cuts land on micro-bucket boundaries)
    target = total / num_partitions
    cuts: list[int] = []
    acc = 0
    for i in range(b):
        acc += hist.get(i, 0)
        if acc >= target * (len(cuts) + 1) and len(cuts) < num_partitions - 1:
            # bucket i's upper value bound, exclusive (ceil: the first
            # value whose micro-bucket index is > i)
            cuts.append(int(lo) + ((i + 1) * span + b - 1) // b)
    if not cuts:
        return spark.read.jdbc(url, dbtable, properties=props)

    preds = [f"{q} < {cuts[0]} OR {q} IS NULL"]
    preds += [
        f"{q} >= {a} AND {q} < {z}" for a, z in zip(cuts, cuts[1:])
    ]
    preds.append(f"{q} >= {cuts[-1]}")
    return spark.read.jdbc(url, dbtable, predicates=preds, properties=props)


def register_jdbc_catalog(
    spark: SparkSession,
    name: str,
    url: str,
    driver: str | None = None,
    push_down_aggregate: bool = True,
    push_down_limit: bool = True,
) -> None:
    """Expose a JDBC database as a Spark DSv2 catalog
    (`JDBCTableCatalog`), the scale path for edge reads Spark's V1
    `format("jdbc")` reader can't optimize: with
    ``pushDownAggregate``/``pushDownLimit`` the database computes
    MIN/MAX/SUM/COUNT/AVG group-bys and LIMITs and ships one row per
    group instead of the raw table — for a warehouse-sized edge scan
    that is gigabytes vs bytes over the wire. After registration the
    database is queryable as ``SELECT … FROM <name>.<schema>.<table>``
    and the scan node advertises `PushedAggregates`/
    `PushedGroupByExpressions` (asserted against live Derby in
    tests/test_jdbc_wire.py). Limit pushdown is additionally gated on
    the dialect being able to express it (Derby has no LIMIT clause,
    so Spark correctly keeps CollectLimit engine-side there)."""
    base = f"spark.sql.catalog.{name}"
    spark.conf.set(
        base,
        "org.apache.spark.sql.execution.datasources.v2.jdbc."
        "JDBCTableCatalog",
    )
    spark.conf.set(f"{base}.url", url)
    if driver:
        spark.conf.set(f"{base}.driver", driver)
    spark.conf.set(
        f"{base}.pushDownAggregate", str(push_down_aggregate).lower()
    )
    spark.conf.set(f"{base}.pushDownLimit", str(push_down_limit).lower())


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    driver: str | None = None,
    column_types: str | None = None,
) -> None:
    """S6 — batched JDBC append (the reference's warehouse write,
    vectorized). `numPartitions` on the df controls connection
    fan-in: repartition down before calling if the target database
    can't take one connection per task.

    `column_types` overrides the dialect's default DDL types when
    Spark creates the table (e.g. ``"region_name VARCHAR(64)"`` —
    the reference's DDL types its varchars explicitly,
    ``postgres/pg_init_covid19.sql:15-33``; some dialects map
    StringType to unGROUPable types like Derby's CLOB otherwise)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    if column_types:
        writer = writer.option("createTableColumnTypes", column_types)
    writer.save()


def write_jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    driver: str | None = None,
    batchsize: int = 10_000,
    column_types: str | None = None,
    batch_id: str | int | None = None,
) -> None:
    """Idempotent JDBC upsert: stage + MERGE — the exactly-once
    pattern for external-warehouse sinks.

    The reference re-INSERTs on retry (quirk Q1: a re-run doubles the
    day's rows). Blind append can never be retry-safe over JDBC, so
    this sink does what production loaders do:

    1. the batch lands in a STAGING table (plain batched append —
       parallel executor connections, same as `write_jdbc`);
    2. one transactional ``MERGE INTO target USING staging ON keys``
       statement upserts it into the target (executed through the
       driver's JVM JDBC connection — a single DDL-sized statement,
       not a data path: rows move inside the database);
    3. the staging table is dropped.

    Re-running the same batch MERGEs to the identical target state —
    idempotent under at-least-once orchestration (the engine-side
    twin of the parquet zones' dynamic partition overwrite). Derby /
    Postgres / Oracle all speak this MERGE; integration-tested over
    live embedded Derby in ``tests/test_jdbc_wire.py``.

    Concurrency: the staging table is per-invocation. With
    `batch_id` given (e.g. the foreachBatch epoch id) the name is
    deterministic — a retry of the SAME batch reuses and first drops
    its own leftover staging, while concurrent writers with distinct
    batch ids never collide. Without it a random token is used, so
    two concurrent upserts to one target still can't clobber each
    other's staged rows; either way staging is dropped in a finally,
    including on MERGE failure.
    """
    import uuid

    spark = df.sparkSession
    if batch_id is not None:
        stage = f"{table}_stg_{batch_id}"
    else:
        stage = f"{table}_stg_{uuid.uuid4().hex[:12]}"
    cols = df.columns
    non_keys = [c for c in cols if c not in keys]

    jvm = spark._jvm
    if driver:
        # DriverManager's JDBC4 SPI auto-loading misses drivers whose
        # jar lacks META-INF/services; force-register like the
        # executor-side path does via the `driver` option.
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)

    def _drop_stage() -> None:
        try:
            st = conn.createStatement()
            st.executeUpdate(f"DROP TABLE {stage}")
            st.close()
        except Exception:
            pass  # staging didn't exist — normal path

    try:
        # drop leftover staging from a crashed run of the SAME batch
        # (deterministic batch_id names make this reachable)
        _drop_stage()
        write_jdbc(
            df,
            url,
            stage,
            mode="overwrite",
            batchsize=batchsize,
            driver=driver,
            column_types=column_types,
        )
        # Spark's JDBC writer creates columns as QUOTED identifiers
        # (case-sensitive); the MERGE must quote them the same way
        def q(c: str) -> str:
            return '"' + c + '"'

        on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in keys)
        set_clause = ", ".join(f"t.{q(c)} = s.{q(c)}" for c in non_keys)
        insert_cols = ", ".join(q(c) for c in cols)
        insert_vals = ", ".join(f"s.{q(c)}" for c in cols)
        merge = (
            f"MERGE INTO {table} t USING {stage} s ON {on} "
            + (f"WHEN MATCHED THEN UPDATE SET {set_clause} " if non_keys else "")
            + f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) "
            f"VALUES ({insert_vals})"
        )
        st = conn.createStatement()
        st.executeUpdate(merge)
        st.close()
    finally:
        _drop_stage()
        conn.close()
