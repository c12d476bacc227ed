"""JDBC wire-path integration tests (SURVEY.md §2.1 S3/S6).

The reference's only edge I/O is JDBC (read with a pushed-down query,
``spark_transform_data.py:17-25``; batched append write,
``spark_transform_data.py:60-66``). No server database exists in this
environment, but Spark ships Apache Derby (its Hive-metastore
backend) on the JVM classpath — an embedded JDBC database is enough
to drive the REAL wire path end-to-end: DataFrame → JDBC INSERT →
table → JDBC scan → DataFrame, including predicate pushdown and
partitioned parallel reads.
"""

import pytest

from etl_covid19_spark.sources.jdbc import read_jdbc, write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "wiredb"
    return f"jdbc:derby:{db};create=true"


@pytest.fixture(scope="module")
def roundtrip_table(spark, derby_url):
    """Write 1000 rows over JDBC once; the read tests share it."""
    df = spark.range(1000).selectExpr(
        "id AS o_id",
        "CAST(id % 7 AS DOUBLE) AS amount",
        "concat('cust_', CAST(id % 13 AS STRING)) AS cust",
    )
    write_jdbc(
        df, derby_url, "wire_orders", mode="append", driver=DRIVER,
        # Derby's dialect maps StringType → CLOB, which can't be
        # grouped/compared; type the key column explicitly (the
        # reference's DDL does the same for its varchars)
        column_types="cust VARCHAR(32)",
    )
    return "wire_orders"


def test_jdbc_write_then_read_roundtrip(spark, derby_url, roundtrip_table):
    back = read_jdbc(
        spark, url=derby_url, dbtable=roundtrip_table, driver=DRIVER
    ).load()
    assert back.count() == 1000
    assert {f.name for f in back.schema.fields} == {"o_id", "amount", "cust"}
    total = back.agg({"o_id": "sum"}).collect()[0][0]
    assert total == sum(range(1000))


def test_jdbc_query_pushdown_executes_in_database(spark, derby_url, roundtrip_table):
    """The reference's S3 pattern: the SQL runs IN the database; Spark
    sees only the result relation."""
    out = read_jdbc(
        spark,
        url=derby_url,
        # Spark's writer quotes COLUMN identifiers (case-sensitive
        # lowercase) but not the table name (Derby folds it upper) —
        # the pushed-down SQL must follow the same quoting
        query=(
            'SELECT "cust", COUNT(*) AS "n", SUM("amount") AS "total" '
            'FROM wire_orders WHERE "o_id" >= 500 GROUP BY "cust"'
        ),
        driver=DRIVER,
    ).load()
    rows = {r.cust: (r.n, r.total) for r in out.collect()}
    assert len(rows) == 13
    assert sum(n for n, _ in rows.values()) == 500


def test_jdbc_filter_pushdown_reaches_scan(spark, derby_url, roundtrip_table):
    """A Spark-side filter over a dbtable scan must be pushed into the
    JDBC source (visible as PushedFilters on the scan node), not
    evaluated after pulling every row."""
    df = (
        read_jdbc(spark, url=derby_url, dbtable=roundtrip_table, driver=DRIVER)
        .load()
        .where("o_id > 900")
        .select("o_id")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan and "GreaterThan(O_ID,900)" in plan.replace(
        "o_id", "O_ID"
    )
    assert df.count() == 99


def test_jdbc_partitioned_parallel_read(spark, derby_url, roundtrip_table):
    """The scale posture for big JDBC scans: N range-partitioned
    queries instead of one connection pulling everything."""
    df = read_jdbc(
        spark,
        url=derby_url,
        dbtable=roundtrip_table,
        partition_column="o_id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
        driver=DRIVER,
    ).load()
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000  # range predicates partition, never drop


def test_jdbc_append_is_append(spark, derby_url):
    """mode='append' on an existing table adds rows (the reference's
    write semantics; idempotency lives engine-side, quirk Q1)."""
    df = spark.range(5).selectExpr("id AS k")
    write_jdbc(df, derby_url, "wire_append", mode="append", driver=DRIVER)
    write_jdbc(df, derby_url, "wire_append", mode="append", driver=DRIVER)
    back = read_jdbc(
        spark, url=derby_url, dbtable="wire_append", driver=DRIVER
    ).load()
    assert back.count() == 10


def test_jdbc_catalog_aggregate_pushdown_returns_groups_not_rows(
    spark, derby_url, roundtrip_table
):
    """DSv2 catalog path: the database computes the GROUP BY and
    ships one row per group — the scan node advertises
    PushedAggregates/PushedGroupByExpressions instead of a bare
    column scan (V1 format('jdbc') cannot do this)."""
    from etl_covid19_spark.sources.jdbc import register_jdbc_catalog

    register_jdbc_catalog(spark, "derbycat", derby_url, driver=DRIVER)
    df = spark.sql(
        "SELECT cust, count(*) AS n, max(amount) AS max_amount "
        "FROM derbycat.APP.WIRE_ORDERS GROUP BY cust"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedAggregates: [COUNT(*), MAX(amount)]" in plan
    assert "PushedGroupByExpressions: [cust]" in plan
    rows = {r.cust: (r.n, r.max_amount) for r in df.collect()}
    assert len(rows) == 13
    assert sum(n for n, _ in rows.values()) == 1000
    assert all(mx == 6.0 for _, mx in rows.values())


def test_jdbc_catalog_limit_is_dialect_gated(spark, derby_url, roundtrip_table):
    """pushDownLimit is enabled on the catalog, but Derby's SQL
    dialect has no LIMIT clause, so Spark must correctly DECLINE the
    pushdown (CollectLimit stays Spark-side) rather than emit invalid
    SQL — the conservative fallback a mixed-dialect edge needs.
    Dialects with LIMIT (Postgres/MySQL/H2) advertise `PushedLimit`
    on the same plumbing."""
    from etl_covid19_spark.sources.jdbc import register_jdbc_catalog

    register_jdbc_catalog(spark, "derbycat", derby_url, driver=DRIVER)
    df = spark.sql("SELECT o_id FROM derbycat.APP.WIRE_ORDERS LIMIT 5")
    assert len(df.collect()) == 5  # correct result despite no pushdown


def test_jdbc_upsert_is_idempotent_and_updates(spark, derby_url):
    """S6 upgrade: stage+MERGE upsert over the live wire. Retrying
    the same batch must not duplicate rows (the reference's quirk Q1
    doubled them); a changed batch must update matched keys in
    place."""
    from etl_covid19_spark.sources.jdbc import write_jdbc, write_jdbc_upsert

    target = "wire_upsert"
    base = spark.range(10).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    )
    # seed the target over plain JDBC (MERGE needs it to exist)
    write_jdbc(base, derby_url, target, mode="append", driver=DRIVER)

    batch = spark.range(5, 15).selectExpr(
        "id AS k", "CAST(id * 100 AS DOUBLE) AS v"
    )
    for _ in range(2):  # second run = the at-least-once retry
        write_jdbc_upsert(batch, derby_url, target, keys=["k"], driver=DRIVER)
        got = {
            r.k: r.v
            for r in read_jdbc(spark, url=derby_url, dbtable=target)
            .load()
            .collect()
        }
        assert len(got) == 15  # 0..14, no duplicates ever
        for k in range(5):
            assert got[k] == float(k)  # untouched rows keep old values
        for k in range(5, 15):
            assert got[k] == float(k * 100)  # matched rows updated


def test_jdbc_upsert_survives_leftover_staging(spark, derby_url):
    """A crashed previous run of the SAME batch leaves its staging
    table behind; the retry (same batch_id → same deterministic
    staging name) must clear it and land correctly — and a CONCURRENT
    batch with a different id must not see it at all."""
    from etl_covid19_spark.sources.jdbc import write_jdbc, write_jdbc_upsert

    target = "wire_upsert2"
    write_jdbc(
        spark.range(3).selectExpr("id AS k", "CAST(0 AS DOUBLE) AS v"),
        derby_url, target, mode="append", driver=DRIVER,
    )
    # simulate the crash: batch b7's staging exists with stale content
    write_jdbc(
        spark.range(99, 100).selectExpr("id AS k", "CAST(-1 AS DOUBLE) AS v"),
        derby_url, f"{target}_stg_b7", mode="append", driver=DRIVER,
    )
    # a different batch id is isolated from b7's leftover
    other = spark.range(2, 3).selectExpr("id AS k", "CAST(5 AS DOUBLE) AS v")
    write_jdbc_upsert(
        other, derby_url, target, keys=["k"], driver=DRIVER, batch_id="b8"
    )
    # the b7 retry clears its own leftover and merges only the batch
    batch = spark.range(3).selectExpr("id AS k", "CAST(7 AS DOUBLE) AS v")
    write_jdbc_upsert(
        batch, derby_url, target, keys=["k"], driver=DRIVER, batch_id="b7"
    )
    got = {
        r.k: r.v
        for r in read_jdbc(spark, url=derby_url, dbtable=target).load().collect()
    }
    assert got == {0: 7.0, 1: 7.0, 2: 7.0}  # stale staging row 99 is gone


def test_streaming_jdbc_upsert_replay_safe(spark, derby_url, tmp_path):
    """Streaming exactly-once to an external warehouse: run the same
    bounded stream TWICE (full replay, fresh checkpoint each time —
    the worst-case redelivery) into the MERGE sink; the target must
    hold each key exactly once with the final aggregate values."""
    from etl_covid19_spark.sources.catalog import events_stream
    from etl_covid19_spark.sources.jdbc import write_jdbc
    from etl_covid19_spark.streaming.sinks import jdbc_upsert_sink

    target = "wire_stream_counts"
    # seed an empty typed target (MERGE needs the table to exist)
    seed = spark.createDataFrame([], "user_id long, n_events long")
    write_jdbc(seed, derby_url, target, mode="append", driver=DRIVER)

    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    expected = {
        r.user_id: r.n
        for r in spark.read.parquet(f"{sf}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    for attempt in range(2):  # second run = total replay
        agg = (
            events_stream(spark, sf)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(jdbc_upsert_sink(derby_url, target, ["user_id"], DRIVER))
            .option("checkpointLocation", str(tmp_path / f"ckpt{attempt}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r.user_id: r.n_events
            for r in read_jdbc(spark, url=derby_url, dbtable=target)
            .load()
            .collect()
        }
        assert got == expected, f"attempt {attempt}"


def test_jdbc_equidepth_partitioned_read_balances_skew(spark, derby_url):
    """90% of rows live in 1% of the key range: Spark's equal-width
    lowerBound/upperBound slicing would put ~90% of the table in one
    partition; the histogram-probed equi-depth reader must spread it
    within 3x across partitions without losing a row."""
    from etl_covid19_spark.sources.jdbc import read_jdbc_equidepth

    dense = spark.range(9000).selectExpr("CAST(id % 100 AS INT) AS k")
    sparse = spark.range(1000).selectExpr("CAST(100 + id * 9 AS INT) AS k")
    write_jdbc(
        dense.unionAll(sparse), derby_url, "wire_skewed",
        mode="append", driver=DRIVER,
    )

    df = read_jdbc_equidepth(
        spark, derby_url, "wire_skewed", '"k"',
        num_partitions=4, driver=DRIVER,
    )
    sizes = df.rdd.glom().map(len).collect()
    assert len(sizes) == 4
    assert sum(sizes) == 10_000  # predicates partition, never drop
    assert max(sizes) <= 3 * max(min(sizes), 1), sizes

    # the equal-width baseline really is pathological on this table
    # (this is the straggler the equi-depth reader exists to kill)
    baseline = read_jdbc(
        spark, url=derby_url, dbtable="wire_skewed",
        partition_column='"k"', lower_bound=0, upper_bound=9092,
        num_partitions=4, driver=DRIVER,
    ).load()
    base_sizes = baseline.rdd.glom().map(len).collect()
    assert max(base_sizes) >= 9000  # ~90% lands in one stride


def test_jdbc_equidepth_degenerate_tables(spark, derby_url):
    """Single-value and empty tables fall back to one clean scan."""
    from etl_covid19_spark.sources.jdbc import read_jdbc_equidepth

    write_jdbc(
        spark.range(50).selectExpr("CAST(7 AS INT) AS k"),
        derby_url, "wire_const", mode="append", driver=DRIVER,
    )
    df = read_jdbc_equidepth(
        spark, derby_url, "wire_const", '"k"', num_partitions=4, driver=DRIVER
    )
    assert df.count() == 50
