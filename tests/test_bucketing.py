"""Bucketed tables must join and aggregate WITHOUT shuffling."""

import pytest
from pyspark.sql import functions as F

from etl_covid19_spark.sources.bucketing import read_table, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(
        orders, "orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"]
    )
    write_bucketed(
        lineitem, "lineitem_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _executed_plan(df):
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    # disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li, o = read_table(spark, "lineitem_b"), read_table(spark, "orders_b")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_skips_shuffle(bucketed):
    spark = bucketed
    li = read_table(spark, "lineitem_b")
    out = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = _executed_plan(out)
    assert "Exchange" not in plan


def test_bucketed_join_matches_plain_join(bucketed):
    spark = bucketed
    li_b, o_b = read_table(spark, "lineitem_b"), read_table(spark, "orders_b")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    n_bucketed = li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey).count()
    n_plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert n_bucketed == n_plain > 0


def test_write_bucketed_survives_stale_warehouse_location(spark):
    """Fresh-session rerun hazard (round 8): saveAsTable(overwrite)
    raises LOCATION_ALREADY_EXISTS when the managed table's
    warehouse directory survives from a previous PROCESS while the
    new session's in-memory catalog has no such table. write_bucketed
    must clear the stale location itself. Simulated here by planting
    an unregistered directory at the table location."""
    import os

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    table = "stale_loc_regression"
    spark.sql(f"DROP TABLE IF EXISTS {table}")  # catalog forgets...
    loc = os.path.join(wh, table)
    os.makedirs(loc, exist_ok=True)  # ...but the location stays
    with open(os.path.join(loc, "stale-part.parquet"), "wb") as f:
        f.write(b"not a real parquet file")
    df = spark.read.parquet(f"{SF}/customer.parquet")
    try:
        write_bucketed(df, table, ["c_custkey"], 4)
        assert read_table(spark, table).count() == df.count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_gate_query_double_run_no_collision(spark):
    """Round-9 ask #5: the gate query's tables are namespaced per
    invocation, so two runs against the same warehouse never race on
    drop/rmtree/saveAsTable. Both runs must succeed, agree, and use
    disjoint table names (the first run's tables are still live —
    its returned DataFrame reads them lazily — when the second run
    writes its own)."""
    from etl_covid19_spark.queries import REGISTRY

    before = {t.name for t in spark.catalog.listTables()}
    df1 = REGISTRY["bucketed_join_agg"].fn(spark, SF)
    mid = {t.name for t in spark.catalog.listTables()}
    df2 = REGISTRY["bucketed_join_agg"].fn(spark, SF)
    after = {t.name for t in spark.catalog.listTables()}
    run1 = {t for t in mid - before if t.startswith("bkt_gate_")}
    run2 = {t for t in after - mid if t.startswith("bkt_gate_")}
    assert len(run1) == 2 and len(run2) == 2 and not (run1 & run2)
    rows1 = sorted(map(tuple, df1.collect()))
    rows2 = sorted(map(tuple, df2.collect()))
    assert rows1 == rows2 and len(rows1) > 0
