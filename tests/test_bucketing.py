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


def test_gate_query_survives_stale_warehouse_location(spark):
    """Fresh-session rerun hazard (round 8): saveAsTable(overwrite)
    raises LOCATION_ALREADY_EXISTS when the managed table's
    warehouse directory survives from a previous PROCESS while the
    new session's in-memory catalog has no such table — exactly how
    the external gate runs queries. The registered query must clear
    the stale location itself. Simulated here by planting an
    unregistered directory at both table locations."""
    import os

    from etl_covid19_spark.queries import REGISTRY

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bkt_gate_customer", "bkt_gate_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")  # catalog forgets...
        loc = os.path.join(wh, t)
        os.makedirs(loc, exist_ok=True)  # ...but the location stays
        with open(os.path.join(loc, "stale-part.parquet"), "wb") as f:
            f.write(b"not a real parquet file")
    out = REGISTRY["bucketed_join_agg"].fn(spark, SF).collect()
    assert len(out) > 0
