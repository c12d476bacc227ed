"""Unit tests for the advanced join and OLAP operators."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_covid19_spark.operators import aggregates as agg
from etl_covid19_spark.operators import joins as J


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            Row(sym="A", qts=ts("2024-01-01 09:00:00"), bid=10.0),
            Row(sym="A", qts=ts("2024-01-01 09:05:00"), bid=11.0),
            Row(sym="B", qts=ts("2024-01-01 09:02:00"), bid=20.0),
        ]
    )
    trades = spark.createDataFrame(
        [
            Row(sym="A", tts=ts("2024-01-01 09:03:00"), qty=5),   # after 09:00 quote
            Row(sym="A", tts=ts("2024-01-01 09:05:00"), qty=7),   # ties 09:05 quote
            Row(sym="B", tts=ts("2024-01-01 09:01:00"), qty=9),   # before any B quote
        ]
    )
    return quotes, trades


def test_asof_join_picks_latest_at_or_before(quotes_trades):
    quotes, trades = quotes_trades
    out = J.asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
        right_cols=["qts", "bid"], how="inner",
    )
    rows = {(r.sym, r.qty): r.asof_bid for r in out.collect()}
    assert rows == {("A", 5): 10.0, ("A", 7): 11.0}  # B trade has no prior quote


def test_asof_join_left_keeps_unmatched(quotes_trades):
    quotes, trades = quotes_trades
    out = J.asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
        right_cols=["bid"], how="left",
    )
    rows = {(r.sym, r.qty): r.asof_bid for r in out.collect()}
    assert rows[("B", 9)] is None and len(rows) == 3


def test_range_join_inclusive_bounds(spark):
    left = spark.createDataFrame(
        [Row(k=1, lts=ts("2024-01-01 00:00:00"))]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rts=ts("2024-01-01 00:00:00")),  # == lower bound
            Row(k=1, rts=ts("2024-01-01 00:05:00")),  # == upper bound
            Row(k=1, rts=ts("2024-01-01 00:05:01")),  # beyond
            Row(k=2, rts=ts("2024-01-01 00:01:00")),  # other key
        ]
    )
    out = J.range_join(left, right, ["k"], "lts", "rts", 0, 300)
    assert sorted(r.rts for r in out.collect()) == [
        ts("2024-01-01 00:00:00"), ts("2024-01-01 00:05:00")
    ]


def test_range_join_crosses_bin_boundary(spark):
    # window straddles two 300 s bins → right row lands in the second
    left = spark.createDataFrame([Row(k=1, lts=ts("2024-01-01 00:04:00"))])
    right = spark.createDataFrame([Row(k=1, rts=ts("2024-01-01 00:08:00"))])
    out = J.range_join(left, right, ["k"], "lts", "rts", 0, 300)
    assert out.count() == 1


def test_salted_join_matches_plain_join(spark):
    left = spark.range(0, 1000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    right = spark.createDataFrame(
        [Row(k=0, label="zero"), Row(k=1, label="one"), Row(k=2, label="two")]
    )
    plain = left.join(right, "k").groupBy("label").count()
    salted = (
        J.salted_join(left, right, on=["k"], n_salts=4)
        .groupBy("label").count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_grouping_sets_matches_unioned_groupbys(spark):
    df = spark.createDataFrame(
        [Row(a="x", b="p", v=1), Row(a="x", b="q", v=2), Row(a="y", b="p", v=4)]
    )
    out = agg.grouping_sets_agg(
        df, sets=[["a"], ["b"]], keys=["a", "b"],
        aggs={"total": "SUM(v)"},
    )
    got = {(r.a, r.b): r.total for r in out.collect()}
    assert got == {
        ("x", None): 3, ("y", None): 4, (None, "p"): 5, (None, "q"): 2,
    }


def test_pivot_agg_explicit_values(spark):
    df = spark.createDataFrame(
        [Row(k="r1", c="A", v=1), Row(k="r1", c="B", v=2), Row(k="r2", c="A", v=5)]
    )
    out = agg.pivot_agg(df, "k", "c", ["A", "B"], F.sum("v"))
    got = {r.k: (r.A, r.B) for r in out.collect()}
    assert got == {"r1": (1, 2), "r2": (5, None)}


def test_percentiles_exact_interpolation(spark):
    df = spark.createDataFrame([Row(g="a", v=float(x)) for x in range(1, 5)])
    out = agg.percentiles(df, ["g"], "v", [0.5]).collect()[0]
    assert out.p50 == pytest.approx(2.5)


def test_percentiles_approx_close(spark):
    df = spark.range(0, 10_000).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    exact = agg.percentiles(df, ["g"], "v", [0.9]).collect()[0].p90
    approx = agg.percentiles(df, ["g"], "v", [0.9], approx=True).collect()[0].p90
    assert abs(approx - exact) / exact < 0.01


def test_hll_sketch_close_to_exact(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from pyspark.sql import functions as F2
    got = (
        ev.groupBy("event_type")
        .agg(
            F2.hll_sketch_estimate(
                F2.hll_sketch_agg(F2.col("user_id"), F2.lit(14))
            ).alias("approx"),
            F2.count_distinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert got and all(abs(r.approx - r.exact) / r.exact < 0.02 for r in got)


def test_hll_sketches_merge_across_slices(spark):
    """Sketches built on disjoint slices must merge to the whole —
    the property that lets 100 TB jobs pre-aggregate per partition."""
    from pyspark.sql import functions as F2

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    whole = ev.agg(
        F2.hll_sketch_estimate(F2.hll_sketch_agg("user_id", F2.lit(14)))
    ).collect()[0][0]
    halves = (
        ev.withColumn("half", (F2.col("event_id") % 2))
        .groupBy("half")
        .agg(F2.hll_sketch_agg("user_id", F2.lit(14)).alias("sk"))
    )
    merged = halves.agg(
        F2.hll_sketch_estimate(F2.hll_union_agg("sk"))
    ).collect()[0][0]
    assert merged == whole
