"""SCD Type-2 collapse and gap-fill interpolation: semantic
invariants plus the shuffle-count guarantees the docstrings claim."""

import datetime as dt

from pyspark.sql import functions as F

from etl_covid19_spark.operators import timeseries as ts
from etl_covid19_spark.operators.scd import scd2_collapse

SF = "/root/testdata/sf0.001"


def _log(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0), 1, "a"),
        (1, dt.datetime(2024, 1, 1, 1), 2, "a"),  # same run
        (1, dt.datetime(2024, 1, 1, 2), 3, "b"),  # change
        (1, dt.datetime(2024, 1, 1, 3), 4, "a"),  # back again
        (2, dt.datetime(2024, 1, 1, 0), 5, "x"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, attr string"
    )


def test_scd2_runs_collapse_and_tile(spark):
    out = scd2_collapse(
        _log(spark), "user_id", ["ts", "event_id"], "attr"
    ).collect()
    u1 = sorted([r for r in out if r.user_id == 1], key=lambda r: r.version)
    assert [r.attr for r in u1] == ["a", "b", "a"]  # runs collapsed
    assert [r.version for r in u1] == [1, 2, 3]
    # intervals tile: each valid_to == next valid_from, half-open
    for a, b in zip(u1, u1[1:]):
        assert a.valid_to == b.valid_from
    assert [r.is_current for r in u1] == [False, False, True]
    u2 = [r for r in out if r.user_id == 2]
    assert len(u2) == 1 and u2[0].is_current and u2[0].valid_to is None


def test_scd2_exactly_one_current_per_entity(spark):
    from etl_covid19_spark.queries import REGISTRY

    out = REGISTRY["scd2_dimension"].fn(spark, SF)
    per = (
        out.groupBy("user_id")
        .agg(
            F.sum(F.col("is_current").cast("int")).alias("n_cur"),
            F.max("version").alias("vmax"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert all(r.n_cur == 1 for r in per)
    assert all(r.vmax == r.n for r in per)  # versions are 1..k dense


def test_scd2_single_exchange(spark):
    """Both window passes must share one (user_id) shuffle."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", "event_type", F.col("ts").alias("tsn"), "event_id"
    )
    out = scd2_collapse(ev, "user_id", ["tsn", "event_id"], "event_type")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_gap_fill_dense_and_bounded(spark):
    from etl_covid19_spark.queries import REGISTRY

    rows = REGISTRY["gap_fill_interpolate"].fn(spark, SF).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.event_type, []).append(r)
    for key, krows in by_key.items():
        krows.sort(key=lambda r: r.bucket_ts)
        # dense: exactly one row per hour in [lo, hi]
        span_h = (
            krows[-1].bucket_ts - krows[0].bucket_ts
        ).total_seconds() / 3600
        assert len(krows) == span_h + 1
        # no NULLs survive; filled values lie within neighbor bounds
        assert all(r.avg_value is not None for r in krows)
        for i, r in enumerate(krows):
            if not r.filled:
                continue
            known = [x.avg_value for x in krows if not x.filled]
            assert min(known) - 1e-9 <= r.avg_value <= max(known) + 1e-9


def test_interpolation_exact_midpoint(spark):
    df = spark.createDataFrame(
        [
            ("k", dt.datetime(2024, 1, 1, 0), 10.0),
            ("k", dt.datetime(2024, 1, 1, 1), None),
            ("k", dt.datetime(2024, 1, 1, 2), None),
            ("k", dt.datetime(2024, 1, 1, 3), 40.0),
        ],
        "event_type string, bucket_ts timestamp, avg_value double",
    )
    out = {
        r.bucket_ts.hour: r
        for r in ts.interpolate_gaps(df, "event_type").collect()
    }
    assert out[1].avg_value == 20.0 and out[1].filled
    assert out[2].avg_value == 30.0 and out[2].filled
    assert out[0].avg_value == 10.0 and not out[0].filled


def test_interpolation_edge_gaps_take_neighbor(spark):
    df = spark.createDataFrame(
        [
            ("k", dt.datetime(2024, 1, 1, 0), None),
            ("k", dt.datetime(2024, 1, 1, 1), 5.0),
            ("k", dt.datetime(2024, 1, 1, 2), None),
        ],
        "event_type string, bucket_ts timestamp, avg_value double",
    )
    out = {
        r.bucket_ts.hour: r.avg_value
        for r in ts.interpolate_gaps(df, "event_type").collect()
    }
    assert out == {0: 5.0, 1: 5.0, 2: 5.0}


def test_seasonal_residuals_sum_to_zero_per_profile_cell(spark):
    """The defining property of a mean baseline: residuals cancel
    within each (event_type, hour-of-day) cell."""
    from collections import defaultdict

    from etl_covid19_spark.queries import REGISTRY

    rows = REGISTRY["seasonal_baseline"].fn(spark, SF).collect()
    cells = defaultdict(list)
    for r in rows:
        cells[(r.event_type, r.bucket_ts.hour)].append(r)
    for (etype, hod), group in cells.items():
        assert abs(sum(x.residual for x in group)) < 1e-6, (etype, hod)
        # every row in a cell shares one baseline
        assert len({x.seasonal_mean for x in group}) == 1
