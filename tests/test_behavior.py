"""Funnel / retention / rolling z-score: semantic invariants on
hand-built timelines plus monotonicity checks at fixture scale."""

import datetime as dt

from pyspark.sql import functions as F

from etl_covid19_spark.operators import timeseries as ts
from etl_covid19_spark.operators.behavior import cohort_retention, funnel_steps

SF = "/root/testdata/sf0.001"


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_strict_ordering(spark):
    t = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    ev = _ev(
        spark,
        [
            # u1 completes in order
            (1, t, "view"), (1, t + h, "click"), (1, t + 2 * h, "purchase"),
            # u2: purchase BEFORE click -> converts step2 only
            (2, t, "view"), (2, t + 2 * h, "click"), (2, t + h, "purchase"),
            # u3: click before view -> stalls at step1
            (3, t + h, "view"), (3, t, "click"),
            # u4 never views -> not in funnel at all
            (4, t, "click"), (4, t + h, "purchase"),
        ],
    )
    out = {r.step: r for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()}
    assert out["view"].users == 3
    assert out["click"].users == 2
    assert out["purchase"].users == 1
    assert out["view"].conv_from_prev is None
    assert out["click"].conv_from_prev == 2 / 3
    assert out["purchase"].conv_from_prev == 0.5


def test_funnel_counts_monotone_at_fixture_scale(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = sorted(
        funnel_steps(
            ev.select("user_id", F.col("ts"), "event_type"),
            ["view", "click", "purchase"],
        ).collect(),
        key=lambda r: r.step_idx,
    )
    assert out[0].users >= out[1].users >= out[2].users


def test_cohort_offset_zero_counts_every_user(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = cohort_retention(ev).collect()
    day0 = sum(r.users for r in out if r.day_offset == 0)
    assert day0 == ev.select("user_id").distinct().count()
    assert all(r.day_offset >= 0 for r in out)


def test_retention_never_exceeds_cohort_size(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = cohort_retention(ev).collect()
    size = {
        r.cohort_day: r.users for r in out if r.day_offset == 0
    }
    assert all(r.users <= size[r.cohort_day] for r in out)


def test_zscore_flags_obvious_spike(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("k", base + dt.timedelta(hours=i), 10.0 + (i % 3) * 0.1)
        for i in range(30)
    ]
    rows.append(("k", base + dt.timedelta(hours=30), 500.0))  # spike
    series = spark.createDataFrame(
        rows, "event_type string, bucket_ts timestamp, v double"
    )
    out = {r.bucket_ts: r for r in ts.rolling_zscore(series, "event_type").collect()}
    spike = out[base + dt.timedelta(hours=30)]
    assert spike.is_anomaly and spike.zscore > 100
    # steady rows are not anomalous; cold-start rows are NULL
    assert out[base].zscore is None  # no history
    steady = out[base + dt.timedelta(hours=20)]
    assert steady.zscore is not None and not steady.is_anomaly


def test_zscore_baseline_excludes_current_row(spark):
    """A single outlier must not soften its own score: with the row
    excluded from its baseline, a constant history gives std=0 ->
    NULL for the next row, not a diluted z."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("k", base + dt.timedelta(hours=i), 10.0) for i in range(15)
    ]
    rows.append(("k", base + dt.timedelta(hours=15), 99.0))
    series = spark.createDataFrame(
        rows, "event_type string, bucket_ts timestamp, v double"
    )
    out = {r.bucket_ts: r for r in ts.rolling_zscore(series, "event_type").collect()}
    # constant baseline -> std == 0 -> z undefined even for the spike
    assert out[base + dt.timedelta(hours=15)].zscore is None


def test_event_sequences_ordered_and_deterministic(spark):
    t = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            # same ts for events 2/3: event_id must break the tie
            (1, t + dt.timedelta(hours=1), 3, "purchase"),
            (1, t, 1, "view"),
            (1, t + dt.timedelta(hours=1), 2, "click"),
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    from etl_covid19_spark.operators.behavior import event_sequences

    out = event_sequences(ev).collect()
    assert out[0].seq == "vcp"
    # order of input rows must not matter
    out2 = event_sequences(ev.orderBy(F.rand(42))).collect()
    assert out2[0].seq == "vcp"


def test_transition_matrix_probs_sum_to_one(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    from etl_covid19_spark.operators.behavior import transition_matrix

    rows = transition_matrix(ev).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for from_type, group in by_from.items():
        assert abs(sum(r.prob for r in group) - 1.0) < 1e-9
        total = sum(r.n_transitions for r in group)
        for r in group:
            assert r.prob == r.n_transitions / total


def test_transition_counts_match_timeline_length(spark):
    """Σ transitions = Σ_users (len(timeline) - 1)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    from etl_covid19_spark.operators.behavior import transition_matrix

    n_trans = sum(
        r.n_transitions for r in transition_matrix(ev).collect()
    )
    per_user = ev.groupBy("user_id").count().collect()
    assert n_trans == sum(r["count"] - 1 for r in per_user)


def test_activity_streaks_hand_case(spark):
    d = dt.date
    rows = [
        # u1: 3-day streak, gap, 2-day streak -> longest 3 from Jan 1
        (1, d(2024, 1, 1)), (1, d(2024, 1, 2)), (1, d(2024, 1, 3)),
        (1, d(2024, 1, 10)), (1, d(2024, 1, 11)),
        # u2: two 2-day streaks tie -> earliest start wins
        (2, d(2024, 1, 5)), (2, d(2024, 1, 6)),
        (2, d(2024, 2, 1)), (2, d(2024, 2, 2)),
        # u3: single day
        (3, d(2024, 3, 3)),
    ]
    ev = spark.createDataFrame(
        [(u, dt.datetime.combine(day, dt.time(12))) for u, day in rows],
        "user_id long, ts timestamp",
    )
    from etl_covid19_spark.queries import REGISTRY  # reuse the plan shape

    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len"), F.min("d").alias("streak_start")
    )
    w_r = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), F.col("streak_start").asc()
    )
    out = {
        r.user_id: r
        for r in streaks.withColumn("rn", F.row_number().over(w_r))
        .where("rn = 1")
        .collect()
    }
    assert out[1].streak_len == 3 and out[1].streak_start == d(2024, 1, 1)
    assert out[2].streak_len == 2 and out[2].streak_start == d(2024, 1, 5)
    assert out[3].streak_len == 1


def _heavy_light(spark):
    """One bot key (150k events, 120k of them 'view' — OVER the 100k
    default cap) plus one normal key. JVM-generated, no driver rows."""
    heavy = spark.range(150_000).selectExpr(
        "CAST(1 AS LONG) AS user_id",
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts",
        "id AS event_id",
        "CASE WHEN id < 120000 THEN 'view' "
        "WHEN id < 135000 THEN 'click' ELSE 'purchase' END AS event_type",
        "CAST(1.0 AS DOUBLE) AS value",
    )
    light = spark.range(3).selectExpr(
        "CAST(2 AS LONG) AS user_id",
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*3600) AS ts",
        "id + 1000000 AS event_id",
        "CASE WHEN id = 0 THEN 'view' WHEN id = 1 THEN 'click' "
        "ELSE 'purchase' END AS event_type",
        "CAST(2.0 AS DOUBLE) AS value",
    )
    return heavy.unionAll(light)


def test_funnel_heavy_key_truncation_surfaced(spark):
    """Adversarial bot key: 120k 'view' events exceed the per-step
    cap; the funnel must still run with bounded aggregation state,
    count the bot once per converted step, and surface exactly one
    truncated user on the 'view' step."""
    ev = _heavy_light(spark)
    out = {
        r.step: r
        for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()
    }
    # both users convert every step (each has view < click < purchase)
    assert out["view"].users == 2
    assert out["click"].users == 2
    assert out["purchase"].users == 2
    assert out["view"].truncated_users == 1  # the bot, view step only
    assert out["click"].truncated_users == 0
    assert out["purchase"].truncated_users == 0


def test_funnel_cap_none_is_exact_and_unflagged(spark):
    ev = _heavy_light(spark)
    capped = {
        r.step: r.users
        for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()
    }
    exact = {
        r.step: r
        for r in funnel_steps(
            ev, ["view", "click", "purchase"], max_events_per_step=None
        ).collect()
    }
    # truncation kept the EARLIEST events, so conversions agree here
    assert {s: r.users for s, r in exact.items()} == capped
    assert all(r.truncated_users == 0 for r in exact.values())


def test_sequences_heavy_key_truncation_surfaced(spark):
    from etl_covid19_spark.operators.behavior import event_sequences

    ev = _heavy_light(spark)
    out = {r.user_id: r for r in event_sequences(ev).collect()}
    assert out[1].truncated
    assert len(out[1].seq) == 100_000  # first cap events only
    assert out[1].seq[:5] == "vvvvv"
    assert not out[2].truncated
    assert out[2].seq == "vcp"  # normal keys byte-identical to exact


def test_item_cooccurrence_heavy_user_capped(spark):
    """Adversarial skew: one bot user touching 10^4 distinct items.
    Uncapped, that single key alone would emit ~5*10^7 pairs from the
    self-join; the cap bounds its contribution to C(cap,2) and marks
    the truncation. Normal users' pairs are exact and unaffected."""
    from etl_covid19_spark.operators.behavior import item_cooccurrence

    bot = [(999, i) for i in range(10_000)]
    # 30 normal users all touching items {1, 2} -> pair (1,2) n_both>=30
    normal = [(u, i) for u in range(30) for i in (1, 2)]
    ui = spark.createDataFrame(bot + normal, "user_id long, item int")
    cap = 50
    out = item_cooccurrence(
        ui, min_support=1, max_items_per_user=cap
    ).collect()
    # bot contributes at most C(50,2) pairs, not C(10000,2)
    assert len(out) <= cap * (cap - 1) // 2 + 1
    assert all(r.truncated_users == 1 for r in out)
    pair = {(r.item_a, r.item_b): r for r in out}
    # the normal-user pair survives exactly: 31 users hold both 1 and 2
    # (30 normals + the bot, whose first 50 items include 1 and 2)
    assert pair[(1, 2)].n_both == 31
    # supports from the SAME capped incidence: items 1,2 held by 31 each
    assert pair[(1, 2)].jaccard == round(31 / (31 + 31 - 31), 6)


def test_item_cooccurrence_uncapped_matches_exact(spark):
    """With the cap disabled the operator is exact: brute-force the
    tiny incidence in Python and compare every pair."""
    from itertools import combinations

    from etl_covid19_spark.operators.behavior import item_cooccurrence

    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 20), (3, 30),
        (4, 10), (4, 30),
    ]
    ui = spark.createDataFrame(rows, "user_id long, item int")
    out = {
        (r.item_a, r.item_b): r.n_both
        for r in item_cooccurrence(
            ui, min_support=1, max_items_per_user=None
        ).collect()
    }
    holders = {}
    for u, i in rows:
        holders.setdefault(i, set()).add(u)
    expect = {}
    for a, b in combinations(sorted(holders), 2):
        n = len(holders[a] & holders[b])
        if n:
            expect[(a, b)] = n
    assert out == expect


def test_linear_attribution_splits_value_equally(spark, tmp_path):
    """Hand-built timeline: purchase credits split equally among the
    touches since the PREVIOUS purchase only — earlier segments'
    touches get nothing from later purchases."""
    import json as _json
    import os

    from etl_covid19_spark.queries import REGISTRY

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: touches on items 10, 20 -> purchase 6.0 (3.0 each);
        # then touch 30 -> purchase 5.0 (all to 30)
        (1, 1, t0 + 0 * m, "view", 0.0, _json.dumps({"k": 10})),
        (1, 2, t0 + 1 * m, "click", 0.0, _json.dumps({"k": 20})),
        (1, 3, t0 + 2 * m, "purchase", 6.0, _json.dumps({})),
        (1, 4, t0 + 3 * m, "view", 0.0, _json.dumps({"k": 30})),
        (1, 5, t0 + 4 * m, "purchase", 5.0, _json.dumps({})),
        # user 2: purchase with NO preceding touches -> unattributed
        (2, 6, t0, "purchase", 9.0, _json.dumps({})),
        # user 2: then one touch on 10 and a purchase 4.0
        (2, 7, t0 + 1 * m, "view", 0.0, _json.dumps({"k": 10})),
        (2, 8, t0 + 2 * m, "purchase", 4.0, _json.dumps({})),
    ]
    ev = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    ev.write.parquet(f"{sf}/events.parquet")
    out = {
        r.item: r
        for r in REGISTRY["attribution_linear"].fn(spark, sf).collect()
    }
    assert out[10].attributed_value == 3.0 + 4.0  # split + solo
    assert out[20].attributed_value == 3.0
    assert out[30].attributed_value == 5.0
    assert out[10].n_credited_touches == 2
    # attributed total = 24.0 of purchases minus the 9.0
    # zero-touch purchase, which credits nobody
    assert sum(r.attributed_value for r in out.values()) == 15.0
