"""Seeded randomized differential tests: the new behavioral /
time-series operators vs straightforward pure-Python references on
generated inputs. Complements the hand-case tests — these catch the
edge the hand case didn't think of (duplicate timestamps, all-gap
series, single-event users) while staying at two Spark round-trips
per operator."""

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from etl_covid19_spark.operators import timeseries as ts
from etl_covid19_spark.operators.behavior import funnel_steps
from etl_covid19_spark.operators.scd import scd2_collapse

BASE = dt.datetime(2024, 1, 1)


def _random_log(seed, n_users=40, n_rows=400, with_nulls=False):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        u = int(rng.integers(1, n_users + 1))
        # coarse timestamps force duplicate (user, ts) pairs so the
        # tiebreak actually matters
        t = BASE + dt.timedelta(hours=int(rng.integers(0, 200)))
        if with_nulls and rng.random() < 0.2:
            e = None
        else:
            e = str(rng.choice(["a", "b", "c"]))
        rows.append((u, t, i, e))
    return rows


def _ref_scd2(rows):
    out = {}
    by_user = {}
    for u, t, k, e in rows:
        by_user.setdefault(u, []).append((t, k, e))
    for u, items in by_user.items():
        items.sort()
        runs = []
        for t, k, e in items:
            if not runs or runs[-1][0] != e:
                runs.append([e, t])
        intervals = []
        for i, (e, start) in enumerate(runs):
            end = runs[i + 1][1] if i + 1 < len(runs) else None
            intervals.append((e, start, end, i + 1, end is None))
        out[u] = intervals
    return out


def test_scd2_matches_python_reference(spark):
    # with_nulls exercises the eqNullSafe change detection: the pure-
    # Python `!=` reference is inherently None-safe (None != 'a' is
    # True, None != None is False), so an A→NULL→A history must come
    # back as three intervals from Spark too.
    for seed, nulls in ((0, False), (1, False), (4, True), (5, True)):
        rows = _random_log(seed, with_nulls=nulls)
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, attr string"
        )
        got = {}
        for r in scd2_collapse(
            df, "user_id", ["ts", "event_id"], "attr"
        ).collect():
            got.setdefault(r.user_id, []).append(
                (r.attr, r.valid_from, r.valid_to, r.version, r.is_current)
            )
        ref = _ref_scd2(rows)
        for u in ref:
            assert sorted(got[u], key=lambda x: x[3]) == ref[u], (seed, u)


def _ref_funnel(rows, steps):
    by_user = {}
    for u, t, k, e in rows:
        by_user.setdefault(u, []).append((t, k, e))
    counts = []
    for i in range(len(steps)):
        counts.append(0)
    for u, items in by_user.items():
        prev = None
        for i, step in enumerate(steps):
            cand = sorted(t for t, _, e in items if e == step)
            if i > 0:
                cand = [t for t in cand if prev is not None and t > prev]
            if not cand:
                break
            prev = cand[0]
            counts[i] += 1
    return counts


def test_funnel_matches_python_reference(spark):
    steps = ["a", "b", "c"]
    for seed in (2, 3):
        rows = _random_log(seed)
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, event_type string"
        )
        got = {
            r.step_idx: r.users
            for r in funnel_steps(df, steps).collect()
        }
        ref = _ref_funnel(rows, steps)
        assert [got[i + 1] for i in range(3)] == ref, seed


def test_interpolation_matches_numpy_reference(spark):
    rng = np.random.default_rng(11)
    hours = list(range(60))
    known = sorted(
        rng.choice(hours, size=18, replace=False).tolist()
    )
    vals = {h: float(np.round(rng.uniform(-5, 5), 3)) for h in known}
    rows = [
        ("k", BASE + dt.timedelta(hours=h), vals.get(h))
        for h in hours
    ]
    df = spark.createDataFrame(
        rows, "event_type string, bucket_ts timestamp, avg_value double"
    )
    out = {
        int((r.bucket_ts - BASE).total_seconds() // 3600): r.avg_value
        for r in ts.interpolate_gaps(df, "event_type").collect()
    }
    ref = np.interp(hours, known, [vals[h] for h in known])
    for h in hours:
        # np.interp clamps edges to the nearest known value — same
        # convention as interpolate_gaps
        assert abs(out[h] - ref[h]) < 1e-9, h
