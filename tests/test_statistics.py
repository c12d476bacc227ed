"""Statistics kit: exact-moment bivariate stats vs numpy ground truth,
partition-invariance of the moment sums, histogram completeness."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_covid19_spark.operators import aggregates as agg


@pytest.fixture(scope="module")
def xy_df(spark):
    rng = np.random.default_rng(7)
    x = np.round(rng.uniform(1, 50, 400), 2)
    y = np.round(x * 3.5 + rng.normal(0, 20, 400), 2)
    g = rng.integers(0, 3, 400)
    rows = [(int(gi), float(xi), float(yi)) for gi, xi, yi in zip(g, x, y)]
    df = spark.createDataFrame(rows, "g int, x double, y double")
    return df, x, y, g


def test_moments_match_numpy(spark, xy_df):
    df, x, y, g = xy_df
    m = {
        r["g"]: r
        for r in agg.exact_moments(df, ["g"], "x", "y").collect()
    }
    for gi in range(3):
        mask = g == gi
        r = m[gi]
        assert r["n"] == mask.sum()
        # inputs are 2-decimal values: per-row products are exact
        # doubles, decimal sums are exact -> must match numpy's
        # float128-free sums to double precision
        np.testing.assert_allclose(r["sx"], x[mask].sum(), rtol=1e-12)
        np.testing.assert_allclose(r["sxy"], (x[mask] * y[mask]).sum(), rtol=1e-12)


def test_derived_stats_match_numpy(spark, xy_df):
    df, x, y, g = xy_df
    m = agg.exact_moments(df, [], "x", "y").collect()[0]
    n, sx, sy = m["n"], m["sx"], m["sy"]
    sxx, syy, sxy = m["sxx"], m["syy"], m["sxy"]
    corr = (n * sxy - sx * sy) / (
        np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
    )
    np.testing.assert_allclose(corr, np.corrcoef(x, y)[0, 1], rtol=1e-9)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    np_slope, np_icept = np.polyfit(x, y, 1)
    np.testing.assert_allclose(slope, np_slope, rtol=1e-9)
    np.testing.assert_allclose((sy - slope * sx) / n, np_icept, rtol=1e-9)


def test_moments_partition_invariant(spark, xy_df):
    """The whole point of the decimal route: identical bits under any
    partitioning. Built-in corr() does NOT have this property."""
    df, *_ = xy_df
    a = agg.exact_moments(df.coalesce(1), ["g"], "x", "y").collect()
    b = agg.exact_moments(df.repartition(13, "x"), ["g"], "x", "y").collect()
    key = lambda r: r["g"]  # noqa: E731
    for ra, rb in zip(sorted(a, key=key), sorted(b, key=key)):
        assert ra.asDict() == rb.asDict()  # exact equality, not approx


def test_histogram_covers_all_rows(spark):
    from etl_covid19_spark.queries import REGISTRY

    out = REGISTRY["value_histogram"].fn(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assert sum(r["n_rows"] for r in rows) == ev.count()
    assert all(0 <= r["bucket"] <= 19 for r in rows)
    assert all(r["lo"] == r["bucket"] * 25.0 for r in rows)


def test_mode_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "a"), (1, "b"), (1, "a"), (1, "c")],
        "user_id long, event_type string",
    )
    counts = df.groupBy(
        (F.col("user_id") % 10).alias("cohort"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    from pyspark.sql import Window

    w = Window.partitionBy("cohort").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    top = (
        counts.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .collect()
    )
    # a and b tie at 2 -> alphabetical tiebreak must pick 'a'
    assert top[0]["event_type"] == "a"


def test_chi_square_matches_numpy(spark):
    from etl_covid19_spark.queries import REGISTRY

    row = REGISTRY["chi_square_independence"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    import numpy as np

    cells = (
        ev.groupBy((F.col("user_id") % 5).alias("c"), "event_type")
        .count()
        .collect()
    )
    cohorts = sorted({r.c for r in cells})
    types = sorted({r.event_type for r in cells})
    obs = np.zeros((len(cohorts), len(types)))
    for r in cells:
        obs[cohorts.index(r.c), types.index(r.event_type)] = r["count"]
    exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    chi2 = ((obs - exp) ** 2 / exp).sum()
    np.testing.assert_allclose(row.chi2, chi2, rtol=1e-9)
    assert row.dof == (len(cohorts) - 1) * (len(types) - 1)


def test_quantized_centroids_match_manual_mean(spark):
    from etl_covid19_spark.operators.similarity import embedding_quantize_int8
    from etl_covid19_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    out = {
        r.label: r for r in REGISTRY["quantized_centroids"].fn(spark, sf).collect()
    }
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    q = embedding_quantize_int8(emb, "embedding", "vec_id").join(
        emb.select("vec_id", "label"), "vec_id"
    )
    one_label = sorted(out)[0]
    rows = q.where(F.col("label") == one_label).collect()
    import numpy as np

    manual = np.array([r.q_embedding for r in rows], dtype=np.int64).mean(0)
    # centroid is the driver-sortable encoding: comma-joined exact
    # integer micro-means (floor(sum*1e6/count)) — decode and compare
    # at micro precision
    got = np.array(
        [int(x) for x in out[one_label].centroid.split(",")], dtype=np.int64
    )
    assert got.shape == manual.shape
    np.testing.assert_array_less(np.abs(got / 1e6 - manual), 1e-6 + 1e-12)
    assert out[one_label].n_vectors == len(rows)


def test_dataset_split_deterministic_and_proportional(spark):
    from etl_covid19_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    a = REGISTRY["dataset_split"].fn(spark, sf).collect()
    b = REGISTRY["dataset_split"].fn(spark, sf).collect()
    assert [(r.doc_id, r.split) for r in a] == [
        (r.doc_id, r.split) for r in b
    ]  # rerun-identical
    n = len(a)
    frac = {
        s: sum(1 for r in a if r.split == s) / n
        for s in ("train", "valid", "test")
    }
    assert 0.7 < frac["train"] < 0.9  # ~80/10/10 at small n
    assert 0.03 < frac["valid"] < 0.2
    assert 0.03 < frac["test"] < 0.2


def test_split_leakage_counts_are_consistent(spark):
    from etl_covid19_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    row = REGISTRY["split_leakage"].fn(spark, sf).collect()[0]
    assert row.leaking_groups <= row.dup_groups
    # every leaking group has >= 2 members by construction
    assert row.leaking_docs >= 2 * row.leaking_groups


def test_correlation_matrix_single_scan(spark):
    from etl_covid19_spark.queries import REGISTRY

    df = REGISTRY["correlation_matrix"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan  # one moments pass
    rows = {r.pair: r.corr for r in df.collect()}
    assert len(rows) == 3
    assert all(-1.0 <= v <= 1.0 for v in rows.values())


def test_equidepth_buckets_are_balanced_and_ordered(spark):
    from etl_covid19_spark.queries import REGISTRY

    rows = REGISTRY["equidepth_histogram"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 10
    counts = [r.n_rows for r in rows]
    assert max(counts) - min(counts) <= 1  # equal depth (±1 remainder)
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo  # buckets tile the sorted domain


def test_equidepth_approx_agrees_with_exact(spark):
    """The sketch-based scale twin must put bucket counts within the
    t-digest rank error of the exact ntile deciles."""
    from etl_covid19_spark.operators.timeseries import equidepth_bins_approx
    from etl_covid19_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    n = ev.count()
    approx = {
        r.bin: r.n_rows
        for r in equidepth_bins_approx(ev, "value", 10).collect()
    }
    exact = {
        r.tile - 1: r.n_rows
        for r in REGISTRY["equidepth_histogram"].fn(spark, sf).collect()
    }
    assert sum(approx.values()) == n  # every row lands in a bin
    tol = max(5, n // 100)  # generous rank-error budget at tiny n
    for b in exact:
        assert abs(approx.get(b, 0) - exact[b]) <= tol, b
    # bins tile the domain in order
    rows = sorted(
        equidepth_bins_approx(ev, "value", 10).collect(),
        key=lambda r: r.bin,
    )
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo


def test_portable_hll_accuracy_across_regimes(spark, tmp_path):
    """The portable HLL must be ACCURATE, not just deterministic:
    relative error within ~3x the theoretical 1.04/sqrt(m) in the
    HLL regime (n >> m), and sane in the linear-counting regime
    (n << m). Exact cross-engine parity is the differential
    oracle's job; this pins estimator quality."""
    import os

    from etl_covid19_spark.queries import REGISTRY

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    # two regimes in one events table: 'big' has 50k distinct users
    # (HLL path), 'small' has 200 (linear counting path)
    big = spark.range(50_000).selectExpr(
        "id AS user_id", "'big' AS event_type"
    )
    small = spark.range(200).selectExpr(
        "id AS user_id", "'small' AS event_type"
    )
    big.unionByName(small).write.parquet(f"{sf}/events.parquet")
    out = {
        r.event_type: r
        for r in REGISTRY["sketch_distinct_users_portable"]
        .fn(spark, sf)
        .collect()
    }
    m = 1024
    sigma = 1.04 / (m ** 0.5)  # ~3.25%
    big_err = abs(out["big"].hll_users - 50_000) / 50_000
    small_err = abs(out["small"].hll_users - 200) / 200
    assert big_err < 3 * sigma, f"HLL-regime error {big_err:.3f}"
    assert small_err < 0.15, f"linear-counting error {small_err:.3f}"
    assert out["big"].exact_users == 50_000


def test_weighted_sample_upsamples_tail_and_reproduces(spark, tmp_path):
    """alpha = 0.7 priority sampling must (a) upsample the tail
    source beyond its proportional share and (b) reproduce the
    IDENTICAL sample on re-run — the property that makes a resumed
    100 TB sampling job emit the same dataset."""
    import os

    from etl_covid19_spark.queries import REGISTRY

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    big = spark.range(9000).selectExpr(
        "id AS doc_id", "'common' AS source"
    )
    tail = spark.range(9000, 10_000).selectExpr(
        "id AS doc_id", "'rare' AS source"
    )
    big.unionByName(tail).write.parquet(f"{sf}/documents.parquet")
    fn = REGISTRY["weighted_corpus_sample"].fn
    rows = fn(spark, sf).collect()
    assert len(rows) == 200
    n_rare = sum(1 for r in rows if r.source == "rare")
    # proportional would give ~20; temperature-0.7 odds boost the
    # tail ~1.9x -> expect ~35. Accept a wide deterministic band.
    assert 25 <= n_rare <= 60, f"tail got {n_rare}/200"
    again = fn(spark, sf).collect()
    assert {(r.doc_id, r.source) for r in rows} == {
        (r.doc_id, r.source) for r in again
    }


def test_equidepth_approx_error_bound_above_compression_threshold(spark):
    """The sketch's contract in the APPROXIMATE regime (n > accuracy),
    where hash-exactness to the rank oracle ends by design — the sf1
    differential (DIFF_sf1.json) first crossed this line with the
    registered accuracy=100k against 1M events and recorded the
    expected sub-0.1%-rank divergence. Force the regime at test SF
    with a small accuracy and pin the Greenwald-Khanna guarantee
    instead: each cut's rank error ≤ n/accuracy, so each decile
    count sits within 2n/accuracy of n/10."""
    from etl_covid19_spark.operators.timeseries import equidepth_bins_approx

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    n = ev.count()
    accuracy = 500
    assert n > accuracy  # genuinely approximate here
    rows = equidepth_bins_approx(
        ev, "value", n_bins=10, accuracy=accuracy
    ).collect()
    assert sum(r.n_rows for r in rows) == n
    tol = 2 * n // accuracy + 1
    for r in rows:
        assert abs(r.n_rows - n / 10) <= tol, (r.bin, r.n_rows)
