"""Quality gates and star-schema kit unit tests."""

import pytest
from pyspark.sql import functions as F

from etl_covid19_spark.plans import quality, star
from etl_covid19_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_expect_count_tolerance_math(spark):
    df = spark.range(240)
    assert quality.expect_count(df, 240, 0.02) == 240
    assert quality.expect_count(df, 243, 0.02) == 240  # within 2%
    with pytest.raises(quality.QualityCheckError):
        quality.expect_count(df, 250, 0.02)


def test_expect_no_orphans(spark):
    fact = spark.createDataFrame([(1,), (2,)], "k int")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    quality.expect_no_orphans(fact, dim, on=["k"])
    with pytest.raises(quality.QualityCheckError):
        quality.expect_no_orphans(dim, fact, on=["k"])


def test_expect_predicate_and_failure_hook(spark):
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    quality.expect(df, F.col("v") % 2 == 0, "v must be even")
    seen = []
    with pytest.raises(quality.QualityCheckError):
        quality.guarded(
            df,
            [lambda d: quality.expect(d, F.col("v") < 10, "v < 10")],
            on_failure=lambda exc: seen.append(exc),
        )
    assert len(seen) == 1  # telegram-analog hook fired (S9)


def test_build_dimension_hash_key_deterministic(spark):
    cust = load_table(spark, "customer", SF)
    d1 = star.build_dimension(cust, ["c_mktsegment"], "k", use_hash_key=True)
    d2 = star.build_dimension(cust, ["c_mktsegment"], "k", use_hash_key=True)
    assert sorted(map(tuple, d1.collect())) == sorted(map(tuple, d2.collect()))
    assert d1.select("k").distinct().count() == d1.count()  # unique keys


def test_build_dimension_row_number_dense(spark):
    cust = load_table(spark, "customer", SF)
    dim = star.build_dimension(cust, ["c_mktsegment"], "k")
    keys = sorted(r.k for r in dim.collect())
    assert keys == list(range(1, len(keys) + 1))


def test_observed_write_gate_single_pass(spark, tmp_path):
    from etl_covid19_spark.plans.quality import QualityCheckError, observed_write

    df = spark.range(0, 240).selectExpr("id", "id * 2 AS v")
    out = str(tmp_path / "zone")
    n = observed_write(
        df, lambda d: d.write.mode("overwrite").parquet(out), pass_value=240
    )
    assert n == 240
    assert spark.read.parquet(out).count() == 240
    with pytest.raises(QualityCheckError):
        observed_write(
            df, lambda d: d.write.mode("overwrite").parquet(out), pass_value=500
        )
