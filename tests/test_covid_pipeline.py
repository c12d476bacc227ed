"""End-to-end tests of the re-hosted reference pipeline (SURVEY.md
§3, §5): raw JSON → clean → star schema → quality gate, on canned
reference-shaped payloads (FIXTURES.md §A1)."""

import pytest
from pyspark.sql import functions as F

from etl_covid19_spark.plans import covid
from etl_covid19_spark.plans.quality import QualityCheckError
from etl_covid19_spark.sources import rest
from etl_covid19_spark.sources.parquet_zone import read_zone, write_zone

DS = "2023-03-02"


@pytest.fixture(scope="module")
def clean_df(spark):
    staged = rest.extract(spark, DS)
    df = covid.clean(staged)
    df.cache().count()
    return df


def test_clean_row_count_matches_quality_rule(clean_df):
    # 5 countries x 48 provinces, pseudo-rows dropped → exactly 240
    # (the README.md:17 rule the reference asserts ±2%).
    assert covid.quality_gate(clean_df, DS) == 240


def test_pseudo_rows_dropped(clean_df):
    assert (
        clean_df.filter(
            F.col("region_name").isin(*covid.PSEUDO_REGIONS)
        ).count()
        == 0
    )


def test_clean_schema_is_canonical(clean_df):
    assert list(clean_df.columns) == list(covid.CLEAN_COLUMNS)
    types = dict(clean_df.dtypes)
    assert types["day_of_data"] == "date"
    assert types["fatality_rate"] == "double"
    # lat/long are double — reference quirk Q2 (Decimal(10,0)) fixed.
    assert types["lat"] == "double" and types["long"] == "double"


def test_quality_gate_raises_outside_tolerance(clean_df):
    with pytest.raises(QualityCheckError):
        covid.quality_gate(clean_df, DS, expected=300)


def test_star_schema_build(clean_df):
    out = covid.build_star(clean_df)
    dim, fact = out["region_dimension"], out["fact_covid19"]
    assert dim.count() == 240
    # surrogate keys dense 1..240, unique
    keys = [r.region_key for r in dim.select("region_key").collect()]
    assert sorted(keys) == list(range(1, 241))
    assert fact.count() == 240
    # every fact row resolved a region_key (JN1 enrichment complete)
    assert fact.filter(F.col("region_key").isNull()).count() == 0
    assert fact.filter(F.col("date_key") != 20230302).count() == 0


def test_idempotent_partition_overwrite(spark, clean_df, tmp_path):
    # Reference quirk Q1: blind appends duplicate data on retry.
    # write_zone(overwrite, dynamic) must make re-runs idempotent.
    zone = str(tmp_path / "clean_zone")
    df = clean_df.withColumn("ds", F.lit(DS))
    write_zone(df, zone)
    write_zone(df, zone)  # simulated orchestrator retry
    assert read_zone(spark, zone, ds=DS).count() == 240


def test_multi_day_partition_isolation(spark, tmp_path):
    zone = str(tmp_path / "multi_day")
    for ds in ("2023-03-02", "2023-03-03"):
        staged = rest.extract(spark, ds)
        df = covid.clean(staged).withColumn("ds", F.lit(ds))
        write_zone(df, zone)
    # overwriting day 2 again must not touch day 1
    staged = rest.extract(spark, "2023-03-03")
    write_zone(covid.clean(staged).withColumn("ds", F.lit("2023-03-03")), zone)
    assert read_zone(spark, zone).count() == 480
    assert read_zone(spark, zone, ds="2023-03-02").count() == 240
