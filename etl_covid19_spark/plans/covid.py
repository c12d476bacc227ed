"""The reference pipeline, re-hosted Spark-first — SURVEY.md §3.

All three reference flavors (pandas ``dags/ETL_covid19_pandas.py``,
spark-submit ``spark_transform_data.py``, PLpgSQL
``postgres/pg_init_covid19.sql``) compute the same thing:

  raw (ds, iso, json) → extract `$.data` → schema-bound parse →
  explode regions → project/rename 14 fields → drop
  Unknown/Recovered pseudo-rows → clean table → star schema →
  count ≈ expected ±2%

Here that is ONE lazy DataFrame program per stage; no JDBC hops, no
driver-side pandas, no stored procedures.

Schema notes (types from FIXTURES.md §A1 / the parse schema at
``spark_transform_data.py:27-47``), with the SURVEY §8 bug fixes:
- lat/long are DoubleType (reference's bare `DecimalType()` truncates
  to integer degrees — quirk Q2);
- `last_update` is TimestampType (reference keeps a string — §7.4);
- measures are LongType.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_covid19_spark.functions import json_kit
from etl_covid19_spark.operators.relational import drop_pseudo_rows
from etl_covid19_spark.plans.quality import expect_count
from etl_covid19_spark.plans.star import build_dimension, build_fact

REGION_SCHEMA = T.StructType(
    [
        T.StructField("iso", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("province", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("long", T.DoubleType()),
        T.StructField("cities", T.ArrayType(T.StringType())),
    ]
)

REPORT_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("date", T.DateType()),
            T.StructField("confirmed", T.LongType()),
            T.StructField("confirmed_diff", T.LongType()),
            T.StructField("deaths", T.LongType()),
            T.StructField("deaths_diff", T.LongType()),
            T.StructField("recovered", T.LongType()),
            T.StructField("recovered_diff", T.LongType()),
            T.StructField("active", T.LongType()),
            T.StructField("active_diff", T.LongType()),
            T.StructField("fatality_rate", T.DoubleType()),
            T.StructField("last_update", T.TimestampType()),
            T.StructField("region", REGION_SCHEMA),
        ]
    )
)

# The canonical clean-zone column set (covid19_table,
# ``postgres/pg_init_covid19.sql:15-33``; quirk Q9's name drift
# resolved to one schema).
CLEAN_COLUMNS = {
    "day_of_data": "rec.date",
    "active": "rec.active",
    "deaths": "rec.deaths",
    "confirmed": "rec.confirmed",
    "recovered": "rec.recovered",
    "active_diff": "rec.active_diff",
    "deaths_diff": "rec.deaths_diff",
    "confirmed_diff": "rec.confirmed_diff",
    "recovered_diff": "rec.recovered_diff",
    "fatality_rate": "rec.fatality_rate",
    "region_name": "rec.region.province",
    "country_name": "rec.region.name",
    "lat": "rec.region.lat",
    "long": "rec.region.long",
}

PSEUDO_REGIONS = ("Unknown", "Recovered")
EXPECTED_DAILY_ROWS = 240  # README.md:17 — the ±2% quality rule


def clean(staged: DataFrame, json_col: str = "json_data") -> DataFrame:
    """raw staging → clean zone. The whole `spark_transform_data.py`
    job as one plan: J1 path-extract, J2 typed parse, J4 explode,
    J6/P1/P4 nested projection, F1 pseudo-row filter. No manual
    `.repartition(2)` (reference R1): AQE sizes the shuffle."""
    parsed = staged.withColumn(
        "reports",
        json_kit.parse_json(
            json_kit.json_path(json_col, "$.data"), REPORT_SCHEMA
        ),
    )
    exploded = json_kit.explode_records(parsed, "reports", alias="rec")
    projected = exploded.select(
        *[F.col(src).alias(name) for name, src in CLEAN_COLUMNS.items()]
    )
    return drop_pseudo_rows(projected, "region_name", PSEUDO_REGIONS)


def build_star(clean_df: DataFrame) -> dict[str, DataFrame]:
    """clean zone → star schema (region dim M6-fixed, fact M5)."""
    region_dim = build_dimension(
        clean_df,
        natural_keys=["region_name"],
        key_col="region_key",
        attrs=["country_name", "lat", "long"],
    )
    fact = build_fact(
        clean_df,
        date_col="day_of_data",
        region_dim=region_dim,
        region_on="region_name",
        measures=[
            "day_of_data", "confirmed", "deaths", "recovered",
            "confirmed_diff", "deaths_diff", "recovered_diff",
            "active", "active_diff", "fatality_rate",
        ],
    )
    return {"region_dimension": region_dim, "fact_covid19": fact}


def quality_gate(clean_df: DataFrame, ds: str,
                 expected: int = EXPECTED_DAILY_ROWS,
                 tolerance: float = 0.02) -> int:
    """A1 — the reference's 240 ±2% daily row-count rule."""
    return expect_count(
        clean_df, expected, tolerance,
        predicate=F.col("day_of_data") == F.lit(ds).cast("date"),
    )
