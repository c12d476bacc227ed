"""Calendar / smart-date-key expressions — SURVEY.md §2.6 D1-D8.

The reference builds these with a 46-line PLpgSQL loop plus
CASE/concat string assembly (``postgres/pg_init_covid19.sql:147-154,
192-237``). Each becomes one Catalyst expression here; the date-range
generator is a single `sequence()` call, so the 36,890-row date
dimension is produced distributed, with no imperative loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def date_key(col: Column | str) -> Column:
    """D1 — smart yyyymmdd int key (replaces the CASE/concat/lpad
    dance at ``postgres/pg_init_covid19.sql:148-154``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd").cast("int")


def day_name(col: Column | str) -> Column:
    """D2 — full day-of-week name (`rtrim(to_char(d,'Day'))`,
    ``postgres/pg_init_covid19.sql:221``); locale-stable English."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "EEEE")


def iso_dow(col: Column | str) -> Column:
    """D3 — ISO day number 1=Mon..7=Sun (`extract(isodow ...)`,
    ``postgres/pg_init_covid19.sql:222``)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.weekday(c) + F.lit(1)).cast("int")


def last_day_in_week(col: Column | str) -> Column:
    """D4 — true on Sunday (``postgres/pg_init_covid19.sql:223-224``)."""
    return iso_dow(col) == F.lit(7)


def month_name(col: Column | str) -> Column:
    """D5 — full month name (``postgres/pg_init_covid19.sql:225``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "MMMM")


def month_number(col: Column | str) -> Column:
    """D6 — month 1..12 (``postgres/pg_init_covid19.sql:226``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.month(c)


def weekday_flag(col: Column | str) -> Column:
    """D7 — false on Sat/Sun (``postgres/pg_init_covid19.sql:227-229``)."""
    return iso_dow(col) <= F.lit(5)


def date_range(spark: SparkSession, start: str, end: str) -> DataFrame:
    """D8 — distributed date-range generator: one row per day in
    [start, end] (replaces the PLpgSQL WHILE loop,
    ``postgres/pg_init_covid19.sql:192-237``)."""
    return spark.sql(
        f"SELECT explode(sequence(DATE'{start}', DATE'{end}', INTERVAL 1 DAY)) AS full_date"
    )


def calendar_attributes(df: DataFrame, date_col: str = "full_date") -> DataFrame:
    """D1-D7 as one projection — the full date-dimension attribute set
    (target schema: ``postgres/pg_init_covid19.sql:50-61``)."""
    return df.select(
        date_key(date_col).alias("date_key"),
        F.col(date_col),
        day_name(date_col).alias("day_of_week"),
        iso_dow(date_col).alias("day_number_in_week"),
        last_day_in_week(date_col).alias("last_day_in_week_indicator"),
        month_name(date_col).alias("month_name"),
        month_number(date_col).alias("month_number_in_year"),
        weekday_flag(date_col).alias("weekday_flag"),
    )
