"""Scalar / semi-structured function kits (SURVEY.md §2.2, §2.6)."""

from etl_covid19_spark.functions import datetime_kit, json_kit, text, vectors

__all__ = ["datetime_kit", "json_kit", "text", "vectors"]
