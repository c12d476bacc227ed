"""Star-schema build kit — SURVEY.md §2.7 M2-M6 and §7.2 step 5.

Reference semantics reproduced (and fixed where SURVEY.md §8 flags a
bug):
- dimension load `insert_region_dimension` has no DISTINCT and is
  "RUN ONCE!" (``postgres/pg_init_covid19.sql:132-140``, quirk Q6) —
  `build_dimension` dedups and derives a deterministic surrogate key.
- smart-key UPDATEs (``postgres/pg_init_covid19.sql:147-160``) become
  recompute-on-write column expressions + broadcast join.
- fact load `insert_in_fact_covid19`
  (``postgres/pg_init_covid19.sql:168-188``) becomes a filtered
  projection append.

Surrogate keys at scale (SURVEY.md §7.4): `row_number() OVER
(ORDER BY …)` is a single-partition sort — fine for small dims and
bit-stable for the oracle, so it's the default; `hash_key` is the
100 TB-safe alternative (deterministic, shuffle-free) when the
dimension itself is huge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_covid19_spark.functions import datetime_kit as dk
from etl_covid19_spark.operators.joins import enrich_with_key


def build_dimension(
    df: DataFrame,
    natural_keys: list[str],
    key_col: str,
    attrs: list[str] | None = None,
    use_hash_key: bool = False,
) -> DataFrame:
    """M6-fixed dimension builder: distinct natural keys + surrogate
    key. Ordered `row_number` by default (deterministic, dense);
    `xxhash64` of the natural key when the dim is too big to sort on
    one partition."""
    cols = natural_keys + [c for c in (attrs or []) if c not in natural_keys]
    distinct = df.select(*cols).dropDuplicates(natural_keys)
    if use_hash_key:
        key = F.xxhash64(*[F.col(c) for c in natural_keys])
    else:
        key = F.row_number().over(
            Window.orderBy(*[F.col(c) for c in natural_keys])
        ).cast("int")
    return distinct.select(key.alias(key_col), *cols)


def build_date_dimension(spark: SparkSession, start: str, end: str) -> DataFrame:
    """The reference's 36,890-row date dimension
    (``postgres/pg_init_covid19.sql:50-61,192-237``) from one
    `sequence()` + seven column expressions."""
    return dk.calendar_attributes(dk.date_range(spark, start, end))


def build_fact(
    clean: DataFrame,
    date_col: str,
    region_dim: DataFrame,
    region_on: str,
    measures: list[str],
) -> DataFrame:
    """M2+M3+M5 — fact build: smart date_key expression, broadcast
    surrogate-key enrichment, measure projection."""
    keyed = clean.withColumn("date_key", dk.date_key(date_col))
    keyed = enrich_with_key(keyed, region_dim, on=region_on, key_col="region_key")
    return keyed.select(*measures, "date_key", "region_key")
