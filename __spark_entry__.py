"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(`etl_covid19_spark.queries.REGISTRY`): every implemented operator
from SURVEY.md §2 is exposed as a (spark, sf_dir) callable plus a
DuckDB-runnable oracle SQL string.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_covid19_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the broadcast star
    join + revenue aggregation (SURVEY.md §2.4 JN2)."""
    return REGISTRY["star_join_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None
    }
