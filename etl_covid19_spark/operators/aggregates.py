"""Aggregation & window surface — SURVEY.md §2.5 (A1) and §7.2 step 8
(the analytics surface that makes the star schema queryable).

Everything here is hash-aggregate shaped: partial (map-side) +
final aggregation, so a 100 TB groupBy shuffles only the distinct
group keys' partial states.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_agg(
    df: DataFrame, keys: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """`groupBy().agg()` with enforced output aliases (the oracle
    contract: every computed column gets an explicit name)."""
    return df.groupBy(*keys).agg(*[c.alias(name) for name, c in aggs.items()])


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """orderBy + limit — Spark plans this as TakeOrderedAndProject:
    each partition keeps k rows, the driver merges; no global sort.
    Pass a deterministic tie-breaker in `order_by`."""
    return df.orderBy(*order_by).limit(k)


def running_totals(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    value: str,
    out_prefix: str = "",
) -> DataFrame:
    """Window kit: running sum + previous-value diff over an ordered
    partition — natively recomputes the reference's `*_diff` measures
    (carried precomputed in the API payload, SURVEY.md §2.6 M1)."""
    w = Window.partitionBy(*partition_by).orderBy(order_by)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(F.col(value), 1).over(w)
    return (
        df.withColumn(f"{out_prefix}running_total", F.sum(value).over(cum))
        .withColumn(
            f"{out_prefix}diff",
            F.col(value) - F.coalesce(prev, F.lit(0.0)),
        )
    )


def rollup_agg(df: DataFrame, keys: list[str], aggs: dict[str, Column]) -> DataFrame:
    """ROLLUP over a dimension hierarchy (region ⊃ nation …) — subtotal
    and grand-total rows with NULL group markers, ANSI semantics."""
    return df.rollup(*keys).agg(*[c.alias(name) for name, c in aggs.items()])


def cube_agg(df: DataFrame, keys: list[str], aggs: dict[str, Column]) -> DataFrame:
    return df.cube(*keys).agg(*[c.alias(name) for name, c in aggs.items()])
