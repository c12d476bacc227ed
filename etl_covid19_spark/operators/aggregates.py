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


def grouping_sets_agg(
    df: DataFrame,
    sets: list[list[str]],
    keys: list[str],
    aggs: dict[str, str],
) -> DataFrame:
    """Explicit GROUPING SETS — the general form under rollup/cube.
    Goes through the SQL surface (Spark has no DataFrame literal for
    arbitrary sets; aggs are SQL expression strings); still one pass,
    one Expand + hash aggregate."""
    view = f"_gs_{abs(hash(tuple(keys))) % 10_000}"
    df.createOrReplaceTempView(view)
    sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
    agg_sql = ", ".join(f"{expr} AS {name}" for name, expr in aggs.items())
    return df.sparkSession.sql(
        f"SELECT {', '.join(keys)}, {agg_sql} FROM {view} "
        f"GROUP BY GROUPING SETS ({sets_sql})"
    )


def pivot_agg(
    df: DataFrame,
    key: str,
    pivot_col: str,
    pivot_values: list[str],
    agg: Column,
) -> DataFrame:
    """Pivot: one output column per (known) pivot value. Passing the
    value list explicitly matters at scale — without it Spark runs an
    extra distinct() job over 100 TB just to discover the columns."""
    return df.groupBy(key).pivot(pivot_col, pivot_values).agg(agg)


def exact_moments(
    df: DataFrame, keys: list[str], x: str, y: str
) -> DataFrame:
    """Bivariate moment sums (n, Σx, Σy, Σx², Σy², Σxy) accumulated in
    exact DECIMAL and emitted as DOUBLE.

    This is the scale-correct substrate for corr/covar/regr/stddev:
    the built-in `corr()`/`covar_samp()` accumulate doubles in
    partition order, so their low bits change with partitioning —
    unacceptable for a differential gate and a real reproducibility
    hazard on a 1000-executor job. Per-row products are exact doubles
    (inputs are small-magnitude), the decimal sums are exact and
    order-independent, and every downstream statistic becomes a pure
    double formula over identical operands on any engine. Still one
    map-side-combined hash aggregate — six partials per group key.
    """
    xc, yc = F.col(x), F.col(y)
    dec = "decimal(38,8)"

    def s(col: Column, name: str) -> Column:
        return F.sum(col.cast(dec)).cast("double").alias(name)

    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        s(xc, "sx"),
        s(yc, "sy"),
        s(xc * xc, "sxx"),
        s(yc * yc, "syy"),
        s(xc * yc, "sxy"),
    )


def percentiles(
    df: DataFrame,
    keys: list[str],
    value: str,
    probs: list[float],
    approx: bool = False,
) -> DataFrame:
    """Per-group quantiles. Exact `percentile` buffers each group's
    values for a true sorted-interpolation answer — right for bounded
    groups (dims, QA gates). At 100 TB-per-group use approx=True:
    t-digest sketches merge map-side and never materialize the group
    (bounded memory, rank error ≤ 1/accuracy)."""
    c = F.col(value).cast("double")
    parr = F.array(*[F.lit(p) for p in probs])
    q = (
        F.percentile_approx(c, parr, 10_000)
        if approx
        else F.percentile(c, parr)
    )
    out = df.groupBy(*keys).agg(q.alias("_q"))
    return out.select(
        *keys,
        *[
            F.col("_q").getItem(i).alias(f"p{int(p * 100):02d}")
            for i, p in enumerate(probs)
        ],
    )
