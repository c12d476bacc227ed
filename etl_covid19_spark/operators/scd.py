"""Slowly-changing-dimension history builder (§2.7 extension).

The reference's dimension load (`dags/ETL_covid19_SQL.py` dimension
inserts) is SCD Type 1: latest value wins, history lost. Real
warehouses track attribute history as Type 2 — one row per
[valid_from, valid_to) interval. This module derives a Type-2
dimension from an append-only change log in two window passes over
ONE shuffle: both windows share the same (entity, order) partitioning,
so Catalyst plans a single Exchange + Sort and pipelines the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_collapse(
    log: DataFrame,
    entity: str,
    order_by: list[str | Column],
    attr: str,
) -> DataFrame:
    """Collapse an ordered change log into SCD Type-2 intervals.

    `log` rows are (entity, ordering columns, attribute). Consecutive
    rows with the SAME attribute value collapse into one interval;
    each value-change opens a new one. Change detection is NULL-safe
    (`eqNullSafe`): an A→NULL→A history yields three intervals with
    the NULL period preserved, and NULL→NULL is not a change.
    `order_by` must be a TOTAL order within each entity (pass a
    unique tiebreaker — e.g. `[ts, event_id]`) or run boundaries are
    nondeterministic.

    Returns (entity, attr, valid_from, valid_to, version,
    is_current): `valid_to` is the next interval's start (half-open
    convention, NULL on the current row), `version` numbers the
    intervals 1..k per entity.

    Scale: everything happens inside per-entity windows — the shuffle
    key is the entity id, state per partition is one entity's rows.
    A billion-entity log shuffles once and parallelizes per entity;
    nothing is collected or cross-entity.
    """
    w = Window.partitionBy(entity).orderBy(*order_by)
    first_ord = order_by[0]
    ts_col = F.col(first_ord) if isinstance(first_ord, str) else first_ord
    # row_number (not `_prev IS NULL`) marks each entity's first row:
    # lag() yields NULL both out-of-range AND for a genuine NULL prev
    # value, so `_prev IS NULL` alone can't distinguish "first row"
    # from "previous attribute was NULL". eqNullSafe keeps NULL-valued
    # intervals in the history instead of silently dropping them.
    changed = (
        log.withColumn("_rn", F.row_number().over(w))
        .withColumn("_prev", F.lag(F.col(attr)).over(w))
        .where(
            (F.col("_rn") == 1)
            | ~F.col("_prev").eqNullSafe(F.col(attr))
        )
        .drop("_prev", "_rn")
    )
    # the filtered frame reuses the same partitioning: no 2nd Exchange
    w2 = Window.partitionBy(entity).orderBy(*order_by)
    return changed.select(
        F.col(entity),
        F.col(attr),
        ts_col.alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )
