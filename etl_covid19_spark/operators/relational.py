"""Projection / filter / row operators — SURVEY.md §2.3 P1-P4, F1-F4,
U1, plus dedup and set ops (§2.10).

Each helper reproduces a reference behavior declaratively so Catalyst
keeps pushdown/pruning; none of them materializes anything.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, columns: dict[str, str | Column]) -> DataFrame:
    """P1/P4 — projection with renames: {target_name: source col/path}.
    (Reference: 14-path nested select + renames,
    ``spark_transform_data.py:53-58``.)"""
    return df.select(
        *[
            (F.col(src) if isinstance(src, str) else src).alias(name)
            for name, src in columns.items()
        ]
    )


def reindex(df: DataFrame, target_fields: list[str]) -> DataFrame:
    """P3 — fix column order to a target list; missing columns become
    typed NULLs (`total_df.reindex(columns=...)`,
    ``dags/ETL_covid19_pandas.py:80-85``)."""
    present = set(df.columns)
    return df.select(
        *[
            F.col(c) if c in present else F.lit(None).alias(c)
            for c in target_fields
        ]
    )


def drop_pseudo_rows(df: DataFrame, col: str, values: tuple[str, ...]) -> DataFrame:
    """F1/F2/F3 — the `province NOT IN ('Unknown','Recovered')`
    anti-filter, shared by all three reference flavors
    (``spark_transform_data.py:57``; ``dags/ETL_covid19_SQL.py:96-97``).
    Filter-before-write replaces the SQL flavor's post-insert DELETE."""
    return df.filter(~F.col(col).isin(*values))


def union_all(*dfs: DataFrame) -> DataFrame:
    """U1 — n-way union by column name (`pd.concat` loop,
    ``dags/ETL_covid19_pandas.py:68-72``), one plan node per input —
    no driver-side materialization."""
    return reduce(lambda a, b: a.unionByName(b), dfs)


def dedup(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Exact dedup (hash aggregate under the hood). Map-side partial
    aggregation makes this shuffle only distinct keys at scale."""
    return df.dropDuplicates(keys) if keys else df.dropDuplicates()
