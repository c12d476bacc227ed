"""Semi-structured (JSON) operator kit — SURVEY.md §2.2 J1-J6.

Reference semantics reproduced:
- J1 JSON path extraction  (`json_data -> 'data'`,
  ``spark_transform_data.py:24``; ``postgres/pg_init_covid19.sql:100``)
- J2 schema-bound parse    (``spark_transform_data.py:49``, schema :27-47)
- J3 typed record-set expansion (`jsonb_populate_recordset`,
  ``postgres/pg_init_covid19.sql:124``) = J2 + J4
- J4 array explode          (``spark_transform_data.py:51``)
- J5 recursive flatten w/ inference (`pd.json_normalize`,
  ``dags/ETL_covid19_pandas.py:70-71``)
- J6 nested field access    (``spark_transform_data.py:53-55``)

All JVM-side built-ins — no Python UDF anywhere, so the whole kit
stays inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def json_path(col: Column | str, path: str) -> Column:
    """J1 — extract a JSON sub-document as a string (`->` analog)."""
    return F.get_json_object(F.col(col) if isinstance(col, str) else col, path)


def parse_json(col: Column | str, schema: T.DataType, options: dict | None = None) -> Column:
    """J2 — schema-bound parse of a JSON string into typed structs."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, schema, options or {})


def explode_records(df: DataFrame, array_col: str, alias: str = "rec") -> DataFrame:
    """J3/J4 — one output row per array element, typed by the array's
    element struct (the `jsonb_populate_recordset` semantics)."""
    return df.withColumn(alias, F.explode(F.col(array_col))).drop(array_col)


def _leaf_paths(schema: T.StructType, prefix: str = "") -> list[str]:
    paths: list[str] = []
    for field in schema.fields:
        name = f"{prefix}{field.name}"
        if isinstance(field.dataType, T.StructType):
            paths.extend(_leaf_paths(field.dataType, prefix=f"{name}."))
        else:
            paths.append(name)
    return paths


def flatten(df: DataFrame, sep: str = ".") -> DataFrame:
    """J5 — generic recursive struct flattener: nested structs become
    dotted top-level columns, the `pd.json_normalize` semantics
    (``dags/ETL_covid19_pandas.py:71``) without driver-side
    materialization. Arrays are left intact (explode is a separate,
    cardinality-changing choice — J4)."""
    leaf = _leaf_paths(df.schema)
    return df.select([F.col(p).alias(p.replace(".", sep)) for p in leaf])


def select_nested(df: DataFrame, paths: dict[str, str]) -> DataFrame:
    """J6 — project nested fields by dotted path with target aliases:
    `select_nested(df, {'rec.region.province': 'region_name'})`."""
    return df.select([F.col(p).alias(a) for p, a in paths.items()])
