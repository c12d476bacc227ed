"""REST API source — SURVEY.md §2.1 S1.

The reference extracts one JSON document per (date, iso) with a
driver-side `requests` loop (``dags/ETL_covid19_pandas.py:26-55``).
Engine-side the fetch stays at the edge: fetch callables produce
(ds, iso, json) rows that land in the raw Parquet zone; everything
downstream is distributed.

Network access is not assumed in this environment, so the default
fetcher is a deterministic fake producing reference-shaped payloads
(FIXTURES.md §A1) — the plumbing (fan-out, staging schema, landing
write) is real.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

STAGING_SCHEMA = T.StructType(
    [
        T.StructField("ds", T.StringType()),
        T.StructField("iso_country", T.StringType()),
        T.StructField("json_data", T.StringType()),
    ]
)

ISO_COUNTRIES = ("CHN", "RUS", "USA", "IND", "BRA")  # O1 fan-out set

Fetcher = Callable[[str, str], str]


def fake_fetch(ds: str, iso: str, n_regions: int = 48) -> str:
    """Deterministic reference-shaped payload: `n_regions` provinces
    plus the Unknown/Recovered pseudo-rows the pipeline must drop.
    5 countries × 48 = 240 clean rows/day — the quality-gate number."""
    regions = []
    for i in range(n_regions):
        regions.append(
            {
                "date": ds,
                "confirmed": 1000 * i + len(iso),
                "confirmed_diff": 10 + i,
                "deaths": 20 * i,
                "deaths_diff": i % 5,
                "recovered": 800 * i,
                "recovered_diff": 8 + i,
                "active": 200 * i,
                "active_diff": 2 + i,
                "fatality_rate": round(0.02 * ((i % 7) + 1), 4),
                "last_update": f"{ds} 04:21:03",
                "region": {
                    "iso": iso,
                    "name": f"Country-{iso}",
                    "province": f"{iso}-province-{i:03d}",
                    "lat": 10.0 + i * 0.25,
                    "long": -40.0 + i * 0.5,
                    "cities": [f"{iso}-city-{i}-{j}" for j in range(2)],
                },
            }
        )
    for pseudo in ("Unknown", "Recovered"):
        regions.append(
            {
                "date": ds,
                "confirmed": 0,
                "region": {"iso": iso, "name": f"Country-{iso}", "province": pseudo},
            }
        )
    return json.dumps({"data": regions})


def extract(
    spark: SparkSession,
    ds: str,
    isos: Iterable[str] = ISO_COUNTRIES,
    fetch: Fetcher = fake_fetch,
) -> DataFrame:
    """O1 fan-out extract for one run date → staging DataFrame
    (raw zone shape, ``postgres/pg_init_covid19.sql:4-10``). The
    per-iso fetches are driver-side (tiny, I/O-bound, at the edge);
    rows immediately become a distributed DataFrame."""
    rows = [(ds, iso, fetch(ds, iso)) for iso in isos]
    return spark.createDataFrame(rows, STAGING_SCHEMA)
