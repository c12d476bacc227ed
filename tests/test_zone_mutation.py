"""Row-level mutation on immutable parquet zones (DELETE / MERGE as
partition rewrites) — the engine-native answer to the reference's
SQL-flavor DELETE (``dags/ETL_covid19_SQL.py:96-97``) and key-matched
UPDATE, without a mutable table format.

The scale contract tested here: only partitions containing affected
rows are rewritten — untouched partitions keep their exact files.
"""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_covid19_spark.sources.parquet_zone import (
    delete_where,
    merge_upsert,
    read_zone,
    write_zone,
)


def _files(path: str, ds: str) -> set[str]:
    d = os.path.join(path, f"ds={ds}")
    return {
        f"{f}:{os.path.getmtime(os.path.join(d, f))}"
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }


@pytest.fixture()
def zone(spark, tmp_path):
    path = str(tmp_path / "zone")
    rows = [
        Row(ds="2023-01-01", region="Hubei", confirmed=10),
        Row(ds="2023-01-01", region="Unknown", confirmed=1),
        Row(ds="2023-01-02", region="Hubei", confirmed=20),
        Row(ds="2023-01-02", region="Recovered", confirmed=2),
        Row(ds="2023-01-03", region="Hubei", confirmed=30),
    ]
    write_zone(spark.createDataFrame(rows), path)
    return path


def test_delete_where_rewrites_only_affected_partitions(spark, zone):
    untouched_before = _files(zone, "2023-01-03")
    n = delete_where(
        spark, zone, F.col("region").isin("Unknown", "Recovered")
    )
    assert n == 2
    left = {
        (str(r.ds), r.region) for r in read_zone(spark, zone).collect()
    }
    assert left == {
        ("2023-01-01", "Hubei"),
        ("2023-01-02", "Hubei"),
        ("2023-01-03", "Hubei"),
    }
    # the partition with no matches kept its exact files (name+mtime)
    assert _files(zone, "2023-01-03") == untouched_before


def test_delete_where_no_matches_is_noop(spark, zone):
    before = {ds: _files(zone, ds) for ds in
              ("2023-01-01", "2023-01-02", "2023-01-03")}
    assert delete_where(spark, zone, F.col("region") == "Nowhere") == 0
    after = {ds: _files(zone, ds) for ds in
             ("2023-01-01", "2023-01-02", "2023-01-03")}
    assert after == before


def test_merge_upsert_updates_and_inserts(spark, zone):
    untouched_before = _files(zone, "2023-01-03")
    updates = spark.createDataFrame(
        [
            # WHEN MATCHED: replaces the existing (ds, region) row
            Row(ds="2023-01-01", region="Hubei", confirmed=11),
            # WHEN NOT MATCHED: inserted
            Row(ds="2023-01-01", region="Beijing", confirmed=5),
        ]
    )
    merge_upsert(spark, zone, updates, keys=["ds", "region"])
    got = {
        (str(r.ds), r.region): r.confirmed
        for r in read_zone(spark, zone).collect()
    }
    assert got == {
        ("2023-01-01", "Hubei"): 11,
        ("2023-01-01", "Beijing"): 5,
        ("2023-01-01", "Unknown"): 1,
        ("2023-01-02", "Hubei"): 20,
        ("2023-01-02", "Recovered"): 2,
        ("2023-01-03", "Hubei"): 30,
    }
    # partitions absent from the updates were not rewritten
    assert _files(zone, "2023-01-03") == untouched_before


def test_merge_upsert_is_idempotent(spark, zone):
    updates = spark.createDataFrame(
        [Row(ds="2023-01-02", region="Hubei", confirmed=99)]
    )
    merge_upsert(spark, zone, updates, keys=["ds", "region"])
    merge_upsert(spark, zone, updates, keys=["ds", "region"])
    got = read_zone(spark, zone, ds="2023-01-02").collect()
    assert {(r.region, r.confirmed) for r in got} == {
        ("Hubei", 99),
        ("Recovered", 2),
    }


def test_refresh_daily_rollup_matches_full_recompute(spark, tmp_path):
    """The incrementally-maintained rollup must equal a from-scratch
    aggregation of the whole fact zone — including after a day's
    facts are rewritten and its rollup slice refreshed again."""
    from etl_covid19_spark.plans.rollup import refresh_daily_rollup

    fact_path = str(tmp_path / "fact")
    rollup_path = str(tmp_path / "rollup")
    days = {
        "2023-01-01": [("Hubei", 10), ("Beijing", 4)],
        "2023-01-02": [("Hubei", 20), ("Beijing", 6), ("Hubei", 1)],
        "2023-01-03": [("Hubei", 30)],
    }
    for ds, rows in days.items():
        write_zone(
            spark.createDataFrame(
                [Row(ds=ds, region=r, confirmed=c) for r, c in rows]
            ),
            fact_path,
        )
        refresh_daily_rollup(
            spark, fact_path, rollup_path, ds,
            group_cols=["region"],
            aggs={
                "total_confirmed": F.sum("confirmed"),
                "n_rows": F.count(F.lit(1)),
            },
        )

    def full_recompute():
        return {
            (str(r.ds), r.region): (r.total_confirmed, r.n_rows)
            for r in spark.read.parquet(fact_path)
            .groupBy("ds", "region")
            .agg(
                F.sum("confirmed").alias("total_confirmed"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .collect()
        }

    def rollup_state():
        return {
            (str(r.ds), r.region): (r.total_confirmed, r.n_rows)
            for r in spark.read.parquet(rollup_path).collect()
        }

    assert rollup_state() == full_recompute()

    # rewrite one day's facts (late-arriving correction), refresh:
    # the rollup's old slice must be REPLACED, not incremented
    write_zone(
        spark.createDataFrame(
            [Row(ds="2023-01-02", region="Hubei", confirmed=99)]
        ),
        fact_path,
    )
    refresh_daily_rollup(
        spark, fact_path, rollup_path, "2023-01-02",
        group_cols=["region"],
        aggs={
            "total_confirmed": F.sum("confirmed"),
            "n_rows": F.count(F.lit(1)),
        },
    )
    assert rollup_state() == full_recompute()


def test_read_zone_merge_schema_handles_additive_evolution(spark, tmp_path):
    """A zone whose later days gained a column must read as the union
    schema with old days null-filled when merge_schema is requested."""
    path = str(tmp_path / "evolving")
    write_zone(
        spark.createDataFrame([Row(ds="2023-01-01", region="Hubei",
                                   confirmed=10)]),
        path,
    )
    write_zone(
        spark.createDataFrame([Row(ds="2023-01-02", region="Hubei",
                                   confirmed=20, vaccinated=5)]),
        path,
    )
    merged = read_zone(spark, path, merge_schema=True)
    assert "vaccinated" in merged.columns
    rows = {str(r.ds): r.vaccinated for r in merged.collect()}
    assert rows == {"2023-01-01": None, "2023-01-02": 5}
