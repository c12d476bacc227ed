"""Oracle output-shape invariants (round-6/7 judge asks).

Two canonicalizer dimensions the driver enforces that plain value
comparison cannot see:

1. Numeric hash families (round 6): DuckDB widens integer aggregates
   to HUGEINT (and exact arithmetic to DECIMAL).  The driver's hasher
   fetches the oracle side through a dtype-sensitive path where those
   render as floats ("10000.0"), while the Spark side's bigint renders
   as "10000" — so an uncast SUM over an integer column hash-fails the
   driver even when every value matches row-for-row (round 6:
   json_try_parse, sequence_packing).

2. Structural types (round 7): the driver's pandas-based row sort
   (`sort_values` over every result column) cannot factorize
   list/struct/map/binary cells — `TypeError: unhashable type` before
   any compare happens (round 7: array_kit).  Every array-valued
   result must leave a registry query as a scalar encoding
   (array_join / array_to_string — the map_kit pattern).

This test lazily binds EVERY registered oracle in DuckDB (plan-only,
no execution — runs in seconds) and asserts no forbidden output type
exists on the oracle side.  The complementary runtime checks live in
tools/diffcheck (`type_drift`, `unsortable_columns`,
`driver_canon_error`), which the full differential applies per query
with the actual Spark schema and rows in hand.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from etl_covid19_spark.queries import REGISTRY
from tools.diffcheck import _is_structural

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# Queries whose Spark side genuinely returns DecimalType, making a
# DuckDB DECIMAL output the *correct* mirror.  Empty today: the test
# datasets carry doubles, so every exact-numeric oracle output is a
# cast-site bug, not a feature.
DECIMAL_ALLOWLIST: frozenset[str] = frozenset()

FORBIDDEN = {"hugeint", "uhugeint", "int128", "decimal", "numeric"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_uncast_integer_aggregates(con):
    violations = []
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)  # binds and plans only; nothing executes
        for col, dtype in zip(rel.columns, rel.types):
            base = str(dtype).lower().split("(")[0].strip()
            if base in FORBIDDEN and name not in DECIMAL_ALLOWLIST:
                violations.append((name, col, str(dtype)))
    assert not violations, (
        "driver-hash-unsafe oracle output types (add CAST(... AS "
        f"BIGINT) at each site): {violations}"
    )


def test_no_structural_output_columns(con):
    """No oracle may emit LIST/STRUCT/MAP/BLOB output columns — the
    driver's pandas canonicalizer throws on them (round-7 array_kit).
    Encode arrays as array_to_string scalars instead."""
    violations = []
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)
        for col, dtype in zip(rel.columns, rel.types):
            if _is_structural(str(dtype)):
                violations.append((name, col, str(dtype)))
    assert not violations, (
        "driver-unsortable structural oracle output columns (encode "
        f"with array_to_string — map_kit pattern): {violations}"
    )


def test_every_query_is_bound(con):
    """Guard the guard: the invariants above only mean something if
    they actually bind the whole registry.  Coupled to the live
    registry, not a magic count: every registered query that declares
    an oracle must bind."""
    oracles = entrymod.oracle_sql()
    declared = {n for n, q in REGISTRY.items() if q.oracle is not None}
    assert set(oracles) == declared
    assert len(oracles) >= 0.9 * len(REGISTRY)  # rows-only stays rare
    for sql in oracles.values():
        con.sql(sql)  # any bind error fails loudly here
