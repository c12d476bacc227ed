"""Oracle type-fidelity invariant (round-7 judge ask #2).

DuckDB widens integer aggregates to HUGEINT (and exact arithmetic to
DECIMAL).  The driver's hasher fetches the oracle side through a
dtype-sensitive path where those render as floats ("10000.0"), while
the Spark side's bigint renders as "10000" — so an uncast SUM over an
integer column hash-fails the driver even when every value matches
row-for-row (round 6: json_try_parse, sequence_packing).  134 oracle
sites already carried the repo-conventional CAST(... AS BIGINT); this
test makes the convention an invariant: it lazily binds EVERY
registered oracle in DuckDB (plan-only, no execution — runs in
seconds) and asserts no HUGEINT/UHUGEINT/DECIMAL output column exists
unless the query is explicitly allow-listed as decimal-on-both-sides.

The complementary runtime check lives in tools/diffcheck.type_drift,
which the full differential applies per query with the actual Spark
schema in hand (catches int-vs-float splits in either direction too).
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
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


def test_every_query_is_bound(con):
    """Guard the guard: the invariant above only means something if
    it actually binds the whole registry."""
    oracles = entrymod.oracle_sql()
    assert len(oracles) >= 205
    for sql in oracles.values():
        con.sql(sql)  # any bind error fails loudly here
