"""Docs-vs-registry consistency: the README/COVERAGE headline counts
(total queries, oracle-checked, rows-only) must match the live
registry, so a registry change that forgets the docs fails CI instead
of shipping stale claims (the round-3 verdict's one documentation
finding). Pure-Python — no SparkSession needed."""

import re

from etl_covid19_spark.queries import REGISTRY

TOTAL = len(REGISTRY)
WITH_ORACLE = sum(1 for q in REGISTRY.values() if q.oracle is not None)
ROWS_ONLY = TOTAL - WITH_ORACLE


def test_registry_shape_is_what_round4_claims():
    assert TOTAL == WITH_ORACLE + ROWS_ONLY
    rows_only = sorted(n for n, q in REGISTRY.items() if q.oracle is None)
    assert rows_only == [
        "compressibility_scores",
        "rest_extract_datasource",
        "sketch_distinct_users",
    ], f"rows-only set changed: {rows_only} — update README/COVERAGE"


def test_readme_counts_match_registry():
    text = open("/root/repo/README.md").read()
    assert f"registry: {TOTAL} queries" in text
    assert f"{WITH_ORACLE} of {TOTAL} queries are oracle-checked" in text
    assert (
        f"all {TOTAL} queries" in text
        or f"# all {TOTAL} queries" in text
    )


def test_coverage_totals_match_registry():
    text = open("/root/repo/COVERAGE.md").read()
    m = re.search(
        r"\*\*(\d+) registry queries — (\d+) oracle-checked, "
        r"(\d+) rows-only\*\*",
        text,
    )
    assert m, "COVERAGE.md totals line missing"
    assert (int(m.group(1)), int(m.group(2)), int(m.group(3))) == (
        TOTAL,
        WITH_ORACLE,
        ROWS_ONLY,
    )
