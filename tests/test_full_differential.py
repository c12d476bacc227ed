"""The full 145-query differential sweep as a test (VERDICT r2 #6).

The driver's CORRECTNESS gate samples ~50 registry queries per round,
so ~95 rotate out of hard coverage each round. This runs the WHOLE
registry against the DuckDB oracle at sf0.01 inside the suite — any
query regression surfaces locally before the driver sees it.

Streaming registry queries start real bounded streams and several
operators are iterative, so this is the suite's slowest test (~6-8
min on local[32]). Deselect with `-m "not differential"` for quick
iteration loops; the default full run keeps it.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.differential
def test_every_registry_query_matches_oracle(spark):
    import diffcheck

    failures = diffcheck.run(spark, SF_DIR, verbose=False)
    assert not failures, "\n".join(f"{n}: {p}" for n, p in failures)
