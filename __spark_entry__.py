"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(`etl_covid19_spark.queries.REGISTRY`): every implemented operator
from SURVEY.md §2 is exposed as a (spark, sf_dir) callable plus a
DuckDB-runnable oracle SQL string.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_covid19_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the broadcast star
    join + revenue aggregation (SURVEY.md §2.4 JN2)."""
    return REGISTRY["star_join_revenue"].fn(spark, "/root/testdata/sf0.001")


# The external correctness gate samples the FIRST 50 exposed queries
# every round. A curated static front (rounds 1-5) left the other
# ~155 queries externally unverified forever. Rounds 6-8 used a
# seeded index-shuffle of sorted(REGISTRY) advanced by a 50-query
# window per round — but that order RE-PERMUTES whenever the registry
# grows (the shuffle is positional), voiding the "every query sampled
# within ⌈N/50⌉ rounds" guarantee every time a query lands (round-8
# verdict ask #1). The scheme is now INSERTION-STABLE and
# HISTORY-DRIVEN, derived only from committed artifacts:
#
#   1. Stable total order: names sort by blake2b(f"{seed}:{name}") —
#      keyed on the NAME itself, so adding/removing queries never
#      reorders the existing ones.
#   2. Front-50: the queries the driver has sampled LEAST RECENTLY,
#      read off the committed CORRECTNESS_r{N}.json artifacts
#      (never-sampled queries, round 0, come first), ties broken by
#      the stable order.
#
# This restores the hard guarantee regardless of registry growth:
# every query is externally sampled within ⌈never_sampled/50⌉ rounds
# of registration, and once all have been seen the front becomes a
# pure least-recently-sampled rotation with period ⌈N/50⌉. The
# selection is deterministic and auditable — recompute it from the
# committed artifacts at any commit. All remaining queries follow in
# stable order; the in-repo differential still covers all 200+ every
# round.
#
# RED ROWS RE-ENTER THE FRONT (round-9 verdict ask #1): a query
# whose LATEST driver row FAILED (err, or any match flag False) is
# ranked round -1 — ahead of never-sampled — so it is re-verified
# the very next round. The previous scheme counted mere PRESENCE in
# an artifact as "sampled", which buried round-9's one red row
# (`zone_mutation_read`) behind ~170 older timestamps for ~4 rounds.
# Rows-only-by-design queries (err == "no_oracle" with rows
# returned) count as sampled-green; they are not failures.
_WINDOW = 50
_SEED = 20260815


def _stable_order(names) -> list[str]:
    """Insertion-stable seeded order: the sort key depends only on
    each name, so the relative order of existing names is invariant
    under registry insertions/removals (unit-pinned in
    tests/test_rotation.py)."""
    import hashlib

    def key(n: str) -> tuple[str, str]:
        h = hashlib.blake2b(
            f"{_SEED}:{n}".encode(), digest_size=8
        ).hexdigest()
        return (h, n)

    return sorted(names, key=key)


def _row_passed(row) -> bool:
    """Did a driver artifact row PASS? err must be absent (or the
    documented rows-only "no_oracle" with rows actually returned)
    and the oracle comparison must have actually concluded green. A
    red row must NOT count as sampled — it has to re-enter the very
    next front-50. Only err == "no_oracle" rows legitimately carry
    all-None match flags; an err=None row with None flags is a
    malformed / partially-written artifact and must NOT count as
    sampled-green either (it re-enters the front window)."""
    if not isinstance(row, dict):
        return False
    err = row.get("err")
    if err == "no_oracle":
        return row.get("spark_rows") is not None
    if err is not None:
        return False
    # A concluded oracle comparison records explicit booleans for
    # rows_match and hash_match (schema_match may be tri-state on
    # some driver versions, so None is tolerated there only).
    return (
        row.get("rows_match") is True
        and row.get("hash_match") is True
        and row.get("schema_match") is not False
    )


def _history_from_artifacts(
    artifacts: dict[int, dict],
) -> dict[str, int]:
    """Pure selection-key computation from {round: artifact dict}.

    name -> -1 if the LATEST round that sampled the name recorded a
    FAILED row (red rows outrank even never-sampled names, so they
    are re-verified next round); else the latest round whose row
    passed. Absent = never externally sampled (key 0 at selection
    time, after red's -1, before any green round ≥ 1)."""
    latest: dict[str, tuple[int, bool]] = {}
    for rnd in sorted(artifacts):
        data = artifacts[rnd]
        if not isinstance(data, dict):
            continue
        for n, row in data.items():
            latest[n] = (rnd, _row_passed(row))
    return {n: (rnd if ok else -1) for n, (rnd, ok) in latest.items()}


def _sample_history() -> dict[str, int]:
    """query name -> selection key read off the committed
    CORRECTNESS_r{N}.json artifacts (top-level keys are the sampled
    names); see `_history_from_artifacts` for the key semantics."""
    import json
    import re

    repo = Path(__file__).resolve().parent
    artifacts: dict[int, dict] = {}
    for f in repo.glob("CORRECTNESS_r*.json"):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f.name)
        if not m:
            continue
        try:
            data = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        artifacts[int(m.group(1))] = data
    return _history_from_artifacts(artifacts)


def _ordered_names() -> list[str]:
    ordered = _stable_order(REGISTRY)
    pos = {n: i for i, n in enumerate(ordered)}
    hist = _sample_history()
    front = sorted(ordered, key=lambda n: (hist.get(n, 0), pos[n]))[:_WINDOW]
    seen = set(front)
    rest = [n for n in ordered if n not in seen]
    return front + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
