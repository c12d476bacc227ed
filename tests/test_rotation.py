"""External-sample rotation invariants (round-9 ask #1).

The driver samples the FIRST 50 names returned by
__spark_entry__.queries() each round. These tests pin the two
properties the round-8 verdict demanded:

1. INSERTION STABILITY — the seeded order is keyed on each name, so
   growing the registry never re-permutes the existing names (the
   old index-shuffle re-randomized all 220 positions on every
   insertion, voiding the coverage guarantee).
2. COVERAGE — never-sampled queries enter the front-50 before any
   already-sampled query, and among sampled ones the least recently
   sampled come first; so every query is externally sampled within
   ⌈never_sampled/50⌉ rounds of registration, independent of
   registry growth.

No SparkSession needed — pure selection logic over the committed
CORRECTNESS_r{N}.json artifacts.
"""

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
spec = importlib.util.spec_from_file_location(
    "spark_entry", REPO / "__spark_entry__.py"
)
entry_mod = importlib.util.module_from_spec(spec)
sys.modules.setdefault("spark_entry", entry_mod)
spec.loader.exec_module(entry_mod)

_stable_order = entry_mod._stable_order
_sample_history = entry_mod._sample_history
_ordered_names = entry_mod._ordered_names
_WINDOW = entry_mod._WINDOW
REGISTRY = entry_mod.REGISTRY


def test_stable_order_invariant_under_insertion():
    """The relative order of existing names must not change when new
    names are registered — the core fix over the index-shuffle."""
    names = sorted(REGISTRY)
    base = _stable_order(names)
    grown = _stable_order(names + [f"new_query_{i}" for i in range(25)])
    filtered = [n for n in grown if not n.startswith("new_query_")]
    assert filtered == base


def test_stable_order_deterministic_and_total():
    names = sorted(REGISTRY)
    assert _stable_order(names) == _stable_order(list(reversed(names)))
    assert sorted(_stable_order(names)) == names


def test_front_prefers_never_sampled():
    """Every never-sampled query (per the committed artifacts) must
    outrank every already-sampled one; the front is all-never-sampled
    whenever at least 50 exist."""
    hist = _sample_history()
    never = [n for n in REGISTRY if n not in hist]
    front = _ordered_names()[:_WINDOW]
    if len(never) >= _WINDOW:
        assert all(n not in hist for n in front)
    else:
        assert set(never) <= set(front)


def test_front_is_least_recently_sampled_rotation():
    """Within the front, sample-round keys are non-decreasing and
    never exceed the best (lowest) round available outside it —
    i.e. the selection is exactly 'least recently sampled first'."""
    hist = _sample_history()
    order = _ordered_names()
    front, rest = order[:_WINDOW], order[_WINDOW:]
    front_keys = [hist.get(n, 0) for n in front]
    assert front_keys == sorted(front_keys)
    if rest:
        assert max(front_keys) <= min(hist.get(n, 0) for n in rest)


def test_ordered_names_is_a_permutation_of_registry():
    order = _ordered_names()
    assert sorted(order) == sorted(REGISTRY)
    assert len(order) == len(set(order))


def test_queries_and_oracles_follow_the_rotation():
    qs = entry_mod.queries()
    assert list(qs)[:_WINDOW] == _ordered_names()[:_WINDOW]
    sql = entry_mod.oracle_sql()
    assert set(sql) <= set(qs)


# ---- red rows re-enter the front next round (round-9 ask #1) ----

_history_from_artifacts = entry_mod._history_from_artifacts
_row_passed = entry_mod._row_passed

_GREEN = {
    "rows_match": True,
    "schema_match": True,
    "hash_match": True,
    "spark_rows": 5,
    "oracle_rows": 5,
    "err": None,
}
_RED_ERR = {
    "rows_match": None,
    "schema_match": None,
    "hash_match": None,
    "spark_rows": None,
    "oracle_rows": None,
    "err": "SparkException: task failed",
}
_RED_MISMATCH = dict(_GREEN, hash_match=False)
_ROWS_ONLY = {
    "rows_match": None,
    "schema_match": None,
    "hash_match": None,
    "spark_rows": 7,
    "oracle_rows": None,
    "err": "no_oracle",
}


def test_row_passed_classification():
    assert _row_passed(_GREEN)
    assert _row_passed(_ROWS_ONLY)  # rows-only by design is a pass
    assert not _row_passed(_RED_ERR)
    assert not _row_passed(_RED_MISMATCH)
    # rows-only that returned NOTHING is not a pass
    assert not _row_passed(dict(_ROWS_ONLY, spark_rows=None))


def test_red_latest_row_gets_priority_key():
    """A query whose most recent driver row failed must rank BEFORE
    never-sampled names (-1 < 0 < any green round)."""
    hist = _history_from_artifacts(
        {
            8: {"q_old_green": _GREEN, "q_flaky": _GREEN},
            9: {"q_flaky": _RED_ERR, "q_fresh_green": _GREEN},
        }
    )
    assert hist["q_flaky"] == -1  # red in its latest sample
    assert hist["q_old_green"] == 8
    assert hist["q_fresh_green"] == 9
    assert "q_never" not in hist  # never-sampled key is 0 downstream
    assert hist["q_flaky"] < 0 < hist["q_old_green"]


def test_red_then_green_clears_the_flag():
    """A later green sample supersedes an older red one."""
    hist = _history_from_artifacts(
        {7: {"q": _RED_ERR}, 9: {"q": _GREEN}}
    )
    assert hist["q"] == 9


def test_zone_mutation_read_reenters_r10_front():
    """The one red row of CORRECTNESS_r09.json must be in round 10's
    externally-sampled front-50 (this reads the real committed
    artifacts — if a future round greens it, the name may rotate out
    again, so guard on its recorded state)."""
    hist = _sample_history()
    if hist.get("zone_mutation_read") == -1:
        assert "zone_mutation_read" in _ordered_names()[:_WINDOW]
