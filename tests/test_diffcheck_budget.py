"""Per-query watchdog for at-scale differential runs.

A DIFF_sf1 run covers 200+ (Spark, DuckDB-oracle) pairs; one
degenerate oracle must land as a `timeout` record, not eat the run.
`_with_budget` is the primitive both sides share: thunk completes →
result passes through; thunk dies after the cancel fired → (None,
True); thunk dies on its own → the exception propagates unchanged.
"""

from __future__ import annotations

import sys
import time

import pytest

sys.path.insert(0, "/root/repo")

from tools.diffcheck import _with_budget  # noqa: E402


def test_no_budget_passthrough():
    assert _with_budget(lambda: 42, lambda: None, None) == (42, False)


def test_fast_thunk_within_budget():
    assert _with_budget(lambda: "ok", lambda: None, 30.0) == ("ok", False)


def test_timeout_reported_not_raised():
    """Cancel flips a flag the thunk observes (stand-in for Spark's
    cancelJobGroup / DuckDB's interrupt), making it raise — which
    must surface as (None, True), not an exception."""
    cancelled = []

    def slow():
        deadline = time.time() + 10
        while time.time() < deadline:
            if cancelled:
                raise RuntimeError("query cancelled")
            time.sleep(0.01)
        return "never"

    got = _with_budget(slow, lambda: cancelled.append(1), 0.1)
    assert got == (None, True)


def test_own_error_propagates():
    with pytest.raises(ValueError, match="boom"):
        _with_budget(
            lambda: (_ for _ in ()).throw(ValueError("boom")),
            lambda: None,
            30.0,
        )


def test_late_cancel_suppressed_after_success():
    """Timer firing after a successful return must NOT invoke the
    cancel callback (a stale DuckDB interrupt would cancel the NEXT
    query on the connection)."""
    fired = []
    got = _with_budget(lambda: "done", lambda: fired.append(1), 0.05)
    assert got == ("done", False)
    time.sleep(0.15)
    assert not fired


def test_gk_bound_checker_accepts_within_and_rejects_beyond():
    """The machine-checked GK adjudicator: bucket counts within
    2n/accuracy+1 of the exact-rank oracle pass (status
    ok_within_bound), a genuine violation or total mismatch fails."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from diffcheck import _gk_equidepth_bound

    cols = ["bin", "n_rows", "lo", "hi"]
    n = 1_000_000  # tol = 2*1e6/1e5 + 1 = 21
    base = [(b, n // 10, 0.0, 1.0) for b in range(10)]
    drift = [
        (b, n // 10 + (21 if b == 0 else (-21 if b == 1 else 0)), 0.0, 1.0)
        for b in range(10)
    ]
    ok, note = _gk_equidepth_bound(cols, drift, cols, base)
    assert ok and "holds" in note, note
    bad = [
        (b, n // 10 + (22 if b == 0 else (-22 if b == 1 else 0)), 0.0, 1.0)
        for b in range(10)
    ]
    ok, note = _gk_equidepth_bound(cols, bad, cols, base)
    assert not ok and "VIOLATED" in note, note
    short = [(b, n // 10, 0.0, 1.0) for b in range(9)]
    ok, note = _gk_equidepth_bound(cols, short, cols, base)
    assert not ok and "total rows differ" in note, note
