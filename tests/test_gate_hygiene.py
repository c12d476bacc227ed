"""Write-path gate-query hygiene (round-9 asks #3/#4).

- _await_stream must raise TimeoutError (and stop the query) when a
  bounded stream fails to finish — never fall through to reading
  partially-committed output.
- _gate_tmpdir must put every gate scratch dir under ONE per-process
  root that is registered for exit-time removal, so sweeps stop
  accumulating orphaned zones in /tmp.

No SparkSession needed.
"""

import os

import pytest

from etl_covid19_spark import queries as Q


class _NeverTerminates:
    stopped = False

    def awaitTermination(self, timeout=None):
        return False  # Spark returns False on timeout

    def stop(self):
        self.stopped = True


class _Finishes:
    def awaitTermination(self, timeout=None):
        return True

    def stop(self):  # pragma: no cover - must not be called
        raise AssertionError("stop() called on a finished query")


def test_await_stream_raises_on_timeout():
    q = _NeverTerminates()
    with pytest.raises(TimeoutError, match="did not terminate"):
        Q._await_stream(q, "stub_query", timeout_s=1)
    assert q.stopped  # the hung query was stopped, not leaked


def test_await_stream_passes_on_completion():
    Q._await_stream(_Finishes(), "stub_query", timeout_s=1)


def test_gate_tmpdirs_share_one_cleanup_root():
    a = Q._gate_tmpdir("hygiene_a_")
    b = Q._gate_tmpdir("hygiene_b_")
    root = Q._GATE_TMP_ROOT
    assert root is not None
    assert os.path.dirname(a) == root and os.path.dirname(b) == root
    assert a != b and os.path.isdir(a) and os.path.isdir(b)
    # the root (not each dir individually) is registered with atexit;
    # simulate the exit hook and verify everything goes with it
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    assert not os.path.exists(a) and not os.path.exists(b)
    Q._GATE_TMP_ROOT = None  # later tests/queries re-create the root
