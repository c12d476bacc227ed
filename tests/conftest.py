import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_covid19_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session", autouse=True)
def _measure_lock():
    """SHARED measure lock for the whole pytest session: tests may
    overlap each other, but an exclusive holder (registry_sweep /
    bench — the measurement runs whose numbers get adjudicated
    round-over-round) blocks until every test session drains, and
    test sessions launched mid-sweep wait for the sweep. Closes the
    round-10 finding where a concurrent pytest run contended the
    committed sf100 MinHash headline."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from registry_sweep import acquire_measure_lock

    fd, _waited = acquire_measure_lock(exclusive=False)
    yield
    import os

    os.close(fd)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
