"""Data-quality gates — SURVEY.md §2.5 A1 and §7.2 step 6.

The reference's only aggregate is its quality gate: a filtered COUNT
asserted to 240 ±2% (`SQLValueCheckOperator(pass_value=240,
tolerance=0.02)`, ``dags/ETL_covid19_pandas.py:139-145``;
``README.md:17``). Generalized here to engine-native expectations
that raise *before* a write commits (the DAG-barrier semantics of
the `data_quality` task, SURVEY.md §2.8 O6).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame


class QualityCheckError(AssertionError):
    """Raised when an expectation fails; orchestrators treat it like
    the reference's failed `data_quality` task (alert + block load)."""


def expect_count(
    df: DataFrame,
    pass_value: float,
    tolerance: float = 0.02,
    predicate: Column | None = None,
) -> int:
    """A1 — filtered count within pass_value ± tolerance."""
    n = (df.filter(predicate) if predicate is not None else df).count()
    if abs(n - pass_value) > pass_value * tolerance:
        raise QualityCheckError(
            f"count {n} outside {pass_value} ±{tolerance:.0%}"
        )
    return n


def expect_no_orphans(fact: DataFrame, dim: DataFrame, on: list[str]) -> None:
    """Referential integrity as an anti-join: the engine-native form
    of the mart's FK constraints (``postgres/pg_init_covid19.sql:78-79``)."""
    orphans = fact.join(dim, on=on, how="left_anti").limit(1).count()
    if orphans:
        raise QualityCheckError(f"orphan fact rows for key {on}")


def expect(df: DataFrame, predicate: Column, description: str = "") -> None:
    """Zero violating rows for an arbitrary row-level predicate."""
    bad = df.filter(~predicate).limit(1).count()
    if bad:
        raise QualityCheckError(description or str(predicate))


def observed_write(
    df: DataFrame,
    write: Callable[[DataFrame], None],
    pass_value: float,
    tolerance: float = 0.02,
) -> int:
    """A1 as a ZERO-extra-pass gate: `df.observe()` accumulates the
    row count DURING the write job itself, so at 100 TB the gate
    costs nothing — no second scan, no count() job. The check runs
    after the action; on violation the caller's orchestration treats
    the written partition as failed (and the idempotent partition
    overwrite makes the retry safe).

    Contrast with expect_count, which gates BEFORE the write (the
    reference's barrier semantics, O6) at the price of computing the
    input twice unless it's cached."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    write(df.observe(obs, F.count(F.lit(1)).alias("n")))
    n = int(obs.get["n"])
    if abs(n - pass_value) > pass_value * tolerance:
        raise QualityCheckError(
            f"observed count {n} outside {pass_value} ±{tolerance:.0%}"
        )
    return n


# Failure hook (SURVEY.md §2.1 S9): the reference alerts Telegram on
# DAG failure. Engine-side this is a pluggable callback, not an HTTP
# call baked into the engine.
FailureHook = Callable[[Exception], None]


def guarded(df: DataFrame, checks: list[Callable[[DataFrame], object]],
            on_failure: FailureHook | None = None) -> DataFrame:
    """Run checks; invoke the failure hook (Telegram-analog) and
    re-raise on the first violation. Returns df for chaining."""
    for check in checks:
        try:
            check(df)
        except Exception as exc:  # noqa: BLE001 — hook sees everything
            if on_failure is not None:
                on_failure(exc)
            raise
    return df
