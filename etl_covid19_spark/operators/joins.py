"""Join operators — SURVEY.md §2.4 JN1/JN2 plus the semi/anti joins
the quality gates need (§7.2 step 6).

Scale posture: dimensions are broadcast explicitly (`F.broadcast`) so
the fact side never shuffles for a key lookup — the 100 TB fact scan
streams through map-side hash joins. When a dimension outgrows
broadcast, dropping the hint falls back to Catalyst's sort-merge with
AQE skew handling; callers don't change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_key(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    key_col: str,
    how: str = "left",
) -> DataFrame:
    """JN1 — surrogate-key enrichment: the reference's UPDATE…FROM
    (``postgres/pg_init_covid19.sql:156-160``) as a broadcast hash
    join; recompute-on-write instead of in-place mutation."""
    on_cols = [on] if isinstance(on, str) else list(on)
    return fact.join(F.broadcast(dim.select(*on_cols, key_col)), on=on_cols, how=how)


def star_join(fact: DataFrame, dims: dict[str, tuple[DataFrame, str]]) -> DataFrame:
    """JN2 — fact ⋈ dims on FK columns (mart FKs at
    ``postgres/pg_init_covid19.sql:78-79``): every dim broadcast, so
    the physical plan is a chain of BroadcastHashJoins over one fact
    scan. Dynamic partition pruning applies when dims are filtered.

    dims: {fk_col: (dim_df, dim_key_col)}"""
    out = fact
    for fk, (dim, dim_key) in dims.items():
        out = out.join(
            F.broadcast(dim), on=out[fk] == dim[dim_key], how="left"
        ).drop(dim_key)
    return out


def semi_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """Rows of `left` with a match in `right` (EXISTS)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """Rows of `left` without a match in `right` (NOT EXISTS) — the
    referential-integrity check primitive (SURVEY.md §7.2 step 6)."""
    return left.join(right, on=on, how="left_anti")
