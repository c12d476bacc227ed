"""Join operators — SURVEY.md §2.4 JN1/JN2 plus the semi/anti joins
the quality gates need (§7.2 step 6).

Scale posture: dimensions are broadcast explicitly (`F.broadcast`) so
the fact side never shuffles for a key lookup — the 100 TB fact scan
streams through map-side hash joins. When a dimension outgrows
broadcast, dropping the hint falls back to Catalyst's sort-merge with
AQE skew handling; callers don't change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """As-of join: for each left row, the single latest right row with
    ``right_ts <= left_ts`` in the same key group (time-series point
    lookup; absent from both the reference and vanilla Spark).

    Implemented as union + one window pass: tag right rows 0 and left
    rows 1, sort (ts, tag) within the key, and carry the last-seen
    right payload forward with last(ignorenulls). Cost is one shuffle
    on the key plus an in-partition sort — the 100 TB plan — where
    the naive formulation (theta join on `r.ts <= l.ts` + max) is a
    Catalyst BroadcastNestedLoop O(n·m) blowup.

    The right payload rides as ONE struct so a NULL in an individual
    right column can't make last(ignorenulls) skip past the true
    most-recent row.
    """
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_r")
    r = right.select(
        *on, F.col(right_ts).alias("_ts"), F.lit(0).alias("_tag"), payload
    )
    payload_type = r.schema["_r"].dataType
    l = left.select(
        "*", F.col(left_ts).alias("_ts"), F.lit(1).alias("_tag"),
        F.lit(None).cast(payload_type).alias("_r"),
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.withColumn("_r", F.last("_r", ignorenulls=True).over(w))
    out = filled.where(F.col("_tag") == 1)
    if how == "inner":
        out = out.where(F.col("_r").isNotNull())
    return out.select(
        *left.columns,
        *[F.col(f"_r.{c}").alias(f"asof_{c}") for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
) -> DataFrame:
    """Interval/range join: pairs where ``right_ts`` falls in
    ``[left_ts + lower_s, left_ts + upper_s]`` (seconds), plus key
    equality. Binning turns the range predicate into an equi-join:
    with bin width = interval width, each left row's window spans at
    most two consecutive bins, so the left side explodes ≤2 bin keys,
    the right side computes one, and the exact BETWEEN filters the
    equi-join output. Join degree is per-bin occupancy — never the
    O(n·m) nested-loop Catalyst falls back to for a raw theta join.
    """
    width = max(upper_s - lower_s, 1)
    lo = F.col(left_ts).cast("double") + lower_s
    hi = F.col(left_ts).cast("double") + upper_s
    lbins = F.array_distinct(
        F.sequence(F.floor(lo / width), F.floor(hi / width))
    )
    l = left.withColumn("_bin", F.explode(lbins))
    r = right.withColumn(
        "_bin", F.floor(F.col(right_ts).cast("double") / width)
    )
    joined = l.join(r, on=[*on, "_bin"])
    in_range = F.col(right_ts).cast("double").between(
        F.col(left_ts).cast("double") + lower_s,
        F.col(left_ts).cast("double") + upper_s,
    )
    return joined.where(in_range).drop("_bin")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
) -> DataFrame:
    """Skew-busting inner equi-join: left rows get a deterministic
    salt (hash of the whole row, mod n), the right side is replicated
    n_salts times, and the join key becomes (on…, salt) — a hot key's
    rows spread over n_salts reducers instead of one straggler.
    Result set is identical to the plain join.

    Use when BOTH sides are too big to broadcast and AQE's skew
    splitting isn't enough; for bounded dims, broadcast instead
    (enrich_with_key)."""
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)
    ).alias("_salt")
    l = left.select("*", salt)
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, on=[*on, "_salt"]).drop("_salt")


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """As-of join via ``cogroup().applyInPandas`` — same semantics as
    `asof_join` (latest right row with ``right_ts <= left_ts`` per
    key), demonstrating the two-table Arrow extension point: both
    sides shuffle ONCE on the key, and each key's pair of Arrow
    batches meets a single Python function (``pandas.merge_asof``).

    This is the shape for per-key two-table logic Catalyst can't
    express (interval reconciliation, custom event alignment,
    model-based matching). For the plain as-of itself the window
    formulation in `asof_join` stays the default: identical shuffle
    count, but JVM-side. Constraint of the cogrouped shape at scale:
    ONE key's rows must fit in one task's memory (the window path has
    no such limit) — skewed keys want pre-splitting or the window
    path.
    """
    import pandas as pd

    out_fields = [f"`{c}` {left.schema[c].dataType.simpleString()}"
                  for c in left.columns]
    out_fields += [f"`asof_{c}` {right.schema[c].dataType.simpleString()}"
                   for c in right_cols]
    schema = ", ".join(out_fields)
    out_cols = list(left.columns) + [f"asof_{c}" for c in right_cols]
    rsel = list(dict.fromkeys([*on, right_ts, *right_cols]))
    inner = how == "inner"

    # Alias every right column to a fresh name BEFORE cogrouping:
    # when both sides derive from the same parent frame, Spark's
    # cogroup dedups right-side attributes that share an expression
    # id with a left-side column, so the right pandas frame would
    # silently arrive without them. Fresh aliases force fresh
    # attribute ids (and rule out pandas-side name collisions too).
    r_in = right.select(*[F.col(c).alias(f"_r_{c}") for c in rsel])
    rts = f"_r_{right_ts}"

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame(columns=out_cols)
        merged = pd.merge_asof(
            l.sort_values(left_ts),
            r[[rts] + [f"_r_{c}" for c in right_cols if f"_r_{c}" != rts]]
            .sort_values(rts),
            left_on=left_ts,
            right_on=rts,
            direction="backward",
        )
        if inner:
            merged = merged[merged[rts].notna()]
        merged = merged.rename(
            columns={f"_r_{c}": f"asof_{c}" for c in right_cols}
        )
        return merged[out_cols]

    return (
        left.groupBy(*on)
        .cogroup(r_in.groupBy(*[f"_r_{k}" for k in on]))
        .applyInPandas(merge, schema=schema)
    )
