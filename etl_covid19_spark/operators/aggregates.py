"""Aggregation & window surface — SURVEY.md §2.5 (A1) and §7.2 step 8
(the analytics surface that makes the star schema queryable).

Everything here is hash-aggregate shaped: partial (map-side) +
final aggregation, so a 100 TB groupBy shuffles only the distinct
group keys' partial states.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from etl_covid19_spark.operators.parallelism import fan_out


def grouped_agg(
    df: DataFrame, keys: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """`groupBy().agg()` with enforced output aliases (the oracle
    contract: every computed column gets an explicit name)."""
    return df.groupBy(*keys).agg(*[c.alias(name) for name, c in aggs.items()])


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """orderBy + limit — Spark plans this as TakeOrderedAndProject:
    each partition keeps k rows, the driver merges; no global sort.
    Pass a deterministic tie-breaker in `order_by`."""
    return df.orderBy(*order_by).limit(k)


def running_totals(
    df: DataFrame,
    partition_by: list[str],
    order_by: str,
    value: str,
    out_prefix: str = "",
) -> DataFrame:
    """Window kit: running sum + previous-value diff over an ordered
    partition — natively recomputes the reference's `*_diff` measures
    (carried precomputed in the API payload, SURVEY.md §2.6 M1)."""
    w = Window.partitionBy(*partition_by).orderBy(order_by)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(F.col(value), 1).over(w)
    return (
        df.withColumn(f"{out_prefix}running_total", F.sum(value).over(cum))
        .withColumn(
            f"{out_prefix}diff",
            F.col(value) - F.coalesce(prev, F.lit(0.0)),
        )
    )


def rollup_agg(df: DataFrame, keys: list[str], aggs: dict[str, Column]) -> DataFrame:
    """ROLLUP over a dimension hierarchy (region ⊃ nation …) — subtotal
    and grand-total rows with NULL group markers, ANSI semantics."""
    return df.rollup(*keys).agg(*[c.alias(name) for name, c in aggs.items()])


def cube_agg(df: DataFrame, keys: list[str], aggs: dict[str, Column]) -> DataFrame:
    return df.cube(*keys).agg(*[c.alias(name) for name, c in aggs.items()])


def grouping_sets_agg(
    df: DataFrame,
    sets: list[list[str]],
    keys: list[str],
    aggs: dict[str, str],
) -> DataFrame:
    """Explicit GROUPING SETS — the general form under rollup/cube.
    Goes through the SQL surface (Spark has no DataFrame literal for
    arbitrary sets; aggs are SQL expression strings); still one pass,
    one Expand + hash aggregate."""
    view = f"_gs_{abs(hash(tuple(keys))) % 10_000}"
    df.createOrReplaceTempView(view)
    sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
    agg_sql = ", ".join(f"{expr} AS {name}" for name, expr in aggs.items())
    return df.sparkSession.sql(
        f"SELECT {', '.join(keys)}, {agg_sql} FROM {view} "
        f"GROUP BY GROUPING SETS ({sets_sql})"
    )


def pivot_agg(
    df: DataFrame,
    key: str,
    pivot_col: str,
    pivot_values: list[str],
    agg: Column,
) -> DataFrame:
    """Pivot: one output column per (known) pivot value. Passing the
    value list explicitly matters at scale — without it Spark runs an
    extra distinct() job over 100 TB just to discover the columns."""
    return df.groupBy(key).pivot(pivot_col, pivot_values).agg(agg)


def exact_moments(
    df: DataFrame, keys: list[str], x: str, y: str
) -> DataFrame:
    """Bivariate moment sums (n, Σx, Σy, Σx², Σy², Σxy) accumulated in
    exact DECIMAL and emitted as DOUBLE.

    This is the scale-correct substrate for corr/covar/regr/stddev:
    the built-in `corr()`/`covar_samp()` accumulate doubles in
    partition order, so their low bits change with partitioning —
    unacceptable for a differential gate and a real reproducibility
    hazard on a 1000-executor job. Per-row products are exact doubles
    (inputs are small-magnitude), the decimal sums are exact and
    order-independent, and every downstream statistic becomes a pure
    double formula over identical operands on any engine. Still one
    map-side-combined hash aggregate — six partials per group key.
    """
    xc, yc = F.col(x), F.col(y)
    dec = "decimal(38,8)"

    def s(col: Column, name: str) -> Column:
        return F.sum(col.cast(dec)).cast("double").alias(name)

    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        s(xc, "sx"),
        s(yc, "sy"),
        s(xc * xc, "sxx"),
        s(yc * yc, "syy"),
        s(xc * yc, "sxy"),
    )


def percentiles(
    df: DataFrame,
    keys: list[str],
    value: str,
    probs: list[float],
    approx: bool = False,
) -> DataFrame:
    """Per-group quantiles. Exact `percentile` buffers each group's
    values for a true sorted-interpolation answer — right for bounded
    groups (dims, QA gates). At 100 TB-per-group use approx=True:
    t-digest sketches merge map-side and never materialize the group
    (bounded memory, rank error ≤ 1/accuracy)."""
    c = F.col(value).cast("double")
    parr = F.array(*[F.lit(p) for p in probs])
    q = (
        F.percentile_approx(c, parr, 10_000)
        if approx
        else F.percentile(c, parr)
    )
    out = df.groupBy(*keys).agg(q.alias("_q"))
    return out.select(
        *keys,
        *[
            F.col("_q").getItem(i).alias(f"p{int(p * 100):02d}")
            for i, p in enumerate(probs)
        ],
    )


def distributed_rank(
    df: DataFrame,
    value: str,
    tiebreak: str,
    n_buckets: int = 64,
    accuracy: int = 10_000,
) -> DataFrame:
    """Global descending rank WITHOUT a global sort — the 100 TB twin
    of an unpartitioned `Window.orderBy(...)` rank (which funnels the
    whole frame through ONE task's sort).

    Bucket-and-merge: (1) `approx_percentile` cut points split the
    value domain into ~equi-depth buckets (sketch is map-side
    combined; the cuts are BALANCE hints only — rank output never
    depends on their precision, so this is exact at every scale,
    unlike a sketch-valued result); (2) `row_number` within each
    bucket's window (max sorted run = bucket depth ≈ n/buckets);
    (3) bucket counts roll into offsets on a |buckets|-row frame and
    broadcast back; global position = offset + within-bucket number.

    Ordering is (value DESC, tiebreak ASC) and must be total —
    equal values share a bucket (binning is on value alone), so the
    tiebreak settles them inside one window partition and global
    positions are exact.

    Returns df + `_pos` (1-based global position), `_n` (total rows).
    percent_rank = (_pos-1)/(_n-1), cume_dist = _pos/_n for total
    orders; both left to the caller's projection.
    """
    v = F.col(value)
    if n_buckets <= 1:
        # degenerate: one bucket IS the global sort — still correct,
        # just without the scale benefit (percentile_approx rejects
        # an empty percentage array, so short-circuit)
        binned = df.withColumn("_b", F.lit(0))
    else:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = df.agg(
            F.percentile_approx(
                v.cast("double"),
                F.array(*[F.lit(p) for p in probs]),
                accuracy,
            ).alias("_cuts")
        )
        binned = df.join(F.broadcast(cuts)).select(
            df["*"],
            F.aggregate(
                "_cuts",
                F.lit(0),
                lambda acc, c: acc + F.when(v >= c, 1).otherwise(0),
            ).alias("_b"),
        )
    wb = Window.partitionBy("_b").orderBy(v.desc(), F.col(tiebreak))
    within = binned.withColumn("_r", F.row_number().over(wb))
    # bucket sizes -> offset = rows in HIGHER-value buckets. |buckets|
    # rows: the unpartitioned window is over a bounded model-sized
    # frame, not data.
    sizes = binned.groupBy("_b").agg(F.count(F.lit(1)).alias("_bn"))
    w_off = (
        Window.orderBy(F.col("_b").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.select(
        "_b",
        F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_bn").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    )
    return (
        within.join(F.broadcast(offsets), "_b")
        .withColumn("_pos", F.col("_off") + F.col("_r"))
        .drop("_b", "_r", "_off")
    )


def attach_scalar(df: DataFrame, scalar_df: DataFrame) -> DataFrame:
    """Attach a 1-row aggregate frame to every row of ``df`` as a
    constant-key broadcast EQUI-join. A bare crossJoin would plan as
    BroadcastNestedLoopJoin — harmless at 1 row but
    indistinguishable in a plan audit from a real O(n·m) fallback,
    so the global no-NLJ sweep (tests/test_plan_invariants.py)
    would need whitelists. The key must be NON-FOLDABLE — a literal
    key gets constant-folded out of the equi-condition and the plan
    degenerates back to BNLJ — so it derives from a column:
    pmod(hash(col), 1) is always 0 but opaque to ConstantFolding,
    keeping the plan a BroadcastHashJoin."""
    key = "_scalar_key"

    def const_key(d: DataFrame) -> Column:
        return F.pmod(F.hash(F.col(d.columns[0])), F.lit(1))

    return (
        df.withColumn(key, const_key(df))
        .join(F.broadcast(scalar_df.withColumn(key, const_key(scalar_df))), key)
        .drop(key)
    )


def frequent_items(
    df: DataFrame, col: str, k: int = 20, capacity: int | None = None
) -> DataFrame:
    """Exact heavy hitters — every value of ``col`` with frequency
    strictly greater than n/k — via the two-pass Misra-Gries /
    mergeable-summaries pattern (Misra & Gries 1982; Agarwal et al.,
    "Mergeable Summaries", PODS'12):

    pass 1 (candidates): one ``mapInPandas`` sweep keeps at most
    ``capacity`` decremented counters per PARTITION and emits only
    the surviving keys. Misra-Gries guarantees a summary of capacity
    c underestimates any key's partition-local count by at most
    m_p/(c+1) (m_p = partition rows), so with c >= k every key whose
    local count exceeds m_p/k survives in that partition — and a
    global heavy hitter (freq > n/k) must exceed m_p/k in at least
    one partition (averaging argument). The union of partition
    candidates is therefore a SUPERSET of the true heavy hitters,
    at most capacity·P rows total, with no token-grain shuffle.

    pass 2 (exact verify): recount ONLY the candidates (broadcast
    left-semi prune, then a groupBy whose map-side combine is
    bounded by the candidate set) against the exact total, keeping
    freq·k > n. The output is exact regardless of sketch sizing —
    the sketch only bounds pass-1 memory and the candidate volume,
    the same candidates-then-verify contract the MinHash/LSH family
    uses.

    The naive single-pass ``groupBy(col)`` ships every distinct key's
    partial state; at web scale (10⁹+ distinct tokens) that shuffle
    dominates. Here the shuffle carries at most capacity·P candidate
    keys plus one count row.

    Returns (``col``, freq, share) — share is freq/n as a plain
    double division of exactly-equal integers."""
    capacity = capacity or 8 * k
    out_schema = df.select(col).schema

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > capacity:
                vals = sorted(counters.values(), reverse=True)
                d = vals[capacity]  # (capacity+1)-th largest
                counters = {
                    t: c - d for t, c in counters.items() if c - d > 0
                }
        import pandas as pd

        yield pd.DataFrame({col: list(counters.keys())})

    candidates = fan_out(df.select(col)).mapInPandas(mg, schema=out_schema).distinct()
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    counts = (
        df.join(F.broadcast(candidates), [col], "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        attach_scalar(counts, total)
        .filter(F.col("freq") * k > F.col("_n"))
        .select(
            col,
            "freq",
            (F.col("freq").cast("double") / F.col("_n")).alias("share"),
        )
    )
