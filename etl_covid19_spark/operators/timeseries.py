"""Time-series regularization (§2.5/§2.8 extension): gap filling and
linear interpolation over bucketed event streams — the hypertable
`time_bucket_gapfill` / `interpolate` surface, expressed as DataFrame
windows so it inherits Spark's shuffle/codegen machinery.

Dataflow shape (the part that must survive 100 TB):
- the bucket aggregate is a map-side-combined hash aggregate —
  shuffle state is |keys × buckets|, never raw events;
- the dense grid is `sequence()` + explode per key — generated
  distributed, proportional to |keys × buckets|, nothing collected;
- grid ←left join← aggregate is an equi-join on (key, bucket), and
  both sides are already bucket-grained (small) frames;
- interpolation is two window passes over ONE (key, time) sort.
For multi-year × million-key grids, range-partition the grid on
(key, coarse-time) first so each window partition stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucket_aggregate(
    events: DataFrame,
    key: str,
    ts: str,
    value: str,
    bucket: str = "hour",
) -> DataFrame:
    """Deterministic per-(key, bucket) average: exact decimal sum /
    count, both emitted, so downstream math is reproducible under any
    partitioning (same contract as `aggregates.exact_moments`)."""
    b = F.date_trunc(bucket, F.col(ts)).alias("bucket_ts")
    return events.groupBy(F.col(key), b).agg(
        F.sum(F.col(value).cast("decimal(18,4)")).cast("double").alias("_sum"),
        F.count(F.lit(1)).alias("n_events"),
    )


def dense_grid(agg: DataFrame, key: str, bucket: str = "hour") -> DataFrame:
    """Per-key dense bucket grid spanning [min(bucket_ts),
    max(bucket_ts)] — `sequence()` + explode, generated on executors."""
    span = agg.groupBy(key).agg(
        F.min("bucket_ts").alias("_lo"), F.max("bucket_ts").alias("_hi")
    )
    step = F.expr(f"interval 1 {bucket}")
    return span.select(
        F.col(key),
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias(
            "bucket_ts"
        ),
    )


def rolling_zscore(
    series: DataFrame,
    key: str,
    ts: str = "bucket_ts",
    value: str = "v",
    lookback: int = 24,
    min_points: int = 12,
    threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window anomaly score: z = (v - mean)/stddev over the
    `lookback` points strictly BEFORE each row (the row under test
    never contaminates its own baseline). Rows with fewer than
    `min_points` of history get NULL (cold start).

    Determinism contract (same as `aggregates.exact_moments`): the
    windowed Σv and Σv² accumulate in exact decimal, mean/std are
    then pure double formulas — so the flag a row gets does not
    depend on partitioning. One (key, time) sort serves all three
    window aggregates.

    At 100 TB the input here is already bucket-grained (run
    `bucket_aggregate` first); the window partition is one key's
    bucket series, bounded by the time span, never raw events.
    """
    v = F.col(value)
    w = (
        Window.partitionBy(key)
        .orderBy(ts)
        .rowsBetween(-lookback, -1)
    )
    dec = "decimal(38,8)"
    n = F.count(v).over(w).cast("double")
    sx = F.sum(v.cast(dec)).over(w).cast("double")
    sxx = F.sum((v * v).cast(dec)).over(w).cast("double")
    mean = sx / n
    std = F.sqrt(n * sxx - sx * sx) / n
    z = F.when(
        (F.count(v).over(w) >= min_points) & (std > 0.0),
        (v - mean) / std,
    )
    return series.select(
        key,
        ts,
        value,
        z.alias("zscore"),
        (F.abs(z) > threshold).alias("is_anomaly"),
    )


def interpolate_gaps(
    grid_joined: DataFrame, key: str, value: str = "avg_value"
) -> DataFrame:
    """Linear interpolation of NULL buckets between known neighbors.

    For each missing bucket, find the previous/next non-null value and
    its timestamp with IGNORE NULLS window scans, then lerp on the
    epoch-seconds axis. Leading/trailing gaps (no neighbor on one
    side) take the single available neighbor. Adds `filled`
    (boolean: was this bucket interpolated).

    Both window passes share one (key, bucket_ts) sort. The lerp is
    pure double arithmetic over exact operands (integral epoch
    seconds, deterministic averages) — cross-engine bit-stable.
    """
    v = F.col(value)
    t = F.unix_timestamp("bucket_ts").cast("double")
    w_back = (
        Window.partitionBy(key)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key)
        .orderBy("bucket_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_t = F.when(v.isNotNull(), t)
    df = (
        grid_joined.withColumn("_pv", F.last(v, ignorenulls=True).over(w_back))
        .withColumn("_pt", F.last(known_t, ignorenulls=True).over(w_back))
        .withColumn("_nv", F.first(v, ignorenulls=True).over(w_fwd))
        .withColumn("_nt", F.first(known_t, ignorenulls=True).over(w_fwd))
    )
    lerp = F.col("_pv") + (F.col("_nv") - F.col("_pv")) * (
        (t - F.col("_pt")) / (F.col("_nt") - F.col("_pt"))
    )
    filled = (
        F.when(v.isNotNull(), v)
        .when(F.col("_pv").isNull(), F.col("_nv"))
        .when(F.col("_nv").isNull(), F.col("_pv"))
        .otherwise(lerp)
    )
    return df.select(
        key,
        "bucket_ts",
        filled.alias(value),
        v.isNull().alias("filled"),
    )


def equidepth_bins_approx(
    df: DataFrame,
    value: str,
    n_bins: int = 10,
    accuracy: int = 10_000,
) -> DataFrame:
    """Scale twin of the exact ntile equi-depth histogram: cut points
    from `approx_percentile` (t-digest — mergeable sketch, map-side
    combined, NO global sort), then closed-form binary-search binning
    against the broadcast cut array. The exact ntile form
    (`equidepth_histogram`) is this operator's oracle at test SF:
    bucket counts agree within the sketch's rank error
    (≈ n/accuracy per boundary).

    Returns (bin, n_rows, lo, hi) like the exact form. The only
    shuffles are the sketch aggregate (one row of state) and the
    |bins|-row final aggregate — this runs on 100 TB where a global
    ntile sort will not."""
    v = F.col(value)
    probs = [i / n_bins for i in range(1, n_bins)]
    cuts = df.agg(
        F.percentile_approx(
            v.cast("double"), F.array(*[F.lit(p) for p in probs]), accuracy
        ).alias("cuts")
    )
    binned = df.join(F.broadcast(cuts)).select(
        v.alias("v"),
        # number of cut points <= v == the 0-based bin index
        F.aggregate(
            "cuts",
            F.lit(0),
            lambda acc, c: acc + F.when(v >= c, 1).otherwise(0),
        ).alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
