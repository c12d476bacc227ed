"""Custom stateful operators over the Python/Arrow boundary.

The engine's session surface has two tiers:

- `streaming.windows.session` — Spark's native `session_window`
  (JVM-side, preferred; SURVEY.md §2.9's streaming extension).
- this module — the *custom* stateful path for semantics
  `session_window` can't express (per-group imperative logic), shown
  on sessionization so batch and streaming outputs are comparable:

  * `sessionize_batch` — `applyInPandas`: each key group arrives as
    one pandas frame (full history available, no state needed).
  * `sessionize_stream` — `applyInPandasWithState`: the same per-key
    session fold, but incremental — state carries the open session
    across micro-batches; closed sessions emit as soon as the gap
    that closes them is observed.

Scale: both shuffle once on the key. The streaming state is O(1)
per key (one open session), so a 1000-executor job holds
|active keys| tiny structs in the state store — this is the shape
`applyInPandasWithState` exists for.

End-of-input semantics: a closed session emits when a later event
reveals the gap, or when the event-time timeout fires (watermark
passes session end + gap). Sessions whose timeout hasn't been
reached when the stream drains stay in state for the next run —
the batch variant, which sees full history, also emits those.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

# open-session carry: (start_us, last_us, n_events, sum_value)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _fold_sessions(
    ts_us: "pd.Series",
    values: "pd.Series",
    gap_us: int,
    carry: tuple[int, int, int, float] | None,
) -> tuple[list[tuple[int, int, int, float]], tuple[int, int, int, float]]:
    """Shared per-key session fold (sorted input): returns (closed
    sessions, open-session carry). An event exactly `gap` after the
    previous one opens a new session — same rule as
    `session_window` and the SQL oracle."""
    closed: list[tuple[int, int, int, float]] = []
    for t, v in zip(ts_us, values):
        t = int(t)
        v = float(v)
        if carry is None:
            carry = (t, t, 1, v)
        elif t - carry[1] >= gap_us:
            closed.append(carry)
            carry = (t, t, 1, v)
        else:
            carry = (carry[0], t, carry[2] + 1, carry[3] + v)
    return closed, carry


def sessionize_batch(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_s: int = 1800,
    max_events_per_key: int | None = 100_000,
) -> DataFrame:
    """Batch sessionization via `applyInPandas`: one Arrow-shipped
    pandas frame per key, vectorized sort, linear fold. Emits every
    session including each key's trailing one.

    Bounded state: `applyInPandas` ships a key's WHOLE group into one
    pandas frame, so a bot key with 10⁸ events would OOM the worker.
    A row_number over the same key partitioning the group-map
    shuffles on caps each key at its `max_events_per_key` EARLIEST
    events before the Python boundary (the filter runs JVM-side; the
    window sort is the same Exchange+Sort the groupBy needs), and
    `truncated` on every emitted session row marks keys that were
    cut (their trailing sessions are missing; emitted ones are
    exact). The streaming twin is inherently bounded per micro-batch
    and needs no cap. Pass None to disable."""
    gap_us = gap_s * 1_000_000
    out_schema = T.StructType(
        SESSION_SCHEMA.fields + [T.StructField("truncated", T.BooleanType())]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        # normalize to int64 microseconds whatever pandas' datetime
        # unit is (ns from Arrow, us from parquet)
        ts_us = pdf[ts_col].values.astype("datetime64[us]").astype("int64")
        closed, carry = _fold_sessions(ts_us, pdf[value_col], gap_us, None)
        if carry is not None:
            closed.append(carry)
        uid = int(pdf[key_col].iloc[0])
        trunc = bool(pdf["_truncated"].iloc[0])
        return pd.DataFrame(
            [(uid, s, e, n, v, trunc) for (s, e, n, v) in closed],
            columns=[f.name for f in out_schema.fields],
        )

    src = df.select(key_col, ts_col, value_col)
    if max_events_per_key is None:
        src = src.withColumn("_truncated", F.lit(False))
    else:
        w = Window.partitionBy(key_col).orderBy(ts_col)
        src = (
            src.withColumn("_rn", F.row_number().over(w))
            .withColumn(
                "_truncated",
                F.max("_rn").over(Window.partitionBy(key_col))
                > max_events_per_key,
            )
            .where(F.col("_rn") <= max_events_per_key)
            .drop("_rn")
        )
    return src.groupBy(key_col).applyInPandas(fn, out_schema)


def sessionize_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_s: int = 1800,
) -> DataFrame:
    """Streaming sessionization via `applyInPandasWithState`: state
    holds each key's open session; a micro-batch's events extend it
    or close it (emit) when the gap is exceeded. Event-time timeout
    closes idle sessions once the watermark passes start+gap."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_s * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        carry = tuple(state.get) if state.exists else None
        if state.hasTimedOut:
            state.remove()
            if carry is not None:
                yield pd.DataFrame(
                    [(int(key[0]), *carry)],
                    columns=[f.name for f in SESSION_SCHEMA.fields],
                )
            return
        pdf = pd.concat(list(pdfs)).sort_values(ts_col)
        # normalize to int64 microseconds whatever pandas' datetime
        # unit is (ns from Arrow, us from parquet)
        ts_us = pdf[ts_col].values.astype("datetime64[us]").astype("int64")
        closed, carry = _fold_sessions(ts_us, pdf[value_col], gap_us, carry)
        if carry is not None:
            state.update(carry)
            # close the open session when the watermark passes its
            # end + gap (no later event can extend it)
            state.setTimeoutTimestamp((carry[1] + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                [(int(key[0]), s, e, n, v) for (s, e, n, v) in closed],
                columns=[f.name for f in SESSION_SCHEMA.fields],
            )

    return (
        stream.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas — Spark 4's richer stateful API
# ---------------------------------------------------------------------------

RUNNING_STATS_SCHEMA = (
    "user_id long, batch_events long, total_events long, total_value double"
)


class RunningUserStats(StatefulProcessor):
    """Per-key running totals via `transformWithStateInPandas` — the
    second custom stateful operator next to `sessionize_stream`,
    showing the newer API's advantages over `applyInPandasWithState`:
    named TYPED state variables managed by the state store (here one
    ValueState; ListState/MapState and timers compose the same way),
    RocksDB-backed so per-key state can exceed executor heap, and
    state TTL available declaratively.

    Emits one row per (key, micro-batch) with the batch's event count
    and the running totals — the streaming analog of a cumulative
    window aggregate, in Update mode.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n BIGINT, total DOUBLE"
        )

    def handleInputRows(self, key, rows, timerValues):  # noqa: N803 (API)
        n, total = (0, 0.0)
        if self._totals.exists():
            n, total = self._totals.get()
        batch_n, batch_total = 0, 0.0
        for pdf in rows:
            batch_n += len(pdf)
            batch_total += float(pdf["value"].sum())
        n += batch_n
        total += batch_total
        self._totals.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "batch_events": [batch_n],
                "total_events": [n],
                "total_value": [total],
            }
        )

    def close(self) -> None:
        pass


def running_user_stats(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Cumulative per-user event totals over a stream. One shuffle on
    the key per micro-batch; state is one small struct per key in the
    RocksDB state store (set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``RocksDBStateStoreProvider`` — transformWithState requires it)."""
    return (
        stream.selectExpr(
            f"{key_col} AS user_id", f"{value_col} AS value"
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningUserStats(),
            outputStructType=RUNNING_STATS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def has_transform_with_state_support() -> bool:
    """transformWithStateInPandas speaks protobuf between the JVM and
    its Python state server (`pyspark.sql.streaming.StateMessage_pb2`
    imports `google.protobuf`); without the runtime the worker cannot
    start. Probe once at plan time instead of failing executor-side."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


RUNNING_STATS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_user_stats_apply(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """`applyInPandasWithState` twin of `running_user_stats`: same
    output (one (key, batch_events, running totals) row per key per
    micro-batch, Update mode), same O(1)-per-key state, expressed
    against the older state API — the degrade target when the
    transformWithState protobuf protocol is unavailable. Kept
    semantically in lockstep by the parity test."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = tuple(state.get) if state.exists else (0, 0.0)
        batch_n, batch_total = 0, 0.0
        for pdf in pdfs:
            batch_n += len(pdf)
            batch_total += float(pdf["value"].sum())
        n += batch_n
        total += batch_total
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "batch_events": [batch_n],
                "total_events": [n],
                "total_value": [total],
            }
        )

    return (
        stream.selectExpr(f"{key_col} AS user_id", f"{value_col} AS value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=RUNNING_STATS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_stats_auto(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Detect-and-degrade dispatcher: the transformWithStateInPandas
    path (RocksDB-backed typed state, TTL, timers) when its protobuf
    protocol is importable, else the `applyInPandasWithState` twin —
    identical rows either way, so callers get the richer engine
    opportunistically without an environment gate."""
    if has_transform_with_state_support():
        return running_user_stats(stream, key_col, value_col)
    return running_user_stats_apply(stream, key_col, value_col)


# ---------------------------------------------------------------------------
# Streaming rolling z-score — the anomaly detector's streaming twin
# ---------------------------------------------------------------------------

ZSCORE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("bucket_us", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)
ZSCORE_STATE_SCHEMA = T.StructType(
    [T.StructField("hist", T.ArrayType(T.DoubleType()))]
)


def zscore_stream(
    stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "bucket_ts",
    value_col: str = "v",
    lookback: int = 24,
    min_points: int = 12,
    threshold: float = 3.0,
) -> DataFrame:
    """Streaming twin of `timeseries.rolling_zscore`: each key's
    state is the trailing ring of up to `lookback` bucket values;
    every arriving bucket is scored against the ring BEFORE being
    pushed into it (the batch operator's strictly-before baseline),
    so a replayed series produces identical flags to the batch pass —
    the parity the test asserts.

    State is O(lookback) doubles per key — bounded regardless of
    stream length, the property that lets a million-key topology run
    forever. Input buckets must arrive time-ordered per key (feed it
    from an upstream windowed aggregate, which closes buckets in
    watermark order)."""
    import math

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        hist = list(state.get[0]) if state.exists else []
        pdf = pd.concat(list(pdfs)).sort_values(ts_col)
        ts_us = pdf[ts_col].values.astype("datetime64[us]").astype("int64")
        out = []
        for t_us, v in zip(ts_us, pdf[value_col].astype(float)):
            ring = hist[-lookback:]
            z, flag = None, None
            if len(ring) >= min_points:
                n = float(len(ring))
                sx = math.fsum(ring)
                sxx = math.fsum(x * x for x in ring)
                var_n2 = n * sxx - sx * sx
                std = math.sqrt(var_n2) / n if var_n2 > 0 else 0.0
                if std > 0:
                    z = (v - sx / n) / std
                    flag = abs(z) > threshold
            out.append((str(key[0]), int(t_us), float(v), z, flag))
            hist.append(float(v))
        state.update((hist[-lookback:],))
        yield pd.DataFrame(
            out, columns=[f.name for f in ZSCORE_OUT_SCHEMA.fields]
        )

    return (
        stream.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=ZSCORE_OUT_SCHEMA,
            stateStructType=ZSCORE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
