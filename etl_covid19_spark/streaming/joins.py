"""Stream-stream joins with watermark-bounded state.

Extension surface (SURVEY.md §2.9 notes streaming is absent from the
reference; the events fixture motivates it). The scale contract of a
stream-stream join is the STATE BOUND: with watermarks on both sides
and a time-range join condition, Spark derives how long each side's
rows can possibly match and evicts state past
``watermark - window``, so a 1000-executor job holds
O(rate × (delay + window)) rows per side, not the whole history.
An unbounded (no-watermark) stream-stream join retains both streams
forever — the streaming scale-killer this module exists to avoid.

Inner-join emission is immediate on match (the watermark bounds
state, not output latency), so draining a bounded replay with
``Trigger.AvailableNow`` yields exactly the batch join's rows — which
is what lets the registered streaming query be oracle-checked
against plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    watermark: str = "10 minutes",
    right_payload: list[str] | None = None,
) -> DataFrame:
    """Watermarked stream-stream inner join: right events within
    ``[left_ts + lower_s, left_ts + upper_s]`` for matching keys.

    Both inputs must be streaming DataFrames with event-time columns
    `left_ts`/`right_ts`. Watermarks are applied HERE (not by the
    caller) so the state-cleanup contract is part of the operator:
    each side's state is evictable once the other side's watermark
    passes the end of its possible match window.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = None
    for k in key_cols:
        c = lw[k] == rw[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (rw[right_ts] >= lw[left_ts] + F.expr(f"INTERVAL {lower_s} SECONDS"))
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    payload = right_payload or []
    return lw.join(rw, cond, "inner").select(
        *[lw[k] for k in key_cols],
        lw[left_ts],
        rw[right_ts],
        *[rw[c] for c in payload],
    )
