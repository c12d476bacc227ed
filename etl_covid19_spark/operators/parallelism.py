"""Minimum-parallelism guard for Python-kernel (Arrow) inputs.

Parquet scan splits follow `spark.sql.files.maxPartitionBytes`, so a
compact input (one ~170 MB file at sf10) yields 13-16 splits — and a
`mapInArrow`/`mapInPandas` stage then runs 13-16 single-threaded
Python workers on a 32-core host, with whatever row skew the
row-group boundaries happened to produce. Measured on the sf10 gram
kernel: 16.5 s at scan parallelism vs 3.3 s after one round-robin
repartition to 32 (shuffle included) — the entire "Arrow kernels are
slow cold" signal in BENCH_sf10 was under-parallelism, not kernel or
boundary cost (pass-through kernel: 1.1 s; persist build: +0.6 s).

`fan_out` is deliberately conditional: at real scale the input has
orders of magnitude more splits than cores and the guard is a no-op
with ZERO added shuffle; it only intervenes when the scan cannot
even fill the cluster, where a one-pass shuffle of the (small by
definition) input is always worth the even 32-way fan-out. This is
the same rule of thumb a 1000-executor job uses: repartition only
when partitions < slots.
"""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame

# Never split the input finer than this: a partition under ~2 MB of
# text is milliseconds of kernel work, so more slots only add task-
# scheduling overhead (measured at sf0.1: fanning a 1.7 MB corpus to
# 32 partitions cost ~1 s of extra scheduling across the capped-
# jaccard query's stages while saving nothing).
_MIN_BYTES_PER_TASK = 2 << 20


def fan_out(
    df: DataFrame,
    min_partitions: int | None = None,
    approx_bytes: int | None = None,
) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism iff (a) it currently has fewer partitions AND (b)
    the input is big enough that each new partition gets at least
    `_MIN_BYTES_PER_TASK`; otherwise return it untouched (no
    shuffle). Local-file input sizes come from the scan's file list;
    non-local inputs conservatively assume big. In-memory frames
    (``createDataFrame``) have no file list, so callers that know
    the frame is tiny pass ``approx_bytes`` and get the same
    2 MB-per-task floor instead of an unconditional fan-out whose
    task-scheduling overhead the floor was measured to avoid. Row-
    content downstream only — round-robin changes row order, so
    callers must be order-independent (every kernel here is)."""
    if df.isStreaming:
        # micro-batch parallelism is the source's concern;
        # inputFiles()/rdd are illegal on streaming frames
        return df
    target = (
        min_partitions
        if min_partitions is not None
        else df.sparkSession.sparkContext.defaultParallelism
    )
    files = df.inputFiles()
    if not files and approx_bytes is not None:
        target = max(1, min(target, approx_bytes // _MIN_BYTES_PER_TASK))
    if files:
        total = 0
        for f in files:
            p = unquote(urlparse(f).path) or f
            try:
                total += os.path.getsize(p)
            except OSError:
                total = -1  # non-local storage: size unknown, assume big
                break
        if total >= 0:
            target = max(1, min(target, total // _MIN_BYTES_PER_TASK))
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
