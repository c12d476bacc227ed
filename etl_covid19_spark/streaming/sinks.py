"""Streaming → external-warehouse sinks (§2.1 S6 × streaming).

Structured Streaming's file/parquet sinks get exactly-once from the
offset log + idempotent file commits; an external JDBC warehouse gets
neither, so the sink must make REPLAY harmless itself. The move is
the same one the snapshot zone's ledger makes, pushed into the
database: every micro-batch lands via stage+MERGE
(`sources/jdbc.write_jdbc_upsert`), so re-delivering a batch after a
crash MERGEs to the identical target state — at-least-once delivery ×
idempotent apply = effectively exactly-once for keyed state.

Use with update-mode aggregations (each trigger emits changed keys'
latest values — exactly what an upsert wants) or append streams with
a natural unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etl_covid19_spark.sources.jdbc import write_jdbc_upsert


def jdbc_upsert_sink(
    url: str,
    table: str,
    keys: list[str],
    driver: str | None = None,
    batchsize: int = 10_000,
):
    """foreachBatch hook: `stream.writeStream.foreachBatch(
    jdbc_upsert_sink(url, table, keys))`. Each micro-batch is staged
    and MERGEd by `keys`; a replayed batch (restart without a
    checkpointed commit) rewrites the same rows to the same values
    instead of duplicating them."""

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # epoch id as the staging token: a replayed micro-batch reuses
        # (and first clears) its own staging table; concurrent streams
        # into one target stage under distinct names.
        write_jdbc_upsert(
            batch_df, url, table, keys, driver=driver,
            batchsize=batchsize, batch_id=batch_id,
        )

    return commit_batch
