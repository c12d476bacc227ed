"""Alert sink as a Spark 4 Python DataSource WRITER — S9 at scale.

The reference's alerting is a driver-side Telegram POST fired from an
orchestrator callback (``dags/ETL_covid19_pandas.py:97-110``). The
engine already mirrors that shape (`plans/quality` failure hooks,
`streaming/observability` listeners); this module adds the missing
piece of the DataSource API surface — a WRITER — so alert/event rows
can be delivered as a first-class `df.write.format("alert_sink")`
sink with executor-side delivery:

- each task ships its partition's rows through `deliver()` and
  returns a commit message; the driver's `commit()` sees all of them
  (the standard two-phase DataSource commit protocol), so a failed
  task's messages are never half-acknowledged;
- delivery batches per partition — 1000 executors POSTing their own
  alerts beats funneling every row through the driver.

No network in this container, so the default delivery appends
JSON-lines to a local spool file (executor-side file I/O is real);
a production deployment replaces `deliver` with an HTTP POST of the
same signature.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row


class AlertCommit(WriterCommitMessage):
    def __init__(self, n_rows: int):
        self.n_rows = n_rows


def deliver(spool_dir: str, payloads: list[dict]) -> None:
    """Default delivery: append JSON lines to a per-task spool file.
    Swap for an HTTP POST (same signature) in production — the
    commit protocol around it is unchanged."""
    os.makedirs(spool_dir, exist_ok=True)
    pid = os.getpid()
    with open(f"{spool_dir}/alerts-{pid}.jsonl", "a") as f:
        for p in payloads:
            f.write(json.dumps(p, sort_keys=True, default=str) + "\n")


class AlertWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.spool_dir = options.get("spool_dir")
        if not self.spool_dir:
            raise ValueError("alert_sink requires option 'spool_dir'")

    def write(self, rows: Iterator[Row]) -> AlertCommit:
        batch = [row.asDict() for row in rows]
        if batch:
            deliver(self.spool_dir, batch)
        return AlertCommit(len(batch))

    def commit(self, messages) -> None:  # noqa: ARG002 (protocol)
        total = sum(m.n_rows for m in messages if m is not None)
        deliver(self.spool_dir, [{"_commit": True, "n_rows": total}])


class AlertSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "alert_sink"

    def writer(self, schema, overwrite: bool) -> AlertWriter:  # noqa: ARG002
        return AlertWriter(self.options)
