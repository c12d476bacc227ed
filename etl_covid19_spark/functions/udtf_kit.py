"""Python user-defined TABLE functions — the Spark 4 row→rows
extension point.

Completes the Python-extension API surface next to the DataSource
reader (`sources/rest_datasource.py`), the DataSource writer
(`sources/alert_datasource.py`), and the Arrow batch/state operators
(`operators/multimodal.py`, `streaming/stateful.py`): a UDTF is the
tool for GRAMMAR-level per-row expansion — parsers that emit a
variable number of typed rows per input and carry sequential state
across the emission (span indices here) — where `explode()` over a
Catalyst expression can't express the loop.

Scale posture: a UDTF call is a Python-side map — no shuffle, no
state across rows, embarrassingly parallel over partitions — but it
IS the slow path vs built-in `split`/`explode` (per-batch Python
dispatch; `useArrow=True` keeps transfer columnar). The docstring
rule from SURVEY.md §6 applies: reach for a UDTF only when the
per-row logic genuinely can't be a Catalyst expression; simple
delimiter splits belong in `explode(split(...))`.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

# Python str.strip() strips more than ASCII space; pin the exact
# character set so the DuckDB oracle (`trim(x, ' \t\n\r')`) matches
# byte-for-byte.
_STRIP = " \t\n\r"


@udtf(returnType="span_idx int, sentence string, n_chars int", useArrow=True)
class SentenceSpans:
    """Split a document into '.'-terminated sentence spans, emitting
    (span_idx, sentence, n_chars) per non-empty span. The span index
    is sequential state across the emitted rows — the part a pure
    `posexplode(split(...))` can't do once the filter ("skip empty
    spans") has to happen BEFORE the position is assigned."""

    def eval(self, text: str | None):  # noqa: D102 (protocol method)
        if text is None:
            return
        idx = 0
        for raw in text.split("."):
            s = raw.strip(_STRIP)
            if s:
                yield idx, s, len(s)
                idx += 1


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register the kit's UDTFs for SQL use
    (``LATERAL sentence_spans(text)``)."""
    spark.udtf.register("sentence_spans", SentenceSpans)
