"""Training-data export: deterministic sharded JSONL with a
verification manifest.

The hand-off format most training stacks ingest (one JSON object
per line, fixed shard count, a manifest the loader checks before
streaming). Extension surface beyond the reference (SURVEY.md §7.2
step 9) — its S2 sink lands raw JSON into a zone
(``dags/ETL_covid19_pandas.py:49-51``); this is the outbound twin.

Design for 100 TB:
- shard assignment is pmod(xxhash64(id), n_shards) — deterministic
  (re-exports are bit-identical, failed exports re-run safely) and
  key-uniform, so shards stay balanced without a global sort;
- the write is ONE repartition-by-shard pass; maxRecordsPerFile
  caps file sizes within a shard;
- the manifest aggregates per-shard row counts, token counts, and
  an ORDER-INVARIANT content checksum (bit_xor of per-row
  xxhash64 of the canonical JSON) in the same pass shape — n_shards
  rows to the driver, a bounded model parameter;
- verification re-aggregates the written files and compares
  manifests — the reader's pre-flight check.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "manifest.json"


def _with_shard(
    df: DataFrame, id_col: str, n_shards: int, shuffle_seed: int | None
) -> DataFrame:
    """Attach the shard id — content-hashed (seed None), or derived
    from the seeded Knuth permutation (`training_shuffle`'s exact
    arithmetic) so shard AND within-shard order come from one
    epoch-keyed pseudo-random permutation."""
    if shuffle_seed is None:
        return df.withColumn(
            "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
        )
    key = (
        ((F.col(id_col) + F.lit(shuffle_seed)) % F.lit(2147483648))
        * F.lit(2654435761)
    ) % F.lit(4294967296)
    return df.withColumn("_shuffle_key", key).withColumn(
        "shard", (F.col("_shuffle_key") % n_shards).cast("bigint")
    )


def _shard_stats(sharded: DataFrame, text_col: str | None) -> DataFrame:
    """Per-shard (rows, tokens, checksum). The checksum hashes the
    canonical JSON of the full row (sorted struct fields) and
    bit_xor-combines — order-invariant, so any task/partition
    ordering of the same rows verifies equal."""
    data_cols = sorted(
        c for c in sharded.columns if c not in ("shard", "_shuffle_key")
    )
    row_json = F.to_json(F.struct(*[F.col(c) for c in data_cols]))
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor(F.xxhash64(row_json)).alias("checksum"),
    ]
    if text_col is not None:
        from etl_covid19_spark.functions import text as TX

        aggs.insert(
            1,
            F.sum(TX.token_count(text_col).cast("bigint")).alias("tokens"),
        )
    return sharded.groupBy("shard").agg(*aggs)


def export_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str,
    text_col: str | None = None,
    n_shards: int = 8,
    max_records_per_file: int | None = None,
    shuffle_seed: int | None = None,
) -> dict:
    """Write ``df`` as ``out_dir/shard=N/*.json`` plus a manifest;
    returns the manifest dict. One repartition(shard) pass; the
    stats aggregate shares the shard key so both shuffles hash the
    same way. With ``shuffle_seed`` the export is training-ready:
    shard assignment AND within-shard row order follow the seeded
    Knuth permutation (one local sort per shard on top of the same
    single shuffle — never a global sort), so a loader streaming
    shard files in order replays exactly ``training_shuffle``'s
    epoch order."""
    sharded = _with_shard(df, id_col, n_shards, shuffle_seed)
    writable = sharded.repartition(n_shards, F.col("shard"))
    if shuffle_seed is not None:
        writable = writable.sortWithinPartitions(
            "shard", "_shuffle_key", id_col
        ).drop("_shuffle_key")
    writer = writable.write.mode("overwrite").partitionBy("shard")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.json(out_dir)

    stats = {
        int(r["shard"]): {
            k: int(r[k]) for k in r.asDict() if k != "shard"
        }
        for r in _shard_stats(sharded, text_col).collect()
    }
    manifest = {
        "format": "jsonl-shards-v1",
        "n_shards": n_shards,
        "id_col": id_col,
        "text_col": text_col,
        "columns": sorted(c for c in df.columns),
        "total_rows": sum(s["rows"] for s in stats.values()),
        "shards": {str(k): stats[k] for k in sorted(stats)},
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def verify_jsonl_shards(spark: SparkSession, out_dir: str) -> dict:
    """Re-aggregate the written shards and compare against the
    manifest. Raises ValueError on any mismatch; returns the
    verified manifest. The checksum catches content corruption that
    row counts miss."""
    with open(os.path.join(out_dir, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    df = spark.read.option("basePath", out_dir).json(
        os.path.join(out_dir, "shard=*")
    )
    got = {
        int(r["shard"]): {
            k: int(r[k]) for k in r.asDict() if k != "shard"
        }
        for r in _shard_stats(df, manifest["text_col"]).collect()
    }
    want = {int(k): v for k, v in manifest["shards"].items()}
    if got != want:
        bad = sorted(
            k
            for k in set(got) | set(want)
            if got.get(k) != want.get(k)
        )
        raise ValueError(
            f"shard verification failed for shards {bad}: "
            f"manifest={ {k: want.get(k) for k in bad} } "
            f"actual={ {k: got.get(k) for k in bad} }"
        )
    return manifest


def streaming_export_sink(
    out_dir: str,
    id_col: str,
    text_col: str | None = None,
    n_shards: int = 8,
    shuffle_seed: int | None = None,
):
    """foreachBatch sink publishing each micro-batch as an
    epoch-stamped shard set:

        out_dir/epoch=<batch_id>/shard=N/*.json  (+ manifest)

    REPLAY-SAFE: a retried epoch rewrites its own `epoch=<id>`
    directory (`export_jsonl_shards` writes mode=overwrite) and
    re-derives the identical manifest — deterministic shard
    assignment means a replay is byte-equivalent, the same
    idempotency contract as the zone writer's dynamic partition
    overwrite and the JDBC stage+MERGE sink. A training loader
    consumes epochs in order and verifies each manifest before
    streaming the files.

    Usage::

        stream.writeStream.foreachBatch(
            streaming_export_sink(path, "doc_id", "text")
        ).trigger(availableNow=True).start()
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        export_jsonl_shards(
            batch_df,
            os.path.join(out_dir, f"epoch={batch_id}"),
            id_col=id_col,
            text_col=text_col,
            n_shards=n_shards,
            shuffle_seed=shuffle_seed,
        )

    return sink


def verify_export_epochs(spark: SparkSession, out_dir: str) -> dict:
    """Verify every published epoch's manifest against its files;
    returns {epoch: manifest}. The loader's pre-flight."""
    epochs = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(out_dir)
        if d.startswith("epoch=")
    )
    return {
        e: verify_jsonl_shards(spark, os.path.join(out_dir, f"epoch={e}"))
        for e in epochs
    }
