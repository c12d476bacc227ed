"""Snapshot-manifest zones: a minimal table-format layer over
parquet giving ATOMIC multi-file commits, TIME-TRAVEL reads, and
FILE-level DELETE/MERGE granularity.

`parquet_zone` mutations (delete_where/merge_upsert) are atomic per
PARTITION — the strongest guarantee a bare directory listing can
offer, and the reason ROADMAP defers finer granularity to "a table
format if one lands". This module IS that missing piece, built from
first principles the way Delta/Iceberg build theirs: readers never
list directories; they read a versioned MANIFEST naming exactly the
data files of one snapshot, and writers make a commit visible with
one atomic rename of the manifest file. Data files are immutable and
written into per-commit directories, so a crashed writer leaves only
invisible orphans (vacuumable), never a half-visible table.

Layout:
    <path>/data/<commit-id>/part-*.parquet   immutable data files
    <path>/_manifests/v<N>.json              snapshot N's file list

Scope honestly documented: single-writer (the rename makes a racing
second writer fail loudly on an existing version, not corrupt);
local/HDFS-style rename atomicity (object stores need a conditional
PUT or a commit service, same as Delta on S3); no statistics in the
manifest yet (file pruning still comes from parquet footers).

Reference parity: this subsumes the reference's row-level ``DELETE
FROM covid19_table WHERE region_name IN (...)``
(``dags/ETL_covid19_SQL.py:96-97``) with snapshot isolation the
reference's autocommit Postgres never had.
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FILE = "__sz_file"


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_manifest_dir(path), f"v{version}.json")


def current_version(path: str) -> int | None:
    """Latest committed snapshot version, or None for an empty zone."""
    versions = [
        int(os.path.basename(p)[1:-5])
        for p in glob.glob(os.path.join(_manifest_dir(path), "v*.json"))
    ]
    return max(versions) if versions else None


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


def _commit(
    path: str,
    files: list[str],
    op: str,
    parent: int | None,
    meta: dict | None = None,
) -> int:
    """Make a snapshot visible: write the manifest to a temp name,
    then one atomic rename. A concurrent writer racing to the same
    version loses the rename (target exists → we fail loudly) —
    last-writer-wins corruption is impossible because data files are
    never shared between in-flight commits."""
    version = (parent + 1) if parent is not None else 0
    os.makedirs(_manifest_dir(path), exist_ok=True)
    target = _manifest_path(path, version)
    if os.path.exists(target):
        raise RuntimeError(
            f"snapshot conflict: v{version} already committed"
        )
    manifest = {
        "version": version,
        "parent": parent,
        "op": op,
        "files": sorted(files),
        "committed_at": time.time(),
        **(meta or {}),
    }
    tmp = target + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, target)
    return version


def _write_data_files(df: DataFrame, path: str) -> list[str]:
    """Write df into a fresh per-commit directory; return the part
    files, relative to the zone root (manifests stay valid if the
    zone is moved wholesale)."""
    commit_id = uuid.uuid4().hex
    data_dir = os.path.join(path, "data", commit_id)
    df.write.parquet(data_dir)
    rel = os.path.join("data", commit_id)
    files = sorted(
        os.path.join(rel, os.path.basename(p))
        for p in glob.glob(os.path.join(data_dir, "*.parquet"))
    )
    return files


def snapshot_write(df: DataFrame, path: str, mode: str = "append") -> int:
    """Commit df as a new snapshot. ``append`` keeps the parent's
    files; ``overwrite`` replaces the logical table — either way the
    previous snapshot stays readable (time travel) until vacuumed.
    Returns the committed version."""
    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be append|overwrite")
    parent = current_version(path)
    new_files = _write_data_files(df, path)
    base: list[str] = []
    if mode == "append" and parent is not None:
        base = _read_manifest(path, parent)["files"]
    return _commit(path, base + new_files, mode, parent)


def snapshot_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read one snapshot (latest by default). Readers never list the
    data directory, so in-flight/crashed writers and unvacuumed old
    files are invisible by construction."""
    v = current_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshots at {path}")
    files = _read_manifest(path, v)["files"]
    if not files:
        raise ValueError(f"snapshot v{v} is empty")
    return spark.read.parquet(*[os.path.join(path, f) for f in files])


def snapshot_delete_where(
    spark: SparkSession, path: str, predicate: F.Column
) -> int:
    """Row-level DELETE with FILE granularity: only data files that
    contain matching rows are rewritten (survivors copied into the
    new commit); every other file is carried into the new manifest
    by reference — zero data movement for untouched files, and the
    pre-delete snapshot remains readable. Returns rows deleted."""
    parent = current_version(path)
    if parent is None:
        return 0
    cur = snapshot_read(spark, path, parent).withColumn(
        _FILE, F.input_file_name()
    )
    affected = [
        r[0]
        for r in cur.filter(predicate).select(_FILE).distinct().collect()
    ]
    if not affected:
        return 0
    manifest = _read_manifest(path, parent)
    # input_file_name yields URIs; match manifest entries by basename
    # (unique by construction: every file name embeds a task UUID)
    affected_names = {os.path.basename(a) for a in affected}
    untouched = [
        f
        for f in manifest["files"]
        if os.path.basename(f) not in affected_names
    ]
    hit = cur.filter(F.col(_FILE).isin(affected)).persist()
    try:
        n_deleted = hit.filter(predicate).count()
        survivors = hit.filter(~predicate).drop(_FILE)
        new_files = (
            _write_data_files(survivors, path)
            if survivors.limit(1).count()
            else []
        )
    finally:
        hit.unpersist(blocking=False)
    _commit(path, untouched + new_files, "delete", parent)
    return n_deleted


def snapshot_merge_upsert(
    spark: SparkSession, path: str, updates: DataFrame, keys: list[str]
) -> int:
    """MERGE with FILE granularity: files containing any matching
    key are rewritten with superseded rows replaced; unmatched
    update rows are inserted; untouched files carry by reference.
    The key-bearing-file search is a semi-join on `keys` — at scale
    it shuffles the (small) update key set, not the zone. Returns
    the committed version."""
    parent = current_version(path)
    if parent is None:
        return snapshot_write(updates, path, mode="overwrite")
    cur = snapshot_read(spark, path, parent).withColumn(
        _FILE, F.input_file_name()
    )
    key_df = updates.select(*keys)
    affected = [
        r[0]
        for r in cur.join(key_df, on=keys, how="left_semi")
        .select(_FILE)
        .distinct()
        .collect()
    ]
    manifest = _read_manifest(path, parent)
    affected_names = {os.path.basename(a) for a in affected}
    untouched = [
        f
        for f in manifest["files"]
        if os.path.basename(f) not in affected_names
    ]
    kept = (
        cur.filter(F.col(_FILE).isin(affected))
        .drop(_FILE)
        .join(key_df, on=keys, how="left_anti")
        if affected
        else None
    )
    cols = [c for c in cur.columns if c != _FILE]
    merged = updates.select(*cols)
    if kept is not None:
        merged = kept.unionByName(merged)
    new_files = _write_data_files(merged, path)
    return _commit(path, untouched + new_files, "merge", parent)


def last_committed_epoch(path: str) -> int | None:
    """Highest streaming epoch any snapshot has committed (None if
    the zone has never been fed by a stream)."""
    latest = current_version(path)
    if latest is None:
        return None
    epochs = [
        e
        for v in range(latest + 1)
        if (e := _read_manifest(path, v).get("epoch")) is not None
    ]
    return max(epochs) if epochs else None


def streaming_snapshot_sink(path: str):
    """EXACTLY-ONCE streaming sink: a `foreachBatch` function that
    appends each micro-batch as one atomic snapshot commit stamped
    with the batch's epoch id. Structured Streaming replays a failed
    batch under the SAME id — the sink consults the zone's committed
    epochs and skips replays whose commit already landed, so a crash
    between the snapshot commit and the checkpoint ack cannot
    double-write (at-least-once delivery + idempotent epoch-keyed
    commit = exactly-once output, the same ledger trick Delta's
    `txnAppId/txnVersion` uses).

    Usage::

        stream.writeStream.foreachBatch(streaming_snapshot_sink(p))
              .option("checkpointLocation", cp)
              .trigger(availableNow=True).start()
    """

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        last = last_committed_epoch(path)
        if last is not None and batch_id <= last:
            return  # replay of an already-committed epoch
        parent = current_version(path)
        new_files = _write_data_files(batch_df, path)
        base = (
            _read_manifest(path, parent)["files"]
            if parent is not None
            else []
        )
        _commit(
            path,
            base + new_files,
            "stream-append",
            parent,
            meta={"epoch": batch_id},
        )

    return commit_batch


def vacuum(path: str, keep_versions: int = 1) -> list[str]:
    """Drop manifests older than the newest `keep_versions` and
    delete data files no surviving snapshot references. Run OUT of
    band (like Delta VACUUM): any reader pinned to a dropped version
    loses time travel, never consistency — current readers resolve
    manifests at open time. Returns deleted file paths."""
    latest = current_version(path)
    if latest is None:
        return []
    keep = range(max(0, latest - keep_versions + 1), latest + 1)
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(path, v)["files"])
    deleted = []
    for p in glob.glob(os.path.join(path, "data", "*", "*.parquet")):
        rel = os.path.relpath(p, path)
        if rel not in live:
            os.remove(p)
            deleted.append(rel)
    for mp in glob.glob(os.path.join(_manifest_dir(path), "v*.json")):
        if int(os.path.basename(mp)[1:-5]) not in keep:
            os.remove(mp)
    return deleted
