"""Snapshot-manifest zones: a minimal table-format layer over
parquet giving ATOMIC multi-file commits, TIME-TRAVEL reads,
FILE-level DELETE/MERGE granularity, and ROW-level deletes via
DELETION VECTORS (`snapshot_delete_where(strategy="dv")`:
metadata-only deletes applied as a distributed
`_metadata.row_index` anti-join at read, folded back into plain
files by `snapshot_compact`).

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

MULTI-WRITER commits use optimistic concurrency control, the same
protocol a real table format uses: the manifest commit is a true
compare-and-swap (atomic create-exclusive via `os.link`, which
fails with EEXIST if the version exists — unlike `os.rename`,
which silently REPLACES an existing target on POSIX and would let
the last of two racing writers destroy the first's commit). A
writer that loses the CAS race re-reads the winner's snapshot and
retries: appends REBASE (their immutable data files are simply
re-parented onto the new manifest — no data rewrite), while
delete/merge RECOMPUTE against the new current snapshot (their
read set may be stale), up to a bounded attempt count before
raising `CommitConflictError`. Aborted attempts leave only
unreferenced data files (invisible to readers, vacuumable).
Storage scope (round 6): manifest publication is a pluggable
`ManifestStore` — link(2) create-exclusive on POSIX/HDFS (default)
or CONDITIONAL PUT on object stores (S3 `If-None-Match: *` / GCS
`if-generation-match: 0`), the same two deployments Delta's
LogStore abstracts; the full multi-writer protocol is raced against
the object-store contract in tests. Manifests carry per-file column
[min, max] STATISTICS
(folded from parquet footers at commit time), so `snapshot_read`
can prune files against a range predicate WITHOUT opening any
footer — the manifest-level skipping a real table format does;
`snapshot_diff` reports file-level deltas between versions.

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
_POS = "__sz_rowpos"

# Bounded optimistic retries before a writer gives up. Each retry is
# preceded by a short jittered backoff so two lockstep writers break
# symmetry (uuid-derived, not wall-clock randomness).
_MAX_COMMIT_ATTEMPTS = 20

# Test seam: called between computing a commit and attempting its CAS.
# Lets a test inject a deterministic competing commit at the exact
# interleaving point a real race would hit. Always None in production.
_before_commit_hook = None


class CommitConflictError(RuntimeError):
    """A competing writer committed the target version and the
    operation exhausted its optimistic retries (or cannot rebase)."""


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_manifest_dir(path), f"v{version}.json")


class ManifestStore:
    """The PUBLICATION primitive the zone's correctness reduces to:
    `publish(version, body)` must succeed for exactly ONE writer per
    version, and `read` must return a fully-published body or
    nothing — never a partial. Everything else in this module
    (rebase, recompute, pruning, time travel) is pure protocol on
    top of that one contract, so porting the zone to a new storage
    system means implementing these four methods and nothing else.

    - `LinkManifestStore` (default): POSIX/HDFS — create-exclusive
      via link(2).
    - `ConditionalPutManifestStore`: the OBJECT-STORE contract —
      conditional PUT (S3 `If-None-Match: *`, GCS
      `if-generation-match: 0`, Azure `If-None-Match: *`), where
      the store accepts a complete body atomically under the
      precondition and there is NO rename primitive at all. The
      in-memory implementation here models exactly that contract so
      the full multi-writer protocol is raced against it in tests
      (`test_snapshot_zone.py`); a production S3/GCS client drops
      in by implementing the same four methods with one HTTP call
      each.
    """

    def publish(self, version: int, body: bytes) -> bool:
        raise NotImplementedError

    def read(self, version: int) -> bytes | None:
        raise NotImplementedError

    def versions(self) -> list[int]:
        raise NotImplementedError

    def delete(self, version: int) -> None:
        raise NotImplementedError


class LinkManifestStore(ManifestStore):
    """POSIX manifest publication: body is fully written (and
    fsynced) to a temp name, then `os.link`ed to its version path.
    link(2) is atomic and fails with EEXIST when the target exists —
    the property `os.rename` does NOT have on POSIX (rename silently
    REPLACES, so a check-then-rename is a TOCTOU race in which the
    second of two racing writers would silently destroy the first's
    commit)."""

    def __init__(self, manifest_dir: str):
        self._dir = manifest_dir

    def _key(self, version: int) -> str:
        return os.path.join(self._dir, f"v{version}.json")

    def publish(self, version: int, body: bytes) -> bool:
        os.makedirs(self._dir, exist_ok=True)
        target = self._key(version)
        tmp = target + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "wb") as f:
            f.write(body)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, target)  # atomic create-exclusive: the CAS
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        # Durability of the directory entry itself (link visible
        # after a crash) — same discipline as a WAL segment rename.
        dfd = os.open(self._dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        return True

    def read(self, version: int) -> bytes | None:
        try:
            with open(self._key(version), "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def versions(self) -> list[int]:
        return [
            int(os.path.basename(p)[1:-5])
            for p in glob.glob(os.path.join(self._dir, "v*.json"))
        ]

    def delete(self, version: int) -> None:
        try:
            os.remove(self._key(version))
        except FileNotFoundError:
            pass


class ConditionalPutManifestStore(ManifestStore):
    """Object-store semantics, modeled faithfully: a PUT carries the
    COMPLETE body plus an if-none-match precondition; the store
    either accepts the whole object atomically (the winner) or
    rejects with 412 (every loser) — partial bodies are never
    observable, and no rename/link primitive exists. The lock below
    stands in for the store service's internal serialization of
    conditional writes to one key (what S3/GCS/Azure guarantee
    server-side); everything ABOVE this class is identical code for
    POSIX and object-store deployments, which is the point."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._objects: dict[int, bytes] = {}
        self.put_attempts = 0  # observability for tests

    def publish(self, version: int, body: bytes) -> bool:
        with self._lock:  # the store's conditional-write serializer
            self.put_attempts += 1
            if version in self._objects:
                return False  # 412 Precondition Failed
            self._objects[version] = bytes(body)
            return True

    def read(self, version: int) -> bytes | None:
        with self._lock:
            return self._objects.get(version)

    def versions(self) -> list[int]:
        with self._lock:
            return list(self._objects)

    def delete(self, version: int) -> None:
        with self._lock:
            self._objects.pop(version, None)


# Per-zone store override (tests / object-store deployments);
# default is POSIX link-CAS against the zone's _manifests dir.
_STORES: dict[str, ManifestStore] = {}


def set_manifest_store(path: str, store: ManifestStore | None) -> None:
    """Install (or with None, remove) a ManifestStore for a zone
    path. All commit/read/vacuum traffic for that zone then flows
    through it — the seam an object-store deployment plugs into."""
    key = os.path.abspath(path)
    if store is None:
        _STORES.pop(key, None)
    else:
        _STORES[key] = store


def manifest_store(path: str) -> ManifestStore:
    return _STORES.get(os.path.abspath(path)) or LinkManifestStore(
        _manifest_dir(path)
    )


def current_version(path: str) -> int | None:
    """Latest committed snapshot version, or None for an empty zone."""
    versions = manifest_store(path).versions()
    return max(versions) if versions else None


def _read_manifest(path: str, version: int) -> dict:
    body = manifest_store(path).read(version)
    if body is None:
        raise FileNotFoundError(_manifest_path(path, version))
    return json.loads(body)


def _commit(
    path: str,
    files: list[str],
    op: str,
    parent: int | None,
    meta: dict | None = None,
) -> int:
    """Make a snapshot visible with a true COMPARE-AND-SWAP through
    the zone's `ManifestStore` publication primitive — link(2)
    create-exclusive on POSIX, conditional PUT on object stores
    (see the store classes for why rename-based publication would
    be a TOCTOU race). Exactly one writer per version can ever win;
    losers see `CommitConflictError` and decide rebase/recompute
    upstream. Data files are never shared between in-flight
    commits, so a losing attempt leaves only invisible, vacuumable
    orphans."""
    version = (parent + 1) if parent is not None else 0
    manifest = {
        "version": version,
        "parent": parent,
        "op": op,
        "files": sorted(files),
        "committed_at": time.time(),
        **(meta or {}),
    }
    body = json.dumps(manifest).encode()
    if not manifest_store(path).publish(version, body):
        raise CommitConflictError(
            f"snapshot conflict: v{version} already committed"
        )
    return version


def _backoff(attempt: int) -> None:
    """Jittered backoff between optimistic retries. Deterministic
    inputs only (uuid entropy, not wall-clock): two lockstep losers
    must desynchronize or they re-collide every round."""
    time.sleep(min(0.2, 0.005 * (attempt + 1)) * (1 + uuid.uuid4().int % 7))


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


def _file_stats(abs_path: str) -> dict:
    """Per-column [min, max] for one parquet file, folded across its
    row groups from the FOOTER statistics (no data read). Numeric
    and string leaves only — the types a range predicate prunes on;
    columns without usable stats are simply absent, which readers
    treat as 'cannot prune' (conservative)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(abs_path).metadata
    mins: dict = {}
    maxs: dict = {}
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            lo, hi = st.min, st.max
            if isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode(), hi.decode()
                except UnicodeDecodeError:
                    continue
            if not isinstance(lo, (int, float, str)):
                continue  # timestamps/decimals: not JSON-portable here
            name = col.path_in_schema
            if name in mins:
                mins[name] = min(mins[name], lo)
                maxs[name] = max(maxs[name], hi)
            else:
                mins[name], maxs[name] = lo, hi
    return {c: [mins[c], maxs[c]] for c in mins}


def _collect_stats(path: str, files: list[str]) -> dict:
    """Manifest `stats` entries for freshly written files."""
    return {f: _file_stats(os.path.join(path, f)) for f in files}


def _carried_stats(manifest: dict, files: list[str]) -> dict:
    """Stats of files carried by reference from a parent manifest."""
    parent_stats = manifest.get("stats", {})
    return {f: parent_stats[f] for f in files if f in parent_stats}


def snapshot_write(df: DataFrame, path: str, mode: str = "append") -> int:
    """Commit df as a new snapshot. ``append`` keeps the parent's
    files; ``overwrite`` replaces the logical table — either way the
    previous snapshot stays readable (time travel) until vacuumed.

    Multi-writer safe: the data files are written ONCE; if a
    competing writer wins the manifest CAS, the commit REBASES —
    re-reads the winner's file list and retries with the same
    immutable data files (append-vs-append and overwrite-vs-anything
    never conflict semantically, so rebase needs no recompute).
    Returns the committed version."""
    if mode not in ("append", "overwrite"):
        raise ValueError("mode must be append|overwrite")
    new_files = _write_data_files(df, path)
    new_stats = _collect_stats(path, new_files)
    for attempt in range(_MAX_COMMIT_ATTEMPTS):
        parent = current_version(path)
        base: list[str] = []
        stats = dict(new_stats)
        dvs: list[str] = []
        if mode == "append" and parent is not None:
            pm = _read_manifest(path, parent)
            base = pm["files"]
            stats.update(_carried_stats(pm, base))
            # deletion vectors carry with the files they mask —
            # appended files have no DV entries by construction
            dvs = pm.get("dvs", [])
        if _before_commit_hook is not None:
            _before_commit_hook()
        try:
            return _commit(
                path, base + new_files, mode, parent,
                meta={"stats": stats, "dvs": dvs},
            )
        except CommitConflictError:
            _backoff(attempt)
    raise CommitConflictError(
        f"gave up after {_MAX_COMMIT_ATTEMPTS} attempts at {path}"
    )


_DV_FNAME = "__sz_dv_fname"
_DV_POS = "__sz_dv_pos"


def _apply_dvs(
    spark: SparkSession, path: str, df: DataFrame, dvs: list[str]
) -> DataFrame:
    """Subtract deletion-vector rows from a raw file-list read: an
    ANTI-join on (file basename, in-file row position) against the
    union of the manifest's DV sidecars. Positions come from the
    scan's own `_metadata.row_index` (stable for immutable parquet),
    file identity from the basename (unique by construction — every
    part file name embeds a task UUID and files are never rewritten
    in place, so a DV entry can never alias a different file). The
    join is DISTRIBUTED — DV sidecars are parquet, so a
    billion-row deletion vector is a shuffle, never driver state.
    Entries for files outside the read set (pruned, or rewritten
    away by a later compaction) anti-match nothing — harmless by
    construction."""
    dv = spark.read.parquet(*[os.path.join(path, d) for d in dvs])
    keyed = df.withColumn(
        _DV_FNAME,
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1),
    ).withColumn(_DV_POS, F.col("_metadata.row_index"))
    return keyed.join(
        dv,
        (keyed[_DV_FNAME] == dv["file_name"])
        & (keyed[_DV_POS] == dv["pos"]),
        "left_anti",
    ).drop(_DV_FNAME, _DV_POS)


def snapshot_read(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    prune: dict | None = None,
) -> DataFrame:
    """Read one snapshot (latest by default). Readers never list the
    data directory, so in-flight/crashed writers and unvacuumed old
    files are invisible by construction. If the manifest carries
    DELETION VECTORS (metadata-only deletes — see
    `snapshot_delete_where(strategy="dv")`), their rows are
    subtracted here via a distributed position anti-join.

    ``prune`` = {column: (lo, hi)} skips every data file whose
    manifest [min, max] cannot overlap the range (None bound =
    unbounded side) — manifest-level file skipping, no footer I/O.
    Pruning is an OPTIMIZATION, not a filter: a kept file may still
    contain non-matching rows (callers apply the real predicate;
    files without stats for a pruned column are conservatively
    kept). Returns an empty frame with the snapshot's schema when
    everything prunes away."""
    v = current_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshots at {path}")
    manifest = _read_manifest(path, v)
    files = manifest["files"]
    if not files:
        raise ValueError(f"snapshot v{v} is empty")
    if prune:
        stats = manifest.get("stats", {})
        files = [
            f for f in files if _overlaps(stats.get(f, {}), prune)
        ]
        if not files:
            full = spark.read.parquet(
                os.path.join(path, manifest["files"][0])
            )
            return full.limit(0)
    df = spark.read.parquet(*[os.path.join(path, f) for f in files])
    dvs = manifest.get("dvs", [])
    if dvs:
        df = _apply_dvs(spark, path, df, dvs)
    return df


def _overlaps(file_stats: dict, prune: dict) -> bool:
    """Can this file contain a row satisfying EVERY pruned range?"""
    for col, (lo, hi) in prune.items():
        if col not in file_stats:
            continue  # no stats: cannot exclude
        fmin, fmax = file_stats[col]
        if lo is not None and fmax < lo:
            return False
        if hi is not None and fmin > hi:
            return False
    return True


def snapshot_diff(path: str, v_from: int, v_to: int) -> dict:
    """File-level delta between two snapshots: which data files
    ``v_to`` added and removed relative to ``v_from``, plus the op
    chain between them — the audit primitive behind incremental
    consumers ("process only files added since my last read") and
    change review. Pure manifest arithmetic; no data I/O."""
    mf, mt = _read_manifest(path, v_from), _read_manifest(path, v_to)
    from_files, to_files = set(mf["files"]), set(mt["files"])
    ops = []
    v = v_to
    while v is not None and v > v_from:
        m = _read_manifest(path, v)
        ops.append({"version": v, "op": m["op"]})
        v = m["parent"]
    return {
        "from_version": v_from,
        "to_version": v_to,
        "added": sorted(to_files - from_files),
        "removed": sorted(from_files - to_files),
        "ops": list(reversed(ops)),
    }


def _read_with_file(
    spark: SparkSession, path: str, manifest: dict, with_pos: bool = False
) -> DataFrame:
    """One snapshot's LIVE rows (deletion vectors applied) with a
    `_FILE` column naming each row's data file (and, with
    ``with_pos``, a `_POS` in-file row position). Both are captured
    from `_metadata` ON THE SCAN, before the DV anti-join —
    metadata columns don't resolve through a join, and
    `input_file_name()` after one is undefined (it reports
    whichever scan the task happens to be executing, i.e. the DV
    sidecar) — which is why mutation paths must use this helper
    instead of `snapshot_read().withColumn(input_file_name)`."""
    df = spark.read.parquet(
        *[os.path.join(path, f) for f in manifest["files"]]
    ).withColumn(_FILE, F.col("_metadata.file_path"))
    if with_pos:
        df = df.withColumn(_POS, F.col("_metadata.row_index"))
    dvs = manifest.get("dvs", [])
    if dvs:
        df = _apply_dvs(spark, path, df, dvs)
    return df


def _write_dv_files(matched: DataFrame, path: str) -> str:
    """Write one immutable deletion-vector sidecar (parquet,
    columns `file_name` string / `pos` long) into a fresh
    per-commit directory; returns its zone-relative path. A
    production format would pack positions as roaring bitmaps; the
    parquet encoding keeps the same asymptotics (sorted ints RLE
    well) while staying readable by any engine."""
    dv_id = uuid.uuid4().hex
    dv_dir = os.path.join(path, "dv", dv_id)
    matched.select("file_name", "pos").write.parquet(dv_dir)
    return os.path.join("dv", dv_id)


def snapshot_delete_where(
    spark: SparkSession,
    path: str,
    predicate: F.Column,
    strategy: str = "rewrite",
) -> int:
    """Row-level DELETE at two granularities.

    ``strategy="rewrite"`` (default): FILE granularity — only data
    files that contain matching rows are rewritten (survivors
    copied into the new commit); every other file is carried into
    the new manifest by reference — zero data movement for
    untouched files, and the pre-delete snapshot remains readable.

    ``strategy="dv"``: DELETION VECTORS — the delete writes ONLY a
    (file_name, row_position) sidecar and a new manifest; no data
    file is rewritten at all. This is the modern Delta/Iceberg
    answer to deletes at scale: removing 0.1% of rows from a 100 TB
    zone moves kilobytes of metadata instead of rewriting terabytes
    of survivors. Readers subtract DV rows with a distributed
    anti-join on the scan's own `_metadata.row_index` (see
    `_apply_dvs`); DVs accumulate per commit and are folded back
    into plain files by `snapshot_compact` when read amplification
    warrants it.

    Multi-writer safe by RECOMPUTE under both strategies: a
    delete's read set goes stale the moment a competing commit
    lands — a rebase could resurrect deleted rows (winner re-adds a
    file we already rewrote) or miss new matches. So a CAS loss
    re-runs the whole read (+rewrite) against the winner's
    snapshot; the stale attempt's files/sidecars become invisible
    orphans. Returns rows deleted."""
    if strategy not in ("rewrite", "dv"):
        raise ValueError("strategy must be rewrite|dv")
    if strategy == "dv":
        return _delete_where_dv(spark, path, predicate)
    for attempt in range(_MAX_COMMIT_ATTEMPTS):
        parent = current_version(path)
        if parent is None:
            return 0
        manifest = _read_manifest(path, parent)
        cur = _read_with_file(spark, path, manifest)
        affected = [
            r[0]
            for r in cur.filter(predicate).select(_FILE).distinct().collect()
        ]
        if not affected:
            return 0
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
        if _before_commit_hook is not None:
            _before_commit_hook()
        stats = _carried_stats(manifest, untouched)
        stats.update(_collect_stats(path, new_files))
        try:
            _commit(
                path, untouched + new_files, "delete", parent,
                # DV entries for rewritten files are inert (their
                # file names left the manifest); untouched files
                # keep their masks
                meta={"stats": stats, "dvs": manifest.get("dvs", [])},
            )
            return n_deleted
        except CommitConflictError:
            _backoff(attempt)
    raise CommitConflictError(
        f"gave up after {_MAX_COMMIT_ATTEMPTS} attempts at {path}"
    )


def snapshot_merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    strategy: str = "rewrite",
) -> int:
    """MERGE (upsert) at two granularities.

    ``strategy="rewrite"`` (default): FILE granularity — files
    containing any matching key are rewritten with superseded rows
    replaced; unmatched update rows are inserted; untouched files
    carry by reference. The key-bearing-file search is a semi-join
    on `keys` — at scale it shuffles the (small) update key set,
    not the zone.

    ``strategy="dv"``: DELETION-VECTOR merge (the Delta/Iceberg
    merge-on-read shape) — superseded rows are MASKED by a
    (file, row_position) sidecar and the whole update set is
    APPENDED as new files; no existing file is rewritten. Cost is
    O(|updates|) regardless of zone size; read amplification
    accumulates until `snapshot_compact` folds the masks away.

    Multi-writer safe by RECOMPUTE under both strategies (same
    reasoning as `snapshot_delete_where`: a merge's read set is
    invalidated by any competing commit, so a CAS loss re-runs the
    semi-join (+rewrite) against the winner's snapshot). Returns
    the committed version."""
    if strategy not in ("rewrite", "dv"):
        raise ValueError("strategy must be rewrite|dv")
    if strategy == "dv":
        return _merge_upsert_dv(spark, path, updates, keys)
    for attempt in range(_MAX_COMMIT_ATTEMPTS):
        parent = current_version(path)
        if parent is None:
            # First commit: merging into an empty table inserts the
            # update set — but a competing writer can land v0 between
            # the version read above and the CAS, so commit with
            # parent=None through the SAME recompute loop. Delegating
            # to snapshot_write(mode="overwrite") here would REBASE on
            # conflict and silently replace the winner's rows, which
            # is overwrite semantics, not merge semantics.
            new_files = _write_data_files(updates, path)
            if _before_commit_hook is not None:
                _before_commit_hook()
            try:
                return _commit(
                    path, new_files, "merge", None,
                    meta={"stats": _collect_stats(path, new_files)},
                )
            except CommitConflictError:
                _backoff(attempt)
                continue
        manifest = _read_manifest(path, parent)
        cur = _read_with_file(spark, path, manifest)
        key_df = updates.select(*keys)
        affected = [
            r[0]
            for r in cur.join(key_df, on=keys, how="left_semi")
            .select(_FILE)
            .distinct()
            .collect()
        ]
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
        if _before_commit_hook is not None:
            _before_commit_hook()
        stats = _carried_stats(manifest, untouched)
        stats.update(_collect_stats(path, new_files))
        try:
            return _commit(
                path, untouched + new_files, "merge", parent,
                # same carry rule as delete: untouched files keep
                # their DV masks, rewritten files' entries go inert
                meta={"stats": stats, "dvs": manifest.get("dvs", [])},
            )
        except CommitConflictError:
            _backoff(attempt)
    raise CommitConflictError(
        f"gave up after {_MAX_COMMIT_ATTEMPTS} attempts at {path}"
    )


def _delete_where_dv(
    spark: SparkSession, path: str, predicate: F.Column
) -> int:
    """DELETE as pure metadata (see `snapshot_delete_where`
    strategy="dv"): matching LIVE rows' (file, position) pairs are
    written as one immutable parquet sidecar; the new manifest
    carries the same data files plus the extra vector. Nothing is
    rewritten — cost is O(|matches|) rows of metadata regardless of
    zone size. RECOMPUTE on CAS loss, same as the rewrite strategy
    (a competing commit changes which rows are live)."""
    for attempt in range(_MAX_COMMIT_ATTEMPTS):
        parent = current_version(path)
        if parent is None:
            return 0
        manifest = _read_manifest(path, parent)
        live = _read_with_file(spark, path, manifest, with_pos=True)
        matched = (
            live.filter(predicate)
            .select(
                F.element_at(F.split(F.col(_FILE), "/"), -1).alias(
                    "file_name"
                ),
                F.col(_POS).alias("pos"),
            )
            .persist()
        )
        try:
            n_deleted = matched.count()
            if n_deleted == 0:
                return 0
            dv_rel = _write_dv_files(matched, path)
        finally:
            matched.unpersist(blocking=False)
        if _before_commit_hook is not None:
            _before_commit_hook()
        try:
            _commit(
                path, manifest["files"], "delete-dv", parent,
                meta={
                    "stats": manifest.get("stats", {}),
                    "dvs": manifest.get("dvs", []) + [dv_rel],
                },
            )
            return n_deleted
        except CommitConflictError:
            _backoff(attempt)
    raise CommitConflictError(
        f"gave up after {_MAX_COMMIT_ATTEMPTS} attempts at {path}"
    )


def _merge_upsert_dv(
    spark: SparkSession, path: str, updates: DataFrame, keys: list[str]
) -> int:
    """Merge-on-read (see `snapshot_merge_upsert` strategy="dv"):
    mask every LIVE row whose key appears in `updates` with a
    deletion vector, append the full update set as new files. The
    mask search is a semi-join of the zone against the update keys —
    the same shuffle shape as the rewrite strategy's file search,
    but what lands on disk is one sidecar + the update rows."""
    for attempt in range(_MAX_COMMIT_ATTEMPTS):
        parent = current_version(path)
        if parent is None:
            # same first-commit race discipline as the rewrite form
            new_files = _write_data_files(updates, path)
            if _before_commit_hook is not None:
                _before_commit_hook()
            try:
                return _commit(
                    path, new_files, "merge-dv", None,
                    meta={"stats": _collect_stats(path, new_files)},
                )
            except CommitConflictError:
                _backoff(attempt)
                continue
        manifest = _read_manifest(path, parent)
        live = _read_with_file(spark, path, manifest, with_pos=True)
        key_df = updates.select(*keys)
        superseded = (
            live.join(key_df, on=keys, how="left_semi")
            .select(
                F.element_at(F.split(F.col(_FILE), "/"), -1).alias(
                    "file_name"
                ),
                F.col(_POS).alias("pos"),
            )
            .persist()
        )
        try:
            n_masked = superseded.count()
            dv_rel = (
                _write_dv_files(superseded, path) if n_masked else None
            )
        finally:
            superseded.unpersist(blocking=False)
        # Project onto the zone's column ORDER (same normalization as
        # the rewrite form): parquet schema inference across versions
        # reads all manifest files together, so an update frame with
        # reordered/extra columns must not land as-is.
        cols = [c for c in live.columns if c not in (_FILE, _POS)]
        new_files = _write_data_files(updates.select(*cols), path)
        if _before_commit_hook is not None:
            _before_commit_hook()
        stats = {**manifest.get("stats", {})}
        stats.update(_collect_stats(path, new_files))
        dvs = manifest.get("dvs", []) + ([dv_rel] if dv_rel else [])
        try:
            return _commit(
                path,
                manifest["files"] + new_files,
                "merge-dv",
                parent,
                meta={"stats": stats, "dvs": dvs},
            )
        except CommitConflictError:
            _backoff(attempt)
    raise CommitConflictError(
        f"gave up after {_MAX_COMMIT_ATTEMPTS} attempts at {path}"
    )


def snapshot_compact(spark: SparkSession, path: str) -> int | None:
    """Fold accumulated deletion vectors back into plain data files:
    every DV-MASKED file is rewritten without its deleted rows, the
    new manifest carries no vectors, and reads go back to bare
    scans (no anti-join read amplification). Files without DV
    entries carry by reference — compaction cost is proportional to
    the masked data, not the zone. No-op (returns None) when the
    current snapshot has no vectors; otherwise returns the new
    version. RECOMPUTE on CAS loss."""
    for attempt in range(_MAX_COMMIT_ATTEMPTS):
        parent = current_version(path)
        if parent is None:
            return None
        manifest = _read_manifest(path, parent)
        dvs = manifest.get("dvs", [])
        if not dvs:
            return None
        dv = spark.read.parquet(*[os.path.join(path, d) for d in dvs])
        masked_names = {r[0] for r in dv.select("file_name").distinct().collect()}
        untouched = [
            f
            for f in manifest["files"]
            if os.path.basename(f) not in masked_names
        ]
        masked = [
            f
            for f in manifest["files"]
            if os.path.basename(f) in masked_names
        ]
        new_files: list[str] = []
        if masked:
            live = _read_with_file(
                spark, path, {"files": masked, "dvs": dvs}
            ).drop(_FILE)
            if live.limit(1).count():
                new_files = _write_data_files(live, path)
            elif not untouched:
                # DVs masked every row of every file: a files=[]
                # manifest would flip a readable-empty zone (bare
                # scan + anti-join → 0 rows, valid schema) into an
                # unreadable one (snapshot_read raises on an empty
                # file list).  Carry ONE zero-row data file so the
                # zone keeps its schema.
                new_files = _write_data_files(
                    live.limit(0).coalesce(1), path
                )
        if _before_commit_hook is not None:
            _before_commit_hook()
        stats = _carried_stats(manifest, untouched)
        stats.update(_collect_stats(path, new_files))
        try:
            return _commit(
                path, untouched + new_files, "compact", parent,
                meta={"stats": stats, "dvs": []},
            )
        except CommitConflictError:
            _backoff(attempt)
    raise CommitConflictError(
        f"gave up after {_MAX_COMMIT_ATTEMPTS} attempts at {path}"
    )


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
        new_files = _write_data_files(batch_df, path)
        new_stats = _collect_stats(path, new_files)
        for attempt in range(_MAX_COMMIT_ATTEMPTS):
            # Re-check the epoch ledger inside the loop: the CAS loser
            # may discover the competing commit WAS this very epoch
            # (two replayed drivers racing) — then skipping, not
            # retrying, is what keeps exactly-once.
            last = last_committed_epoch(path)
            if last is not None and batch_id <= last:
                return
            parent = current_version(path)
            dvs: list[str] = []
            if parent is not None:
                pm = _read_manifest(path, parent)
                base = pm["files"]
                stats = {**_carried_stats(pm, base), **new_stats}
                dvs = pm.get("dvs", [])  # appends carry DV masks
            else:
                base, stats = [], dict(new_stats)
            try:
                _commit(
                    path,
                    base + new_files,
                    "stream-append",
                    parent,
                    meta={"epoch": batch_id, "stats": stats, "dvs": dvs},
                )
                return
            except CommitConflictError:
                _backoff(attempt)
        raise CommitConflictError(
            f"gave up after {_MAX_COMMIT_ATTEMPTS} attempts at {path}"
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
    live_dvs: set[str] = set()
    for v in keep:
        m = _read_manifest(path, v)
        live.update(m["files"])
        live_dvs.update(m.get("dvs", []))
    deleted = []
    for p in glob.glob(os.path.join(path, "data", "*", "*.parquet")):
        rel = os.path.relpath(p, path)
        if rel not in live:
            os.remove(p)
            deleted.append(rel)
    # deletion-vector sidecars referenced by no surviving manifest
    # (superseded by later vectors, compaction, or dropped versions)
    import shutil

    for d in glob.glob(os.path.join(path, "dv", "*")):
        rel = os.path.relpath(d, path)
        if rel not in live_dvs:
            shutil.rmtree(d, ignore_errors=True)
            deleted.append(rel)
    store = manifest_store(path)
    for v in store.versions():
        if v not in keep:
            store.delete(v)
    return deleted


def snapshot_added_rows(
    spark: SparkSession,
    path: str,
    since_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Incremental CONSUMPTION: the rows in data files ADDED after
    ``since_version`` — the cheap path a downstream job uses to
    process only what's new since its last run (file-level change
    data feed). Exact for append-only history; after a delete/merge
    the added files also contain REWRITTEN survivors, and a
    deletion-vector delete adds NO files at all so its removals are
    invisible here (both standard file-level CDF caveats — use
    `snapshot_row_diff`, which reads through `snapshot_read` and is
    therefore DV-aware, when row-exact deltas across mutations are
    required). Returns an empty frame with the table schema when
    nothing was added."""
    v_to = current_version(path) if to_version is None else to_version
    if v_to is None:
        raise FileNotFoundError(f"no snapshots at {path}")
    added = snapshot_diff(path, since_version, v_to)["added"]
    if not added:
        return snapshot_read(spark, path, v_to).limit(0)
    return spark.read.parquet(*[os.path.join(path, f) for f in added])


def snapshot_row_diff(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
) -> DataFrame:
    """EXACT row-level delta between two snapshots: every row with a
    different multiplicity in v_to vs v_from, tagged '+' (insert) or
    '-' (delete); an update surfaces as one of each. Computed with
    two exceptAll passes, so duplicate rows diff by multiplicity,
    not set-membership. Scale shape: a full compare is inherently a
    shuffle of both snapshots' rows — this is the audit/backfill
    tool; incremental consumers should prefer `snapshot_added_rows`
    (file-level, reads only new files)."""
    a = snapshot_read(spark, path, v_from)
    b = snapshot_read(spark, path, v_to)
    added = b.exceptAll(a).withColumn("_change", F.lit("+"))
    removed = a.exceptAll(b).withColumn("_change", F.lit("-"))
    return added.unionByName(removed)
