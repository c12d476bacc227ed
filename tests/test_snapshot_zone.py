"""Snapshot-manifest zone: atomic commits, time travel, file-level
DELETE/MERGE, crashed-writer invisibility, vacuum."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from etl_covid19_spark.sources import snapshot_zone as sz


@pytest.fixture()
def zone(spark, tmp_path):
    path = str(tmp_path / "snapzone")
    df = spark.range(100).selectExpr("id", "id % 10 AS k")
    assert sz.snapshot_write(df, path, mode="overwrite") == 0
    return path


def test_append_overwrite_and_time_travel(spark, zone):
    more = spark.range(100, 150).selectExpr("id", "id % 10 AS k")
    v1 = sz.snapshot_write(more, zone, mode="append")
    assert v1 == 1
    assert sz.snapshot_read(spark, zone).count() == 150
    # time travel: v0 still readable after the append
    assert sz.snapshot_read(spark, zone, version=0).count() == 100
    v2 = sz.snapshot_write(
        spark.range(7).selectExpr("id", "id AS k"), zone, mode="overwrite"
    )
    assert v2 == 2
    assert sz.snapshot_read(spark, zone).count() == 7
    assert sz.snapshot_read(spark, zone, version=1).count() == 150


def test_delete_rewrites_only_affected_files(spark, zone):
    # spread v0 across many files so the predicate hits a subset
    df = spark.range(1000).selectExpr("id", "id % 4 AS bucket")
    path = zone + "_many"
    sz.snapshot_write(df.repartition(8, "bucket"), path, mode="overwrite")
    before = set(sz._read_manifest(path, 0)["files"])

    n = sz.snapshot_delete_where(spark, path, F.col("bucket") == 3)
    assert n == 250
    after = set(sz._read_manifest(path, 1)["files"])
    carried = before & after
    assert carried, "untouched files must carry by reference"
    # deleted rows are gone, survivors intact, old snapshot unchanged
    cur = sz.snapshot_read(spark, path)
    assert cur.filter("bucket = 3").count() == 0
    assert cur.count() == 750
    assert sz.snapshot_read(spark, path, version=0).count() == 1000


def test_merge_upsert_file_granularity(spark, zone):
    updates = spark.createDataFrame(
        [(5, 500), (6, 600), (999, 999)], "id long, k long"
    )
    v = sz.snapshot_merge_upsert(spark, zone, updates, keys=["id"])
    assert v == 1
    cur = sz.snapshot_read(spark, zone)
    got = {r.id: r.k for r in cur.collect()}
    assert got[5] == 500 and got[6] == 600  # matched → updated
    assert got[999] == 999  # unmatched → inserted
    assert len(got) == 101
    assert got[7] == 7  # untouched row intact


def test_crashed_writer_is_invisible(spark, zone):
    """Data files without a committed manifest must not affect
    readers — the atomicity contract."""
    orphan = spark.range(5000).selectExpr("id", "id AS k")
    sz._write_data_files(orphan, zone)  # simulate crash pre-commit
    assert sz.snapshot_read(spark, zone).count() == 100


def test_vacuum_drops_orphans_and_old_versions(spark, zone):
    sz._write_data_files(
        spark.range(10).selectExpr("id", "id AS k"), zone
    )  # orphan
    sz.snapshot_write(
        spark.range(3).selectExpr("id", "id AS k"), zone, mode="overwrite"
    )
    deleted = sz.vacuum(zone, keep_versions=1)
    assert deleted  # orphan + v0 files removed
    assert sz.current_version(zone) == 1
    assert sz.snapshot_read(spark, zone).count() == 3
    with pytest.raises(FileNotFoundError):
        sz._read_manifest(zone, 0)
    # nothing dangling on disk beyond the live snapshot
    live = set(sz._read_manifest(zone, 1)["files"])
    on_disk = {
        os.path.relpath(p, zone)
        for p in glob.glob(os.path.join(zone, "data", "*", "*.parquet"))
    }
    assert on_disk == live


def test_commit_conflict_raises(spark, zone):
    files = sz._read_manifest(zone, 0)["files"]
    with pytest.raises(RuntimeError, match="conflict"):
        sz._commit(zone, files, "append", parent=None)  # v0 exists


def test_streaming_sink_is_exactly_once(spark, tmp_path):
    """A real availableNow file-stream drive lands every input row
    exactly once; replaying an epoch (simulated post-commit crash →
    Structured Streaming redelivery under the same batch_id) commits
    nothing new; the next epoch appends."""
    src = str(tmp_path / "stream_src")
    path = str(tmp_path / "stream_zone")
    cp = str(tmp_path / "cp")
    spark.range(100).selectExpr("id", "id % 5 AS k").write.parquet(src)

    sink = sz.streaming_snapshot_sink(path)
    stream = spark.readStream.schema("id long, k long").parquet(src)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sz.snapshot_read(spark, path).count() == 100
    v_after = sz.current_version(path)
    epoch = sz.last_committed_epoch(path)

    # redelivery of the same epoch: no new snapshot, no duplicates
    replay = spark.range(100).selectExpr("id", "id % 5 AS k")
    sink(replay, epoch)
    assert sz.current_version(path) == v_after
    assert sz.snapshot_read(spark, path).count() == 100

    # the next epoch appends atomically
    sink(spark.range(100, 130).selectExpr("id", "id % 5 AS k"), epoch + 1)
    assert sz.snapshot_read(spark, path).count() == 130
    assert sz.last_committed_epoch(path) == epoch + 1


def test_cas_rejects_duplicate_version(spark, tmp_path):
    """The commit primitive itself: exactly one writer can own a
    version. os.link's EEXIST is atomic — no check-then-rename
    window in which a second writer could silently replace the
    first's manifest (os.rename REPLACES on POSIX)."""
    path = str(tmp_path / "casz")
    df = spark.range(5).selectExpr("id", "id AS k")
    files = sz._write_data_files(df, path)
    assert sz._commit(path, files, "append", parent=None) == 0
    with pytest.raises(sz.CommitConflictError):
        sz._commit(path, files, "append", parent=None)
    # the losing attempt must not have clobbered the winner
    assert sz._read_manifest(path, 0)["files"] == sorted(files)


def test_append_append_race_rebases_no_commit_lost(spark, tmp_path):
    """Two interleaved appenders: writer A computes parent=v0, then
    writer B lands v1 before A's CAS. A must lose exactly once,
    rebase onto B's manifest, and commit v2 containing BOTH
    writers' files — no committed file lost, no data rewritten."""
    path = str(tmp_path / "racez")
    base = spark.range(10).selectExpr("id", "id AS k")
    a_df = spark.range(100, 110).selectExpr("id", "id AS k")
    b_df = spark.range(200, 210).selectExpr("id", "id AS k")
    sz.snapshot_write(base, path, mode="overwrite")  # v0

    state = {"fired": 0}

    def competing_commit():
        if state["fired"] == 0:
            state["fired"] += 1
            # writer B wins v1 in the window between A's parent read
            # and A's CAS — the exact interleaving of a real race
            sz.snapshot_write(b_df, path, mode="append")

    sz._before_commit_hook = competing_commit
    try:
        v = sz.snapshot_write(a_df, path, mode="append")
    finally:
        sz._before_commit_hook = None

    assert v == 2, "A lost v1 to B and rebased to v2"
    assert state["fired"] == 1, "exactly one conflicting writer retried"
    m1, m2 = sz._read_manifest(path, 1), sz._read_manifest(path, 2)
    # B's v1 files all survive into A's rebased v2
    assert set(m1["files"]) <= set(m2["files"])
    got = {
        r.id for r in sz.snapshot_read(spark, path).select("id").collect()
    }
    assert got == set(range(10)) | set(range(100, 110)) | set(range(200, 210))


def test_delete_recomputes_against_winner_snapshot(spark, tmp_path):
    """Delete-vs-append race: the competing append lands rows that
    MATCH the delete predicate after the delete computed its read
    set. A rebase would miss them (stale affected-file list); the
    recompute loop must re-scan the winner's snapshot and delete
    them too — snapshot isolation with write-write correctness."""
    path = str(tmp_path / "delrace")
    df = spark.range(100).selectExpr("id", "id % 4 AS bucket")
    sz.snapshot_write(df.repartition(4, "bucket"), path, mode="overwrite")
    late = spark.range(1000, 1010).selectExpr("id", "CAST(3 AS bigint) AS bucket")

    state = {"fired": 0}

    def competing_commit():
        if state["fired"] == 0:
            state["fired"] += 1
            sz.snapshot_write(late, path, mode="append")

    sz._before_commit_hook = competing_commit
    try:
        n = sz.snapshot_delete_where(spark, path, F.col("bucket") == 3)
    finally:
        sz._before_commit_hook = None

    assert state["fired"] == 1
    # 25 original bucket-3 rows + 10 late-landing bucket-3 rows
    assert n == 35
    cur = sz.snapshot_read(spark, path)
    assert cur.filter("bucket = 3").count() == 0
    assert cur.count() == 75


def test_merge_recomputes_against_winner_snapshot(spark, tmp_path):
    """Merge-vs-append race: the winner's appended rows share a key
    with the merge's updates; the recompute must supersede them
    instead of double-keeping (a rebase would leave two rows for
    the same key)."""
    path = str(tmp_path / "mergerace")
    df = spark.range(50).selectExpr("id", "id * 10 AS val")
    sz.snapshot_write(df, path, mode="overwrite")
    updates = spark.createDataFrame(
        [(7, 777), (1007, 777)], "id long, val long"
    )
    racing = spark.createDataFrame([(7, -1)], "id long, val long")

    state = {"fired": 0}

    def competing_commit():
        if state["fired"] == 0:
            state["fired"] += 1
            sz.snapshot_write(racing, path, mode="append")

    sz._before_commit_hook = competing_commit
    try:
        sz.snapshot_merge_upsert(spark, path, updates, keys=["id"])
    finally:
        sz._before_commit_hook = None

    assert state["fired"] == 1
    cur = sz.snapshot_read(spark, path)
    rows = {r.id: r.val for r in cur.collect()}
    assert cur.count() == 51, "one row per key: racing id=7 superseded"
    assert rows[7] == 777 and rows[1007] == 777


def test_manifest_stats_prune_files_without_footer_io(spark, tmp_path):
    """Manifest-level file skipping: per-file [min, max] recorded at
    commit time lets a range read skip files entirely from the
    manifest — and pruning must stay an optimization: pruned read +
    real filter == full read + real filter."""
    path = str(tmp_path / "statz")
    # three disjoint id ranges in three separate commits -> 3+ files
    for lo in (0, 1000, 2000):
        sz.snapshot_write(
            spark.range(lo, lo + 100).selectExpr("id", "id % 7 AS k"),
            path,
            mode="append",
        )
    m = sz._read_manifest(path, sz.current_version(path))
    assert set(m["stats"]) == set(m["files"]), "every file has stats"
    for f, st in m["stats"].items():
        assert "id" in st and st["id"][0] <= st["id"][1]

    pruned = sz.snapshot_read(spark, path, prune={"id": (1000, 1099)})
    # only the middle commit's files are read
    read_files = {os.path.basename(f) for f in pruned.inputFiles()}
    mid = {
        os.path.basename(f)
        for f in m["files"]
        if m["stats"][f]["id"][0] >= 1000 and m["stats"][f]["id"][1] <= 1099
    }
    assert read_files == mid and len(read_files) < len(m["files"])
    # correctness: same rows as the unpruned read with the filter
    full = sz.snapshot_read(spark, path).filter("id BETWEEN 1000 AND 1099")
    assert sorted(r.id for r in pruned.filter(
        "id BETWEEN 1000 AND 1099").collect()
    ) == sorted(r.id for r in full.collect())


def test_time_travel_prune_equals_unpruned(spark, tmp_path):
    """Pruning a TIME-TRAVEL read is the same manifest min/max skip
    as pruning the live read — version only selects whose stats to
    skip against (round-10 scale fix: the unpruned version-0 read
    re-scanned the whole base slice at sf100). Pinned: pruned v0 +
    real filter ≡ unpruned v0 + real filter, files actually skip,
    and a later append/DV never bleeds into the pruned v0 read."""
    path = str(tmp_path / "ttprune")
    sz.snapshot_write(
        spark.range(300).selectExpr("id", "id % 7 AS k")
        .repartitionByRange(6, "id"),
        path,
        mode="overwrite",
    )
    sz.snapshot_write(
        spark.range(300, 600).selectExpr("id", "id % 7 AS k")
        .repartitionByRange(6, "id"),
        path,
        mode="append",
    )
    sz.snapshot_delete_where(spark, path, F.col("k") == 3, strategy="dv")

    rng = {"id": (100, 149)}
    pruned = sz.snapshot_read(spark, path, version=0, prune=rng)
    full = sz.snapshot_read(spark, path, version=0)
    m0 = sz._read_manifest(path, 0)
    assert len(
        {os.path.basename(f) for f in pruned.inputFiles()}
    ) < len(m0["files"]), "v0 read must skip files on manifest stats"
    got = sorted(
        r.id for r in pruned.filter("id BETWEEN 100 AND 149").collect()
    )
    want = sorted(
        r.id for r in full.filter("id BETWEEN 100 AND 149").collect()
    )
    assert got == want == list(range(100, 150))
    # the live DV delete must not leak into the versioned read
    assert full.filter("k = 3").count() > 0


def test_prune_can_skip_everything_and_carries_through_mutations(
    spark, tmp_path
):
    path = str(tmp_path / "statz2")
    sz.snapshot_write(
        spark.range(100).selectExpr("id", "id % 4 AS bucket"),
        path, mode="overwrite",
    )
    empty = sz.snapshot_read(spark, path, prune={"id": (10_000, None)})
    assert empty.count() == 0
    assert empty.schema == sz.snapshot_read(spark, path).schema
    # stats survive a delete's carried-by-reference files
    sz.snapshot_delete_where(spark, path, F.col("bucket") == 3)
    m = sz._read_manifest(path, sz.current_version(path))
    assert set(m["stats"]) == set(m["files"])


def test_snapshot_diff_reports_file_deltas(spark, tmp_path):
    path = str(tmp_path / "diffz")
    sz.snapshot_write(
        spark.range(100).selectExpr("id", "id % 4 AS bucket"),
        path, mode="overwrite",
    )  # v0
    sz.snapshot_write(
        spark.range(100, 150).selectExpr("id", "id % 4 AS bucket"),
        path, mode="append",
    )  # v1
    sz.snapshot_delete_where(spark, path, F.col("bucket") == 0)  # v2
    d = sz.snapshot_diff(path, 0, 2)
    assert [o["op"] for o in d["ops"]] == ["append", "delete"]
    m0 = set(sz._read_manifest(path, 0)["files"])
    m2 = set(sz._read_manifest(path, 2)["files"])
    assert set(d["added"]) == m2 - m0
    assert set(d["removed"]) == m0 - m2
    assert d["removed"], "the delete rewrote at least one v0 file"


def test_concurrent_appenders_lose_no_commits(spark, tmp_path):
    """Live-race stress (no test seam): 6 threads append disjoint id
    ranges concurrently through the real CAS + rebase path. Every
    commit must land (6 appends + the base = version 6), every
    writer's rows must be readable, and the version chain must be a
    single unbroken parent line."""
    import threading

    path = str(tmp_path / "stress")
    sz.snapshot_write(
        spark.range(10).selectExpr("id", "id AS k"), path,
        mode="overwrite",
    )
    errs = []
    barrier = threading.Barrier(6)

    def appender(i):
        try:
            barrier.wait(timeout=30)
            df = spark.range(1000 * (i + 1), 1000 * (i + 1) + 50).selectExpr(
                "id", "id AS k"
            )
            sz.snapshot_write(df, path, mode="append")
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    threads = [threading.Thread(target=appender, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs, errs
    assert sz.current_version(path) == 6, "one version per append, none lost"
    # unbroken parent chain
    for v in range(1, 7):
        assert sz._read_manifest(path, v)["parent"] == v - 1
    got = {r.id for r in sz.snapshot_read(spark, path).select("id").collect()}
    expect = set(range(10))
    for i in range(6):
        expect |= set(range(1000 * (i + 1), 1000 * (i + 1) + 50))
    assert got == expect, "every writer's rows are present exactly"
    # stats carried/collected for every live file
    m = sz._read_manifest(path, 6)
    assert set(m["stats"]) == set(m["files"])


def test_incremental_added_rows_and_row_diff(spark, tmp_path):
    path = str(tmp_path / "cdc")
    sz.snapshot_write(
        spark.range(100).selectExpr("id", "id * 10 AS val"), path,
        mode="overwrite",
    )  # v0
    sz.snapshot_write(
        spark.range(100, 120).selectExpr("id", "id * 10 AS val"), path,
        mode="append",
    )  # v1
    inc = sz.snapshot_added_rows(spark, path, since_version=0)
    assert {r.id for r in inc.collect()} == set(range(100, 120))
    # nothing new between v1 and v1: empty, schema preserved
    none = sz.snapshot_added_rows(spark, path, 1, 1)
    assert none.count() == 0 and none.schema == inc.schema

    # merge updates one row and inserts one -> row-exact delta
    updates = spark.createDataFrame(
        [(5, -1), (500, 1)], "id long, val long"
    )
    sz.snapshot_merge_upsert(spark, path, updates, keys=["id"])  # v2
    d = {(r.id, r.val, r._change)
         for r in sz.snapshot_row_diff(spark, path, 1, 2).collect()}
    assert d == {
        (5, -1, "+"), (500, 1, "+"),   # new value + fresh insert
        (5, 50, "-"),                  # superseded old value
    }
    # file-level feed over the merge includes rewritten survivors —
    # documented caveat: superset of the row-exact inserts
    feed = {r.id for r in sz.snapshot_added_rows(spark, path, 1).collect()}
    assert {5, 500} <= feed


def test_merge_first_commit_race_preserves_winner_rows(spark, tmp_path):
    """Merge into an EMPTY table racing a writer that lands v0: the
    merge must recompute against the winner's snapshot (upsert
    semantics), not rebase-overwrite it — the winner's non-matching
    rows survive, its matching row is superseded (round-4 advisory:
    the old parent-None path delegated to an overwrite write whose
    rebase silently dropped the winner's commit)."""
    import etl_covid19_spark.sources.snapshot_zone as sz

    path = str(tmp_path / "mergerace0")
    updates = spark.createDataFrame(
        [(7, 777), (8, 888)], "id long, val long"
    )
    racing = spark.createDataFrame(
        [(7, -1), (100, 100)], "id long, val long"
    )
    state = {"fired": 0}

    def competing_commit():
        if state["fired"] == 0:
            state["fired"] += 1
            sz.snapshot_write(racing, path, mode="overwrite")

    sz._before_commit_hook = competing_commit
    try:
        sz.snapshot_merge_upsert(spark, path, updates, keys=["id"])
    finally:
        sz._before_commit_hook = None

    assert state["fired"] == 1
    rows = {r.id: r.val for r in sz.snapshot_read(spark, path).collect()}
    assert rows == {7: 777, 8: 888, 100: 100}


def test_conditional_put_store_models_object_store_contract():
    """The object-store publication primitive in isolation: exactly
    one of N concurrent conditional PUTs per key wins, losers get
    the 412 path, and a read returns a complete body or None —
    never a partial."""
    import threading

    store = sz.ConditionalPutManifestStore()
    wins = []
    barrier = threading.Barrier(8)

    def putter(i):
        barrier.wait(timeout=30)
        if store.publish(5, f"body-{i}".encode()):
            wins.append(i)

    threads = [threading.Thread(target=putter, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert len(wins) == 1, "conditional PUT accepted more than one writer"
    assert store.read(5) == f"body-{wins[0]}".encode()
    assert store.read(4) is None
    assert store.versions() == [5]
    store.delete(5)
    assert store.read(5) is None


def test_full_protocol_races_clean_on_conditional_put(spark, tmp_path):
    """The SAME multi-writer protocol (CAS + rebase/recompute), zero
    code changes, driven against the object-store store instead of
    link(2): 5 racing appenders + a racing delete all land, the
    parent chain is unbroken, and no manifest file ever appears on
    the local filesystem (proof the zone used conditional PUT, not
    rename/link)."""
    import threading

    path = str(tmp_path / "objstore")
    store = sz.ConditionalPutManifestStore()
    sz.set_manifest_store(path, store)
    try:
        sz.snapshot_write(
            spark.range(20).selectExpr("id", "id AS k"), path,
            mode="overwrite",
        )
        errs = []
        barrier = threading.Barrier(6)

        def appender(i):
            try:
                barrier.wait(timeout=30)
                df = spark.range(100 * (i + 1), 100 * (i + 1) + 10).selectExpr(
                    "id", "id AS k"
                )
                sz.snapshot_write(df, path, mode="append")
            except Exception as e:  # pragma: no cover
                errs.append(e)

        def deleter():
            try:
                barrier.wait(timeout=30)
                sz.snapshot_delete_where(
                    spark, path, F.expr("id >= 15 AND id < 20")
                )
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [
            threading.Thread(target=appender, args=(i,)) for i in range(5)
        ] + [threading.Thread(target=deleter)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errs, errs
        assert sz.current_version(path) == 6
        for v in range(1, 7):
            assert sz._read_manifest(path, v)["parent"] == v - 1
        got = {r.id for r in sz.snapshot_read(spark, path).select("id").collect()}
        expect = set(range(15))
        for i in range(5):
            expect |= set(range(100 * (i + 1), 100 * (i + 1) + 10))
        assert got == expect
        assert store.put_attempts > 7, "losers retried through the store"
        assert not glob.glob(
            os.path.join(path, "_manifests", "*")
        ), "no manifest touched the filesystem — publication was PUT-only"
        # time travel still works against the object store
        assert {r.id for r in sz.snapshot_read(spark, path, version=0).collect()} == set(range(20))
    finally:
        sz.set_manifest_store(path, None)


def test_vacuum_routes_through_manifest_store(spark, tmp_path):
    path = str(tmp_path / "objvac")
    store = sz.ConditionalPutManifestStore()
    sz.set_manifest_store(path, store)
    try:
        sz.snapshot_write(spark.range(5).selectExpr("id", "id AS k"), path, mode="overwrite")
        sz.snapshot_write(spark.range(5, 9).selectExpr("id", "id AS k"), path, mode="append")
        sz.snapshot_write(spark.range(9, 12).selectExpr("id", "id AS k"), path, mode="append")
        sz.vacuum(path, keep_versions=1)
        assert store.versions() == [2], "old manifests deleted via the store"
        got = {r.id for r in sz.snapshot_read(spark, path).select("id").collect()}
        assert got == set(range(12))
    finally:
        sz.set_manifest_store(path, None)


def _zone(spark, tmp_path, name="dvz", n=100):
    path = str(tmp_path / name)
    sz.snapshot_write(
        spark.range(n).selectExpr("id", "id % 7 AS k"), path,
        mode="overwrite",
    )
    return path


def test_dv_delete_is_metadata_only(spark, tmp_path):
    """strategy='dv' must not touch a single data file: same file
    list in the manifest, same bytes on disk — the delete is one
    parquet sidecar plus a manifest."""
    path = _zone(spark, tmp_path)
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(path, "data", "*", "*.parquet"))
    }
    n = sz.snapshot_delete_where(
        spark, path, F.col("k") == 3, strategy="dv"
    )
    assert n == 14  # ids 3,10,17,...,94
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(path, "data", "*", "*.parquet"))
    }
    assert before == after, "a data file changed under a dv delete"
    m0, m1 = sz._read_manifest(path, 0), sz._read_manifest(path, 1)
    assert m1["files"] == m0["files"]
    assert m1["op"] == "delete-dv" and len(m1["dvs"]) == 1
    got = {r.id for r in sz.snapshot_read(spark, path).collect()}
    assert got == {i for i in range(100) if i % 7 != 3}


def test_dv_stacking_time_travel_and_prune(spark, tmp_path):
    path = _zone(spark, tmp_path)
    sz.snapshot_delete_where(spark, path, F.col("k") == 3, strategy="dv")
    n2 = sz.snapshot_delete_where(
        spark, path, F.col("id") < 10, strategy="dv"
    )
    assert n2 == 9, "rows already dv-deleted must not re-count"
    assert len(sz._read_manifest(path, 2)["dvs"]) == 2
    got = {r.id for r in sz.snapshot_read(spark, path).collect()}
    assert got == {i for i in range(10, 100) if i % 7 != 3}
    # each version sees exactly its own vectors
    v1 = {r.id for r in sz.snapshot_read(spark, path, version=1).collect()}
    assert v1 == {i for i in range(100) if i % 7 != 3}
    v0 = {r.id for r in sz.snapshot_read(spark, path, version=0).collect()}
    assert v0 == set(range(100))
    # manifest-level pruning composes with the dv anti-join
    pruned = sz.snapshot_read(spark, path, prune={"id": (50, None)})
    assert {r.id for r in pruned.filter("id >= 50").collect()} == {
        i for i in range(50, 100) if i % 7 != 3
    }


def test_dv_carry_through_append_and_merge(spark, tmp_path):
    path = _zone(spark, tmp_path)
    sz.snapshot_delete_where(spark, path, F.col("k") == 3, strategy="dv")
    sz.snapshot_write(
        spark.range(1000, 1010).selectExpr("id", "id % 7 AS k"),
        path,
        mode="append",
    )
    got = {r.id for r in sz.snapshot_read(spark, path).collect()}
    assert got == {i for i in range(100) if i % 7 != 3} | set(
        range(1000, 1010)
    ), "append dropped the deletion vectors"
    # merge on a dv-masked zone: updates replace, dv'd rows stay dead
    upd = spark.createDataFrame(
        [(5, 500), (3, 300)], "id long, k long"
    )
    sz.snapshot_merge_upsert(spark, path, upd, keys=["id"])
    rows = {r.id: r.k for r in sz.snapshot_read(spark, path).collect()}
    assert rows[5] == 500 and rows[3] == 300  # upsert re-inserts id=3
    assert 10 not in rows or rows[10] != None  # sanity
    assert {i for i in range(100) if i % 7 == 3 and i != 3}.isdisjoint(
        rows
    ), "merge resurrected dv-deleted rows"


def test_dv_compact_folds_vectors_and_vacuum_reclaims(spark, tmp_path):
    path = _zone(spark, tmp_path)
    sz.snapshot_delete_where(spark, path, F.col("k") == 3, strategy="dv")
    sz.snapshot_delete_where(
        spark, path, F.col("id") < 10, strategy="dv"
    )
    live_before = {
        r.id for r in sz.snapshot_read(spark, path).collect()
    }
    v = sz.snapshot_compact(spark, path)
    m = sz._read_manifest(path, v)
    assert m["dvs"] == [] and m["op"] == "compact"
    assert {
        r.id for r in sz.snapshot_read(spark, path).collect()
    } == live_before
    assert sz.snapshot_compact(spark, path) is None, "no-op without dvs"
    deleted = sz.vacuum(path, keep_versions=1)
    assert not glob.glob(os.path.join(path, "dv", "*")), (
        "orphaned dv sidecars survived vacuum: " + str(deleted)
    )
    assert {
        r.id for r in sz.snapshot_read(spark, path).collect()
    } == live_before


def test_dv_delete_races_append_via_recompute(spark, tmp_path):
    """A competing append lands between the dv computation and its
    CAS; the dv delete must recompute against the winner so the
    final table has the appended rows and none of the matched
    ones."""
    path = _zone(spark, tmp_path)
    fired = {"done": False}

    def compete():
        if not fired["done"]:
            fired["done"] = True
            sz.snapshot_write(
                spark.range(200, 205).selectExpr("id", "id % 7 AS k"),
                path,
                mode="append",
            )

    sz._before_commit_hook = compete
    try:
        n = sz.snapshot_delete_where(
            spark, path, F.col("k") == 3, strategy="dv"
        )
    finally:
        sz._before_commit_hook = None
    got = {r.id for r in sz.snapshot_read(spark, path).collect()}
    expect = {i for i in range(100) if i % 7 != 3} | {
        i for i in range(200, 205) if i % 7 != 3
    }
    assert got == expect
    assert n == len(
        {i for i in range(100) if i % 7 == 3}
        | {i for i in range(200, 205) if i % 7 == 3}
    )


@pytest.mark.parametrize(
    "pred_sql",
    [
        "k = 3",
        "id % 11 < 4",
        "id >= 37 AND id < 71",
        "k IN (1, 4) OR id = 99",
    ],
)
def test_dv_delete_equals_rewrite_delete(spark, tmp_path, pred_sql):
    """DIFFERENTIAL: for the same predicate, strategy='dv' and
    strategy='rewrite' must report the same deleted count and leave
    byte-identical surviving tables — the two granularities are
    implementations of one semantics."""
    rows = spark.range(120).selectExpr("id", "id % 7 AS k")
    pa, pb = str(tmp_path / "dv_side"), str(tmp_path / "rw_side")
    for p in (pa, pb):
        sz.snapshot_write(rows.repartition(6), p, mode="overwrite")
    n_dv = sz.snapshot_delete_where(
        spark, pa, F.expr(pred_sql), strategy="dv"
    )
    n_rw = sz.snapshot_delete_where(
        spark, pb, F.expr(pred_sql), strategy="rewrite"
    )
    assert n_dv == n_rw
    got_dv = sorted(
        tuple(r) for r in sz.snapshot_read(spark, pa).collect()
    )
    got_rw = sorted(
        tuple(r) for r in sz.snapshot_read(spark, pb).collect()
    )
    assert got_dv == got_rw
    # and compaction of the dv side changes nothing visible
    sz.snapshot_compact(spark, pa)
    assert (
        sorted(tuple(r) for r in sz.snapshot_read(spark, pa).collect())
        == got_rw
    )


def test_row_diff_sees_dv_deletes(spark, tmp_path):
    """snapshot_row_diff reads through snapshot_read, so a
    metadata-only dv delete surfaces as '-' rows even though no
    data file changed."""
    path = _zone(spark, tmp_path, name="dvdiff", n=30)
    sz.snapshot_delete_where(spark, path, F.col("k") == 2, strategy="dv")
    d = sz.snapshot_row_diff(spark, path, 0, 1)
    changes = {(r.id, r._change) for r in d.collect()}
    assert changes == {
        (i, "-") for i in range(30) if i % 7 == 2
    }, "dv delete must appear as removals and nothing else"


def test_dv_merge_equals_rewrite_merge(spark, tmp_path):
    """DIFFERENTIAL: merge-on-read (strategy='dv') and the rewrite
    merge must produce identical tables; the dv side must not
    rewrite any pre-existing data file."""
    rows = spark.range(80).selectExpr("id", "id % 9 AS k")
    pa, pb = str(tmp_path / "mdv"), str(tmp_path / "mrw")
    for p in (pa, pb):
        sz.snapshot_write(rows.repartition(5), p, mode="overwrite")
    upd = spark.createDataFrame(
        [(5, 500), (17, 1700), (200, 2000)], "id long, k long"
    )
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(pa, "data", "*", "*.parquet"))
    }
    sz.snapshot_merge_upsert(spark, pa, upd, keys=["id"], strategy="dv")
    sz.snapshot_merge_upsert(spark, pb, upd, keys=["id"])
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(pa, "data", "*", "*.parquet"))
        if p in before
    }
    assert before == after, "dv merge rewrote a pre-existing file"
    got_dv = sorted(tuple(r) for r in sz.snapshot_read(spark, pa).collect())
    got_rw = sorted(tuple(r) for r in sz.snapshot_read(spark, pb).collect())
    assert got_dv == got_rw
    m = sz._read_manifest(pa, 1)
    assert m["op"] == "merge-dv" and len(m["dvs"]) == 1
    # masked rows stay dead after compaction; updates survive
    sz.snapshot_compact(spark, pa)
    assert (
        sorted(tuple(r) for r in sz.snapshot_read(spark, pa).collect())
        == got_rw
    )
    # dv merge into an empty zone = plain insert
    pc = str(tmp_path / "mempty")
    sz.snapshot_merge_upsert(spark, pc, upd, keys=["id"], strategy="dv")
    assert sz.snapshot_read(spark, pc).count() == 3


def test_compact_after_deleting_every_row_keeps_zone_readable(spark, tmp_path):
    """Round-7 ADVICE: DVs masking EVERY row used to compact into a
    files=[] manifest, flipping a readable-empty zone into one
    snapshot_read rejects. Compaction must carry a zero-row data
    file so the schema survives."""
    path = str(tmp_path / "allgone")
    df = spark.range(50).selectExpr("id", "id % 5 AS k")
    sz.snapshot_write(df, path, mode="overwrite")
    n = sz.snapshot_delete_where(spark, path, F.col("id") >= 0, strategy="dv")
    assert n == 50
    # dv-read form: zero rows, schema intact
    assert sz.snapshot_read(spark, path).count() == 0
    v = sz.snapshot_compact(spark, path)
    assert v is not None
    out = sz.snapshot_read(spark, path)
    assert out.count() == 0
    assert set(out.columns) == {"id", "k"}
    m = sz._read_manifest(path, v)
    assert m["dvs"] == [] and len(m["files"]) == 1


def test_merge_upsert_dv_normalizes_update_column_order(spark, tmp_path):
    """Round-7 ADVICE: the DV merge appended `updates` verbatim, so a
    reordered/extra-column update frame corrupted cross-version
    schema inference. It must project onto the zone's columns (the
    rewrite strategy already did)."""
    path = str(tmp_path / "dvproj")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, name string, v double"
    )
    sz.snapshot_write(base, path, mode="overwrite")
    # reordered columns + an extra one the zone doesn't carry
    updates = spark.createDataFrame(
        [(99.0, "B2", 2, "junk"), (30.0, "c", 3, "junk")],
        "v double, name string, id long, extra string",
    )
    sz.snapshot_merge_upsert(spark, path, updates, keys=["id"], strategy="dv")
    out = sz.snapshot_read(spark, path)
    assert out.columns == ["id", "name", "v"]  # zone order, no 'extra'
    got = {r.id: (r.name, r.v) for r in out.collect()}
    assert got == {1: ("a", 10.0), 2: ("B2", 99.0), 3: ("c", 30.0)}
