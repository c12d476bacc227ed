"""Training-export sink: deterministic JSONL shards + manifest
verification (sources/export.py). Sink surface — not oracle-
queryable, so correctness is pinned here: determinism, balance,
round-trip, and corruption detection."""

import json
import shutil

import pytest
from pyspark.sql import functions as F

from etl_covid19_spark.sources.export import (
    MANIFEST_NAME,
    export_jsonl_shards,
    verify_jsonl_shards,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_export_roundtrip_and_verify(spark, docs, tmp_path):
    out = str(tmp_path / "exp")
    manifest = export_jsonl_shards(
        docs, out, id_col="doc_id", text_col="text", n_shards=4
    )
    assert manifest["total_rows"] == docs.count()
    assert sorted(manifest["shards"]) == ["0", "1", "2", "3"]
    # verify passes on intact output
    assert verify_jsonl_shards(spark, out)["total_rows"] == docs.count()
    # every row present exactly once after re-read
    back = spark.read.option("basePath", out).json(out + "/shard=*")
    assert back.count() == docs.count()
    assert (
        back.select("doc_id").distinct().count()
        == docs.select("doc_id").distinct().count()
    )
    # token totals match the source
    from etl_covid19_spark.functions import text as TX

    want = docs.agg(
        F.sum(TX.token_count("text").cast("bigint"))
    ).first()[0]
    assert sum(s["tokens"] for s in manifest["shards"].values()) == want


def test_export_deterministic(spark, docs, tmp_path):
    a = export_jsonl_shards(
        docs, str(tmp_path / "a"), id_col="doc_id", n_shards=4
    )
    b = export_jsonl_shards(
        docs.repartition(13), str(tmp_path / "b"), id_col="doc_id", n_shards=4
    )
    # same data, any input partitioning -> identical manifests
    # (shard assignment is content-hashed; checksums order-invariant)
    assert a["shards"] == b["shards"]


def test_export_shards_balanced(spark, docs, tmp_path):
    m = export_jsonl_shards(
        docs, str(tmp_path / "bal"), id_col="doc_id", n_shards=4
    )
    sizes = [s["rows"] for s in m["shards"].values()]
    assert max(sizes) <= 2 * min(sizes)  # hash-uniform, 500 rows


def test_verify_detects_corruption(spark, docs, tmp_path):
    out = str(tmp_path / "cor")
    export_jsonl_shards(docs, out, id_col="doc_id", n_shards=2)
    # tamper: drop one shard's files entirely
    shutil.rmtree(out + "/shard=1")
    with pytest.raises(ValueError, match="shard verification failed"):
        verify_jsonl_shards(spark, out)


def test_verify_detects_content_edit(spark, docs, tmp_path):
    out = str(tmp_path / "edit")
    export_jsonl_shards(docs, out, id_col="doc_id", n_shards=2)
    import glob

    victim = sorted(glob.glob(out + "/shard=0/*.json"))[0]
    lines = open(victim).read().splitlines()
    row = json.loads(lines[0])
    row["text"] = (row.get("text") or "") + " tampered"
    lines[0] = json.dumps(row)
    open(victim, "w").write("\n".join(lines) + "\n")
    # drop Hadoop's local-FS .crc sidecar: object stores don't have
    # one — the manifest checksum is the defense under test
    import os

    crc = os.path.join(
        os.path.dirname(victim), "." + os.path.basename(victim) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(ValueError, match="shard verification failed"):
        verify_jsonl_shards(spark, out)


def test_export_shuffle_seed_orders_shards(spark, docs, tmp_path):
    """With shuffle_seed, within-shard file order replays the
    training_shuffle permutation exactly (what a sequential loader
    will feed the model)."""
    import glob

    seed, n = 7919, 4
    out = str(tmp_path / "shuf")
    m = export_jsonl_shards(
        docs, out, id_col="doc_id", n_shards=n, shuffle_seed=seed
    )
    assert m["total_rows"] == docs.count()
    verify_jsonl_shards(spark, out)

    def key(doc_id):
        return ((doc_id + seed) % 2**31) * 2654435761 % 2**32

    for shard in range(n):
        got = []
        for f in sorted(glob.glob(f"{out}/shard={shard}/*.json")):
            for line in open(f).read().splitlines():
                got.append(json.loads(line)["doc_id"])
        assert got, f"shard {shard} empty"
        assert all(key(d) % n == shard for d in got)
        assert got == sorted(got, key=lambda d: (key(d), d))

    # a different seed produces a different permutation
    out2 = str(tmp_path / "shuf2")
    m2 = export_jsonl_shards(
        docs, out2, id_col="doc_id", n_shards=n, shuffle_seed=104729
    )
    assert m2["shards"] != m["shards"]


def test_streaming_export_epochs(spark, tmp_path):
    """Drive a REAL documents stream into the epoch-sharded JSONL
    sink; every epoch's manifest verifies and the union of epochs
    is exactly the corpus."""
    from etl_covid19_spark.sources.catalog import documents_stream
    from etl_covid19_spark.sources.export import (
        streaming_export_sink,
        verify_export_epochs,
    )

    out = str(tmp_path / "stream_exp")
    q = (
        documents_stream(spark, SF)
        .writeStream.foreachBatch(
            streaming_export_sink(out, "doc_id", text_col="text", n_shards=2)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    manifests = verify_export_epochs(spark, out)
    assert manifests, "no epochs published"
    total = sum(m["total_rows"] for m in manifests.values())
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert total == docs.count()
    back = spark.read.json(out + "/epoch=*/shard=*")
    assert back.select("doc_id").distinct().count() == docs.count()
