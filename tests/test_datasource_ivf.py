"""Tests for the Spark 4 Python DataSource extract and IVF ANN."""

import pytest
from pyspark.sql import functions as F

from etl_covid19_spark.sources.rest_datasource import (
    RestReportsDataSource,
    RestReportsReader,
)

SF = "/root/testdata/sf0.001"


def test_datasource_partition_fanout():
    reader = RestReportsReader(
        {"ds_start": "2023-01-01", "ds_end": "2023-01-05", "isos": "CHN,USA"}
    )
    parts = reader.partitions()
    assert len(parts) == 5 * 2  # one per (date, iso) — the O1 fan-out
    assert {(p.ds, p.iso) for p in parts} >= {("2023-01-01", "CHN"), ("2023-01-05", "USA")}


def test_datasource_requires_date():
    with pytest.raises(ValueError):
        RestReportsReader({})


def test_datasource_reads_reference_shaped_payloads(spark):
    spark.dataSource.register(RestReportsDataSource)
    df = (
        spark.read.format("rest_reports")
        .option("ds", "2023-03-02")
        .option("isos", "CHN,RUS")
        .load()
    )
    rows = df.collect()
    assert df.columns == ["ds", "iso_country", "json_data"]
    assert {r.iso_country for r in rows} == {"CHN", "RUS"}
    assert all(r.json_data.startswith('{"data"') for r in rows)


def test_ivf_recall_against_brute_force(spark):
    from etl_covid19_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 12))
    exact = brute_force_topk(emb, queries, "embedding", "vec_id", k=5)
    approx = ivf_topk(
        emb, queries, "embedding", "vec_id", k=5, n_centroids=8, n_probe=4
    )
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    # probing half the lists should recover a decent share of the
    # true top-5 (clustered synthetic embeddings)
    assert len(e & a) / len(e) >= 0.5


def test_ivf_self_excluded_and_ranked(spark):
    from etl_covid19_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 9)
    out = ivf_topk(emb, q, "embedding", "vec_id", k=3).collect()
    assert all(r.neighbor_id != 9 for r in out)
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2, 3]


def test_ivf_trained_kmeans_recall_on_clustered_data(spark):
    """IVF with TRAINED centroids must reach recall@10 >= 0.9 vs
    brute force on clustered data (8 planted clusters, 64-dim,
    deterministic LCG noise), probing only 2 of 8 cells — the
    pruning IVF exists for. Parameters: k-means|| seeded, maxIter
    20, n_probe/n_centroids = 1/4."""
    from etl_covid19_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk_trained,
    )

    state = 42

    def rnd():
        nonlocal state
        state = (state * 1103515245 + 12345) % (2**31)
        return state / 2**31 - 0.5

    centers = [[rnd() * 8 for _ in range(64)] for _ in range(8)]
    rows = []
    for vid in range(400):
        c = centers[vid % 8]
        rows.append((vid, [x + rnd() * 0.5 for x in c]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 8)

    bf = brute_force_topk(emb, queries, "embedding", "vec_id", k=10)
    ivf = ivf_topk_trained(
        emb, queries, "embedding", "vec_id",
        k=10, n_centroids=8, n_probe=2, max_iter=20, seed=7,
    )
    bf_sets, ivf_sets = {}, {}
    for r in bf.collect():
        bf_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in ivf.collect():
        ivf_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(bf_sets[q] & ivf_sets.get(q, set())) / 10 for q in bf_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_train_centroids_fixedpoint_count_and_refinement(spark):
    """The trained fixed-count centroids (a) never track corpus size
    — the scale property replacing knn_graph_ivf's n/4000 sizing —
    (b) are genuine Lloyd means: each trained center sits strictly
    closer (higher cosine) to its cell's planted cluster center than
    the raw id-ordered seed did, on clustered data, and (c) are
    exactly the fixed-point micro-means (int64 sum of floor(x*1e6),
    one double division) so the SQL oracle reproduces them."""
    from etl_covid19_spark.operators.similarity import (
        train_centroids_fixedpoint,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = train_centroids_fixedpoint(
        emb, "embedding", "vec_id", n_centroids=32
    )
    # (a) fixed count: <= 32 regardless of n (== unless a seed cell
    # emptied via an exact-parallel tie, impossible on this corpus)
    assert len(cents) == 32
    assert [c for c, _ in cents] == sorted(c for c, _ in cents)
    bigger = emb.union(
        emb.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    )
    cents2 = train_centroids_fixedpoint(
        bigger, "embedding", "vec_id", n_centroids=32
    )
    assert len(cents2) == 32  # 2x the corpus, same centroid count

    # (c) fixed-point reproducibility: recompute one cell's mean from
    # first principles and compare bit-for-bit
    import math

    seeds = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(32).collect()
    }

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    members = {}
    for r in emb.collect():
        v = [float(x) for x in r["embedding"]]
        best = max(
            sorted(seeds), key=lambda c: (cos(v, seeds[c]), c)
        )
        members.setdefault(best, []).append(v)
    cid0, cv0 = cents[0]
    vs = members[cid0]
    dim = len(vs[0])
    expect = [
        sum(math.floor(v[d] * 1_000_000) for v in vs)
        / (float(len(vs)) * 1_000_000.0)
        for d in range(dim)
    ]
    assert cv0 == expect  # bit-identical, not approx


def test_knn_graph_ivf_trained_noninferior_and_ranked(spark):
    """Training the fixed-count centroids must not LOSE recall vs the
    id-ordered-seed lens on the same corpus (recall against the exact
    brute-force graph; both lenses are exact within probed cells, so
    any gap is purely centroid placement — a Lloyd step only improves
    it), and every trained row must keep the (cosine DESC, dst ASC)
    rank contract. Absolute recall at this SF is structurally low
    (32 cells over 500 vectors, 2 probes ≈ 1/16 of the corpus
    scanned) — the value-level correctness gate is the SQL oracle
    (`knn_graph_ivf_trained` in the registry), not this test."""
    from etl_covid19_spark.operators.similarity import (
        brute_force_topk,
        knn_graph_ivf,
        train_centroids_fixedpoint,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = train_centroids_fixedpoint(
        emb, "embedding", "vec_id", n_centroids=32
    )
    trained = knn_graph_ivf(
        emb, "embedding", "vec_id", k=5, cents=cents, n_probe=2
    ).collect()
    untrained = knn_graph_ivf(
        emb, "embedding", "vec_id", k=5, n_centroids=None, n_probe=2
    ).collect()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(
            emb, emb, "embedding", "vec_id", k=5
        ).collect()
    }
    t = {(r.src, r.dst) for r in trained}
    u = {(r.src, r.dst) for r in untrained}
    r_t = len(t & exact) / len(exact)
    r_u = len(u & exact) / len(exact)
    assert r_t >= r_u - 0.02, (r_t, r_u)
    by_src = {}
    for r in trained:
        by_src.setdefault(r.src, []).append(r)
    for rows in by_src.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)
