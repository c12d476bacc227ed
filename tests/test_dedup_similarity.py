"""Tests for the dedup family and similarity search: planted
duplicates must be found; LSH paths must agree with their exact
baselines."""

import pytest
from pyspark.sql import functions as F

from etl_covid19_spark.operators import dedup, similarity

BASE = (
    "spark shuffles the sorted columnar batches through the exchange "
    "operator while the adaptive planner coalesces small partitions "
    "into larger buckets for the final aggregation stage"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact duplicate of 0
        (2, BASE.replace("final", "last")),  # near-dup of 0
        (3, "completely different text about cooking pasta at home"),
        (4, "the weather today is sunny with a light breeze"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups_identical_texts(docs):
    out = {r.canonical_id: r.n_copies for r in
           dedup.exact_dedup(docs, "text", "doc_id").collect()}
    assert out[0] == 2  # docs 0 and 1 collapse
    assert out[2] == 1 and out[3] == 1 and out[4] == 1


def test_ngram_jaccard_finds_planted_pair(docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in
             dedup.ngram_jaccard_pairs(docs, "text", "doc_id",
                                       threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.7
    assert (0, 3) not in pairs


def test_minhash_lsh_matches_exact_jaccard(docs):
    """Pair SET and per-pair jaccard VALUES must match the exact
    postings-join Jaccard operator — this is the semantic pin for
    the pair-local verification rewrite (`_verify_pairs_exact`): the
    array-intersect count must equal the postings-aggregate count
    for every surviving pair, not just select the same pairs."""
    exact = {(r.doc_a, r.doc_b): r.jaccard for r in
             dedup.ngram_jaccard_pairs(docs, "text", "doc_id",
                                       threshold=0.8).collect()}
    lsh = {(r.doc_a, r.doc_b): r.jaccard for r in
           dedup.minhash_lsh_pairs(docs, "text", "doc_id",
                                   threshold=0.8).collect()}
    assert set(lsh) == set(exact) and exact  # non-empty, same pairs
    for pair, j in lsh.items():
        assert j == exact[pair]  # identical exact-Jaccard values


def test_minhash_recall_on_planted_entropic_corpus(spark, tmp_path):
    """END-TO-END recall pin on a generated realistic-entropy corpus
    (tools/gen_fatdocs.gen_entropic — the 10k-word Zipf regime the
    sf100 stretch sweep measures): ground truth is known by
    construction (exact dups are byte-copies of base docs; near-dups
    carry ~1% token substitutions → 3-gram Jaccard ≈ 0.9+), so this
    pins that the banded candidate generation + pair-local exact
    verification recover planted duplicates, not just that the two
    stages agree with each other."""
    from tools.gen_fatdocs import (
        EXACT_DUP_FRAC,
        NEAR_DUP_FRAC,
        gen_entropic,
    )

    n_docs = 2000
    gen_entropic(
        n_docs, str(tmp_path / "entropic"), str(tmp_path / "nosrc")
    )
    corpus = spark.read.parquet(
        str(tmp_path / "entropic" / "documents.parquet")
    ).select("doc_id", "text")
    n_base = int(n_docs * (1 - EXACT_DUP_FRAC - NEAR_DUP_FRAC))
    n_planted = n_docs - n_base
    # dup row i (doc_id = n_base + i) copies/edits base doc i % n_planted
    # (base_cache holds the first n_planted base texts in id order)
    truth = {
        (i % n_planted, n_base + i) for i in range(n_planted)
    }
    found = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(
            corpus, "text", "doc_id", threshold=0.8
        ).collect()
    }
    exact_truth = {
        p for p in truth if p[1] < n_base + int(n_docs * EXACT_DUP_FRAC)
    }
    near_truth = truth - exact_truth
    assert exact_truth <= found, "every planted exact dup must surface"
    near_recall = len(near_truth & found) / len(near_truth)
    assert near_recall >= 0.9, f"near-dup recall {near_recall:.2f} < 0.9"


def test_simhash_ranks_near_dups_closest(docs):
    fps = {r.doc_id: r.simhash for r in
           dedup.simhash(docs, "text", "doc_id").collect()}

    def hamming(a, b):
        return bin(fps[a] ^ fps[b]).count("1")

    assert hamming(0, 1) == 0  # identical text → identical simhash
    near = hamming(0, 2)
    far = min(hamming(0, 3), hamming(0, 4), hamming(3, 4))
    assert near < far  # near-dup strictly closer than unrelated docs
    # blocked pair search must at least surface the exact duplicate
    # (identical halves) — fuzzier pairs are best-effort by design
    pairs = {(r.doc_a, r.doc_b) for r in
             dedup.simhash_pairs(docs, "text", "doc_id",
                                 max_hamming=30).collect()}
    assert (0, 1) in pairs


@pytest.fixture(scope="module")
def emb(spark):
    from etl_covid19_spark.sources.catalog import load_table

    return load_table(spark, "embeddings", "/root/testdata/sf0.001")


def test_lsh_ann_recall_against_brute_force(emb):
    queries = emb.filter(F.col("vec_id") < 5)
    exact = dedup  # noqa: F841 (readability)
    bf = similarity.brute_force_topk(emb, queries, "embedding", "vec_id", k=10)
    ann = similarity.lsh_bucket_ann(
        emb, queries, "embedding", "vec_id", k=10, n_planes=4, dim=64
    )
    bf_sets = {}
    for r in bf.collect():
        bf_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    ann_sets = {}
    for r in ann.collect():
        ann_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    # every ANN result must be a real corpus vector ranked correctly
    # within its bucket; recall vs exact top-10 should be non-trivial
    recalls = [
        len(bf_sets[q] & ann_sets.get(q, set())) / 10 for q in bf_sets
    ]
    assert sum(recalls) / len(recalls) > 0.2


def test_embedding_near_dup_symmetric_threshold(emb):
    pairs = dedup.embedding_near_dup(emb, "embedding", "vec_id", 0.45)
    for r in pairs.collect():
        assert r.id_a < r.id_b and r.cosine >= 0.45


def test_embedding_near_dup_lsh_vs_exact_and_plan_shape(emb):
    """The LSH-bucketed near-dup must (a) be a subset of the exact
    all-pairs result (verification is exact, so no false positives),
    (b) reach high recall at the tuned banding, and (c) plan as
    equi-joins only — the whole point of replacing the O(n²) path."""
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_near_dup_exact(
            emb, "embedding", "vec_id", 0.45
        ).collect()
    }
    lsh_df = dedup.embedding_near_dup(
        emb, "embedding", "vec_id", 0.45, band_bits=4, n_bands=16
    )
    lsh = {(r.id_a, r.id_b) for r in lsh_df.collect()}
    assert lsh <= exact  # exact verify → no false positives
    if exact:
        assert len(lsh) / len(exact) >= 0.8  # recall at tuned banding
    plan = lsh_df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_normalize_unit_norm(spark):
    from etl_covid19_spark.functions import vectors

    df = spark.createDataFrame([([3.0, 4.0],)], "v array<double>")
    out = df.select(vectors.norm(vectors.normalize("v")).alias("n")).collect()
    assert abs(out[0].n - 1.0) < 1e-12


def test_connected_components_chain_and_islands(spark):
    from pyspark.sql import Row

    from etl_covid19_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [
            Row(doc_a=1, doc_b=2),
            Row(doc_a=2, doc_b=3),
            Row(doc_a=3, doc_b=4),   # chain 1-2-3-4 → cluster 1
            Row(doc_a=10, doc_b=11), # island → cluster 10
        ]
    )
    got = {
        r.doc_id: r.cluster_id for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_corpus_curation_verdicts(spark):
    from pyspark.sql import functions as F

    from etl_covid19_spark.plans.corpus import curate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = curate(docs).persist()
    assert out.count() == docs.count()  # every doc gets a verdict
    reasons = {r.reason for r in out.select("reason").distinct().collect()}
    assert reasons <= {"low_quality", "wrong_lang", "exact_dup", "near_dup", "kept"}
    kept = out.where(F.col("keep"))
    # kept docs must pass the columnar rules
    assert kept.where(
        (F.col("quality") < 0.5) | (F.col("predicted_lang") != "en")
    ).count() == 0
    # keep column is consistent with reason
    assert out.where(
        F.col("keep") != (F.col("reason") == F.lit("kept"))
    ).count() == 0
    out.unpersist()


def test_capped_jaccard_bounds_skew_at_sf01(spark):
    """The cap's scale contract, checked on the biggest local corpus
    (sf0.1, 5k docs): (a) no shingle key entering the self-join has
    df > cap — the hot-key bound AQE can't provide; (b) the join
    volume Σ df² strictly shrinks; (c) the capped query still finds
    near-dup pairs and never reports jaccard below threshold."""
    from etl_covid19_spark.operators.dedup import (
        ngram_jaccard_pairs_capped,
        shingle_postings_cached,
    )
    from etl_covid19_spark.sources.catalog import load_table

    cap = 5
    docs = load_table(spark, "documents", "/root/testdata/sf0.1")
    posts = shingle_postings_cached(docs, "text", "doc_id")
    freq = posts.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    stats = freq.agg(
        F.max("df").alias("max_df"),
        F.sum(F.col("df") * F.col("df")).alias("vol"),
        F.sum(
            F.when(F.col("df") <= cap, F.col("df") * F.col("df")).otherwise(0)
        ).alias("vol_capped"),
    ).collect()[0]
    assert stats.max_df > cap  # the corpus really has hot shingles
    assert stats.vol_capped < stats.vol  # cap shrinks join volume
    pairs = ngram_jaccard_pairs_capped(
        docs, "text", "doc_id", threshold=0.5, max_df=cap
    ).collect()
    assert pairs and all(r.jaccard >= 0.5 for r in pairs)


def test_knn_graph_recall_vs_exact(spark):
    """The sign-band kNN graph recovers ≥0.85 of the exact top-5
    graph at test SF (measured 0.908 with the default 4-bit × 16
    bands) — the quality bound that makes 'approximate' a contract
    instead of a vibe."""
    from conftest import SF_SMALL
    from pyspark.sql import Window

    from etl_covid19_spark.functions import vectors as V
    from etl_covid19_spark.operators.similarity import knn_graph
    from etl_covid19_spark.sources.catalog import load_table

    emb = load_table(spark, "embeddings", SF_SMALL)
    approx = knn_graph(emb, "embedding", "vec_id", k=5)
    a = emb.select(F.col("vec_id").alias("src"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("vb"))
    allp = a.join(b, a.src != b.dst).withColumn(
        "cosine", V.cosine("va", "vb")
    )
    w = Window.partitionBy("src").orderBy(
        F.col("cosine").desc(), F.col("dst").asc()
    )
    exact = (
        allp.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= 5)
        .select("src", "dst")
    )
    total = exact.count()
    hit = approx.select("src", "dst").intersect(exact).count()
    assert total > 0 and hit / total >= 0.85


def test_strip_duplicate_spans_hashed_equals_string_path(spark):
    """The xxhash64 scale path and the engine-portable string-key
    path select identical spans (no observable collision at test SF),
    and planted exact duplicates are fully stripped."""
    from conftest import SF_SMALL

    from etl_covid19_spark.operators.dedup import strip_duplicate_spans
    from etl_covid19_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", SF_SMALL)
    hashed = strip_duplicate_spans(docs, "text", "doc_id", hashed=True)
    strings = strip_duplicate_spans(docs, "text", "doc_id", hashed=False)
    assert hashed.exceptAll(strings).count() == 0
    assert strings.exceptAll(hashed).count() == 0

    planted = spark.createDataFrame(
        [
            (1, "a b c d e f g h tail one"),
            (2, "a b c d e f g h tail two"),
            (3, "u v w x y z q r s t"),
        ],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: (r.n_dup_tokens, r.clean_text)
        for r in strip_duplicate_spans(
            planted, "text", "doc_id", hashed=True
        ).collect()
    }
    # docs 1/2 share the 8-grams "a b c d e f g h" AND
    # "b c d e f g h tail" — covered positions 1..9, so only the
    # distinct final token survives (span EXTENSION falls out of
    # overlapping anchors for free)
    assert out[1] == (9, "one")
    assert out[2] == (9, "two")
    assert out[3] == (0, "u v w x y z q r s t")


def test_strip_duplicate_spans_keep_first_retains_one_copy(spark):
    """keep_first=True exempts the lexicographically-first occurrence
    of each duplicated span: the min-(doc,pos) document keeps the
    span intact, later copies are stripped; hashed and string key
    paths agree."""
    from conftest import SF_SMALL

    from etl_covid19_spark.operators.dedup import strip_duplicate_spans
    from etl_covid19_spark.sources.catalog import load_table

    planted = spark.createDataFrame(
        [
            (1, "a b c d e f g h tail one"),
            (2, "a b c d e f g h tail two"),
            (3, "u v w x y z q r s t"),
        ],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: (r.n_dup_tokens, r.clean_text)
        for r in strip_duplicate_spans(
            planted, "text", "doc_id", hashed=True, keep_first=True
        ).collect()
    }
    # doc 1 owns both shared 8-grams (min doc_id) → untouched;
    # doc 2 loses the whole 9-token shared span; doc 3 untouched
    assert out[1] == (0, "a b c d e f g h tail one")
    assert out[2] == (9, "two")
    assert out[3] == (0, "u v w x y z q r s t")

    # intra-doc repetition: the FIRST occurrence survives, the rest go
    rep = spark.createDataFrame(
        [(7, "p q r s t u v w x p q r s t u v w x")],
        "doc_id int, text string",
    )
    row = strip_duplicate_spans(
        rep, "text", "doc_id", hashed=True, keep_first=True
    ).collect()[0]
    assert row.n_tokens == 18 and row.n_dup_tokens == 9
    assert row.clean_text == "p q r s t u v w x"

    docs = load_table(spark, "documents", SF_SMALL)
    hashed = strip_duplicate_spans(
        docs, "text", "doc_id", hashed=True, keep_first=True
    )
    strings = strip_duplicate_spans(
        docs, "text", "doc_id", hashed=False, keep_first=True
    )
    assert hashed.exceptAll(strings).count() == 0
    assert strings.exceptAll(hashed).count() == 0


def test_incremental_dedup_probes_corpus_without_rededuping_it(spark):
    """Batch docs whose text already exists in the corpus are
    dropped; within-batch duplicates collapse to the min id; corpus
    internals never appear. Hashed and string key paths agree."""
    from conftest import SF_SMALL

    from etl_covid19_spark.operators.dedup import incremental_exact_dedup
    from etl_covid19_spark.sources.catalog import load_table

    corpus = spark.createDataFrame(
        [(1, "old news"), (2, "old news"), (3, "evergreen piece")],
        "doc_id int, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "old news"),          # exists in corpus → dropped
            (11, "fresh scoop"),       # new, unique
            (12, "fresh scoop"),       # within-batch dup of 11
            (13, "another original"),
        ],
        "doc_id int, text string",
    )
    out = {
        r.canonical_id: r.n_copies
        for r in incremental_exact_dedup(
            batch, corpus, "text", "doc_id", hashed=True
        ).collect()
    }
    assert out == {11: 2, 13: 1}

    docs = load_table(spark, "documents", SF_SMALL)
    new, old = docs.filter("doc_id >= 30"), docs.filter("doc_id < 30")
    h = incremental_exact_dedup(new, old, "text", "doc_id", hashed=True)
    s = incremental_exact_dedup(new, old, "text", "doc_id", hashed=False)
    assert h.exceptAll(s).count() == 0
    assert s.exceptAll(h).count() == 0


def test_embedding_quantize_int8_bounds_and_error(spark):
    """Quantized codes live in [0, 255]; dequantizing (mid-rise)
    reconstructs each coordinate within one quantization step of the
    original — the defining guarantee of per-dim affine scalar
    quantization."""
    from conftest import SF_SMALL

    from etl_covid19_spark.operators.similarity import (
        embedding_quantize_int8,
    )
    from etl_covid19_spark.sources.catalog import load_table

    emb = load_table(spark, "embeddings", SF_SMALL)
    q = embedding_quantize_int8(emb, "embedding", "vec_id")
    joined = emb.join(q, "vec_id").collect()
    assert len(joined) > 0

    import collections

    dims = collections.defaultdict(list)
    for r in joined:
        for d, x in enumerate(r.embedding):
            dims[d].append(float(x))
    steps = {
        d: (max(xs) - min(xs)) / 255 or 1.0 for d, xs in dims.items()
    }
    mins = {d: min(xs) for d, xs in dims.items()}
    for r in joined:
        for d, (x, code) in enumerate(zip(r.embedding, r.q_embedding)):
            assert 0 <= code <= 255
            deq = mins[d] + code * steps[d]
            assert abs(float(x) - deq) <= steps[d] * (1 + 1e-9)


def test_quantized_ann_preserves_neighbor_ranking(spark):
    """Brute-force top-10 over int8-DEQUANTIZED embeddings recalls
    ≥0.8 of the float top-10 — the compression is usable for ANN,
    not just storage."""
    from conftest import SF_SMALL

    from etl_covid19_spark.operators.similarity import (
        brute_force_topk,
        embedding_quantize_int8,
    )
    from etl_covid19_spark.sources.catalog import load_table

    emb = load_table(spark, "embeddings", SF_SMALL)
    q = embedding_quantize_int8(emb, "embedding", "vec_id")
    # dequantize mid-rise back to double arrays (code → mn + code*step)
    stats = (
        emb.select(F.posexplode("embedding").alias("d", "x"))
        .groupBy("d")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    mn = {r.d: float(r.mn) for r in stats}
    step = {r.d: (float(r.mx) - float(r.mn)) / 255 or 1.0 for r in stats}
    dim = len(stats)
    mn_arr = F.array(*[F.lit(mn[i]) for i in range(dim)])
    st_arr = F.array(*[F.lit(step[i]) for i in range(dim)])
    deq = q.select(
        "vec_id",
        F.transform(
            "q_embedding",
            lambda c, i: F.element_at(mn_arr, i + 1)
            + (c.cast("double") + F.lit(0.5)) * F.element_at(st_arr, i + 1),
        ).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") < 8)
    dq_queries = deq.filter(F.col("vec_id") < 8)
    exact = brute_force_topk(emb, queries, "embedding", "vec_id", k=10)
    approx = brute_force_topk(deq, dq_queries, "embedding", "vec_id", k=10)
    ex, ap = {}, {}
    for r in exact.collect():
        ex.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx.collect():
        ap.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(ex[k] & ap.get(k, set())) / 10 for k in ex]
    assert sum(recalls) / len(recalls) >= 0.8


def test_binary_signature_matches_python(spark):
    """Banded sign-bit packing is exactly the MSB-first fold the
    oracle SQL re-derives."""
    import random

    rng = random.Random(7)
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(6)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    sigs = similarity.binary_signature_bands("embedding", 64, 16)
    got = {
        r["vec_id"]: [r[f"sig{i}"] for i in range(4)]
        for r in df.select(
            "vec_id", *[s.alias(f"sig{i}") for i, s in enumerate(sigs)]
        ).collect()
    }
    import struct

    for vid, v in vecs:
        v32 = [struct.unpack("f", struct.pack("f", x))[0] for x in v]
        want = [
            sum(
                (1 << (15 - j)) if v32[b * 16 + j] > 0 else 0
                for j in range(16)
            )
            for b in range(4)
        ]
        assert got[vid] == want, vid


def test_hamming_pigeonhole_guarantee(spark):
    """A neighbor within Hamming distance n_bands-1 of the query
    MUST be a candidate (pigeonhole: <n_bands flipped bits can't
    touch every band), and exact integer Hamming ranks it."""
    base = [1.0] * 64
    near = list(base)
    for i in (3, 20, 45):  # 3 flipped sign bits, 8 bands of 8 bits
        near[i] = -1.0
    far = [(-1.0) ** i for i in range(64)]  # hamming 32 from base
    rows = [(0, base), (1, near), (2, far)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.hamming_banded_topk(
        df,
        df.filter(F.col("vec_id") == 0),
        "embedding",
        "vec_id",
        k=5,
        dim=64,
        band_bits=8,
    ).collect()
    by_neighbor = {r["neighbor_id"]: r for r in out}
    assert 1 in by_neighbor  # guaranteed candidate
    assert by_neighbor[1]["hamming"] == 3
    assert by_neighbor[1]["rank"] == 1
    # 'far' shares bands with neither (alternating signs) unless by
    # chance; if present its hamming must be exactly 32
    if 2 in by_neighbor:
        assert by_neighbor[2]["hamming"] == 32


def test_containment_catches_embedded_quote(spark):
    """A short doc fully contained in a long one: Jaccard stays tiny
    (union is dominated by the long side) but containment is 1.0 —
    the pair symmetric dedup misses by construction."""
    quote = "the adaptive planner coalesces small partitions into larger buckets"
    long_doc = (
        "intro section about storage engines. " * 5
        + quote
        + " closing words on compaction strategies. " * 5
    )
    rows = [
        (0, long_doc),
        (1, quote),
        (2, "unrelated text about cooking pasta at home tonight"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.containment_pairs(
            df, "text", "doc_id", n=3, threshold=0.8
        ).collect()
    }
    assert (0, 1) in pairs
    assert pairs[(0, 1)] == 1.0
    # and Jaccard indeed misses it at any useful threshold
    jac = dedup.ngram_jaccard_pairs(
        df, "text", "doc_id", n=3, threshold=0.4
    ).collect()
    assert not any(
        {r["doc_a"], r["doc_b"]} == {0, 1} for r in jac
    )


def test_incremental_minhash_cross_side_only(spark):
    """Delta docs match against the corpus; delta-internal and
    corpus-internal duplicates are NOT re-reported (the corpus was
    deduped when it was ingested; the delta's internal dups are
    full-dedup's job at delta scale)."""
    near = BASE.replace("final", "last")
    corpus = spark.createDataFrame(
        [(0, BASE), (1, "totally different words about gardens")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(100, near), (101, near), (102, "nothing similar here at all")],
        "doc_id long, text string",
    )
    got = dedup.minhash_lsh_pairs_incremental(
        corpus, delta, "text", "doc_id", threshold=0.5
    ).collect()
    pairs = {(r["corpus_doc"], r["delta_doc"]) for r in got}
    assert (0, 100) in pairs and (0, 101) in pairs
    # no intra-side pairs by construction
    assert all(c in (0, 1) and d >= 100 for c, d in pairs)


def test_postings_backend_parity(spark):
    """Arrow-kernel postings vs the Catalyst HOF path: hash VALUES
    differ by design (byte polynomial vs xxhash64) but everything a
    consumer observes — per-doc distinct-shingle counts and the
    cross-doc equality structure (pair intersection sizes, hence
    every Jaccard/containment score) — must be identical."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    edge = spark.createDataFrame(
        [
            (9001, ""),
            (9002, "one"),
            (9003, "two tokens"),
            (9004, "  padded   with    runs\tand\ttabs "),
            (9005, "café naïve café naïve café naïve café naïve"),
        ],
        "doc_id long, text string",
    )
    both = docs.unionByName(edge)

    def pair_view(backend):
        posts = (
            dedup.shingle_postings_arrow(both, "text", "doc_id")
            if backend == "arrow"
            else dedup.shingle_postings(both, "text", "doc_id")
        )
        a, b = posts.alias("a"), posts.alias("b")
        pairs = (
            a.join(b, on="sh")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(
                F.col("a.doc_id").alias("da"),
                F.col("b.doc_id").alias("db"),
                F.col("a.n_shingles").alias("na"),
                F.col("b.n_shingles").alias("nb"),
            )
            .agg(F.count(F.lit(1)).alias("nc"))
        )
        return {
            (r["da"], r["db"]): (r["na"], r["nb"], r["nc"])
            for r in pairs.collect()
        }

    arrow, catalyst = pair_view("arrow"), pair_view("catalyst")
    assert arrow == catalyst
    # per-doc shingle counts identical too
    ac = {
        (r["doc_id"], r["n_shingles"])
        for r in dedup.shingle_postings_arrow(both, "text", "doc_id")
        .select("doc_id", "n_shingles")
        .distinct()
        .collect()
    }
    cc = {
        (r["doc_id"], r["n_shingles"])
        for r in dedup.shingle_postings(both, "text", "doc_id")
        .select("doc_id", "n_shingles")
        .distinct()
        .collect()
    }
    assert ac == cc


def test_minhash_signature_kernel_parity(spark):
    """Kernel signatures (np.minimum.reduceat over gram hashes) must
    equal the Catalyst wide min-aggregate computed over the SAME
    Arrow postings — value-for-value, all 96 slots."""
    from etl_covid19_spark.operators.dedup import (
        _signatures_from_postings,
        minhash_signatures_arrow,
        shingle_postings_arrow,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    posts = shingle_postings_arrow(docs, "text", "doc_id")
    want = {
        r["doc_id"]: (r["n_shingles"], list(r["signature"]))
        for r in _signatures_from_postings(posts, 96).collect()
    }
    got = {
        r["doc_id"]: (r["n_shingles"], list(r["signature"]))
        for r in minhash_signatures_arrow(
            docs, "text", "doc_id", 3, 96
        ).collect()
    }
    assert got == want


def test_hyperplane_bucket_kernel_bit_exact(spark, emb):
    """The Arrow bucket kernel must reproduce the Catalyst HOF fold
    BIT-exactly (same left-to-right IEEE double sequence) — sign
    flips on near-zero dot products would silently change buckets,
    so this pins every corpus vector, not a sample."""
    planes = similarity.make_planes(64, 6)
    want = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id",
            similarity.hyperplane_signature("embedding", planes).alias("b"),
        ).collect()
    }
    got = {
        r["neighbor_id"]: r["bucket"]
        for r in similarity.hyperplane_buckets_arrow(
            emb, "embedding", "vec_id", planes
        ).collect()
    }
    assert got == want


def test_postings_backend_parity_randomized(spark):
    """Seeded fuzz over nasty strings: unicode whitespace (NBSP is
    NOT Java \\s — must stay inside tokens), multi-byte runs, emoji,
    control chars, repeated tokens, giant runs of separators. Pair
    structure and per-doc counts must match across backends on all
    of it."""
    import random

    rng = random.Random(20260814)
    alphabet = [
        "word", "täst", "émoji🎉", "a", " joined ", "汉字",
        "x" * 50, "123", "..", "mixed123täst", "nb sp",
    ]
    seps = [" ", "\t", "\n", "  ", " \x0b ", "\r\n", "\x0c"]
    docs = []
    for i in range(300):
        k = rng.randint(0, 12)
        parts = [rng.choice(alphabet) for _ in range(k)]
        docs.append(
            (i, rng.choice(seps).join(parts) + rng.choice(["", " ", "\t"]))
        )
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def shape(posts):
        a, b = posts.alias("a"), posts.alias("b")
        pairs = (
            a.join(b, on="sh")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(
                F.col("a.doc_id").alias("da"),
                F.col("b.doc_id").alias("db"),
            )
            .agg(F.count(F.lit(1)).alias("nc"))
        )
        counts = {
            (r["doc_id"], r["n_shingles"])
            for r in posts.select("doc_id", "n_shingles")
            .distinct()
            .collect()
        }
        return counts, {
            (r["da"], r["db"]): r["nc"] for r in pairs.collect()
        }

    arrow = shape(dedup.shingle_postings_arrow(df, "text", "doc_id"))
    catalyst = shape(dedup.shingle_postings(df, "text", "doc_id"))
    assert arrow == catalyst


def test_tight_hyperplane_near_dup_recall_on_planted_pairs(spark):
    """Constructed clustered corpus: 100 planted near-dup pairs
    (cos >= ~0.97) in a 2000-vector background. The tight-threshold
    banding must find essentially all of them while generating far
    fewer candidates than all-pairs — the subquadratic claim,
    measured, not asserted from math alone."""
    import numpy as np

    from etl_covid19_spark.operators.similarity import (
        hyperplane_near_dup_pairs,
    )

    rng = np.random.RandomState(11)
    base = rng.randn(1900, 64)
    seeds = rng.randn(100, 64)
    # each planted pair: a seed + a tiny perturbation of it
    mates = seeds + 0.12 * rng.randn(100, 64)
    vecs = np.vstack([base, seeds, mates]).astype(np.float32)
    rows = [(i, vecs[i].tolist()) for i in range(len(vecs))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = hyperplane_near_dup_pairs(
        emb, "embedding", "vec_id", threshold=0.9
    )
    pairs = {(r.id_a, r.id_b) for r in got.collect()}
    planted = set()
    u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for i in range(100):
        a, b = 1900 + i, 2000 + i
        if float(u[a] @ u[b]) >= 0.9:
            planted.add((a, b))
    assert len(planted) >= 90, "construction sanity"
    recall = len(pairs & planted) / len(planted)
    assert recall >= 0.95, f"recall {recall:.3f}"
    # every reported pair is a true >= 0.9 pair (exact verify)
    for i, j in pairs:
        assert float(u[i] @ u[j]) >= 0.9 - 1e-9


def test_blocked_near_dup_finds_planted_pairs_in_clustered_space(spark):
    """blocked_near_dup_pairs is the mid-threshold tool for CLUSTERED
    embedding spaces (the realistic near-dup corpus shape): with
    genuine cluster structure, Sigma cluster^2 blocking keeps recall
    high; the isotropic fixture's 0.32 recall at 0.45 is the
    documented worst case, not this."""
    import numpy as np

    from etl_covid19_spark.operators.similarity import (
        blocked_near_dup_pairs,
    )

    rng = np.random.RandomState(5)
    centers = rng.randn(10, 64) * 4
    pts = np.vstack([
        c + 0.3 * rng.randn(150, 64) for c in centers
    ]).astype(np.float32)
    # interleave ids across clusters: the deterministic first-k
    # centroid stub assumes ingestion order is not sorted BY cluster
    # (production seeding is k-means — ivf_topk_trained)
    pts = pts[rng.permutation(len(pts))]
    rows = [(i, pts[i].tolist()) for i in range(len(pts))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    u = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    S = u @ u.T
    iu = np.triu_indices(len(pts), 1)
    exact = {(int(i), int(j)) for i, j in zip(*[x[S[iu] >= 0.95] for x in iu])}
    assert len(exact) > 1000, "construction sanity: dense clusters"
    got = {
        (r.id_a, r.id_b)
        for r in blocked_near_dup_pairs(
            emb, "embedding", "vec_id", threshold=0.95,
            n_clusters=16, probes=2,
        ).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.95, f"recall {recall:.3f}"
    assert got <= exact | set(), "no false positives (exact verify)"


def test_simhash_arrow_value_parity_null_unicode(spark):
    """simhash_arrow is VALUE-exact with the Catalyst expression on
    the full row set, including NULL text (→ NULL fingerprint, so
    the doc drops out of banding — round-4 advisory: the kernel used
    to fingerprint NULL as 0, pairing null docs with empty docs),
    empty/whitespace-only docs, and non-ASCII tokens (per-codepoint
    recompute path)."""
    rows = [
        (0, BASE),
        (1, "café au lait — naïve 模型 emoji 🚀 test"),
        (2, None),
        (3, ""),
        (4, "   "),
        (5, "Ω≈ç√∫ microßcope mixed ascii"),
        (6, "plain ascii text here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cat = {r.doc_id: r.simhash for r in
           dedup.simhash(df, "text", "doc_id").collect()}
    arw = {r.doc_id: r.simhash for r in
           dedup.simhash_arrow(df, "text", "doc_id").collect()}
    assert cat == arw
    assert cat[2] is None


def test_cosine_pairs_fold_arrow_bit_exact(spark):
    """The Arrow pair-cosine kernel equals the Catalyst fold
    bit-for-bit on random vectors, including zero-norm inputs
    (cosine 0.0 by the when-guard)."""
    import random

    from etl_covid19_spark.functions import vectors as V
    from etl_covid19_spark.operators.similarity import (
        cosine_pairs_fold_arrow,
    )

    rng = random.Random(11)
    rows = []
    for i in range(200):
        va = [rng.uniform(-1, 1) for _ in range(17)]
        vb = [rng.uniform(-1, 1) for _ in range(17)]
        if i % 17 == 0:
            va = [0.0] * 17
        rows.append((i, va, vb))
    df = spark.createDataFrame(
        rows, "pid long, va array<float>, vb array<float>"
    )
    hof = {
        r.pid: r.c
        for r in df.select(
            "pid", V.cosine("va", "vb").alias("c")
        ).collect()
    }
    arw = {
        r.pid: r.cosine
        for r in cosine_pairs_fold_arrow(df, "va", "vb").collect()
    }
    assert hof == arw  # exact equality, not approx


def test_cosine_pairs_fold_arrow_null_and_ragged_parity(spark):
    """Round-6 ADVICE fix: a NULL list slot used to survive
    ``flatten()`` silently and misalign the whole batch's reshape.
    The kernel must now match the Catalyst fold's NULL algebra
    exactly — NULL vector, length mismatch (zip_with pads), and NULL
    element all yield NULL cosine; regular rows in the same batch
    stay bit-exact."""
    import random

    from etl_covid19_spark.functions import vectors as V
    from etl_covid19_spark.operators.similarity import (
        cosine_pairs_fold_arrow,
    )

    rng = random.Random(6)
    rows = []
    for i in range(120):
        va = [rng.uniform(-1, 1) for _ in range(9)]
        vb = [rng.uniform(-1, 1) for _ in range(9)]
        if i % 11 == 0:
            va = None  # NULL vector
        elif i % 11 == 1:
            vb = vb[:5]  # ragged: length mismatch
        elif i % 11 == 2:
            va = va[:4]
            vb = vb[:4]  # both short but EQUAL length: real cosine
        elif i % 11 == 3:
            vb = vb[:8] + [None]  # NULL element
        rows.append((i, va, vb))
    df = spark.createDataFrame(
        rows, "pid long, va array<float>, vb array<float>"
    )
    hof = {
        r.pid: r.c
        for r in df.select(
            "pid", V.cosine("va", "vb").alias("c")
        ).collect()
    }
    arw = {
        r.pid: r.cosine
        for r in cosine_pairs_fold_arrow(df, "va", "vb").collect()
    }
    assert hof == arw
    # the scenarios actually exercised what they claim
    assert arw[0] is None and arw[1] is None and arw[3] is None
    assert arw[2] is not None and arw[4] is not None


def test_assign_buckets_single_centroid_and_null_rows(spark):
    """Round-6 ADVICE fixes for `_assign_buckets_arrow`: a single
    trained centroid (legal k-means outcome) must not crash the
    top-2 margin guard, and NULL/ragged corpus vectors must come out
    with bucket NULL instead of misaligning the batch."""
    from etl_covid19_spark.operators.similarity import (
        _assign_buckets_arrow,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, None),
        (3, [0.5, 0.5]),  # ragged width
        (4, [-1.0, 0.2, 0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # one centroid: every scorable row lands in the lone bucket
    one = {
        r.neighbor_id: r.bucket
        for r in _assign_buckets_arrow(
            df, [(7, [1.0, 0.0, 0.0, 0.0])], "embedding", "vec_id"
        ).collect()
    }
    assert one == {0: 7, 1: 7, 2: None, 3: None, 4: 7}
    # two centroids: argmax assignment, NULL/ragged still NULL
    two = {
        r.neighbor_id: r.bucket
        for r in _assign_buckets_arrow(
            df,
            [(3, [1.0, 0.0, 0.0, 0.0]), (9, [0.0, 1.0, 0.0, 0.0])],
            "embedding",
            "vec_id",
        ).collect()
    }
    assert two == {0: 3, 1: 9, 2: None, 3: None, 4: 9}


def test_knn_graph_large_k_stride_regression(spark):
    """Round-6 ADVICE fix for `bucket_topk`: with n ≥ 4096 in a
    bucket and k in (n/8, n/4), the stride-8 column subsample had
    fewer columns than k and the from-the-end partition index
    silently dropped true neighbors. Pin exactness of the emitted
    top-k against a driver-side numpy oracle for sampled sources."""
    import numpy as np

    from etl_covid19_spark.operators.similarity import knn_graph

    rng = np.random.default_rng(42)
    n, dim, k = 4300, 6, 600  # n/8 = 537 < k < n/4 = 1075
    X = rng.normal(size=(n, dim))
    X[:, 0] = np.abs(X[:, 0]) + 0.1  # one sign bucket (band 0 bit set)
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    g = knn_graph(emb, "embedding", "vec_id", k=k, band_bits=1, n_bands=1)
    sample = [0, 17, 1234, 4299]
    got = {
        s: [
            r.dst
            for r in sorted(
                (r for r in g.where(F.col("src").isin(sample)).collect()
                 if r.src == s),
                key=lambda r: r.rank,
            )
        ]
        for s in sample
    }
    Xf = np.array([[np.float32(x) for x in row] for (_, row) in rows],
                  dtype=np.float64)
    nrm = np.sqrt((Xf * Xf).sum(axis=1))
    for s in sample:
        cos = (Xf @ Xf[s]) / (nrm * nrm[s])
        cos[s] = -np.inf
        order = np.lexsort((np.arange(n), -cos))[:k]
        assert got[s] == [int(i) for i in order], f"src {s} top-k mismatch"


def test_bucket_min_labels_dense_chunked_parity():
    """The skewed-bucket (chunked, no dense adjacency) propagation
    path labels identically to the dense path on random hamming
    graphs — the round-6 memory-cap fix cannot change components."""
    import numpy as np

    from etl_covid19_spark.operators.dedup import _bucket_min_labels

    rng = np.random.default_rng(7)
    for trial in range(5):
        v = np.unique(
            rng.integers(0, 1 << 24, 400 + 100 * trial)
        ).astype(np.int64)
        dense = _bucket_min_labels(v, max_hamming=6)
        chunked = _bucket_min_labels(v, max_hamming=6, dense_limit=0)
        assert (dense == chunked).all()


def test_knn_graph_ivf_recall_and_budget(spark):
    """The round-6 cluster-blocked kNN twin: (a) on clustered
    embeddings (the realistic shape) the IVF-probed graph recovers
    ≥0.85 of the exact top-k graph with k-means centers; (b) the
    deterministic-centroid registry form matches a driver-side
    numpy re-derivation of its own contract exactly (candidates =
    probed-bucket members, top-k by cosine desc / id asc); (c) the
    per-point candidate count never exceeds n_probe·max_bucket."""
    import numpy as np

    from etl_covid19_spark.operators.similarity import knn_graph_ivf

    rng = np.random.RandomState(9)
    centers = rng.randn(8, 32) * 4
    pts = np.vstack([
        c + 0.3 * rng.randn(60, 32) for c in centers
    ]).astype(np.float32)
    pts = pts[rng.permutation(len(pts))]
    n, k = len(pts), 5
    rows = [(i, pts[i].tolist()) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    u = pts.astype(np.float64)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    S = u @ u.T
    np.fill_diagonal(S, -np.inf)

    def topk_rows(cand_mask_row, s_row):
        cand = np.flatnonzero(cand_mask_row)
        order = cand[np.lexsort((cand, -s_row[cand]))][:k]
        return [int(x) for x in order]

    # (a) recall with TRAINED centers on clustered data
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = emb.select(array_to_vector(F.col("embedding").cast("array<double>")).alias("features"))
    model = KMeans(k=8, seed=3, maxIter=10).fit(train)
    cents = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    g = knn_graph_ivf(emb, "embedding", "vec_id", k=k, n_probe=2, cents=cents)
    got = {}
    for r in g.collect():
        got.setdefault(r.src, set()).add(r.dst)
    exact_sets = {
        s: set(topk_rows(np.ones(n, dtype=bool) & (np.arange(n) != s), S[s]))
        for s in range(n)
    }
    hit = sum(len(got.get(s, set()) & exact_sets[s]) for s in range(n))
    recall = hit / (n * k)
    assert recall >= 0.85, f"clustered recall {recall:.3f}"

    # (b) deterministic-centroid form vs numpy contract oracle
    g2 = knn_graph_ivf(emb, "embedding", "vec_id", k=k,
                       n_centroids=16, n_probe=2)
    C = u[:16]  # first 16 ids are the centroids (unit-normalized ok
    # for ranking: cosine is scale-invariant)
    cc = u @ C.T
    # probe order (cos desc, cid desc) — ties toward higher cid
    probe = []
    for i in range(n):
        idx = sorted(range(16), key=lambda c: (-cc[i, c], -c))[:2]
        probe.append(idx)
    assign = np.array([p[0] for p in probe])
    members = {b: set(np.flatnonzero(assign == b)) for b in range(16)}
    got2 = {}
    for r in g2.collect():
        got2.setdefault(r.src, []).append((r.rank, r.dst))
    for s in range(0, n, 37):
        cand = set().union(*[members[b] for b in probe[s]]) - {s}
        assert len(cand) <= 2 * 100_000  # (c) per-point budget
        mask = np.zeros(n, dtype=bool)
        mask[list(cand)] = True
        expect = topk_rows(mask, S[s])[: min(k, len(cand))]
        got_sorted = [d for _, d in sorted(got2.get(s, []))]
        assert got_sorted == expect, f"src {s}"


def test_prefix_filter_equivalent_to_postings_selfjoin(spark):
    """The exact prefix filter (`_prefix_candidates`) must produce
    BYTE-IDENTICAL results to the old postings self-join form of
    both capped twins, across thresholds INCLUDING low ones where
    prefixes are long and the size-ratio prune is weak — the
    completeness claim is mathematical (Bayardo's prefix principle),
    so any threshold where they diverge is a bug, full stop.
    Baseline reimplemented inline from the pre-round-11 shape."""
    from etl_covid19_spark.operators.dedup import (
        containment_pairs_capped,
        ngram_jaccard_pairs_capped,
        shingle_postings_cached,
    )
    from etl_covid19_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    posts = shingle_postings_cached(docs, "text", "doc_id")

    def baseline(threshold, max_df, metric):
        hot = (
            posts.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("doc_freq"))
            .where(F.col("doc_freq") > max_df)
            .select("sh")
        )
        capped = posts.join(hot, "sh", "left_anti").select(
            "doc_id", "sh"
        )
        sizes = capped.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_capped")
        )
        a, b = capped.alias("a"), capped.alias("b")
        common = (
            a.join(b, on="sh")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        sa = sizes.select(
            F.col("doc_id").alias("doc_a"),
            F.col("n_capped").alias("na"),
        )
        sb = sizes.select(
            F.col("doc_id").alias("doc_b"),
            F.col("n_capped").alias("nb"),
        )
        if metric == "containment":
            score = F.col("n_common") / F.least("na", "nb")
        else:
            score = F.col("n_common") / (
                F.col("na") + F.col("nb") - F.col("n_common")
            )
        return {
            (r.doc_a, r.doc_b, round(r.s, 12))
            for r in common.join(sa, "doc_a")
            .join(sb, "doc_b")
            .withColumn("s", score)
            .where(F.col("s") >= threshold)
            .select("doc_a", "doc_b", "s")
            .collect()
        }

    for threshold in (0.2, 0.4, 0.8):
        got_j = {
            (r.doc_a, r.doc_b, round(r.jaccard, 12))
            for r in ngram_jaccard_pairs_capped(
                docs, "text", "doc_id", threshold=threshold, max_df=5
            ).collect()
        }
        assert got_j == baseline(threshold, 5, "jaccard"), threshold
        got_c = {
            (r.doc_a, r.doc_b, round(r.containment, 12))
            for r in containment_pairs_capped(
                docs, "text", "doc_id",
                threshold=threshold, max_df=100,
            ).collect()
        }
        assert got_c == baseline(threshold, 100, "containment"), threshold


def test_hyperplane_near_dup_null_and_ragged_vectors(spark):
    """Round-11 ADVICE (medium): the signature kernel emits `_v`
    from the raw Arrow values buffer, which holds undefined garbage
    under element-level NULLs — such rows must be dropped in the
    kernel (a NULL-element vector can never reach the cosine
    threshold: HOF cosine is NULL), never flow garbage doubles into
    verification. Pin: the pair set over a corpus with NULL-slot,
    NULL-element and ragged vectors equals the pair set over its
    clean subset, bit-for-bit on the cosine."""
    import numpy as np

    from etl_covid19_spark.operators.similarity import (
        hyperplane_near_dup_pairs,
    )

    rng = np.random.RandomState(23)
    base = rng.randn(40, 8)
    mates = base[:10] + 0.02 * rng.randn(10, 8)
    clean = np.vstack([base, mates]).astype(np.float32)
    rows = [(i, clean[i].tolist()) for i in range(len(clean))]
    dirty = list(rows)
    # NULL slot, NULL element, ragged width — all must drop out
    dirty.append((100, None))
    nulled = clean[0].tolist()
    nulled[3] = None
    dirty.append((101, nulled))
    dirty.append((102, clean[1].tolist()[:5]))
    schema = "vec_id long, embedding array<float>"
    got_dirty = {
        (r.id_a, r.id_b, r.cosine)
        for r in hyperplane_near_dup_pairs(
            spark.createDataFrame(dirty, schema),
            "embedding", "vec_id", threshold=0.9, dim=8,
        ).collect()
    }
    got_clean = {
        (r.id_a, r.id_b, r.cosine)
        for r in hyperplane_near_dup_pairs(
            spark.createDataFrame(rows, schema),
            "embedding", "vec_id", threshold=0.9, dim=8,
        ).collect()
    }
    assert got_dirty == got_clean
    assert len(got_clean) >= 5, "construction sanity: planted pairs"
    assert not any(i >= 100 for p in got_dirty for i in p[:2])


def test_vector_sql_fast_path_gated_on_simple_identifiers(spark):
    """Round-11 ADVICE: the SQL-string fast path backtick-quotes its
    input, so a dotted name ('s.v') would resolve a literal column
    named "s.v" while the F.col path resolves the nested struct
    field — the fast path must therefore be gated on simple
    identifiers, with dotted names falling back to the Column path
    (nested-field semantics preserved)."""
    from etl_covid19_spark.functions import vectors as V

    df = spark.createDataFrame(
        [(1, ([3.0, 4.0], [4.0, 3.0]))],
        "pid long, s struct<va: array<double>, vb: array<double>>",
    )
    r = df.select(
        V.dot("s.va", "s.vb").alias("d"),
        V.norm("s.va").alias("n"),
        V.cosine("s.va", "s.vb").alias("c"),
        V.l2_distance("s.va", "s.vb").alias("l"),
    ).collect()[0]
    assert r.d == 24.0
    assert r.n == 5.0
    assert abs(r.c - 24.0 / 25.0) < 1e-15
    assert abs(r.l - 2.0 ** 0.5) < 1e-15


def test_components_arrow_label_identical_to_iterative(spark):
    """The single-task union-find kernel (`_components_arrow` — the
    round-11-verdict band-components successor used by
    simhash_clusters) is label-identical to the iterative
    `connected_components` on random graphs, star graphs, parallel/
    self-referencing duplicate edges, and a chain DEEPER than the
    iterative path's pointer-doubling round budget would need."""
    import random

    from pyspark.sql import Row

    from etl_covid19_spark.operators.dedup import (
        _components_arrow,
        connected_components,
    )

    rng = random.Random(7)
    cases = []
    # random sparse graph over sparse ids
    ids = rng.sample(range(10_000_000), 400)
    cases.append(
        [
            (ids[rng.randrange(400)], ids[rng.randrange(400)])
            for _ in range(300)
        ]
    )
    # deep chain (diameter 120) + islands + duplicate edges
    chain = [(i * 7, (i + 1) * 7) for i in range(120)]
    cases.append(chain + chain[:10] + [(5_000_001, 5_000_002)])
    for edges in cases:
        edges = [e for e in edges if e[0] != e[1]] or [(1, 2)]
        pairs = spark.createDataFrame(
            [Row(doc_a=a, doc_b=b) for a, b in edges]
        )
        got_uf = {
            r.doc_id: r.cluster_id
            for r in _components_arrow(pairs).collect()
        }
        got_it = {
            r.doc_id: r.cluster_id
            for r in connected_components(
                pairs, max_iter=40
            ).collect()
        }
        assert got_uf == got_it
