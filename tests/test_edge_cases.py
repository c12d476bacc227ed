"""Edge-case hardening: empty inputs, degenerate groups, boundary
documents — the shapes that break pipelines in production."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_asof_join_empty_right(spark):
    from etl_covid19_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [Row(k=1, lts=dt.datetime(2024, 1, 1, 9), v=1.0)]
    )
    right = spark.createDataFrame(
        [], "k int, rts timestamp, payload double"
    )
    inner = asof_join(left, right, ["k"], "lts", "rts", ["payload"], "inner")
    outer = asof_join(left, right, ["k"], "lts", "rts", ["payload"], "left")
    assert inner.count() == 0
    rows = outer.collect()
    assert len(rows) == 1 and rows[0].asof_payload is None


def test_range_join_empty_sides(spark):
    from etl_covid19_spark.operators.joins import range_join

    left = spark.createDataFrame([], "k int, lts timestamp")
    right = spark.createDataFrame(
        [Row(k=1, rts=dt.datetime(2024, 1, 1, 9))]
    )
    assert range_join(left, right, ["k"], "lts", "rts", 0, 60).count() == 0


def test_connected_components_empty_pairs(spark):
    from etl_covid19_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(pairs).count() == 0


def test_connected_components_raises_on_nonconvergence(spark):
    """A 5-hop path graph cannot converge in 2 min-label rounds; the
    operator must refuse to return partially-merged components."""
    from etl_covid19_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [Row(doc_a=i, doc_b=i + 1) for i in range(6)]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)
    # and with enough rounds the same graph resolves to one component
    labels = connected_components(pairs, max_iter=10).collect()
    assert {r.cluster_id for r in labels} == {0}


def test_dedup_cache_bounded_and_invalidated_on_rewrite(spark, tmp_path):
    """The postings pool must (a) serve a cached frame for the same
    file snapshot, (b) miss after the parquet is rewritten in place,
    and (c) unpersist on eviction/clear instead of leaking."""
    from etl_covid19_spark.operators import dedup

    path = str(tmp_path / "corpus")
    spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma delta")]
    ).write.mode("overwrite").parquet(path)
    df1 = spark.read.parquet(path)
    p1 = dedup.shingle_postings_cached(df1, "text", "doc_id")
    assert (
        dedup.shingle_postings_cached(spark.read.parquet(path), "text", "doc_id")
        is p1
    )
    # rewrite the same path with different content → new part files →
    # the memo must NOT serve postings from the old corpus
    spark.createDataFrame(
        [Row(doc_id=2, text="epsilon zeta eta theta")]
    ).write.mode("overwrite").parquet(path)
    p2 = dedup.shingle_postings_cached(
        spark.read.parquet(path), "text", "doc_id"
    )
    assert p2 is not p1
    assert [r.doc_id for r in p2.select("doc_id").distinct().collect()] == [2]
    dedup.clear_dedup_caches()
    assert not p2.storageLevel.useMemory  # unpersisted by clear()


def test_dedup_handles_empty_and_whitespace_docs(spark):
    from etl_covid19_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=""),
            Row(doc_id=2, text="   "),
            Row(doc_id=3, text="one two"),
            Row(doc_id=4, text="alpha beta gamma delta"),
            Row(doc_id=5, text="alpha beta gamma delta"),
        ]
    )
    jp = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.9).collect()
    mp = minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.9).collect()
    # identical docs pair with J=1.0; empty/whitespace docs don't crash.
    # (1,2) may pair too: both have an empty shingle stream → same hash.
    assert {(4, 5)} <= {(r.doc_a, r.doc_b) for r in jp}
    assert {(4, 5)} <= {(r.doc_a, r.doc_b) for r in mp}


def test_sessionize_batch_single_events(spark):
    from etl_covid19_spark.streaming.stateful import sessionize_batch

    df = spark.createDataFrame(
        [Row(user_id=1, ts=dt.datetime(2024, 1, 1, 9), value=2.5)]
    )
    out = sessionize_batch(df).collect()
    assert len(out) == 1 and out[0].n_events == 1 and out[0].sum_value == 2.5


def test_percentiles_single_row_group(spark):
    from etl_covid19_spark.operators.aggregates import percentiles

    df = spark.createDataFrame([Row(g="a", v=42.0)])
    out = percentiles(df, ["g"], "v", [0.25, 0.99]).collect()[0]
    assert out.p25 == 42.0 and out.p99 == 42.0


def test_quality_functions_on_empty_text(spark):
    from etl_covid19_spark.functions import text

    df = spark.createDataFrame([Row(t="")])
    row = df.select(
        text.token_count("t").alias("n"),
        text.quality_score("t").alias("q"),
        text.fingerprint("t").alias("fp"),
        text.bpe_ish_token_count("t").alias("bpe"),
    ).collect()[0]
    assert row.n == 0 and row.bpe == 0 and row.fp == 0
    assert 0.0 <= row.q <= 1.0


def test_curation_on_degenerate_corpus(spark):
    from etl_covid19_spark.plans.corpus import curate

    docs = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text="the and of to a " * 10)]
    )
    out = {r.doc_id: r.reason for r in curate(docs).collect()}
    assert set(out) == {1, 2}
    assert out[1] == "low_quality"
