"""Corpus-statistics batch: Misra-Gries heavy hitters, Bloom
incremental dedup, tf-idf top terms, OOV audit, lang-ID confusion.

Oracle parity for the registry entries is covered by
test_full_differential; these tests pin the properties the oracle
can't see — sketch exactness under adversarial skew with a capacity
far below the distinct-key count, and Bloom soundness (no false
negatives) with a deliberately undersized filter.
"""

import pytest
from pyspark.sql import functions as F

from etl_covid19_spark.operators.aggregates import frequent_items
from etl_covid19_spark.operators.dedup import (
    bloom_membership_predicate,
    bloom_words_column,
    build_text_bloom,
    incremental_exact_dedup,
    incremental_exact_dedup_bloom,
)
from etl_covid19_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


# ---------------------------------------------------------------------------
# frequent_items: exact under adversarial skew
# ---------------------------------------------------------------------------


def test_frequent_items_exact_under_skew(spark):
    # 2000 distinct background keys (one row each) + 3 heavy keys,
    # capacity 32 << 2003 distinct: the naive per-partition state
    # would hold thousands of counters; MG holds 32. Result must
    # still be exactly the keys with freq*k > n.
    rows = [(f"bg_{i}",) for i in range(2000)]
    rows += [("heavy_a",)] * 900 + [("heavy_b",)] * 700 + [("heavy_c",)] * 400
    df = spark.createDataFrame(rows, ["k"]).repartition(8)
    n = len(rows)
    k = 5  # threshold n/5 = 800 -> only heavy_a qualifies
    got = {
        r["k"]: r["freq"]
        for r in frequent_items(df, "k", k=k, capacity=32).collect()
    }
    exact = {
        r["k"]: r["cnt"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()
        if r["cnt"] * k > n
    }
    assert got == exact == {"heavy_a": 900}


def test_frequent_items_threshold_strict_and_share(spark):
    # 4 keys x 25 rows each, n=100, k=4 -> freq*4 > 100 fails at
    # exactly 25 (strict >): empty result. k=5 -> all four qualify
    # with share 0.25.
    rows = [(c,) for c in "abcd" for _ in range(25)]
    df = spark.createDataFrame(rows, ["k"]).repartition(4)
    assert frequent_items(df, "k", k=4, capacity=16).count() == 0
    out = frequent_items(df, "k", k=5, capacity=16).collect()
    assert sorted(r["k"] for r in out) == ["a", "b", "c", "d"]
    assert all(r["freq"] == 25 and r["share"] == 0.25 for r in out)


def test_frequent_items_single_partition_stream_order(spark):
    # Heavy key arriving LAST in one partition — the decrement
    # phase has already run many times; the candidate must survive.
    rows = [(f"bg_{i}",) for i in range(500)] + [("tail_heavy",)] * 300
    df = spark.createDataFrame(rows, ["k"]).coalesce(1)
    got = frequent_items(df, "k", k=4, capacity=8).collect()
    assert [(r["k"], r["freq"]) for r in got] == [("tail_heavy", 300)]


# ---------------------------------------------------------------------------
# Bloom incremental dedup
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    # Deliberately tiny filter (2 words = 128 bits) for 120 distinct
    # texts: heavy saturation, many false positives — but NEVER a
    # false negative on a member.
    docs = _docs(spark).limit(120)
    words = build_text_bloom(docs, "text", m_words=2, k=5)
    probe = docs.select(F.col("text").alias("content_key")).withColumn(
        "_bloom_words", bloom_words_column(words)
    )
    might = bloom_membership_predicate(words, "content_key", k=5)
    assert probe.filter(~might).count() == 0


def test_bloom_incremental_matches_exact(spark):
    docs = _docs(spark)
    new = docs.filter(F.col("doc_id") >= 100)
    old = docs.filter(F.col("doc_id") < 100)
    exact = incremental_exact_dedup(new, old, "text", "doc_id", hashed=False)
    for m_words in (2, 1024):  # saturated AND well-sized filters
        bloom = incremental_exact_dedup_bloom(
            new, old, "text", "doc_id", m_words=m_words
        )
        assert sorted(map(tuple, bloom.collect())) == sorted(
            map(tuple, exact.collect())
        )


def test_bloom_prefilter_prunes_probe(spark):
    # With a well-sized filter, rows that are definitely new skip
    # the verify join: the positives branch must be a small subset
    # of the batch (dupes + ~1% FP), not the whole batch.
    docs = _docs(spark)
    new = docs.filter(F.col("doc_id") >= 100)
    old = docs.filter(F.col("doc_id") < 100)
    words = build_text_bloom(old, "text", m_words=1024, k=5)
    probe = new.select(F.col("text").alias("content_key")).withColumn(
        "_bloom_words", bloom_words_column(words)
    )
    might = bloom_membership_predicate(words, "content_key", k=5)
    n_new = new.count()
    n_probed = probe.filter(might).count()
    n_true_dupes = (
        new.join(
            old.select("text").distinct(), ["text"], "left_semi"
        ).count()
    )
    assert n_probed < n_new  # the prefilter actually prunes
    # FPs bounded: probed <= dupes + 10% of the batch
    assert n_probed <= n_true_dupes + max(5, n_new // 10)


# ---------------------------------------------------------------------------
# Registry smoke of the analytical entries (values vs oracle are in
# the differential sweep; here: shape + internal consistency)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["tfidf_top_terms", "oov_rate"])
def test_doc_grain_outputs_cover_every_doc(spark, name):
    out = REGISTRY[name].fn(spark, SF)
    n_docs = _docs(spark).count()
    assert out.select("doc_id").distinct().count() == n_docs


def test_tfidf_rank_bounds(spark):
    out = REGISTRY["tfidf_top_terms"].fn(spark, SF)
    per_doc = out.groupBy("doc_id").count().agg(F.max("count")).first()[0]
    assert per_doc <= 3


def test_langid_confusion_shares_sum_to_one(spark):
    out = REGISTRY["langid_confusion"].fn(spark, SF)
    sums = (
        out.groupBy("actual_lang")
        .agg(F.sum("share_of_actual").alias("s"))
        .collect()
    )
    assert all(abs(r["s"] - 1.0) < 1e-9 for r in sums)


# ---------------------------------------------------------------------------
# text_quality Arrow twin: bit-exact parity with the HOF form
# ---------------------------------------------------------------------------


def test_quality_counts_arrow_bit_parity(spark):
    import struct

    import numpy as np

    from etl_covid19_spark.functions import text as TX

    rng = np.random.default_rng(23)
    words = ["the", "spark!", "café", "naïve", "日本語", "😀,.;", "a", "It"]
    rows = [
        (0, "", "en"),
        (1, "   ", "en"),
        (2, "single", "fr"),
        (3, "\ta b\n c  d\x0b e\x0c f\r g", "en"),
        (4, "x " * 200, "en"),
        (5, "!!! ??? ...", "en"),
    ]
    for i in range(6, 80):
        k = int(rng.integers(0, 30))
        rows.append(
            (i, " ".join(rng.choice(words) for _ in range(k)), "xx")
        )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def pack(r):
        return tuple(
            struct.pack("d", v) if isinstance(v, float) else v
            for v in (
                r["n_tokens"],
                r["mean_token_len"],
                r["punct_ratio"],
                r["stopword_ratio"],
                r["quality"],
            )
        )

    hof = {
        r["doc_id"]: pack(r)
        for r in df.select(
            "doc_id",
            TX.token_count("text").alias("n_tokens"),
            TX.mean_token_length("text").alias("mean_token_len"),
            TX.punct_ratio("text").alias("punct_ratio"),
            TX.stopword_ratio("text").alias("stopword_ratio"),
            TX.quality_score("text").alias("quality"),
        ).collect()
    }
    m = TX.quality_from_counts()
    kern = {
        r["doc_id"]: pack(r)
        for r in TX.quality_counts_arrow(df, ["doc_id", "lang"], "text")
        .select(
            "doc_id",
            "n_tokens",
            m["mean_token_len"].alias("mean_token_len"),
            m["punct_ratio"].alias("punct_ratio"),
            m["stopword_ratio"].alias("stopword_ratio"),
            m["quality"].alias("quality"),
        )
        .collect()
    }
    assert hof == kern
