"""Lexical retrieval: postings construction, hand-computed BM25
scores on a tiny corpus, and ranking invariants."""

import math

from etl_covid19_spark.operators.search import bm25_topk, postings, tokenize


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tokenize_lowercases_and_splits_punct(spark):
    toks = tokenize(
        _corpus(spark, [(1, "Hello, World! hello-42")])
    ).collect()
    assert sorted(t.term for t in toks) == ["42", "hello", "hello", "world"]


def test_postings_tf_and_dl(spark):
    post = {
        (r.doc_id, r.term): (r.tf, r.dl)
        for r in postings(_corpus(spark, [(1, "x x y"), (2, "x z")])).collect()
    }
    assert post[(1, "x")] == (2, 3)
    assert post[(1, "y")] == (1, 3)
    assert post[(2, "x")] == (1, 2)
    assert post[(2, "z")] == (1, 2)


def test_bm25_matches_hand_computation(spark):
    out = bm25_topk(
        _corpus(spark, [(1, "x x y"), (2, "x z")]), ["x"], k=10
    ).collect()
    k1, b = 1.2, 0.75
    n_docs, avgdl, df = 2.0, 2.5, 2.0
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def expected(tf, dl):
        return round(
            idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * (dl / avgdl))), 6
        )

    got = {r.doc_id: r.score for r in out}
    assert math.isclose(got[1], expected(2, 3), abs_tol=2e-6)
    assert math.isclose(got[2], expected(1, 2), abs_tol=2e-6)
    # higher tf (same-ish length) ranks first
    assert out[0].doc_id == 1


def test_bm25_rare_term_outranks_common(spark):
    # 'rare' appears in 1 of 4 docs; 'com' in all 4. Same tf/dl for
    # the probe docs -> the rare-term doc must score higher.
    docs = _corpus(
        spark,
        [(1, "rare com"), (2, "com com"), (3, "com pad"), (4, "com pad")],
    )
    out = {r.doc_id: r.score for r in bm25_topk(docs, ["rare"], k=10).collect()}
    out2 = {r.doc_id: r.score for r in bm25_topk(docs, ["com"], k=10).collect()}
    assert set(out) == {1}  # only the matching doc is touched/returned
    assert out[1] > out2[3]  # idf(rare) > idf(common) at equal tf/dl


def test_bm25_only_query_term_postings_touched(spark):
    """The scoring join must prune to query terms: a query for a
    term absent from the corpus returns nothing (no full scan
    fallback path)."""
    out = bm25_topk(
        _corpus(spark, [(1, "x y"), (2, "y z")]), ["missing"], k=10
    ).collect()
    assert out == []
