"""Scale twins vs their exact formulations on in-memory inputs:
distributed_rank vs a global-window rank, simhash_clusters vs
pairs→connected-components. The registry differential already pins
both at sf0.01 against DuckDB; these cover shapes the warehouse data
doesn't (single row, all-equal values, empty pair graph, heavy
duplication)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_covid19_spark.operators.aggregates import distributed_rank


def _ranked_exact(df, value, tiebreak):
    w = Window.orderBy(F.col(value).desc(), F.col(tiebreak))
    return {
        r[tiebreak]: r.pos
        for r in df.withColumn("pos", F.row_number().over(w)).collect()
    }


@pytest.mark.parametrize("n_buckets", [1, 4, 64])
def test_distributed_rank_matches_global_sort(spark, n_buckets):
    df = spark.range(500).selectExpr(
        "id AS k", "CAST((id * 37) % 211 AS DOUBLE) AS v"  # heavy ties
    )
    got = {
        r.k: r._pos
        for r in distributed_rank(df, "v", "k", n_buckets=n_buckets).collect()
    }
    assert got == _ranked_exact(df, "v", "k")


def test_distributed_rank_degenerate_shapes(spark):
    one = spark.createDataFrame([(1, 5.0)], "k long, v double")
    r = distributed_rank(one, "v", "k").collect()
    assert len(r) == 1 and r[0]._pos == 1 and r[0]._n == 1
    # all-equal values: pure tiebreak ordering
    eq = spark.range(50).selectExpr("id AS k", "CAST(1.0 AS DOUBLE) AS v")
    got = {r.k: r._pos for r in distributed_rank(eq, "v", "k").collect()}
    assert got == {k: k + 1 for k in range(50)}


def test_simhash_clusters_matches_pairs_components(spark):
    """Cluster assignment must equal the quadratic composition
    (pairs → connected components → min-id canonical) on a corpus
    with exact dups, near dups, and singletons."""
    from etl_covid19_spark.operators.dedup import (
        connected_components,
        simhash_clusters,
        simhash_pairs,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup
        (2, "the quick brown fox jumps over the lazy cat"),  # near dup
        (3, "completely different text about spark engines"),
        (4, "completely different text about spark engines"),  # dup of 3
        (5, "zzz unrelated singleton document body here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.cluster_id
        for r in simhash_clusters(df, "text", "doc_id").collect()
    }
    assert set(got) == {0, 1, 2, 3, 4, 5}  # every doc assigned once

    pairs = simhash_pairs(df, "text", "doc_id")
    comp = {
        r.doc_id: r.cluster_id
        for r in connected_components(pairs).collect()
    }
    for doc, label in comp.items():  # connected docs agree
        assert got[doc] == label, (doc, got, comp)
    for doc in set(got) - set(comp):  # singletons self-labelled
        assert got[doc] == doc


def test_simhash_clusters_no_pairs_all_singletons(spark):
    from etl_covid19_spark.operators.dedup import simhash_clusters

    # wildly different docs: likely zero hamming<=8 pairs; every doc
    # must still come back with its own id
    rows = [
        (i, " ".join(f"tok{i}_{j}" for j in range(30))) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.cluster_id
        for r in simhash_clusters(df, "text", "doc_id").collect()
    }
    assert len(got) == 6
    assert all(got[d] <= d for d in got)  # labels are component minima
