"""PageRank: hand-computable graphs, mass conservation, dangling
redistribution, and partition invariance."""

import math

import pytest
from pyspark.sql import functions as F

from etl_covid19_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_cycle_is_uniform(spark):
    # 1->2->3->1: perfect symmetry -> uniform ranks at any damping
    out = {r.vertex: r.rank for r in pagerank(
        _edges(spark, [(1, 2), (2, 3), (3, 1)]), n_iter=20
    ).collect()}
    for v in (1, 2, 3):
        assert math.isclose(out[v], 1 / 3, rel_tol=1e-9)


def test_star_hub_dominates_and_matches_closed_form(spark):
    # spokes 2..5 each point at hub 1; hub is dangling.
    # Closed-form fixpoint (d=0.85, N=5, s = spoke rank, h = hub):
    #   s = 0.03 + 0.17*h,  h = 0.03 + 0.85*(4s) + 0.17*h
    out = {r.vertex: r.rank for r in pagerank(
        _edges(spark, [(2, 1), (3, 1), (4, 1), (5, 1)]), n_iter=60
    ).collect()}
    h, s = out[1], out[2]
    assert math.isclose(s, 0.03 + 0.17 * h, rel_tol=1e-6)
    assert math.isclose(h, 0.03 + 0.85 * 4 * s + 0.17 * h, rel_tol=1e-6)
    assert h > s * 3  # the hub clearly dominates


def test_mass_conserved_with_dangling_nodes(spark):
    # 3 is dangling; total rank must stay exactly 1.0 (to fp noise)
    out = pagerank(
        _edges(spark, [(1, 2), (2, 3), (1, 3)]), n_iter=25
    ).collect()
    assert math.isclose(sum(r.rank for r in out), 1.0, rel_tol=1e-9)


def test_partition_invariance(spark):
    e = _edges(spark, [(i, (i * 7) % 23) for i in range(200)])
    a = sorted(
        pagerank(e.coalesce(1), n_iter=8).collect(),
        key=lambda r: r.vertex,
    )
    b = sorted(
        pagerank(e.repartition(17, "dst"), n_iter=8).collect(),
        key=lambda r: r.vertex,
    )
    for ra, rb in zip(a, b):
        assert ra.vertex == rb.vertex and ra.rank == rb.rank  # exact bits


def test_registry_entry_runs(spark):
    from etl_covid19_spark.queries import REGISTRY

    out = REGISTRY["pagerank_similarity"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert 0 < len(out) <= 50
    assert all(out[i].rank >= out[i + 1].rank for i in range(len(out) - 1))


def test_empty_edge_list_returns_empty_frame(spark):
    """An upstream kNN build can legitimately yield zero edges; the
    operator must return an empty (vertex, rank) frame instead of
    raising ZeroDivisionError on the teleport constant."""
    out = pagerank(_edges(spark, []))
    assert out.columns == ["vertex", "rank"]
    assert out.count() == 0
