"""Property-based tests (hypothesis) for the pure-Python kernels.

Spark stays out of the hypothesis loop (hundreds of examples);
deterministic Spark-side equivalents are covered in the other test
modules."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_covid19_spark.operators.dedup import _minhash_coeffs
from etl_covid19_spark.streaming.stateful import _fold_sessions

GAP = 1000


def reference_sessions(ts_sorted, gap):
    """Independent gaps-and-islands implementation."""
    sessions = []
    for t in ts_sorted:
        if sessions and t - sessions[-1][-1] < gap:
            sessions[-1].append(t)
        else:
            sessions.append([t])
    return sessions


@given(
    st.lists(st.integers(min_value=0, max_value=50_000), min_size=1, max_size=60)
)
@settings(max_examples=300, deadline=None)
def test_fold_sessions_matches_reference(ts):
    ts = sorted(ts)
    vals = [1.0] * len(ts)
    closed, carry = _fold_sessions(pd.Series(ts), pd.Series(vals), GAP, None)
    got = closed + [carry]
    ref = reference_sessions(ts, GAP)
    # same session boundaries…
    assert [(s[0], s[-1], len(s)) for s in ref] == [
        (start, end, n) for (start, end, n, _) in got
    ]
    # …and totals conserve events
    assert sum(n for (_, _, n, _) in got) == len(ts)


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=40),
    st.integers(min_value=1, max_value=20),
)
@settings(max_examples=200, deadline=None)
def test_fold_sessions_incremental_equals_batch(ts, split_at):
    """Feeding the fold in two chunks with carried state must equal
    one batch pass — the applyInPandasWithState invariant."""
    ts = sorted(ts)
    cut = min(split_at, len(ts) - 1)
    a, b = ts[:cut], ts[cut:]
    closed1, carry1 = _fold_sessions(
        pd.Series(a), pd.Series([1.0] * len(a)), GAP, None
    )
    closed2, carry2 = _fold_sessions(
        pd.Series(b), pd.Series([1.0] * len(b)), GAP, carry1
    )
    whole_closed, whole_carry = _fold_sessions(
        pd.Series(ts), pd.Series([1.0] * len(ts)), GAP, None
    )
    assert closed1 + closed2 == whole_closed
    assert carry2 == whole_carry


def test_minhash_coeffs_distinct_and_nonzero():
    coeffs = _minhash_coeffs(128)
    assert len(set(coeffs)) == 128
    assert all(a != 0 for a, _ in coeffs)  # h_i must not be constant


def test_sequence_packing_invariants(spark):
    """Pack assignment invariants at sf0.01: (1) every document lands
    in exactly one pack; (2) no pack exceeds budget + the largest
    single document (running-total bucketing can overshoot by at most
    the doc that crosses the boundary); (3) pack ids are disjoint
    across shards."""
    from pyspark.sql import functions as F

    from etl_covid19_spark.queries import REGISTRY
    from etl_covid19_spark.sources.catalog import load_table
    from etl_covid19_spark.functions import text

    sf = "/root/testdata/sf0.01"
    packs = REGISTRY["sequence_packing"].fn(spark, sf)
    docs = load_table(spark, "documents", sf)
    n_docs = docs.count()
    stats = packs.agg(
        F.sum("n_docs").alias("total_docs"),
        F.max("pack_tokens").alias("max_pack"),
    ).collect()[0]
    assert stats.total_docs == n_docs  # partition of the corpus
    max_doc = docs.select(
        F.max(F.size(text.tokens("text"))).alias("m")
    ).collect()[0].m
    assert stats.max_pack <= 2048 + max_doc
    # (lang, pack_id) is unique — shard offsets cannot collide
    assert packs.count() == packs.select("lang", "pack_id").distinct().count()


def test_stratified_sample_is_deterministic_and_stratified(spark):
    """Hash sampling must (1) give identical results on re-run (no
    RNG), and (2) actually differentiate strata rates."""
    from etl_covid19_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.01"
    a = {(r.lang): (r.n_sampled, r.sampled_chars)
         for r in REGISTRY["stratified_sample"].fn(spark, sf).collect()}
    b = {(r.lang): (r.n_sampled, r.sampled_chars)
         for r in REGISTRY["stratified_sample"].fn(spark, sf).collect()}
    assert a == b and a


def test_connected_components_matches_union_find(spark):
    """Randomized cross-check: min-label propagation must agree with
    a reference union-find on seeded random graphs (islands, chains,
    and dense blobs all arise across draws)."""
    from pyspark.sql import Row

    from etl_covid19_spark.operators.dedup import connected_components

    state = 1234567

    def rnd(n):
        nonlocal state
        state = (state * 1103515245 + 12345) % (2**31)
        return state % n

    for trial in range(3):
        n_nodes, n_edges = 60, 45
        edges = [(rnd(n_nodes), rnd(n_nodes)) for _ in range(n_edges)]
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {x for e in edges for x in e}
        expected = {x: find(x) for x in touched}

        got = {
            r.doc_id: r.cluster_id
            for r in connected_components(
                spark.createDataFrame(
                    [Row(doc_a=a, doc_b=b) for a, b in edges]
                ),
                max_iter=60,
            ).collect()
        }
        assert got == expected, f"trial {trial}"
