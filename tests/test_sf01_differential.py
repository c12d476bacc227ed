"""Scale-sensitive families' differential sweep at sf0.1 (VERDICT r3
#7): sf0.01 catches logic errors, sf0.1 catches CARDINALITY-dependent
ones — LSH bucket sizes, candidate volumes, df caps, cluster
convergence, and skew paths only exercise their interesting branches
once the corpus is big enough to populate them (the skew tests
already run there). The families selected by the pattern are exactly
the candidate-generation / iterative / postings operators whose
behavior changes with data volume; plain scans/aggregates gain
nothing from the bigger SF and stay at sf0.01 in
test_full_differential.py.

Slowest test in the suite after the full sweep (~4-6 min); deselect
with `-m "not differential"` for quick iteration loops.
"""

import re
import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from etl_covid19_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.1"

_SCALE_SENSITIVE = re.compile(
    r"dedup|minhash|simhash|containment|substring|jaccard|ann_|knn"
    r"|pagerank|triangle|embedding|semantic|bm25|phrase|rrf|hybrid"
    r"|boilerplate|near_dup|cluster|quantiz|incremental"
)


def scale_sensitive_names() -> set[str]:
    return {n for n in REGISTRY if _SCALE_SENSITIVE.search(n)}


def test_selector_matches_the_families_it_claims():
    names = scale_sensitive_names()
    # guard the selector itself: a registry rename must not silently
    # shrink the sweep
    assert len(names) >= 35
    for must in (
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard_capped",
        "ann_ivf_pq_topk",
        "knn_graph",
        "pagerank_similarity",
        "semantic_dedup_scaled",
        "incremental_minhash_dedup",
    ):
        assert must in names


@pytest.mark.differential
def test_scale_sensitive_queries_match_oracle_at_sf01(spark):
    import diffcheck

    failures = diffcheck.run(
        spark, SF_DIR, only=scale_sensitive_names(), verbose=False
    )
    assert not failures, "\n".join(f"{n}: {p}" for n, p in failures)
