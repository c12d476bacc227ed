"""Global plan invariants over the scale-sensitive registry surface.

The one physical-plan property that must NEVER regress at 100 TB:
no O(n·m) join fallback — a BroadcastNestedLoopJoin or
CartesianProduct appearing in a dedup/similarity/join query means a
candidate-generation equi-join silently degraded (a refactor lost a
join key, a condition became non-equi). Plans are inspected WITHOUT
executing the queries, so the sweep stays cheap.

Whitelist: the two documented exact baselines are all-pairs BY
DESIGN (`embedding_near_dup_exact`, `ann_cosine_topk`'s brute-force
scorer) — they are the tiny-SF oracle cross-checks, never the scale
path, and excluded here.
"""

import pytest

from etl_covid19_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

# scale-sensitive batch queries: every dedup/similarity/join-family
# entry plus the bench headliners (streaming drives excluded — their
# fns execute real streams; exact all-pairs baselines excluded by
# design)
SWEEP = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_clustered",
    "dedup_clusters",
    "embedding_near_dup",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_hamming_topk",
    "embedding_binarize",
    "training_shuffle",
    "pmi_bigrams",
    "negative_sampling",
    "zipf_fit",
    "dedup_containment",
    "incremental_minhash_dedup",
    "triangle_count",
    "item_cooccurrence",
    "attribution_last_touch",
    "phrase_search",
    "attribution_first_touch",
    "boilerplate_shingles",
    "dup_cluster_sizes",
    "session_bounce_rate",
    "source_language_entropy",
    "source_overlap_matrix",
    "knn_graph",
    "knn_graph_ivf",
    "asof_join_events",
    "range_join_events",
    "skew_salted_join",
    "star_join_revenue",
    "profit_by_nation_brand",
    "semi_join_active",
    "anti_join_integrity",
    "null_safe_join",
    "contamination_check",
    "temperature_mix",
    "source_reputation_filter",
    "sequence_packing",
    "substring_dedup",
    "substring_dedup_keep_first",
    "incremental_dedup",
    "incremental_dedup_bloom",
    "heavy_hitter_tokens",
    "tfidf_top_terms",
    "oov_rate",
    "semantic_dedup",
    "semantic_dedup_scaled",
    "ann_ivf_pq_topk",
    "quality_classifier",
    "text_quality_arrow",
    "unigram_lm_perplexity",
    "bigram_lm_perplexity",
    "dsir_importance",
    "gopher_quality_filter",
    "curation_pipeline",
    "image_phash_dedup",
    "audio_fingerprint_dedup",
    "corpus_datacard",
    "curation_signal_agreement",
    "q5_local_supplier_volume",
    "q10_returned_item",
    "q14_promo_revenue",
    "q19_disjunctive_pricing",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q16_part_supplier_counts",
    "stats_kit",
    "mode_per_group",
    "value_histogram",
    "scd2_dimension",
    "gap_fill_interpolate",
    "funnel_conversion",
    "cohort_retention",
    "anomaly_zscore",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q20_excess_quantity_suppliers",
    "q21_waiting_suppliers",
]
# q11/q15/q22 and bm25_search carry a deliberate single-row
# scalar-aggregate broadcast (uncorrelated scalar subquery / corpus
# stats row) which Spark plans as a BroadcastNestedLoopJoin over
# exactly one build row — constant work, not O(n·m) — so they are
# excluded from the forbidden-node sweep. fuzzy_join_nations is a
# documented bounded-broadcast theta join (|probes| × |dim|), also
# excluded by design. window_dist_scaled and
# equidepth_histogram_sketch broadcast a ONE-ROW model frame (cut
# array / third-highest value) the same way — constant work,
# excluded for the same reason. hybrid_retrieval_rrf inherits
# bm25_search's one-row corpus-stats broadcast (its kw side), so it
# is excluded with it; its vector side (ann_lsh_topk machinery) and
# fusion join are equi-joins covered by the swept entries.
# length_drift_ks cross-joins two BOUNDED stats tables (|sources| ×
# |distinct lengths| — model-sized, never row-level data), the same
# documented exclusion class.

FORBIDDEN = ("BroadcastNestedLoopJoin", "CartesianProduct")


@pytest.mark.parametrize("name", SWEEP)
def test_no_nested_loop_or_cartesian(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for node in FORBIDDEN:
        assert node not in plan, f"{name}: {node} in physical plan"


# Queries whose round-6 broadcast-audit dropped forced hints on
# corpus-PROPORTIONAL frames (eval shingle vocabularies, LSH
# candidate sets, df-capped vocabularies, filtered linear dims).
# They must keep working — same answers, no join fallback — when
# broadcasting is impossible (`autoBroadcastJoinThreshold=-1`),
# because that is exactly the 100 TB regime where those frames
# outgrow any broadcast budget.
DEHINTED = [
    "contamination_check",
    "contamination_check_capped",
    "dedup_ngram_jaccard_capped",
    "dedup_minhash_lsh",
    "profit_by_nation_brand",
    "q3_shipping_priority",
    "q18_large_volume_customers",
    "q11_important_stock",
    "q16_part_supplier_counts",
]


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.mark.parametrize("name", DEHINTED)
def test_survives_without_broadcast(no_broadcast, name):
    """With broadcasts disabled the de-hinted queries must (a) plan
    without O(n·m) fallbacks — shuffle equi-joins, not BNLJ — and
    (b) return the same rows as the default plan."""
    spark = no_broadcast
    df = REGISTRY[name].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # q11's documented ONE-ROW scalar-total cross join plans as a
    # single-build-row BNLJ once hints are off — constant work, the
    # same exclusion class as the main sweep's scalar broadcasts
    if name != "q11_important_stock":
        for node in FORBIDDEN:
            assert node not in plan, f"{name}: {node} without broadcast"
    no_bc_rows = {tuple(r) for r in df.collect()}
    # back to the session defaults (split thresholds: 10m static
    # estimate-driven, 64m AQE measured) for the comparison plan
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    default_rows = {
        tuple(r) for r in REGISTRY[name].fn(spark, SF).collect()
    }
    assert no_bc_rows == default_rows, f"{name}: result depends on join strategy"
