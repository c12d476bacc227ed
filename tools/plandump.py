"""Regenerate PLANS.md: executed physical plans (post-AQE) for
representative queries, with the scale-relevant properties called
out. Run: python tools/plandump.py"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"

COMMENTARY = {
    "snapshot_zone_dv_read": (
        "Snapshot zone under the gate: the DV-masked read is the data "
        "scan anti-joined with the sidecar scan on (file basename, "
        "row_index) — an EQUI-join feeding a two-phase hash aggregate; "
        "no BNLJ, no driver-side vector state."
    ),
    "snapshot_time_travel": (
        "Versioned reads (manifest-stats pruned, round 10): the v0 "
        "branch scans only the manifest-0 files whose [min,max] "
        "overlap the custkey slice (no DV anti-join — the later "
        "deletion vector is invisible to old manifests by "
        "construction); the live branch prunes against the live "
        "manifest's stats and carries the DV anti-join. Range-"
        "partitioned writes give each file a disjoint key range, so "
        "both reads skip most files without footer I/O (the unpruned "
        "v0 read re-scanned the whole base slice — 12.6× slope at "
        "sf100). Both collapse to single-row aggregates before the "
        "union."
    ),
    "snapshot_change_feed": (
        "Row-exact CDF: snapshot_row_diff is two exceptAll passes "
        "(hash aggregates on the full row), each over a DV-aware "
        "read — multiplicity-exact, shuffles rows once per side; "
        "the registered output aggregates to tag counts."
    ),
    "streaming_export_read": (
        "Replay-safe streaming export read-back: epoch publication "
        "ran upstream (one overwrite-idempotent shard set per "
        "micro-batch); the registered plan is a partitioned JSON "
        "scan over epoch=*/shard=* + two-phase aggregate — the "
        "epoch/shard layout rides in as partition columns, no "
        "per-epoch union."
    ),
    "export_roundtrip_read": (
        "JSONL export read-back: shard assignment is a map-side "
        "xxhash64 projection; ONE repartition(shard) pass wrote the "
        "files, so the registered plan is a JSON scan + two-phase "
        "lang aggregate — manifest verification ran upstream as "
        "its own bounded n_shards-row aggregate."
    ),
    "clustered_compact_read": (
        "Layout-governance read-back: both branches are bare "
        "parquet scans (range-clustered files / compacted "
        "partitions) with the user_id filter pushed to footer "
        "stats, each collapsing to a single-row aggregate before "
        "the union — layout work is paid at write time, the read "
        "plan carries none of it."
    ),
    "zone_mutation_read": (
        "Partition-granularity DELETE+MERGE read-back: after the "
        "dynamic-partition rewrites land, the registered plan is a "
        "plain partitioned parquet scan + two-phase aggregate — "
        "mutation cost lives in the rewrite jobs (affected "
        "partitions only), never in the read path."
    ),
    "bucketed_join_agg": (
        "Co-located join: both sides are bucketed saveAsTable "
        "scans on the join key. At this SF the dim is under the "
        "broadcast threshold, so AQE picks a BroadcastHashJoin "
        "(bucketing moot but harmless); with broadcasts disabled — "
        "the 100 TB shape — the SAME tables join as a "
        "SortMergeJoin with ZERO Exchange on either input "
        "(plan-pinned in test_bucketing). Either way the only "
        "shuffle here is the final mktsegment aggregate's partial "
        "states."
    ),
    "streaming_snapshot_sink_read": (
        "Read-back after exactly-once streaming ingestion: the "
        "epoch-ledger foreachBatch sink leaves plain data files, so "
        "the registered plan is a bare multi-file parquet scan + "
        "two-phase aggregate; the streaming write itself ran "
        "upstream of this plan (one atomic snapshot commit per "
        "micro-batch, replays skipped via the epoch ledger)."
    ),
    "snapshot_merge_upsert_read": (
        "MERGE at both granularities: the rewrite zone's read is a "
        "bare scan (survivors + updates rewritten into new files); "
        "the dv zone's read carries the sidecar anti-join over the "
        "masked originals plus appended update files. Both branches "
        "collapse to the same two-phase aggregate before the union "
        "— the semi-join that finds affected files shuffles only "
        "the update KEY set, never the zone."
    ),
    "snapshot_compact_vacuum_read": (
        "Post-compaction read: after snapshot_compact folds the DVs "
        "into rewritten files and vacuum drops the superseded "
        "versions, the plan is a BARE parquet scan + aggregate — "
        "the DV anti-join is gone, which is the whole point of "
        "compaction (no read amplification on the steady state)."
    ),
    "snapshot_prune_read": (
        "Manifest-stats file skipping: the scan's file list is "
        "pruned DRIVER-side from manifest [min,max] (no footer "
        "I/O), so the plan shows a parquet scan over only the "
        "overlapping range files; the real BETWEEN predicate still "
        "pushes down onto that scan."
    ),
    "filter_project": (
        "Filters and projection reach the parquet scan: `PushedFilters` "
        "carries both predicates, `ReadSchema` reads 6 of 11 columns."
    ),
    "pricing_summary": (
        "Partial (map-side) + final HashAggregate around one exchange: "
        "only per-group partial states shuffle, never scan rows."
    ),
    "star_join_revenue": (
        "The fact scan streams through BroadcastHashJoins; the only "
        "shuffle is the final 2-key aggregate. orders/customer joins are "
        "left to AQE (auto-broadcast under threshold at this SF; "
        "sort-merge + skew split at cluster scale)."
    ),
    "profit_by_nation_brand": (
        "part is filtered (p_size ≤ 20) BEFORE broadcasting — dimension "
        "pruning happens off the fact path."
    ),
    "asof_join_events": (
        "As-of join = union + Window (last-ignorenulls carry-forward): "
        "one hash partition on user_id, an in-partition sort, no "
        "BroadcastNestedLoopJoin."
    ),
    "range_join_events": (
        "Interval join binned to an equi-join: SortMergeJoin/"
        "ShuffledHashJoin on (user_id, _bin) + exact BETWEEN filter — "
        "no nested-loop fallback."
    ),
    "dedup_exact": (
        "The dedup shuffle partitions on xxhash64(text): 8-byte keys, "
        "document bodies never move."
    ),
    "dedup_minhash_lsh": (
        "Postings (Arrow gram kernel, fan_out-guarded) → signatures "
        "straight from the kernel (no wide min aggregate) → banded "
        "self-join on a single long band key, bucket-size-capped → "
        "PAIR-LOCAL exact verification (round 10): each candidate "
        "pair equi-joins to its two per-doc shingle arrays "
        "(collect_list over candidate-semi-joined postings — linear) "
        "and array_intersect computes the shared count per row. The "
        "prior form re-joined postings on the shingle key — Σ_sh df² "
        "rows (222M at sf10; disk death at sf100 on a 27k-type "
        "corpus); now NOTHING in the plan scales with df², and the "
        "only payload wider than a hash is each doc's own shingle "
        "array riding once per candidate pair."
    ),
    "filter_funnel": (
        "The removal-cascade datacard is ONE corpus pass: per-doc rule "
        "metrics are map-side expressions, cumulative stage flags fold "
        "into them, the dedup stage is a single (xxhash64, length) "
        "window, and the funnel itself is a 1-row aggregate stacked to "
        "6 stage rows — no per-stage re-scan of the corpus."
    ),
    "normalized_exact_dedup": (
        "C4-style canonicalized dedup at exact-dedup cost: the "
        "normalization chain (lower → strip non-alnum → collapse "
        "whitespace) is map-side; the only shuffle is the hash groupBy "
        "on (xxhash64(norm), length(norm)) with raw-variant counting "
        "through countDistinct(xxhash64(raw)) — every shuffled row is "
        "a constant ~32 bytes regardless of document size (the round-9 "
        "rewrite; the original countDistinct(raw) shuffled full "
        "bodies corpus-wide, 398.7 s at sf100), and "
        "TakeOrderedAndProject caps the driver at 50 rows."
    ),
    "attribution_linear": (
        "Linear multi-touch attribution with NO event-to-event range "
        "join: one running purchase-count window segments each user's "
        "timeline, then touches and purchases meet on an equi-join on "
        "(user, segment); per-item totals decimal-accumulate."
    ),
    "item_item_recs": (
        "Symmetrized capped co-occurrence pairs ranked per source item "
        "by a window — no task sorts more than one item's candidate "
        "list, and the pair fan-out stays bounded by the per-user cap."
    ),
    "sketch_distinct_users_portable": (
        "The HLL shuffle carries at most types × 1024 register rows "
        "(two hash projections are map-side; the register MAX is one "
        "hash aggregate) — never the user-id key set. The exact "
        "count-distinct rides along only as the self-audit."
    ),
    "item_cooccurrence": (
        "The pair self-join shuffles the CAPPED user-item incidence "
        "(row_number ≤ 200 per user, one Exchange reused by the join), "
        "so a single bot key fans out to at most cap² pairs; supports "
        "and the user universe aggregate from the same capped frame."
    ),
    "streaming_tumbling": (
        "A real Structured Streaming run: StateStore-backed windowed "
        "aggregation over the replayed file source (this plan is the "
        "in-memory sink table's final content)."
    ),
    "corpus_curation": (
        "The composed training-data pipeline: columnar quality/lang "
        "filters feed the hash dedup and the LSH band join; the "
        "connected-components iterations appear as checkpointed scans, "
        "keeping lineage O(1)."
    ),
    "embedding_near_dup": (
        "LSH-banded near-dup: sign-bit band keys explode → self "
        "EQUI-join on the 8-byte key → distinct pairs → vectors joined "
        "back by id for exact-cosine verify. No BroadcastNestedLoopJoin "
        "anywhere — the O(n²) theta join this replaced lives on only as "
        "the tiny-SF exact baseline."
    ),
    "ann_lsh_topk": (
        "The ANN headline: hyperplane-signature bucketing turns the "
        "query×corpus scoring into a broadcast equi-join on the bucket "
        "key; join degree = bucket size, not corpus size."
    ),
    "dedup_ngram_jaccard_capped": (
        "Skew-hardened Jaccard (prefix-filter form, round 11): the "
        "stop-shingle set (df > cap) is broadcast as an anti-join "
        "filter, then candidates come from the EXACT Bayardo prefix "
        "filter — each doc's rarest-first prefix postings equi-joined "
        "against the full capped postings (zero recall loss by the "
        "prefix principle) — and verification is the pair-local "
        "array_intersect pass. No postings self-join and no Σ df² "
        "term anywhere: on a rich vocabulary most prefix shingles "
        "have df ≈ 1 and the candidate join collapses; on the "
        "adversarial corpus it stays a strict subset of the old "
        "|postings|·max_df volume."
    ),
    "dedup_containment_capped": (
        "Containment twin of the prefix-filter rewrite: the smaller "
        "doc's (na − ⌈t·na⌉ + 1)-prefix must hit the larger doc's "
        "postings, so the same rarest-first prefix×full equi-join "
        "generates candidates and the pair-local array_intersect "
        "verifies — the sf100 entropic regime where the df-cap "
        "dropped nothing (482 s postings self-join) now pays only "
        "prefix-sized join volume."
    ),
    "knn_graph_ivf_trained": (
        "Trained fixed-count-centroid kNN graph (round 11): "
        "train_centroids_fixedpoint runs one deterministic Lloyd "
        "step from first-N-by-id seeds with exact int64 fixed-point "
        "means (bit-for-bit SQL-reproducible), sized as a deployment "
        "constant (512) — the centroid count never tracks n, so the "
        "assignment pass is n·512·d forever, replacing the adaptive "
        "form's n·(n/4000)·d term that goes quadratic past sf100. "
        "Same assign/probe/rank dataflow as knn_graph_ivf: map-side "
        "Arrow assignment against collected model literals, ONE "
        "Exchange on the probed bucket id, per-bucket BLAS kernel, "
        "dedup + rank window."
    ),
    "ann_ivf_topk_trained": (
        "Trained-quantizer IVF retrieval twin: the same fixed-point "
        "one-Lloyd-step trainer feeds _ivf_search's assign/probe/"
        "rank pipeline — broadcast equi-join on the coarse bucket, "
        "WindowGroupLimit partial+final top-k — giving the trained "
        "centroid route an externally verified RETRIEVAL path next "
        "to the kNN-graph one (ivf_topk_trained with Spark ML "
        "k-means stays the production training path this twin "
        "verifies)."
    ),
    "ann_ivf_pq_topk": (
        "IVF-PQ: corpus encode (coarse bucket + m PQ codes) is an "
        "Arrow mapInPandas kernel (selection only — no encoded value "
        "reaches the output); the probe is a broadcast equi-join on "
        "the coarse bucket; per-candidate ADC is m element_at lookups "
        "into the query's precomputed distance table, accumulated in "
        "exact DECIMAL so ranking is order-independent."
    ),
    "semantic_dedup": (
        "SemDeDup: map-side numpy centroid assignment → ONE Exchange "
        "on cluster_id → per-cluster pairwise BLAS block inside "
        "FlatMapGroupsInPandas. No join at all — the O(cluster²) work "
        "is a single in-task matmul, bounded by the paper's k ≈ √n "
        "cluster sizing."
    ),
    "quality_classifier": (
        "Learned quality filter: a bare Project over the scan — the "
        "hashed-feature fold and weight lookups are literal-array "
        "expressions, ZERO exchanges; the trained-model path ships "
        "weights the same way."
    ),
    "curation_pipeline": (
        "End-to-end curation in one plan: the classifier filter is "
        "map-side on the scan; the perplexity branch aggregates to "
        "doc grain before its equi-join back (two small-key "
        "shuffles); the final dedup window partitions on "
        "(xxhash64, length) — document text shuffles exactly once."
    ),
    "map_kit": (
        "Real map columns built from sorted entries inside the plan; "
        "the canonical k=v encoding is plain projection — no shuffle "
        "beyond the two aggregates."
    ),
    "window_range_frame": (
        "Interval RANGE frame: one hash partition on the key, one "
        "in-partition sort, a running frame — no self-join formulation "
        "of the trailing window."
    ),
    "contamination_check": (
        "Decontamination: the corpus-sized train postings are pruned "
        "by a semi-join on the eval shingle set before the shuffle "
        "join — only matching postings ever move. The eval set is "
        "corpus-proportional, so the broadcast decision is AQE's "
        "(round 6 — no forced hint), not the plan's."
    ),
    "sequence_packing": (
        "Packing cumsum windows on (stratum, shard), not the stratum "
        "alone — no single task ever owns a whole language's rows."
    ),
    "table_profile": (
        "All columns' profile stats in ONE scan (a single wide "
        "aggregate, stacked to rows afterwards) — never one pass per "
        "column."
    ),
    "q4_order_priority": (
        "Correlated EXISTS decorrelated by Catalyst into a left-semi "
        "join — one shuffle on the order key, no per-row subquery probe."
    ),
    "knn_graph": (
        "All-points kNN graph (round 5 per-BUCKET shape): the banded "
        "frame is a UNION of n_bands narrow projections over the "
        "POOLED compact (id, vec) frame (round 6 — InMemoryTableScan "
        "in every band branch, one corpus scan total; explode would "
        "re-copy the vector payload per row in GenerateExec), then "
        "ONE Exchange on band_key feeds FlatMapGroupsInArrow — the "
        "per-bucket kernel does float32 BLAS threshold preselect + "
        "exact fold recompute, so candidate PAIRS never materialize "
        "as a join. Global merge is dedup + per-src rank window. No "
        "BroadcastNestedLoopJoin, no global sort."
    ),
    "knn_graph_ivf": (
        "IVF-blocked kNN twin (round 6; cell sizing fixed round 10): "
        "one multi-probe Arrow assignment pass (centroids are "
        "collected model literals — map-side, zero shuffle), ONE "
        "Exchange on the probed bucket id into the per-bucket "
        "probers×members kernel, dedup + rank window. Centroid count "
        "now scales as max(16, ceil(n/4000)) — fixed cell SIZE — so "
        "the per-cell block is n_probe·n·cell_target·d, LINEAR in n "
        "(the fixed-16 form was O((n/16)²)d and blew the 900 s sf100 "
        "budget); identical plan at every gate SF where the floor "
        "binds."
    ),
    "embedding_near_dup_tight": (
        "Tight-threshold hyperplane near-dup (round 5 per-bucket "
        "verify): signatures are one Arrow kernel pass; the vector "
        "rides ONCE per band key into the grouped verify kernel "
        "(BLAS prefilter at threshold−1e-6, fold-exact recompute), "
        "replacing the pair-carrying verify join that measured DNF "
        "at sf10 (pair × 2 × 512 B vector payload shuffle)."
    ),
    "contamination_check_capped": (
        "Train-df-capped decontamination (rounds 5-6): 64-bit "
        "shingle postings from the pooled Arrow kernel; the eval "
        "vocabulary and the df-capped 'rare' set are corpus-"
        "PROPORTIONAL, so neither carries a broadcast HINT — AQE "
        "broadcasts them at this SF (visible as BroadcastHashJoins "
        "with isFinalPlan=true) and shuffles them at 100 TB; the "
        "plan survives broadcasts-disabled (plan-pinned test)."
    ),
    "bpe_encode_stats": (
        "BPE encode (round 5): the learned merge list is a model-"
        "sized broadcast literal; encoding replays merges inside one "
        "Arrow kernel pass (vocab-memoized), so the plan is a bare "
        "kernel stage over the scan plus the final stats aggregate."
    ),
    "repetition_signals": (
        "Gopher repetition signals: the per-document n-gram mode is a "
        "map-side sorted-array fold (aggregate() accumulator over "
        "array_sort) — a bare Project over the scan, ZERO exchanges, "
        "where the relational formulation (explode → count → window) "
        "would shuffle twice per doc key."
    ),
    "scd2_dimension": (
        "SCD Type-2 collapse: lag-filter and lead/row_number windows "
        "share ONE (user_id) Exchange + Sort — the change-detection "
        "pass and the interval-building pass pipeline inside the same "
        "partition (plan-asserted in test_timeseries_scd)."
    ),
    "gap_fill_interpolate": (
        "Gap-fill: raw events hit only the first partial+final hash "
        "aggregate, persisted via the shared bounded pool "
        "(InMemoryTableScan in both the grid-span branch and the "
        "join side — ONE events scan); the dense grid is "
        "sequence()+explode on the bucket-grained span frame; "
        "grid←agg is an equi-join; both IGNORE-NULLS interpolation "
        "windows reuse one (key, time) sort. No event-grained "
        "window, no nested loop."
    ),
    "funnel_conversion": (
        "Strict funnel, SINGLE events pass: one isin-filtered scan "
        "feeds one user-keyed aggregate collecting sorted per-step "
        "timestamp arrays; the strict-order walk is a codegen'd chain "
        "of higher-order filter()[0] lookups (no joins), collapsed "
        "into a single-row count aggregate and stack()ed to 3 rows. "
        "The join-chained formulation re-scanned events 10× — this "
        "plan shows 1 fact scan."
    ),
    "bm25_search": (
        "BM25: postings (doc,term) aggregate → equi-join against the "
        "BROADCAST 4-row query-term list prunes everything but queried "
        "terms; the one-row corpus-stats frame enters as a single-row "
        "broadcast (constant work); top-k is TakeOrderedAndProject."
    ),
    "anomaly_zscore": (
        "Rolling z-score: one partial+final aggregate to hourly "
        "buckets, then all three trailing-frame window aggregates "
        "(count/Σ/Σ²) share a single (event_type, time) sort over the "
        "bucket-grained frame."
    ),
    "activity_streaks": (
        "Gaps-and-islands: distinct (user, day) state feeds the "
        "date-minus-row_number island key inside ONE user-partitioned "
        "window; streak aggregation and best-streak rank reuse the "
        "same user-grained partitioning — no self-join, no iteration."
    ),
    "dataset_split": (
        "Deterministic split assignment: a bare Project over the scan "
        "(Knuth multiplicative hash is integer arithmetic in "
        "whole-stage codegen) — ZERO exchanges; the property that "
        "makes train/test membership reproducible at any scale."
    ),
    "quantized_centroids": (
        "Quantized centroids: the quantize step is a map-side "
        "transform over literal per-dim stats (d-row model, bounded "
        "collect); centroid build is posexplode → (label,dim) hash "
        "aggregate whose partials collapse each partition to "
        "|labels|·d rows before the shuffle; array re-pack is a "
        "bounded sorted collect_list per label."
    ),
    "window_dist_scaled": (
        "Distributed global rank (round 3): row_number windows "
        "partition by the sketch-cut bucket (max sorted run = bucket "
        "depth, never n), bucket offsets come from a |buckets|-row "
        "frame broadcast back, and the one-row third-highest model "
        "enters as a constant-work single-row broadcast. The ONLY "
        "unpartitioned sort left is the final top-100 "
        "TakeOrderedAndProject. Output is hash-identical to the "
        "global-window exact form (same oracle)."
    ),
    "dedup_simhash_clustered": (
        "SimHash clusters (round 3): fingerprints are a bare Project "
        "over the scan; the hamming candidate join runs on DISTINCT "
        "fingerprints' 15-bit halves (equi-join, never docs²); "
        "min-label components iterate bounded vertex-keyed "
        "join+aggregate rounds; doc assignment is one linear "
        "fp-keyed join. Replaces a 23.4M-row pair materialization "
        "(measured at sf1) with |docs| output rows."
    ),
    "equidepth_histogram_sketch": (
        "Sketch equi-depth histogram (round 3): ONE percentile_approx "
        "aggregate (mergeable GK sketch, partial-combined) produces "
        "the 9-cut model row, broadcast to a closed-form binning "
        "Project; the final aggregate carries 10 groups. No global "
        "sort anywhere — the exact ntile twin keeps one for the "
        "tiny-SF cross-check."
    ),
    "training_shuffle": (
        "Deterministic training shuffle (round 3): the Knuth "
        "permutation key is a map-side Project over the scan; ONE "
        "hash exchange on the shard key feeds per-shard window "
        "sorts (max sorted run = shard size, chosen ≈ one loader "
        "file). No global sort, no rand() — rerun-identical."
    ),
    "pmi_bigrams": (
        "PMI collocations (round 3): one InMemoryTableScan of the "
        "pooled (doc, pos, token) frame serves the unigram "
        "aggregate, the lag-window bigram derivation, and both "
        "total counts — the corpus is tokenized exactly once "
        "(the per-branch re-tokenization measured 68 s warm at "
        "sf1; this plan is ~2 s). Count joins are AQE-broadcast; "
        "top-20 is TakeOrderedAndProject."
    ),
    "ann_hamming_topk": (
        "Hamming ANN (round 3): banded sign-bit signatures are a "
        "Project over the scan; candidates come from a broadcast "
        "(band_idx, band_val) equi-join against the 8-query band "
        "list, then exact integer Hamming re-ranks inside a "
        "per-query window. All arithmetic is int64 — the plan has "
        "no NLJ and no floating point at all."
    ),
    "hybrid_retrieval_rrf": (
        "Hybrid retrieval fusion (round 3): both retriever legs end "
        "in TakeOrderedAndProject top-20s, so the fusion full-outer "
        "join and RRF scoring run over two ≤k-row frames — bounded "
        "model-sized work regardless of corpus scale. The kw leg "
        "carries bm25's one-row corpus-stats broadcast (constant "
        "work); the vector leg is the LSH bucket equi-join."
    ),
}


def main() -> None:
    import subprocess

    from etl_covid19_spark.queries import REGISTRY
    from etl_covid19_spark.session import get_spark

    spark = get_spark("plandump")
    spark.sparkContext.setLogLevel("ERROR")

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
    ).stdout.strip()
    out = [
        "# PLANS — executed physical plans (post-AQE, sf0.01)",
        "",
        f"Generated by `tools/plandump.py` at commit `{commit}`;",
        "regenerate after plan-affecting changes. These are the *final",
        "adaptive* plans (`isFinalPlan=true`), i.e. what actually ran,",
        "not the pre-AQE sketch. `*(n)` marks whole-stage-codegen",
        "stages.",
        "",
    ]
    for name, note in COMMENTARY.items():
        df = REGISTRY[name].fn(spark, SF)
        # drive the DataFrame's OWN query execution (a write would
        # clone the plan and leave this one pre-AQE)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        out += [f"## {name}", "", note, "", "```", plan.rstrip(), "```", ""]
    out += _nonregistry_plans(spark)
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(COMMENTARY)} + appendix plans)")


def _nonregistry_plans(spark) -> list[str]:
    """Appendix: plan shapes of non-registry surfaces the driver
    gate can't see (they aren't (spark, sf_dir) -> DataFrame
    queries) but whose physical shape is scale-critical."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from etl_covid19_spark.sources import snapshot_zone as sz

    tmp = tempfile.mkdtemp(prefix="plandump_dv_")
    try:
        zone = f"{tmp}/zone"
        sz.snapshot_write(
            spark.range(10_000).selectExpr("id", "id % 97 AS k"),
            zone,
            mode="overwrite",
        )
        sz.snapshot_delete_where(
            spark, zone, F.col("k") == 13, strategy="dv"
        )
        df = sz.snapshot_read(spark, zone)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        note = (
            "Deletion-vector read (`snapshot_read` on a DV-masked "
            "zone): the data scan anti-joins the DV sidecar scan on "
            "(file basename, `_metadata.row_index`) — a shuffle/"
            "broadcast EQUI-join (no BNLJ), so a billion-row vector "
            "is distributed work, never driver state. With no DVs "
            "the read is the bare parquet scan (zero overhead)."
        )
        return [
            "## appendix: snapshot_read with deletion vectors "
            "(non-registry surface)",
            "",
            note,
            "",
            "```",
            plan.rstrip(),
            "```",
            "",
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
