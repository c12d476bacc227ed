"""Physical-plan assertions: the scale contract, checked in CI.

Correct rows are not enough — these tests pin the *plan shapes* that
make the operators viable at 100 TB: filters pushed into the parquet
scan, pruned read schemas, broadcast hash joins for dims, partial
aggregation, and (for the custom joins) the absence of nested-loop
fallbacks.
"""

import contextlib
import io

import pytest

from etl_covid19_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_project_pushdown_and_pruning(spark):
    plan = plan_of(spark, "filter_project")
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_returnflag)" in plan or "l_shipdate" in plan
    # pruned scan: none of the unprojected lineitem columns are read
    read = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "l_extendedprice" in read and "l_comment" not in read


def test_star_join_broadcasts_dimensions(spark):
    plan = plan_of(spark, "star_join_revenue")
    assert plan.count("BroadcastHashJoin") >= 2  # nation & region at least
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pricing_summary_partial_aggregation(spark):
    plan = plan_of(spark, "pricing_summary")
    # map-side partial + final: two HashAggregate layers around the
    # exchange, so only per-group partial states shuffle
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "LessThanOrEqual(l_shipdate" in plan


def test_asof_join_is_window_not_nested_loop(spark):
    plan = plan_of(spark, "asof_join_events")
    assert "Window" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_is_equi_join(spark):
    plan = plan_of(spark, "range_join_events")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_exact_shuffles_hashes_not_bodies(spark):
    plan = plan_of(spark, "dedup_exact")
    # the shuffle partitions on the 8-byte xxhash64, never the text
    assert "hashpartitioning(content_hash" in plan
    ex = [
        line for line in plan.splitlines()
        if "Arguments: hashpartitioning" in line
    ]
    assert ex and all("text" not in line for line in ex)


def test_fact_build_single_shuffle_free_enrichment(spark):
    plan = plan_of(spark, "fact_build")
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize(
    "name", ["pricing_summary", "star_join_revenue", "explode_tokens"]
)
def test_whole_stage_codegen_active(spark, name):
    # AQE only reveals codegen spans in the FINAL plan, so execute
    # first and read the executed plan ("*(n)" = codegen'd stage)
    df = REGISTRY[name].fn(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "*(" in plan


def test_no_nested_loop_join_in_any_headline_plan(spark):
    """The bench's headline set is the repo's scale statement: every
    headline query must plan without a nested-loop/cartesian join.
    Exact all-pairs baselines (brute-force ANN, exact near-dup) are
    deliberately excluded from the headline set for this reason."""
    streaming_side_effect = {"streaming_tumbling"}  # runs a real stream
    for name, qd in REGISTRY.items():
        if not qd.headline or name in streaming_side_effect:
            continue
        plan = plan_of(spark, name)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_join_strategy_hints_are_honored(spark):
    """The hint surface users reach for when AQE guesses wrong: the
    same join planned as broadcast, shuffle-hash, or sort-merge on
    request. At 100 TB forcing MERGE over a mis-sized broadcast (or
    vice versa) is a one-line fix — worth pinning that the planner
    actually obeys."""
    from etl_covid19_spark.sources.catalog import load_table

    o = load_table(spark, "orders", SF)
    c = load_table(spark, "customer", SF).select("c_custkey")
    cases = {
        "broadcast": "BroadcastHashJoin",
        "shuffle_hash": "ShuffledHashJoin",
        "merge": "SortMergeJoin",
    }
    for hint, node in cases.items():
        df = o.join(c.hint(hint), o.o_custkey == c.c_custkey).select(
            "o_orderkey"
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert node in plan, (hint, node)


def test_q19_redundant_envelopes_reach_both_scans(spark):
    """The OR-of-ANDs predicate spans both join sides and cannot be
    pushed as-is; the hand-derived per-side envelopes (brand IN-list
    on part, quantity range on lineitem) must appear as PushedFilters
    on their respective scans so both prune before the join."""
    plan = plan_of(spark, "q19_disjunctive_pricing")
    flat = plan.replace(" ", "")
    assert "In(p_brand" in flat  # brand envelope reached the part scan
    assert "GreaterThanOrEqual(l_quantity,1.0)" in flat
    assert "LessThanOrEqual(l_quantity,30.0)" in flat
