"""Physical-plan regression guards: the optimizations the engine's scale
story depends on must be visible in the executed plan — filters reaching
the parquet scan, dimension joins broadcast, no stray cartesian products."""

from __future__ import annotations

import pytest

from data_warehouse_product_mix_clustering_spark.plans.registry import all_queries

from conftest import SF_SMOKE

QUERIES = all_queries()


def plan_of(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushes_shipdate_filter(spark):
    plan = plan_of(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, (
        f"shipdate predicate not pushed to parquet:\n{plan[:800]}"
    )


def test_shipping_priority_pushes_segment_filter_and_broadcasts(spark):
    plan = plan_of(spark, "shipping_priority")
    assert "EqualTo(c_mktsegment,BUILDING)" in plan.split("PushedFilters", 3)[-1]
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan, "top-k should not materialize a full sort"


def test_nation_revenue_broadcasts_dims(spark):
    plan = plan_of(spark, "nation_revenue")
    # customer/nation/region joins all broadcast; only lineitem⋈orders may shuffle
    assert plan.count("BroadcastHashJoin") >= 3, plan[:800]
    assert "CartesianProduct" not in plan


def test_fact_priced_interval_join_is_hash_not_bnlj(spark):
    """Only 1-row scalar cross joins (broadcast final_date) may be BNLJ;
    the interval match itself must stay a broadcast HASH join."""
    plan = plan_of(spark, "product_features")
    bad = [
        line
        for line in plan.splitlines()
        if "BroadcastNestedLoopJoin" in line and "Cross" not in line
    ]
    assert not bad, f"interval match regressed to nested-loop:\n{bad}"


def test_doc_token_stats_prunes_columns(spark):
    plan = plan_of(spark, "doc_token_stats")
    assert "doc_id" not in plan.split("ReadSchema")[-1], (
        "documents scan reads doc_id although the query never uses it"
    )


@pytest.mark.parametrize("name", ["cluster_summary", "category_rollup", "trajectory_stats"])
def test_dim_joins_broadcast(spark, name):
    plan = plan_of(spark, name)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
