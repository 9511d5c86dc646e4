"""Physical-plan assertions: the plans must be the ones we'd want at
100 TB — broadcast for small dims, pushdown into the Parquet scan,
partial (map-side) aggregation, TakeOrdered for top-k, no cartesian
products anywhere."""

from __future__ import annotations

import pytest

from wnv_etl_lab2_spark.queries import REGISTRY, _ensure_loaded


def plan_of(spark, sf_dir, name: str) -> str:
    _ensure_loaded()
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_lookup_join_is_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "lookup_enrichment_join")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must not shuffle the fact side


def test_containment_join_is_broadcast_not_cartesian(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "spatial_join_count")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "constant_column")
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)" in plan


def test_column_pruning_reaches_parquet_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "projection_concat")
    # only the two needed columns in ReadSchema, not the whole table
    assert "ReadSchema: struct<c_custkey:bigint,c_name:string>" in plan


def test_aggregation_is_partial_and_codegen(spark, sf_dir):
    _ensure_loaded()
    df = REGISTRY["pricing_summary"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two HashAggregates (partial + final) around the exchange
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan  # map-side combine before the shuffle
    # codegen spans only materialize in the AQE final plan; collect()
    # runs through this DataFrame's own queryExecution (a write would
    # create a fresh one and leave this plan unfinalized)
    df.collect()
    final_plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark whole-stage-codegen spans in the plan string
    assert "*(1)" in final_plan and "*(2)" in final_plan


def test_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "orderby_limit_topk")
    assert "TakeOrderedAndProject" in plan  # no global sort


def test_no_cartesian_products_in_any_query(spark, sf_dir):
    _ensure_loaded()
    offenders = []
    for name, spec in REGISTRY.items():
        plan = spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


def test_spray_targets_shape(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "spray_targets")
    assert "CartesianProduct" not in plan
    # zones side of the containment join is broadcast
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
