"""Plan-shape regression tests: the scale properties the engine relies
on (predicate pushdown, column pruning, broadcast dims, top-k as
TakeOrderedAndProject, no cartesian anywhere) asserted on the physical
plans so a refactor can't silently regress them.
"""

from __future__ import annotations

import pytest


def _plan(spark, name, sf_oracle) -> str:
    import __spark_entry__ as m

    return (
        m.queries()[name](spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )


def test_q06_filters_pushed_and_columns_pruned(spark, sf_oracle):
    plan = _plan(spark, "q06_revenue_forecast", sf_oracle)
    assert "PushedFilters: [IsNotNull" in plan
    # projection pruning: the scan must not read all 16 lineitem columns
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "l_orderkey" not in scan  # unused column stays unread
    assert "l_shipdate" in scan


def test_q03_broadcast_and_topk(spark, sf_oracle):
    plan = _plan(spark, "q03_shipping_priority", sf_oracle)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort


def test_q05_star_join_broadcasts_all_dims(spark, sf_oracle):
    plan = _plan(spark, "q05_region_volume", sf_oracle)
    assert plan.count("BroadcastHashJoin") >= 4  # cust/supp/nation/region


@pytest.mark.parametrize(
    "name",
    [
        "q01_pricing_summary",
        "q03_shipping_priority",
        "q05_region_volume",
        "q_cust_order_stats",
        "dd_ngram_jaccard",
        "sim_embedding_neardup",
        "sim_ann_lsh",
        "ev_tumbling_counts",
    ],
)
def test_no_cartesian_in_headline_plans(spark, sf_oracle, name):
    plan = _plan(spark, name, sf_oracle)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
