"""Accuracy tests for approximate relational operators and plan-shape
assertions for the scale-sensitive manifest operators.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ftp_blueprints_spark.session import load_table


def test_approx_count_distinct_within_rsd(spark, sf_oracle):
    """approx_count_distinct(rsd=0.05) lands within ~3x rsd of exact."""
    orders = load_table(spark, sf_oracle, "orders")
    exact = orders.select(F.countDistinct("o_custkey").alias("n")).collect()[0]["n"]
    approx = orders.select(
        F.approx_count_distinct("o_custkey", rsd=0.05).alias("n")
    ).collect()[0]["n"]
    assert abs(approx - exact) / exact <= 0.15, f"exact={exact} approx={approx}"


def test_file_numbering_is_global_path_order(spark, sf_oracle):
    """Two-pass numbering == row_number() OVER (ORDER BY path)."""
    from ftp_blueprints_spark.operators.manifest import (
        build_manifest,
        match_files,
        with_file_numbers,
    )

    m = match_files(build_manifest(spark, sf_oracle), pattern="[.]csv$")
    got = {
        r["path"]: r["file_number"]
        for r in with_file_numbers(m).select("path", "file_number").collect()
    }
    paths = sorted(got)
    assert [got[p] for p in paths] == list(range(1, len(paths) + 1))


def test_file_numbering_no_single_partition_window(spark, sf_oracle):
    """The numbering plan contains no empty-frame global Window sort
    (Window.orderBy without partitioning funnels all rows into one
    task); partition counts + offsets replace it."""
    from ftp_blueprints_spark.operators.manifest import (
        build_manifest,
        match_files,
        with_file_numbers,
    )

    m = match_files(build_manifest(spark, sf_oracle), pattern="[.]csv$")
    numbered = with_file_numbers(m)
    plan = numbered._jdf.queryExecution().executedPlan().toString()
    # the remaining window is partitioned by _pid; a global window
    # would show 'Window [...], [path ASC' with no partition spec
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line.lower():
            assert "_pid" in line, f"global window in plan: {line}"


def test_approx_percentile_close_to_exact(spark, sf_oracle):
    """approx_percentile(accuracy 10000) vs exact percentile_cont:
    within 1% relative error on each requested quantile."""
    import pyspark.sql.functions as F
    from ftp_blueprints_spark.plans.relational import q_approx_percentile
    from ftp_blueprints_spark.session import load_table

    approx = {r["l_returnflag"]: r for r in q_approx_percentile(spark, sf_oracle).collect()}
    li = load_table(spark, sf_oracle, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag in exact:
        for q in ("p50", "p90", "p99"):
            rel = abs(approx[flag][q] - exact[flag][q]) / exact[flag][q]
            assert rel <= 0.01, f"{flag} {q}: rel err {rel:.4f}"
