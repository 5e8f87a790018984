"""Layout-utility tests: salted joins preserve semantics while spreading
hot keys; partitioned writes prune; bucketed joins skip the exchange.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ftp_blueprints_spark.operators.layout import (
    salted_join,
    write_bucketed,
    write_partitioned,
)
from ftp_blueprints_spark.session import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_equals_plain_join(spark, sf_oracle):
    orders = load_table(spark, sf_oracle, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_oracle, "customer").select("c_custkey", "c_name")
    small = cust.withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(small, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, small, "o_custkey").select("o_orderkey", "c_name")
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_join_spreads_hot_key(spark):
    """A single ubiquitous key lands in salt_buckets distinct buckets."""
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id"))
    dim = spark.createDataFrame([(1, "only")], "k int, v string")
    out = salted_join(hot, dim, "k", salt_buckets=8)
    assert out.count() == 10_000
    salt = (F.abs(F.xxhash64("k", "id")) % 8).cast("int")
    n_buckets = hot.select(salt.alias("s")).distinct().count()
    assert n_buckets == 8


def test_partitioned_write_prunes(spark, sf_oracle, tmp_path):
    orders = load_table(spark, sf_oracle, "orders")
    path = str(tmp_path / "orders_by_priority")
    write_partitioned(
        orders.select("o_orderkey", "o_totalprice", "o_orderpriority"),
        path,
        ["o_orderpriority"],
    )
    back = spark.read.parquet(path).filter(F.col("o_orderpriority") == "1-URGENT")
    plan = _plan(back)
    assert "PartitionFilters: [isnotnull(o_orderpriority" in plan
    want = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert back.count() == want


def test_bucketed_join_has_no_exchange(spark, sf_oracle):
    # tables land in the default warehouse dir (spark-warehouse/,
    # gitignored); dropped in the finally block
    orders = load_table(spark, sf_oracle, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_oracle, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "t_orders_b", "o_orderkey", 8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "t_lineitem_b", "o_orderkey", 8
    )
    a = spark.table("t_orders_b")
    b = spark.table("t_lineitem_b")
    # disable broadcast so the join would normally shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "o_orderkey")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
