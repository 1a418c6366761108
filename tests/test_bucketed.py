"""Bucketed co-located joins (sources/bucketed.py): plan pins that the
write-time layout removes the exchange (and sort) from later joins."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.sources.bucketed import bucketed, write_bucketed
from delta_lake_pyspark_scd2_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("buckets")
    write_bucketed(
        load_table(spark, SF, "orders"), "b_orders", str(root / "o"), "o_orderkey"
    )
    write_bucketed(
        load_table(spark, SF, "lineitem"), "b_lineitem", str(root / "l"), "l_orderkey"
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    return old


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    old = _no_broadcast(spark)
    try:
        joined = bucketed(spark, "b_orders").join(
            bucketed(spark, "b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        # (a LOCAL in-bucket sort remains: Spark 3+ ignores write-time
        # sortBy ordering at read unless the legacy outputOrdering flag
        # is on — the shuffle elision is the material win)
        assert "Bucketed: true" in plan
        # and the result is the same as the shuffled join
        plain = load_table(spark, SF, "orders").join(
            load_table(spark, SF, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    agg = (
        bucketed(spark, "b_lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_plain_parquet_read_of_same_path_shuffles(spark, bucketed_tables, tmp_path):
    # control: reading the files without catalog bucket metadata
    # reintroduces the exchange — pinning that the layout, not the
    # data, is what the optimizer uses
    old = _no_broadcast(spark)
    try:
        path = spark.sql("DESCRIBE FORMATTED b_orders").filter(
            F.col("col_name") == "Location"
        ).collect()[0]["data_type"]
        o = spark.read.parquet(path.replace("file:", ""))
        li = bucketed(spark, "b_lineitem")
        plan = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
