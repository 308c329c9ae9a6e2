"""Bucketing demonstration: co-located joins with zero shuffle.

At 100 TB the fact-fact join (lineitem ⋈ orders on orderkey) is the
dominant shuffle; bucketing both tables by the join key at write time
moves that shuffle to ingest, once, and every later join is
exchange-free. This test writes both sides bucketed and asserts the
join plan contains NO Exchange."""

from __future__ import annotations

from psx_data_pipeline_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    li = load_table(spark, "lineitem", SF).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, "orders", SF).select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    for name, df, key in [
        ("li_bucketed", li, "l_orderkey"),
        ("orders_bucketed", orders, "o_orderkey"),
    ]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )

    # at fixture scale AQE would broadcast the small side — disable it
    # so the test exercises the big-big (sort-merge) path bucketing
    # exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_bucketed").join(
            spark.table("orders_bucketed"),
            spark.table("li_bucketed")["l_orderkey"]
            == spark.table("orders_bucketed")["o_orderkey"],
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout satisfies both sides

        # and the result is still the plain join
        expected = li.join(
            orders, li["l_orderkey"] == orders["o_orderkey"]
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_registered_bucketed_join_query_is_exchange_free(spark):
    """The registered `bucketed_join` query writes its own bucketed
    tables; the join over those tables must stay SMJ-with-no-Exchange
    (the property the query exists to demonstrate)."""
    from pyspark.sql import functions as F

    from psx_data_pipeline_spark.plans import QUERIES

    QUERIES["bucketed_join"](spark, SF)  # (re)writes the tables
    joined = spark.table("li_bucketed_q").hint("merge").join(
        spark.table("orders_bucketed_q"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
