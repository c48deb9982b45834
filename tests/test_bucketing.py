"""Bucketed co-located join: pre-bucketing both sides of a recurring join on
the join key eliminates the per-query shuffle — THE storage-layout lever for
repeated fact-fact joins at 100 TB (bucket count chosen so bucket ~= one
task's worth of data)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from wiki_mysql_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_eliminates_shuffle(spark):
    suffix = uuid.uuid4().hex[:8]
    li_t, o_t = f"li_b_{suffix}", f"o_b_{suffix}"
    load_table(spark, SF, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable(li_t)
    load_table(spark, SF, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable(o_t)
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li, o = spark.table(li_t), spark.table(o_t)
        joined = li.join(o, li.l_orderkey == o.o_orderkey)

        # both sides read bucketed -> no Exchange below the join (broadcast
        # disabled so the tiny test tables take the sort-merge path that a
        # real fact-fact join would take)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan.split("SortMergeJoin")[1], (
            "bucketed join should not shuffle either side"
        )

        got = joined.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
        want = (
            load_table(spark, SF, "lineitem")
            .join(
                load_table(spark, SF, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {li_t}")
        spark.sql(f"DROP TABLE IF EXISTS {o_t}")


def test_cache_produces_inmemory_scan(spark):
    """df.cache() must actually serve downstream plans from the columnar
    in-memory store (InMemoryTableScan), not re-scan parquet — the
    iterative-workload accelerator (e.g. the redirect fixpoint reuses its
    frontier across rounds)."""
    from tests.conftest import SF_SMOKE
    from wiki_mysql_spark.sources.tables import load_table

    df = load_table(spark, SF_SMOKE, "nation").cache()
    try:
        df.count()  # populate
        plan = (
            df.where(F.col("n_nationkey") > 5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the execution path must go through InMemoryTableScan (the
        # FileScan below it is just the InMemoryRelation's cached-plan
        # description, not an execution node)
        assert "InMemoryTableScan" in plan
        assert plan.index("InMemoryTableScan") < plan.index("FileScan")
    finally:
        df.unpersist()
