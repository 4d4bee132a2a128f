"""Physical-plan strategy tests: bucketed joins must produce NO Exchange; salted
aggregation/join must return identical results to the plain forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_migration_assessment_tools_spark.plans.bucketing import (
    assert_no_shuffle_join,
    read_bucketed_table,
    save_bucketed,
)
from hadoop_migration_assessment_tools_spark.plans.skew import (
    salted_aggregate,
    salted_join_left,
)
from hadoop_migration_assessment_tools_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # managed tables land in the default warehouse dir (spark-warehouse/, gitignored);
    # warehouse location is a static conf and cannot move per-test
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    save_bucketed(orders, "orders_b", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"])
    save_bucketed(
        li.select("l_orderkey", "l_quantity"), "lineitem_b", ["l_orderkey"], num_buckets=8,
        sort_cols=["l_orderkey"],
    )
    ob = read_bucketed_table(spark, "orders_b")
    lb = read_bucketed_table(spark, "lineitem_b")
    # disable broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select("o_orderkey", "l_quantity")
        assert_no_shuffle_join(joined)  # bucketing makes the join co-located
        expected = (
            orders.join(li, orders.o_orderkey == li.l_orderkey).count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salted_aggregate_matches_plain(spark):
    ev = load_table(spark, SF, "events")
    plain = {
        r["event_type"]: (r["n"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], r["mx"])
        for r in salted_aggregate(
            ev, ["event_type"], {"n": "count(1)", "mx": "max(value)"}, salt_buckets=8
        ).collect()
    }
    assert salted == plain


def test_salted_aggregate_rejects_non_algebraic(spark):
    import pytest

    ev = load_table(spark, SF, "events")
    with pytest.raises(ValueError):
        salted_aggregate(ev, ["event_type"], {"m": "median(value)"})


def test_salted_join_matches_plain(spark):
    ev = load_table(spark, SF, "events").withColumnRenamed("event_type", "et")
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 3), ("signup", 4), ("error", 5)],
        ["et", "type_id"],
    )
    plain = ev.join(dim, "et").groupBy("type_id").count().collect()
    salted = salted_join_left(ev, dim, "et", salt_buckets=4).groupBy("type_id").count().collect()
    assert sorted((r["type_id"], r["count"]) for r in salted) == sorted(
        (r["type_id"], r["count"]) for r in plain
    )
