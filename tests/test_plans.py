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


def test_range_join_semantics(spark):
    from hadoop_migration_assessment_tools_spark.plans.range_join import range_join

    fact = spark.createDataFrame(
        [(1, 0.0), (2, 5.0), (3, 10.0), (4, 15.0), (5, 99.0), (6, -3.0)],
        "id long, v double",
    )
    # overlapping bands + exact-boundary cases: lo inclusive, hi exclusive
    dim = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 5.0, 15.0), ("c", 15.0, 20.0)],
        "band string, lo double, hi double",
    )
    for bcast in (True, False):
        got = sorted(
            (r["id"], r["band"])
            for r in range_join(fact, dim, "v", "lo", "hi", 4.0, broadcast_dim=bcast).collect()
        )
        # v=0 -> a only; v=5 -> a+b (overlap); v=10 -> b only (hi-exclusive of a);
        # v=15 -> c (hi-exclusive of b, lo-inclusive of c); v=99, v=-3 -> nothing
        assert got == [(1, "a"), (2, "a"), (2, "b"), (3, "b"), (4, "c")]


def test_range_join_matches_nested_loop(spark):
    from hadoop_migration_assessment_tools_spark.plans.range_join import range_join

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
    dim = spark.createDataFrame(
        [("lo", 900.0, 20000.0), ("hi", 20000.0, 120000.0)],
        "band string, lo double, hi double",
    )
    bucketed = (
        range_join(li, dim, "l_extendedprice", "lo", "hi", 10000.0)
        .groupBy("band").count().collect()
    )
    naive = (
        li.join(
            dim,
            (li.l_extendedprice >= dim.lo) & (li.l_extendedprice < dim.hi),
        ).groupBy("band").count().collect()
    )
    assert sorted((r["band"], r["count"]) for r in bucketed) == sorted(
        (r["band"], r["count"]) for r in naive
    )


def test_range_join_rejects_bad_width(spark):
    import pytest

    from hadoop_migration_assessment_tools_spark.plans.range_join import range_join

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError):
        range_join(df, df, "v", "v", "v", 0.0)


def test_bucketed_join_query_is_colocated(spark):
    """The scored orders_customer_bucketed_join must join with zero Exchange."""
    from hadoop_migration_assessment_tools_spark.queries.tpch import (
        _BKT_DB,
        orders_customer_bucketed_join,
    )

    # run once to (re)create the bucketed tables, then probe the join shape
    orders_customer_bucketed_join(spark, SF).collect()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(f"{_BKT_DB}.orders_by_cust").hint("merge")
        c = spark.table(f"{_BKT_DB}.customer_bkt")
        joined = o.join(c, o["o_custkey"] == c["c_custkey"]).select("o_orderkey", "c_mktsegment")
        assert_no_shuffle_join(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_range_join_random_equivalence(spark):
    """Seeded random fuzz: bucket+refine must equal a pure-Python nested loop over
    random values and random (possibly overlapping, empty, or huge) intervals."""
    import random

    from hadoop_migration_assessment_tools_spark.plans.range_join import range_join

    for seed in (7, 42, 1337):
        rng = random.Random(seed)
        vals = [(i, round(rng.uniform(-100, 100), 3)) for i in range(300)]
        dims = []
        for j in range(25):
            lo = round(rng.uniform(-120, 120), 3)
            hi = round(lo + rng.uniform(-5, 40), 3)  # sometimes hi < lo (empty)
            dims.append((f"b{j}", lo, hi))
        expected = sorted(
            (i, b) for i, v in vals for b, lo, hi in dims if lo <= v < hi
        )
        fact = spark.createDataFrame(vals, "id long, v double")
        dim = spark.createDataFrame(dims, "band string, lo double, hi double")
        for width in (1.0, 7.3, 50.0):
            got = sorted(
                (r["id"], r["band"])
                for r in range_join(fact, dim, "v", "lo", "hi", width).collect()
            )
            assert got == expected, (seed, width)


def test_diagnose_join_skew_flags_hot_key(spark):
    from pyspark.sql import functions as F

    from hadoop_migration_assessment_tools_spark.plans.skew import diagnose_join_skew

    # 50% of rows share one key; rest spread across 1000 keys
    df = spark.range(0, 20_000).select(
        F.when(F.col("id") % 2 == 0, F.lit("HOT")).otherwise(
            (F.col("id") % 1000).cast("string")
        ).alias("k")
    )
    diag = {r["key_value"]: r for r in diagnose_join_skew(
        df, "k", top_k=5, broadcast_row_limit=100
    ).collect()}
    assert "HOT" in diag
    hot = diag["HOT"]
    assert hot["share"] > 0.4
    assert hot["recommendation"] == "salt_this_key"

    # small table -> broadcast THIS side regardless of distribution
    small = spark.range(0, 50).select(F.lit("x").alias("k"))
    recs = {r["recommendation"] for r in diagnose_join_skew(small, "k").collect()}
    assert recs == {"broadcast_this_side"}


def test_diagnose_join_skew_single_scan(spark):
    """The count is folded into the Misra-Gries pass: exactly one scan of the input
    in the plan (one mapInPandas source), and the share denominator is exact."""
    from pyspark.sql import functions as F

    from hadoop_migration_assessment_tools_spark.plans.skew import diagnose_join_skew

    df = spark.range(0, 1000).select((F.col("id") % 3).cast("string").alias("k"))
    import re

    diag = diagnose_join_skew(df, "k", top_k=3)
    plan = diag._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # node detail headers count each physical node once (tree lines would double)
    assert len(re.findall(r"^\(\d+\) MapInPandas", plan, re.M)) == 1
    rows = diag.collect()
    # exact denominator: shares computed against the true 1000-row total
    assert all(abs(r["share"] - r["est_count"] / 1000) < 1e-9 for r in rows)


def test_aqe_splits_skewed_join_partition(spark):
    """Runtime proof that the session's AQE skew-join config actually engages: a
    join with one hot key must show OptimizeSkewedJoin's work in the FINAL adaptive
    plan (skew=true on the sort-merge join / a skewed-partition split), under
    thresholds scaled down to test-sized data. This is the knob pkg/session.py
    turns on for 100 TB runs — the test keeps it from silently rotting."""
    import re

    from pyspark.sql import functions as F

    conf_keys = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
        "spark.sql.shuffle.partitions": "8",
    }
    saved = {k: spark.conf.get(k, None) for k in conf_keys}
    try:
        for k, v in conf_keys.items():
            spark.conf.set(k, v)
        # hot key 0 carries 200k rows (with a fat payload); 200 cold keys carry 100 each
        left = spark.range(0, 220_000).select(
            F.when(F.col("id") < 200_000, F.lit(0))
            .otherwise((F.col("id") % 200) + 1)
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(0, 201).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        # A global aggregate, not groupBy(k): an agg keyed on the join key would
        # REQUIRE the join's hash partitioning, and OptimizeSkewedJoin correctly
        # refuses to split a skewed partition whose distribution a downstream
        # operator still needs (splitting would force a re-shuffle).
        joined = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.length("payload")).alias("bytes")
        )
        row = joined.collect()[0]
        assert row["n"] == 220_000  # correctness unchanged by AQE
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"skew=true", final_plan), (
            "AQE did not mark the skewed join — plan:\n" + final_plan[:2000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zorder_clustering_prunes_on_both_dimensions(spark):
    """The layout claim, measured the way min/max pruning actually works: count the
    partitions whose [min, max] stats intersect a selective single-dimension
    predicate. A single-column sort is perfect on its own column but touches EVERY
    partition for the other dimension's predicate; z-order balances the spans so
    BOTH predicates prune. (Bounding-box AREA is the wrong metric — both layouts
    tile ~R_x*R_y/N cells; the win is span balance, not area.)"""
    from pyspark.sql import functions as F

    from hadoop_migration_assessment_tools_spark.plans.zorder import (
        cluster_by_zorder,
        fixed_range_bucket,
    )
    from hadoop_migration_assessment_tools_spark.sources.readers import load_table

    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    x = fixed_range_bucket(F.col("o_totalprice"), 0.0, 614_400.0, 8)
    y = fixed_range_bucket(
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("double"),
        0.0,
        2_560.0,
        8,
    )
    base = orders.select(x.alias("x"), y.alias("y"))

    def partition_stats(df):
        return (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"))
            .collect()
        )

    def touched(stats, dim, lo, hi):
        return sum(
            1 for r in stats if not (r[f"max({dim})"] < lo or r[f"min({dim})"] > hi)
        )

    n_parts = 16
    z_stats = partition_stats(cluster_by_zorder(base, [F.col("x"), F.col("y")], n_parts))
    s_stats = partition_stats(
        base.repartitionByRange(n_parts, F.col("x")).sortWithinPartitions("x")
    )
    assert len(z_stats) == n_parts and len(s_stats) == n_parts

    # 16-bucket-wide predicate windows on each dimension (a ~6% selective filter)
    windows = [(64, 79), (128, 143), (192, 207)]
    z_cost = s_cost = 0
    for lo, hi in windows:
        z_cost += touched(z_stats, "x", lo, hi) + touched(z_stats, "y", lo, hi)
        s_cost += touched(s_stats, "x", lo, hi) + touched(s_stats, "y", lo, hi)
    # single-sort: ~1-2 partitions for x, all 16 for y => ~17-18 per window pair.
    # z-order: ~4-6 for each dimension => ~8-12. Require a strict win.
    assert z_cost < s_cost, (z_cost, s_cost)
    # and the y-dimension alone must prune at all under z-order (single-sort can't)
    y_touched = touched(z_stats, "y", 64, 79)
    assert y_touched < n_parts, y_touched


def test_zorder_key_interleave_golden(spark):
    from pyspark.sql import functions as F

    from hadoop_migration_assessment_tools_spark.plans.zorder import zorder_key

    df = spark.createDataFrame([(0b1010, 0b0110)], "x: long, y: long")
    got = df.select(zorder_key([F.col("x"), F.col("y")], 4).alias("z")).collect()[0]["z"]

    def interleave(a, b):
        z = 0
        for i in range(4):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == interleave(0b1010, 0b0110)


def test_hilbert_key_matches_replay_bijective_and_continuous(spark):
    """plans/hilbert.py (r11): (a) with_hilbert_key must equal the pure-Python
    Lam-Shapiro replay on the FULL 32x32 grid at bits=5; (b) the mapping is a
    BIJECTION onto [0, 4^bits); (c) the continuity theorem that gives Hilbert
    its locality edge: consecutive curve positions d and d+1 are grid
    NEIGHBORS (|dx| + |dy| == 1) — Morton provably violates this at every
    power-of-two boundary, which is exactly why unaligned file cuts cover
    bigger rectangles there."""
    from hadoop_migration_assessment_tools_spark.plans.hilbert import (
        hilbert_d_py,
        with_hilbert_key,
    )

    bits = 5
    n = 1 << bits
    grid = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(grid, "x long, y long")
    got = {
        (r["x"], r["y"]): r["_h"]
        for r in with_hilbert_key(df, F.col("x"), F.col("y"), bits).collect()
    }
    want = {(x, y): hilbert_d_py(x, y, bits) for x, y in grid}
    assert got == want
    assert sorted(got.values()) == list(range(n * n))  # bijection
    by_d = {d: xy for xy, d in got.items()}
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, by_d[d], by_d[d + 1])


def test_hilbert_beats_zorder_on_equal_count_cuts(spark):
    """The registry row's claim pinned as an inequality: at 48 equal-count
    file cuts over the real orders buckets, Hilbert's total covered
    min/max-rectangle area must be STRICTLY smaller than Z-order's (measured
    ~0.53x at both sf0.01 and sf0.1 — this asserts the direction, not the
    weather-sensitive magnitude)."""
    from hadoop_migration_assessment_tools_spark.queries.tpch import (
        orders_hilbert_locality,
    )

    rows = {
        r["curve"]: r
        for r in orders_hilbert_locality(spark, "/root/testdata/sf0.01").collect()
    }
    assert rows["hilbert"]["n_rows"] == rows["zorder"]["n_rows"]
    assert rows["hilbert"]["n_files"] == rows["zorder"]["n_files"]
    assert rows["hilbert"]["covered_area"] < rows["zorder"]["covered_area"]
    assert rows["hilbert"]["span_sum"] < rows["zorder"]["span_sum"]


def test_runtime_bloom_filter_prunes_application_side(spark):
    """Runtime-filter literacy proof: with a selective creation side, Catalyst's
    InjectRuntimeFilter must add a bloom-filter semi-reduction (might_contain) on
    the fact side of a shuffle join — at 100 TB this is what keeps the big side's
    shuffle from carrying rows the dimension filter will discard anyway. Also
    proves the correctness envelope: results identical with the filter on/off."""
    from pyspark.sql import functions as F

    from hadoop_migration_assessment_tools_spark.sources.readers import load_table

    conf_keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in conf_keys}
    try:
        for k, v in conf_keys.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF, "lineitem")
        orders = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan[:1500]
        with_filter = j.collect()[0]["n"]
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        j2 = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).agg(
            F.count(F.lit(1)).alias("n")
        )
        assert "might_contain" not in j2._jdf.queryExecution().optimizedPlan().toString()
        assert j2.collect()[0]["n"] == with_filter
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_observation_api_collects_metrics_in_flight(spark):
    """df.observe: aggregate metrics collected DURING the action, not via a second
    scan — at 100 TB this is how a pipeline reports rows/nulls/bytes processed
    without doubling its I/O. Asserts observed metrics equal a ground-truth pass."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from hadoop_migration_assessment_tools_spark.sources.readers import load_table

    li = load_table(spark, SF, "lineitem")
    obs = Observation("scan-metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_sum"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0)).alias("null_shipdates"),
    )
    result = observed.filter(F.col("l_quantity") > 25).count()  # the real job
    got = obs.get
    truth = li.agg(
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_sum"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0)).alias("null_shipdates"),
    ).collect()[0]
    assert got["rows_seen"] == truth["rows_seen"]
    assert got["qty_sum"] == truth["qty_sum"]
    assert got["null_shipdates"] == truth["null_shipdates"] == 0
    assert 0 < result < got["rows_seen"]  # the filter actually ran as the action


def test_distributed_median_edge_cases(spark):
    """Exact-median selection across the degenerate shapes: single-row groups,
    all-equal groups (lo == hi bucket collapse), even/odd counts, duplicates
    straddling the median."""
    from pyspark.sql import functions as F

    from hadoop_migration_assessment_tools_spark.plans.median import distributed_median

    rows = (
        [("single", 42.0)]
        + [("equal", 7.0)] * 5
        + [("odd", float(v)) for v in [5, 1, 9, 3, 7]]        # median 5
        + [("even", float(v)) for v in [4, 1, 3, 2]]          # lower median 2
        + [("dups", float(v)) for v in [1, 2, 2, 2, 9, 9]]    # lower median 2
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: (r["n_rows"], r["median"]) for r in
           distributed_median(df, "v", ["g"], n_buckets=4).collect()}
    assert got == {
        "single": (1, 42.0),
        "equal": (5, 7.0),
        "odd": (5, 5.0),
        "even": (4, 2.0),
        "dups": (6, 2.0),
    }


def test_distributed_median_matches_sorted_reference(spark):
    import random

    from hadoop_migration_assessment_tools_spark.plans.median import distributed_median

    rng = random.Random(42)
    rows = [(f"g{i % 7}", round(rng.uniform(-1000, 1000), 3)) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r["median"] for r in distributed_median(df, "v", ["g"]).collect()}
    by_g: dict = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        vs.sort()
        assert got[g] == vs[(len(vs) + 1) // 2 - 1], g


def test_distributed_quantiles_match_sorted_reference(spark):
    import random

    from hadoop_migration_assessment_tools_spark.plans.median import distributed_quantiles

    rng = random.Random(7)
    rows = [(f"g{i % 3}", round(rng.uniform(0, 100), 3)) for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: (r["q25"], r["q50"], r["q95"]) for r in
           distributed_quantiles(df, "v", ["g"], {"q25": 0.25, "q50": 0.5, "q95": 0.95}).collect()}
    import math
    by_g: dict = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        vs.sort()
        want = tuple(vs[max(1, math.ceil(q * len(vs))) - 1] for q in (0.25, 0.5, 0.95))
        assert got[g] == want, g


def test_bloom_prefilter_no_false_negatives_and_runtime_reuse(spark):
    """plans/bloom.py: (a) NO false negatives — every probe row whose key is in
    the filter set survives the prefilter (the Bloom guarantee the exact join
    relies on); (b) false positives exist only outside the key set; (c) the
    words bitmap broadcast is built ONCE at runtime — AQE's stage cache turns
    the k=3 static broadcasts into 1 build + ReusedExchange."""
    from hadoop_migration_assessment_tools_spark.plans.bloom import (
        bloom_prefilter,
        bloom_words,
    )
    from pyspark.sql import functions as F

    keys = spark.range(0, 500, 3).select(F.col("id").alias("k"))  # every 3rd id
    probe = spark.range(0, 500).select(F.col("id").alias("k"))
    words = bloom_words(keys, "k")
    passed = bloom_prefilter(probe, "k", words)
    got = {r["k"] for r in passed.collect()}
    true_set = set(range(0, 500, 3))
    assert true_set <= got, f"false negatives: {sorted(true_set - got)[:5]}"
    # determinism across partition layouts
    got2 = {r["k"] for r in bloom_prefilter(probe.repartition(7), "k", words).collect()}
    assert got == got2
    # runtime exchange reuse (one bitmap build for all three probes)
    plan = passed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 2, plan[:500]


def test_kmv_bottom_k_uses_take_ordered(spark):
    """The KMV bottom-k must compile to TakeOrderedAndProject — per-partition
    top-k then a k-row driver merge. A plan that splits into a global
    Sort + GlobalLimit ships whole partitions to one task at 100 TB."""
    from hadoop_migration_assessment_tools_spark.ext.sketch import kmv_bottom_k
    from hadoop_migration_assessment_tools_spark.plans.audit import formatted_plan

    df = spark.range(1000).select(F.col("id").cast("string").alias("v"))
    plan = formatted_plan(kmv_bottom_k(df, "v", 16))
    assert "TakeOrderedAndProject" in plan
    assert "GlobalLimit" not in plan


def test_bottom_k_rows_uses_take_ordered(spark):
    """The quantile-sketch row sample (events_sampled_quantiles' hot stage) must
    compile to TakeOrderedAndProject, same contract as the KMV sketch: a global
    Sort + GlobalLimit would ship whole partitions to one task at 100 TB."""
    from hadoop_migration_assessment_tools_spark.ext.sketch import bottom_k_rows
    from hadoop_migration_assessment_tools_spark.plans.audit import formatted_plan

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("double").alias("v")
    )
    plan = formatted_plan(bottom_k_rows(df, "k", 16, "v"))
    assert "TakeOrderedAndProject" in plan
    assert "GlobalLimit" not in plan


def test_bottom_k_rows_partition_invariant(spark):
    """The sampled SET is a pure function of the data: identical under 1, 7 and
    32 input partitions (the property the quantile estimates stand on)."""
    from hadoop_migration_assessment_tools_spark.ext.sketch import bottom_k_rows

    df = spark.range(5000).select(
        F.col("id").alias("k"), F.pmod(F.col("id") * 37, F.lit(991)).cast("double").alias("v")
    )
    expect = None
    for parts in (1, 7, 32):
        got = sorted(
            (r["h"], r["v"]) for r in bottom_k_rows(df.repartition(parts), "k", 64, "v").collect()
        )
        assert len(got) == 64
        if expect is None:
            expect = got
        assert got == expect


def test_shingle_jaccard_prestage_pinned(spark):
    """docs_shingle_jaccard's checkpointed index stage (memory rule: pin the
    pre-checkpoint strategy separately when a query localCheckpoints its hot
    subtree): tokenize+shingle stays NARROW (zip_with chain, no pre-shuffle),
    so the stage is exactly the distinct shuffle + the per-doc count window."""
    from hadoop_migration_assessment_tools_spark.ext.dedup import shingle_index
    from hadoop_migration_assessment_tools_spark.plans.audit import plan_signature
    from hadoop_migration_assessment_tools_spark.queries.llm import (
        SHINGLE_K,
        _docs_with_planted_dups,
    )
    from pyspark.sql.window import Window as W

    aug = _docs_with_planted_dups(spark, "/root/testdata/sf0.001")
    idx = shingle_index(aug, "text", "doc_id", SHINGLE_K)
    inv = idx.select(
        F.col("_id").alias("doc_id"),
        F.count(F.lit(1)).over(W.partitionBy("_id")).alias("n_sh"),
        F.col("_sh").alias("sh"),
    )
    sig = plan_signature(inv)
    # r13: 3 shuffles = the scale-adaptive scan spread (plans/spread.py, runs
    # once via the AQE stage cache) + the distinct shuffle + the window shuffle
    assert sig["window"] == 1 and sig["shuffle_exchange"] == 3, sig
    assert sig["smj"] + sig["bhj"] + sig["shj"] + sig["bnlj"] + sig["cartesian"] == 0, sig


def test_grouped_sample_window_group_limit(spark):
    """The grouped/sliding quantile sketches' per-group bottom-k (row_number
    <= k filter over a window) must compile to WindowGroupLimit — Spark pushes
    the rank filter below the shuffle so each map task keeps only k rows per
    group before exchanging. Without it, the full corpus shuffles to compute a
    k-row sample — the difference between a sketch build and a sort at 100 TB."""
    from hadoop_migration_assessment_tools_spark.plans.audit import formatted_plan
    from hadoop_migration_assessment_tools_spark.queries.events_analytics import (
        events_grouped_sampled_quantiles,
        events_sliding_sample_quantiles,
    )

    for q in (events_grouped_sampled_quantiles, events_sliding_sample_quantiles):
        plan = formatted_plan(q(spark, "/root/testdata/sf0.001"))
        assert "WindowGroupLimit" in plan, q.__name__


def test_salted_group_topk_registry_row_plan_shape(spark):
    """VERDICT r10 #3 — the oracled events_salted_group_topk row must show the
    two-phase WindowGroupLimit shape: BOTH windows (the per-(grp,salt) local
    top-k and the per-grp re-rank) carry the rank-filter pushdown, and the
    plan has no join beyond the one broadcast of the 1-row split relation."""
    from hadoop_migration_assessment_tools_spark.plans.audit import (
        formatted_plan,
        plan_signature,
    )
    from hadoop_migration_assessment_tools_spark.queries.events_analytics import (
        events_salted_group_topk,
    )

    df = events_salted_group_topk(spark, "/root/testdata/sf0.001")
    plan = formatted_plan(df)
    assert plan.count("WindowGroupLimit") >= 2, "both phases must push the rank filter"
    sig = plan_signature(df)
    # bnlj == 1 is the 1-row split-certification crossJoin (BNLJ_ALLOWED class)
    assert sig["bnlj"] <= 1 and sig["cartesian"] == 0, sig
    r = df.collect()
    # the in-plan split certification must REQUIRE the >= 4x shrink
    assert all(row["split_ok"] for row in r)
    assert r[0]["hot_rows"] >= 4 * r[0]["max_bucket"]


def test_interval_join_salted_equals_plain_and_splits_hot_bucket(spark):
    """VERDICT r8 #7 — the interval-join x skew composition: plant one HOT time
    bucket (80% of points in a single 30-min window, all on ONE timestamp —
    the worst case, where even finer bucketing can't split it), and prove
    (a) the salted variant returns exactly the plain variant's pairs,
    (b) the physical join stays a structural equi join (no BNLJ/Cartesian),
    (c) the hot bucket actually SPLITS: the max (bucket, salt) group on the
    point side is a fraction of the hot bucket's size, so the straggler task
    shrinks by ~salt_buckets."""
    import datetime as dt

    from hadoop_migration_assessment_tools_spark.plans.audit import plan_signature
    from hadoop_migration_assessment_tools_spark.plans.interval_join import (
        point_in_interval_join,
        point_in_interval_join_salted,
    )

    base = dt.datetime(2024, 3, 1)
    hot_ts = base + dt.timedelta(seconds=900)
    pts = spark.createDataFrame(
        [(i, hot_ts) for i in range(4000)]
        + [(10_000 + i, base + dt.timedelta(seconds=3600 + 137 * i)) for i in range(1000)],
        "pid long, p_ts timestamp",
    ).repartition(8)
    ivs = spark.createDataFrame(
        [
            (j, base + dt.timedelta(seconds=600 * j), base + dt.timedelta(seconds=600 * j + 2400))
            for j in range(40)
        ],
        "iid long, w_start timestamp, w_end timestamp",
    )

    plain = point_in_interval_join(pts, "p_ts", ivs, "w_start", "w_end")
    salted = point_in_interval_join_salted(
        pts, "p_ts", ivs, "w_start", "w_end", salt_buckets=8
    )
    want = sorted((r["pid"], r["iid"]) for r in plain.select("pid", "iid").collect())
    got = sorted((r["pid"], r["iid"]) for r in salted.select("pid", "iid").collect())
    assert got == want and len(want) > 4000  # hot point matches several intervals

    # structural equi join, no BNLJ/Cartesian — for BOTH variants
    for df in (plain, salted):
        sig = plan_signature(df)
        assert sig["bnlj"] == 0 and sig["cartesian"] == 0, sig
        assert sig["smj"] + sig["bhj"] + sig["shj"] == 1, sig

    # the hot bucket splits: reproduce the salted point-side key and compare
    # the biggest shuffle group before/after salting
    w = F.lit(1800).cast("long")
    keyed = pts.select(
        F.floor(F.unix_timestamp("p_ts") / w).cast("long").alias("b"),
        F.pmod(F.xxhash64(F.col("p_ts"), F.monotonically_increasing_id()), F.lit(8))
        .cast("int")
        .alias("s"),
    )
    max_plain = keyed.groupBy("b").count().agg(F.max("count")).collect()[0][0]
    max_salted = keyed.groupBy("b", "s").count().agg(F.max("count")).collect()[0][0]
    assert max_plain >= 4000  # the planted hot bucket
    assert max_salted <= max_plain / 4  # split across >= 4 effective salts


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """The star-schema 100 TB move: a fact table laid out with partitionBy on
    the join key lets Catalyst's dynamic partition pruning turn a selective
    dim filter into a RUNTIME PartitionFilter on the fact scan — whole
    partitions are skipped before a single fact row is read. This pins that
    the engine's layout guidance (partitioned sinks, sources/sink.py) composes
    with DPP: the executed plan must carry a dynamicpruningexpression on the
    fact scan's partition column, and results must equal the unpartitioned
    join exactly."""
    import os

    from hadoop_migration_assessment_tools_spark.sources.readers import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    fact_dir = str(tmp_path / "fact")
    ev.write.partitionBy("event_type").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("purchase", 1.0), ("error", 0.5), ("click", 0.1), ("view", 0.05), ("signup", 2.0)],
        "etype string, weight double",
    )
    j = (
        fact.join(dim.where(F.col("weight") > 0.9), fact.event_type == F.col("etype"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "DPP did not plant a runtime PartitionFilter"
    assert "PartitionFilters" in plan
    got = {(r["event_type"], r["n"]) for r in j.collect()}
    want = {
        (r["event_type"], r["n"])
        for r in ev.join(
            dim.where(F.col("weight") > 0.9), ev.event_type == F.col("etype")
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) == 2


def test_join_advisor_walks_the_decision_tree(spark):
    """plans/advisor.advise_join — the sketches composed into the standard CBO
    decision: broadcast when a side fits, salt when one key dominates, plain
    shuffle otherwise; est_join_size (CMS inner product) rides along as the
    viability number and must upper-bound the exact join size on every branch."""
    from hadoop_migration_assessment_tools_spark.plans.advisor import advise_join

    big = spark.range(0, 20_000).select(
        (F.col("id") % 1000).cast("string").alias("k"), F.col("id").alias("v")
    )
    small = spark.range(0, 500).select(
        F.col("id").cast("string").alias("k"), (F.col("id") * 2).alias("w")
    )

    # 1) small right side -> broadcast_right, est >= exact
    r = advise_join(big, small, "k", broadcast_row_limit=1_000).collect()[0]
    exact = big.join(small, "k").count()
    assert r["strategy"] == "broadcast_right"
    assert r["est_join_size"] >= exact > 0
    assert r["left_rows"] == 20_000 and r["right_rows"] == 500

    # 2) both sides big, one pathological key on the left -> salt_left_key
    skewed = spark.range(0, 20_000).select(
        F.when(F.col("id") < 12_000, F.lit("hot"))
        .otherwise((F.col("id") % 997).cast("string"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    r2 = advise_join(skewed, big, "k", broadcast_row_limit=100).collect()[0]
    assert r2["strategy"] == "salt_left_key"
    assert r2["left_top_share"] > 0.5

    # 3) both big, uniform keys -> shuffle_ok
    r3 = advise_join(big, big.select("k", F.col("v").alias("w")), "k",
                     broadcast_row_limit=100).collect()[0]
    assert r3["strategy"] == "shuffle_ok"
    assert r3["left_top_share"] < 0.2 and r3["right_top_share"] < 0.2


def test_join_advisor_exact_bytes_sees_past_prefix_bias(spark):
    """ADVICE r11 #1: the LIMIT byte sample is a position-biased prefix — a
    side whose wide rows sit beyond the first sample_rows can be sanctioned
    for broadcast on a far-too-low byte estimate. exact_bytes=True averages
    over every row and must catch it (refusing the broadcast)."""
    from hadoop_migration_assessment_tools_spark.plans.advisor import advise_join

    # 2000 narrow rows first (sorted by id within the single input partition),
    # then 500 rows carrying ~40 KB each: true avg ~8 KB/row, prefix avg ~20 B
    wide_tail = spark.range(0, 2_500, 1, 1).select(
        F.col("id").cast("string").alias("k"),
        F.when(F.col("id") >= 2_000, F.repeat(F.lit("x"), 40_000))
        .otherwise(F.lit("s"))
        .alias("payload"),
    )
    big = spark.range(0, 50_000).select(
        (F.col("id") % 2_500).cast("string").alias("k"), F.col("id").alias("v")
    )
    kwargs = dict(broadcast_row_limit=10_000, broadcast_byte_limit=1_000_000,
                  sample_rows=1_024)
    biased = advise_join(big, wide_tail, "k", **kwargs).collect()[0]
    exact = advise_join(big, wide_tail, "k", exact_bytes=True, **kwargs).collect()[0]
    # prefix mode undersizes (~2.5k rows x ~20 B << 1 MB) and sanctions the
    # broadcast; the exact average sees the ~20 MB truth and refuses it
    assert biased["strategy"] == "broadcast_right"
    assert exact["right_bytes"] > 10 * biased["right_bytes"]
    assert exact["right_bytes"] > 1_000_000
    assert exact["strategy"] != "broadcast_right"


def test_join_advice_applied_byte_slack_is_pinned(spark):
    """ADVICE r11 #4: events_join_advice_applied's oracle replays a row-only
    CASE while the engine also evaluates the sampled byte conjunct; branch
    parity rests on the dim byte estimate sitting far under
    APPLIED_BCAST_BYTES wherever the row gate passes. Pin that slack (>= 8x)
    at every scoring SF so a fixture change that widens dim rows trips CI
    before it breaks the correctness hash."""
    from hadoop_migration_assessment_tools_spark.plans.advisor import advise_join
    from hadoop_migration_assessment_tools_spark.queries.events_analytics import (
        APPLIED_BCAST_BYTES,
        APPLIED_BCAST_LIMIT,
        APPLIED_HOT_MOD,
        APPLIED_KEY_MOD,
        _events,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
        k = F.when(
            F.pmod(F.col("user_id"), F.lit(APPLIED_HOT_MOD)) < 2, F.lit("hot")
        ).otherwise(
            F.concat(
                F.lit("u"),
                F.pmod(F.col("user_id"), F.lit(APPLIED_KEY_MOD)).cast("string"),
            )
        )
        left = ev.select(k.alias("k"), "value")
        dim = left.groupBy("k").agg(F.count("*").cast("long").alias("dim_n"))
        r = advise_join(
            left, dim, "k",
            broadcast_row_limit=APPLIED_BCAST_LIMIT,
            broadcast_byte_limit=APPLIED_BCAST_BYTES,
        ).collect()[0]
        if r["right_rows"] <= APPLIED_BCAST_LIMIT:
            # the row gate passes -> the byte conjunct must be slack, not close
            assert r["right_bytes"] * 8 < APPLIED_BCAST_BYTES, (
                f"{sf_dir}: dim byte estimate {r['right_bytes']} is within 8x "
                f"of APPLIED_BCAST_BYTES={APPLIED_BCAST_BYTES}; the row-only "
                "oracle CASE no longer certifies the engine's branch"
            )


def test_join_advisor_handles_empty_side(spark):
    """An empty side must advise broadcast with rows=0 and est=0 — numbers,
    never NULL-propagated branches (the sizer's disjoint/empty discipline)."""
    from hadoop_migration_assessment_tools_spark.plans.advisor import advise_join

    big = spark.range(0, 5000).select(
        (F.col("id") % 100).cast("string").alias("k"), F.col("id").alias("v")
    )
    r = advise_join(big, big.where(F.lit(False)), "k").collect()[0]
    assert r["right_rows"] == 0 and r["right_top_share"] == 0.0
    assert r["est_join_size"] == 0 and r["strategy"] == "broadcast_right"


def test_aqe_skew_join_splits_hot_partition(spark):
    """The docstring claim 'AQE skew-join is the runtime alternative to
    pre-salting' (plans/skew.py, interval_join.py, advisor.py), demonstrated:
    a planted 75%-hot key must make AQE re-plan the SortMergeJoin with
    skew=true and read the hot partition through AQEShuffleRead-skewed splits
    — no code change, only runtime stats. Notable trap pinned here:
    coalescePartitions ON can merge away the skew detection at these toy
    sizes, so the demonstration disables it for the scope of the test."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") < 300_000, F.lit("hot"))
            .otherwise((F.col("id") % 5000).cast("string"))
            .alias("k"),
            F.col("id").alias("v"),
            F.lpad(F.lit("x"), 40, "y").alias("pad"),
        )
        right = spark.range(0, 50_000).select(
            (F.col("id") % 5000).cast("string").alias("k"), F.col("id").alias("w")
        ).union(spark.createDataFrame([("hot", -1)], "k string, w long"))
        j = left.join(right, "k").select(F.sum("v").alias("s"))
        assert j.collect()[0]["s"] == 394_999_350_000  # exact join mass
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not re-plan the skewed join"
        assert "AQEShuffleRead" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_apply_join_advice_every_branch_equals_plain_join(spark):
    """VERDICT r9 #3 — the advisor ACTUATED: apply_join_advice must walk the
    same decision tree as advise_join and every branch must return exactly the
    plain inner join's rows. Five planted fixtures, one per branch; planted
    skew share (0.8) sits far above skew_share + total/cap per the documented
    MG undercount margin."""
    from hadoop_migration_assessment_tools_spark.plans.advisor import apply_join_advice
    from hadoop_migration_assessment_tools_spark.plans.audit import plan_signature

    big_uniform = [(i % 200, i) for i in range(2000)]  # 200 keys x 10 rows
    hot = [(0, i) for i in range(1600)] + [(1 + i % 200, i) for i in range(400)]
    tiny = [(k, k * 10) for k in range(30)]
    wide = [(i % 300, i) for i in range(3000)]

    def mk(rows, side):
        return spark.createDataFrame(rows, f"k long, {side} long")

    cases = {
        "broadcast_right": (mk(big_uniform, "lv"), mk(tiny, "rv")),
        "broadcast_left": (mk(tiny, "lv"), mk(big_uniform, "rv")),
        "salt_left_key": (mk(hot, "lv"), mk(big_uniform, "rv")),
        "salt_right_key": (mk(big_uniform, "lv"), mk(hot, "rv")),
        "shuffle_ok": (mk(big_uniform, "lv"), mk(wide, "rv")),
    }
    for want, (left, right) in cases.items():
        strategy, out = apply_join_advice(
            left, right, "k", broadcast_row_limit=50, salt_buckets=8
        )
        assert strategy == want, f"{want}: advisor chose {strategy}"
        assert out.columns == ["k", "lv", "rv"]
        plain = left.join(right, "k").select("k", "lv", "rv")
        got = sorted(map(tuple, out.collect()))
        exp = sorted(map(tuple, plain.collect()))
        assert got == exp, f"{want}: rows diverge from the plain join"
        sig = plan_signature(out)
        assert sig["bnlj"] == 0 and sig["cartesian"] == 0, (want, sig)
        if want.startswith("broadcast"):
            assert sig["bhj"] >= 1, (want, sig)  # the hint must actually fire


def test_apply_join_advice_rejects_column_overlap(spark):
    import pytest

    from hadoop_migration_assessment_tools_spark.plans.advisor import apply_join_advice

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="non-key columns"):
        apply_join_advice(df, df, "k")


def test_apply_join_advice_viability_guard_refuses_exploding_join(spark):
    """r11 — the viability number ACTUATED: a self-join on a 4-value key
    explodes ~n^2/4-fold; with max_blowup set, apply_join_advice must refuse
    with the numbers in the error instead of launching it. Controls: the same
    call without the guard executes (row count == the true explosion), and a
    well-keyed join passes the same guard. The CMS bound only ever
    OVERcounts, so a refusal is never a silent false pass."""
    import pytest

    from hadoop_migration_assessment_tools_spark.plans.advisor import apply_join_advice

    left = spark.createDataFrame(
        [(i % 4, i) for i in range(2000)], "k long, lv long"
    )
    right = spark.createDataFrame(
        [(i % 4, i) for i in range(2000)], "k long, rv long"
    )
    with pytest.raises(ValueError, match="viability"):
        apply_join_advice(left, right, "k", broadcast_row_limit=50, max_blowup=10.0)
    # control 1: without the guard the join executes — and really explodes
    _, out = apply_join_advice(left, right, "k", broadcast_row_limit=50)
    assert out.count() == 4 * 500 * 500
    # control 2: a near-unique key passes the same guard
    ok_l = spark.createDataFrame([(i, i) for i in range(2000)], "k long, lv long")
    ok_r = spark.createDataFrame([(i, -i) for i in range(2000)], "k long, rv long")
    strategy, out = apply_join_advice(
        ok_l, ok_r, "k", broadcast_row_limit=50, max_blowup=10.0
    )
    assert out.count() == 2000


def test_join_advisor_refuses_bytes_blown_broadcast(spark):
    """VERDICT r10 #1 — the broadcast decision is BYTES, not rows: a dim that
    passes the row limit but whose rows x avg-serialized-bytes blows the byte
    limit must NOT be broadcast (the r10-and-earlier row-only tree would have
    OOM'd the driver at scale). Control: the same dim with a generous byte
    limit IS broadcast — only the byte term flips the branch."""
    from hadoop_migration_assessment_tools_spark.plans.advisor import (
        advise_join,
        apply_join_advice,
    )

    big = spark.range(0, 3000).select(
        (F.col("id") % 300).alias("k"), F.col("id").alias("lv")
    )
    # 30 rows (<< row limit 50) of ~100 KB payload each: ~3 MB serialized
    wide_dim = spark.range(0, 30).select(
        F.col("id").alias("k"), F.repeat(F.lit("x"), 100_000).alias("rv")
    )
    r = advise_join(
        big, wide_dim, "k", broadcast_row_limit=50, broadcast_byte_limit=100_000
    ).collect()[0]
    assert r["right_rows"] == 30 and r["right_bytes"] > 100_000
    assert not r["strategy"].startswith("broadcast"), r["strategy"]
    assert r["strategy"] == "shuffle_ok"  # no skew either: 300 uniform keys
    strategy, out = apply_join_advice(
        big, wide_dim, "k", broadcast_row_limit=50, broadcast_byte_limit=100_000
    )
    assert strategy == "shuffle_ok"
    assert out.count() == 300  # 30 dim keys x 10 rows each
    # control: byte room -> the same fixture broadcasts
    r2 = advise_join(
        big, wide_dim, "k", broadcast_row_limit=50,
        broadcast_byte_limit=64 * 1024 * 1024,
    ).collect()[0]
    assert r2["strategy"] == "broadcast_right"


def test_join_advisor_broadcast_ties_break_by_bytes(spark):
    """Two broadcast-eligible sides: the advisor must pick the smaller side
    BY BYTES (the unit that costs), not by rows — fewer rows of fat strings
    lose to more rows of narrow ints."""
    from hadoop_migration_assessment_tools_spark.plans.advisor import advise_join

    fat_few = spark.range(0, 10).select(
        F.col("id").alias("k"), F.repeat(F.lit("y"), 5_000).alias("lv")
    )
    narrow_many = spark.range(0, 40).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("rv")
    )
    r = advise_join(
        fat_few, narrow_many, "k", broadcast_row_limit=1_000
    ).collect()[0]
    assert r["left_rows"] < r["right_rows"]  # rows would pick the LEFT side
    assert r["left_bytes"] > r["right_bytes"]
    assert r["strategy"] == "broadcast_right"  # bytes pick the right side


def test_apply_join_advice_composite_key_all_branches(spark):
    """VERDICT r10 #6 — composite equi-join keys: the sketches measure the
    NUL-joined key tuple and the salted rewrite salts the same tuple, so
    broadcast / salt / shuffle branches all return exactly the plain two-
    column join's rows. The hot fixture plants one (k1, k2) PAIR at 80% —
    the share the advisor must measure is the TUPLE's, because that is what
    the shuffle partitioner hashes."""
    from hadoop_migration_assessment_tools_spark.plans.advisor import (
        advise_join,
        apply_join_advice,
    )
    from hadoop_migration_assessment_tools_spark.plans.audit import plan_signature

    uniform = [(i % 20, (i * 7) % 20, i) for i in range(2000)]
    # hot PAIR (3, 9): 1600 rows; the rest spread so each single column is
    # ~uniform (every k1 and k2 value still appears many times)
    hot = [(3, 9, i) for i in range(1600)] + [
        (i % 20, (i * 7 + 1) % 20, i) for i in range(400)
    ]
    tiny = [(a, b, a * 100 + b) for a in range(5) for b in range(5)]

    def mk(rows, side):
        return spark.createDataFrame(rows, f"k1 long, k2 long, {side} long")

    cases = {
        "broadcast_right": (mk(uniform, "lv"), mk(tiny, "rv")),
        "salt_left_key": (mk(hot, "lv"), mk(uniform, "rv")),
        "shuffle_ok": (mk(uniform, "lv"), mk(uniform[:2000], "rv")),
    }
    for want, (left, right) in cases.items():
        strategy, out = apply_join_advice(
            left, right, ["k1", "k2"], broadcast_row_limit=50, salt_buckets=8
        )
        assert strategy == want, f"{want}: advisor chose {strategy}"
        assert out.columns == ["k1", "k2", "lv", "rv"]
        plain = left.join(right, ["k1", "k2"]).select("k1", "k2", "lv", "rv")
        got = sorted(map(tuple, out.collect()))
        exp = sorted(map(tuple, plain.collect()))
        assert got == exp, f"{want}: rows diverge from the plain join"
        sig = plan_signature(out)
        assert sig["bnlj"] == 0 and sig["cartesian"] == 0, (want, sig)
    # the advisor's measured share is the TUPLE's (planted 0.8 >> 0.2 + the
    # documented MG undercount margin)
    r = advise_join(
        mk(hot, "lv"), mk(uniform, "rv"), ["k1", "k2"], broadcast_row_limit=50
    ).collect()[0]
    assert r["left_top_share"] > 0.7


def test_salted_interval_join_rejects_outer_how(spark):
    """ADVICE r9: under right/full outer the salted variant would emit each
    unmatched interval once per (bucket replica x salt) — it must refuse.
    The PLAIN variant deliberately allows 'right' (events_session_concurrency
    keeps zero-concurrency incidents through a duplication-insensitive
    groupBy), with the per-bucket-replica duplication documented instead."""
    import pytest

    from hadoop_migration_assessment_tools_spark.plans.interval_join import (
        point_in_interval_join_salted,
    )

    pts = spark.createDataFrame([], "p_ts timestamp")
    ivs = spark.createDataFrame([], "w_start timestamp, w_end timestamp")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="unmatched intervals"):
            point_in_interval_join_salted(pts, "p_ts", ivs, "w_start", "w_end", how=how)


def test_salted_group_topk_equals_plain_window_and_splits_hot_group(spark):
    """VERDICT r9 #5 — per-group top-k under group skew: plant one group
    holding 80% of rows (with heavy sort-key ties, the worst case for any
    'just bucket finer' dodge), and prove (a) the salted two-phase result
    equals the plain per-group window row-for-row, (b) the hot group's max
    (group, salt) task shrinks by >= 4x, (c) the plan stays shuffle+window
    only — no join, no BNLJ."""
    from pyspark.sql.window import Window

    from hadoop_migration_assessment_tools_spark.plans.audit import plan_signature
    from hadoop_migration_assessment_tools_spark.plans.ranking import salted_group_topk

    rows = [("hot", i % 13, i) for i in range(8000)] + [
        (f"g{i % 50}", i % 7, 100_000 + i) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "grp string, score long, row_id long").repartition(16)
    order = [F.desc("score"), F.asc("row_id")]

    got = salted_group_topk(df, ["grp"], order, k=5, salt_buckets=8)
    w = Window.partitionBy("grp").orderBy(*order)
    want = (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
    )
    assert sorted(map(tuple, got.select("grp", "score", "row_id", "rank").collect())) == sorted(
        map(tuple, want.select("grp", "score", "row_id", "rank").collect())
    )

    sig = plan_signature(got)
    assert sig["bnlj"] == 0 and sig["cartesian"] == 0, sig
    assert sig["smj"] + sig["bhj"] + sig["shj"] == 0, sig  # windows only, no join

    # the hot group actually splits: biggest (grp, salt) cell vs the hot group
    keyed = df.select(
        "grp",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8))
        .cast("int")
        .alias("s"),
    )
    max_plain = keyed.groupBy("grp").count().agg(F.max("count")).collect()[0][0]
    max_salted = keyed.groupBy("grp", "s").count().agg(F.max("count")).collect()[0][0]
    assert max_plain >= 8000
    assert max_salted <= max_plain / 4


def test_apply_window_topk_advice_both_branches_equal_plain_window(spark):
    """apply_window_topk_advice (r13, VERDICT r12 #6): the actuated result is
    identical to the definitional one-window top-k under EITHER branch — a
    planted hot group forces salt_group_topk, a uniform key forces
    plain_window, and both reproduce the same rows (total order via the
    unique id tie-breaker)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from hadoop_migration_assessment_tools_spark.plans.advisor import (
        advise_window,
        apply_window_topk_advice,
    )

    n = 600
    base = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 1000).alias("v"),
    )
    # hot: ~75% of rows in one group
    hot = base.select(
        F.when(F.col("id") % 4 < 3, F.lit("hot"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 5).cast("string")))
        .alias("grp"),
        "id",
        "v",
    )
    # uniform: 20 groups, 5% each
    uni = base.select(
        F.concat(F.lit("g"), (F.col("id") % 20).cast("string")).alias("grp"),
        "id",
        "v",
    )
    for df, want in ((hot, "salt_group_topk"), (uni, "plain_window")):
        advice = advise_window(df, ["grp"]).collect()[0]
        assert advice["strategy"] == want, advice
        strategy, got = apply_window_topk_advice(
            df, ["grp"], [F.col("v").desc(), F.col("id").asc()], 3, salt_buckets=4
        )
        assert strategy == want
        w = Window.partitionBy("grp").orderBy(F.col("v").desc(), F.col("id").asc())
        plain = (
            df.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= 3)
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))


def test_window_advice_branches_diverge_across_sfs(spark):
    """The registry row's branch-divergence claim as an executable assertion
    (the events_join_advice pattern): the SAME query chooses salt_group_topk
    at sf0.001/sf0.01 and plain_window at sf0.1, with the actuated literal
    agreeing with the in-plan advice at every SF."""
    from hadoop_migration_assessment_tools_spark.queries.events_analytics import (
        events_window_advice_applied,
    )

    want = {
        "/root/testdata/sf0.001": "salt_group_topk",
        "/root/testdata/sf0.01": "salt_group_topk",
        "/root/testdata/sf0.1": "plain_window",
    }
    for sf_dir, branch in want.items():
        row = events_window_advice_applied(spark, sf_dir).limit(1).collect()[0]
        assert row["strategy"] == branch, (sf_dir, row)
        assert row["actuated_matches"] is True, (sf_dir, row)
