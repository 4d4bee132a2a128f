"""Scale-neutrality guards for plans/spread.py (VERDICT r13 #9 + ADVICE r13).

The spread's 100 TB contract: it repartitions ONLY when the local input is too
small to split into the session's parallelism; with enough natural splits, or
with any input it cannot size (remote URI, missing path), it must be identity —
a full repartition of a production table would be a catastrophic regression.
"""

from __future__ import annotations

import os

import pytest

from hadoop_migration_assessment_tools_spark.plans.spread import (
    _conf_bytes,
    _size_bytes,
    spread_small_scan,
    table_path,
)

SF = "/root/testdata/sf0.001"


def _has_spread_exchange(df) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "RoundRobinPartitioning" in plan


def test_conf_bytes_all_spark_suffix_forms():
    # ADVICE r13: '128mb' used to strip only the trailing 'b' and crash on
    # int(float('128m')). Spark accepts both one- and two-letter suffixes.
    assert _conf_bytes("134217728") == 128 * 1024 * 1024
    assert _conf_bytes("128m") == 128 * 1024 * 1024
    assert _conf_bytes("128mb") == 128 * 1024 * 1024
    assert _conf_bytes("1g") == 1 << 30
    assert _conf_bytes("1gb") == 1 << 30
    assert _conf_bytes("256kb") == 256 * 1024
    assert _conf_bytes("256k") == 256 * 1024
    assert _conf_bytes("1tb") == 1 << 40
    assert _conf_bytes("64b") == 64
    assert _conf_bytes(" 128M ") == 128 * 1024 * 1024  # trim + case


def test_size_bytes_remote_and_missing_paths_are_unsizeable(tmp_path):
    f = tmp_path / "x.bin"
    f.write_bytes(b"a" * 1000)
    assert _size_bytes(str(f)) == 1000
    assert _size_bytes(str(tmp_path)) == 1000
    # no evidence is None, NOT zero: zero would count as "tiny input, spread it"
    assert _size_bytes("hdfs://nn/warehouse/huge_table") is None
    assert _size_bytes("s3a://bucket/huge_table") is None
    assert _size_bytes(str(tmp_path / "does_not_exist")) is None


def test_spread_is_identity_when_natural_splits_cover_parallelism(spark):
    """The scale-neutrality pin: when input_bytes / maxPartitionBytes >= the
    session parallelism (the 100 TB case), the spread must not touch the plan.
    Forced locally by shrinking maxPartitionBytes below file_size/parallelism."""
    path = table_path(SF, "documents")
    df = spark.read.parquet(path)
    size = _size_bytes(path)
    assert size and size > 0
    cores = spark.sparkContext.defaultParallelism
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # natural_splits = ceil(size / max_split) >= cores  <=>  max_split <= size/cores
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(max(1, size // (cores * 2))))
        out = spread_small_scan(df, path)
        assert out is df, "spread must be identity when the scan already splits"
        assert not _has_spread_exchange(out)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_spread_repartitions_a_single_small_file(spark):
    path = table_path(SF, "documents")
    df = spark.read.parquet(path)
    out = spread_small_scan(df, path)
    assert out is not df
    assert _has_spread_exchange(out)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # factor multiplies the target for variable-cost rows
    out2 = spread_small_scan(df, path, factor=2)
    assert out2.rdd.getNumPartitions() == 2 * spark.sparkContext.defaultParallelism


def test_spread_is_identity_for_unsizeable_input(spark):
    """ADVICE r13: a remote path must DISABLE the spread (identity), never be
    treated as 0 bytes (which would full-shuffle a production table)."""
    path = table_path(SF, "documents")
    df = spark.read.parquet(path)
    for bad in ("hdfs://nn/warehouse/huge", "s3a://bucket/huge"):
        assert spread_small_scan(df, bad) is df
        # even mixed with a sizeable path: one unknown poisons the evidence
        assert spread_small_scan(df, path, bad) is df


def test_spread_env_toggle(spark, monkeypatch):
    path = table_path(SF, "documents")
    df = spark.read.parquet(path)
    monkeypatch.setenv("SPARK_GRAFT_NO_SPREAD", "1")
    assert spread_small_scan(df, path) is df
