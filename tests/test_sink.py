"""Sink roundtrip tests (SRC2-SRC4) — write→read-back through the real sink into temp
dirs, the reference's own test pattern (EventLoggerTest.java:87-124, SURVEY §5.3).
Rollover timeline fixture: writes on different UTC days land in different date dirs
(DatePartitionedRecordsWriterFactoryTest.java:100-165)."""

from __future__ import annotations

import datetime as dt
import os

from hadoop_migration_assessment_tools_spark.schema import QUERY_EVENTS_SCHEMA
from hadoop_migration_assessment_tools_spark.sources.readers import read_event_log
from hadoop_migration_assessment_tools_spark.sources.sink import DatePartitionedSink


def _event(qid: str, start: dt.datetime) -> dict:
    row = {f.name: None for f in QUERY_EVENTS_SCHEMA.fields}
    row.update(
        QueryId=qid,
        EventType="QUERY_SUBMITTED",
        StartTime=start,
        HookVersion="1.0",
        TablesRead=["db@t"],
        TablesWritten=[],
        PartitionsRead=[],
        PartitionsWritten=[],
        DatabasesRead=[],
        DatabasesWritten=[],
    )
    return row


def test_batch_roundtrip_date_partitioned(spark, tmp_path):
    base = str(tmp_path / "events")
    rows = [
        _event("q1", dt.datetime(2024, 1, 1, 23, 50)),
        _event("q2", dt.datetime(2024, 1, 1, 23, 59)),
        # day boundary: next UTC day must land in a new date dir (rollover-at-midnight
        # semantics, DatePartitionedRecordsWriterFactory.java:196-202)
        _event("q3", dt.datetime(2024, 1, 2, 0, 1)),
    ]
    df = spark.createDataFrame(rows, schema=QUERY_EVENTS_SCHEMA)
    DatePartitionedSink(base).write_batch(df)

    day_dirs = sorted(d for d in os.listdir(base) if d.startswith("EventDate="))
    assert day_dirs == ["EventDate=2024-01-01", "EventDate=2024-01-02"]

    back = read_event_log(spark, base)
    assert back.count() == 3
    got = {r["QueryId"]: r for r in back.collect()}
    assert got["q1"]["StartTime"] == dt.datetime(2024, 1, 1, 23, 50)
    assert got["q1"]["TablesRead"] == ["db@t"]
    # SET1: the whole dir tree reads back as one logical dataset
    assert {r["EventDate"].isoformat() for r in back.collect()} == {"2024-01-01", "2024-01-02"}


def test_batch_append_accumulates(spark, tmp_path):
    """Multiple writer instances appending — multi-file union semantics (SET1)."""
    base = str(tmp_path / "events")
    sink = DatePartitionedSink(base)
    df1 = spark.createDataFrame([_event("a", dt.datetime(2024, 1, 1))], schema=QUERY_EVENTS_SCHEMA)
    df2 = spark.createDataFrame([_event("b", dt.datetime(2024, 1, 1))], schema=QUERY_EVENTS_SCHEMA)
    sink.write_batch(df1)
    sink.write_batch(df2)
    assert read_event_log(spark, base).count() == 2


def test_avro_falls_back_to_parquet_when_module_absent(spark, tmp_path):
    """SRC2: fmt='avro' matches the reference's container format when spark-avro is on
    the classpath; this container has only avro-core jars, so the sink must degrade to
    parquet with a warning rather than fail."""
    import warnings

    base = str(tmp_path / "events")
    df = spark.createDataFrame([_event("q", dt.datetime(2024, 1, 1))], schema=QUERY_EVENTS_SCHEMA)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        DatePartitionedSink(base, fmt="avro").write_batch(df)
    assert read_event_log(spark, base).count() == 1  # parquet fallback readable


def test_rollover_records_split_files(spark, tmp_path):
    """SRC4 equivalent: maxRecordsPerFile caps records per physical file the way the
    reference's time rotation caps records per Avro container."""
    base = str(tmp_path / "events")
    rows = [_event(f"q{i}", dt.datetime(2024, 1, 1, 12, 0)) for i in range(10)]
    df = spark.createDataFrame(rows, schema=QUERY_EVENTS_SCHEMA).coalesce(1)
    DatePartitionedSink(base, rollover_records=3).write_batch(df)
    files = [
        f
        for f in os.listdir(os.path.join(base, "EventDate=2024-01-01"))
        if f.endswith(".parquet")
    ]
    assert len(files) >= 4  # 10 records / 3 per file
    assert read_event_log(spark, base).count() == 10
