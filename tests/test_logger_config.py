"""Degrade-to-noop config handling (VERDICT r3 next-round #7), mirroring
EventLoggerTest.java:71-84: a blank/unset base dir disables logging — handle() is a
no-op and the would-be log dir stays empty — while a valid conf writes normally and
malformed numeric values degrade to defaults instead of raising."""

from __future__ import annotations

import datetime as dt
import glob
import os

from hadoop_migration_assessment_tools_spark.config import (
    CONF_BASE_DIRECTORY,
    CONF_QUEUE_CAPACITY,
    CONF_ROLLOVER_INTERVAL,
    DEFAULT_QUEUE_CAPACITY,
    DEFAULT_ROLLOVER_INTERVAL_SECONDS,
)
from hadoop_migration_assessment_tools_spark.logger import (
    EventLogger,
    parse_duration_seconds,
)
from hadoop_migration_assessment_tools_spark.schema import QUERY_EVENTS_SCHEMA


def _batch(spark, n=5):
    rows = []
    for i in range(n):
        row = {f.name: None for f in QUERY_EVENTS_SCHEMA.fields}
        for c in ("TablesRead", "TablesWritten", "PartitionsRead", "PartitionsWritten",
                  "DatabasesRead", "DatabasesWritten"):
            row[c] = []
        row.update(QueryId=f"q{i}", EventType="QUERY_SUBMITTED",
                   StartTime=dt.datetime(2024, 3, 1, 10, 0))
        rows.append(row)
    return spark.createDataFrame(rows, schema=QUERY_EVENTS_SCHEMA)


def test_disabled_when_dir_not_set(spark, tmp_path, caplog):
    import logging

    with caplog.at_level(logging.ERROR, logger="hadoop_migration_assessment_tools_spark.logger"):
        logger = EventLogger.from_conf({})  # empty conf, like `new HiveConf()`
    assert logger.disabled
    assert "logging disabled" in caplog.text
    assert logger.handle(_batch(spark)) == 0  # silent no-op, no exception
    assert logger.events_written == 0
    # nothing was written anywhere under the temp root
    assert not glob.glob(str(tmp_path / "**" / "*.avro"), recursive=True)


def test_disabled_when_dir_blank():
    assert EventLogger.from_conf({CONF_BASE_DIRECTORY: "   "}).disabled


def test_enabled_writes_reference_layout(spark, tmp_path):
    base = str(tmp_path / "hooklog")
    logger = EventLogger.from_conf(
        {
            CONF_BASE_DIRECTORY: base,
            CONF_QUEUE_CAPACITY: "128",
            CONF_ROLLOVER_INTERVAL: "30m",
        }
    )
    assert not logger.disabled
    assert logger.queue_capacity == 128
    assert logger.rollover_seconds == 1800
    assert logger.handle(_batch(spark)) == 5
    files = glob.glob(os.path.join(base, "*", "dwhassessment_*.avro"))
    assert files, "enabled logger must write the reference day-dir layout"


def test_malformed_values_degrade_to_defaults(tmp_path):
    logger = EventLogger.from_conf(
        {
            CONF_BASE_DIRECTORY: str(tmp_path / "d"),
            CONF_QUEUE_CAPACITY: "not-a-number",
            CONF_ROLLOVER_INTERVAL: "garbage",
        }
    )
    assert not logger.disabled
    assert logger.queue_capacity == DEFAULT_QUEUE_CAPACITY
    assert logger.rollover_seconds == DEFAULT_ROLLOVER_INTERVAL_SECONDS


def test_parse_duration_suffixes():
    assert parse_duration_seconds("600", 1) == 600
    assert parse_duration_seconds("90s", 1) == 90
    assert parse_duration_seconds("15m", 1) == 900
    assert parse_duration_seconds("2h", 1) == 7200
    assert parse_duration_seconds(None, 42) == 42
    assert parse_duration_seconds("oops", 42) == 42
