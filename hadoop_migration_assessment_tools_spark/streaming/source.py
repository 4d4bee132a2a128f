"""Streaming sources (SRC1 streaming form, SURVEY §2.8).

The reference's hook is a long-lived async event processor; its Spark-native
equivalent is a file-source stream over the event log directory (new files appear per
rollover window — exactly what the sink writes) or any other streaming source mapped
into HOOK_INPUT_SCHEMA / QUERY_EVENTS_SCHEMA.

STR2 note (bounded queue / load shedding): Spark's source backpressure is
``maxFilesPerTrigger`` / ``maxOffsetsPerTrigger`` — events buffer in the source
instead of being dropped; a documented semantic upgrade over the reference's
at-most-once queue (EventLogger.java:155-166).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import QUERY_EVENTS_SCHEMA


def read_event_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream QueryEvents rows from a (growing) log directory."""
    reader = spark.readStream.schema(QUERY_EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def read_events_table_stream(
    spark: SparkSession,
    path: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream the analytics `events` shape from a directory of parquet files."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format("parquet").load(path)
