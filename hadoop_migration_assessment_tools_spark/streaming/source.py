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


def read_event_stream_avro(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Tail a reference-layout Avro tree (``<base>/<YYYY-MM-DD>/dwhassessment_*.avro``)
    as a stream — the consumption mode the reference's own downstream pipeline uses
    (new files appear per rollover window; SRC4). The ``binaryFile`` streaming source
    tracks new files; each decodes executor-side with the built-in OCF codec
    (sources/avro_ocf.py) inside ``mapInPandas`` — streaming-legal, Arrow-batched,
    one file per input row so memory is bounded by rollover file size.

    Returns QUERY_EVENTS_SCHEMA columns plus ``EventDate`` (from the day directory),
    matching the batch reader's shape (readers.read_event_log fmt='avro')."""
    from pyspark.sql import functions as F, types as T

    from ..sources.avro_ocf import decode_ocf_file_to_rows

    out_schema = T.StructType(
        list(QUERY_EVENTS_SCHEMA.fields) + [T.StructField("EventDate", T.DateType(), True)]
    )
    reader = (
        spark.readStream.format("binaryFile")
        # streaming sources require an explicit schema; binaryFile's is fixed
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", "*.avro")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    binary = reader.load(path).select("path", "content")

    names = [f.name for f in out_schema.fields]

    def decode(batches):
        import datetime as dt
        import os

        import pandas as pd

        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                parent = os.path.basename(os.path.dirname(p))
                try:
                    day = dt.date.fromisoformat(parent)
                except ValueError:
                    day = None
                for tup in decode_ocf_file_to_rows(bytes(content), QUERY_EVENTS_SCHEMA):
                    rows.append(tup + (day,))
            yield pd.DataFrame(rows, columns=names)

    return binary.mapInPandas(decode, schema=out_schema)


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
