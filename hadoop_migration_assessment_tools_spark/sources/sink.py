"""Date-partitioned rolling sink (SRC2-SRC4).

Reference behavior being re-expressed (SURVEY §1.3, §2.1):
- one directory per UTC day (DatePartitionedRecordsWriterFactory.java:182-190,204-206)
- a new file per (writer × rollover window), prefix ``dwhassessment_``
  (:208-214; LoggingHookConstants.java:29)
- rollover at min(start+interval, next UTC midnight) (:196-202)
- Avro OCF as the container format (RecordsWriter.java:35-60)

Spark-native mapping:
- day directory        → parquet: hive-style ``EventDate=YYYY-MM-DD`` via ``partitionBy``;
                         avro: bare ``YYYY-MM-DD`` dirs exactly like the reference
- file-per-window      → parquet: ``maxRecordsPerFile``; avro: per-task
                         ``RollingOcfWriterFactory`` with the reference's
                         ``dwhassessment_<instant>_<loggerId>.avro`` naming
- flush-per-record     → avro path flushes a block per record like the reference
                         (DatePartitionedRecordsWriterFactory.java:106-107); parquet
                         path commits per file (atomic-rename upgrade — SURVEY §7
                         known hard part 4)
- single writer thread → one task per output partition; each task is its own logger
                         instance with its own loggerId (SET1: many instances × days
                         × files read back as one dataset).

Scale notes: date partitioning is what makes downstream date-range scans
partition-prunable at 100 TB; never write one monolithic dir. The avro path writes
one file per (task, day) — distribution comes from Spark's partitioning of the
DataFrame, not from a driver-side loop.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import DEFAULT_ROLLOVER_INTERVAL_SECONDS

PARTITION_COL = "EventDate"


def with_event_date(df: DataFrame, ts_cols: tuple[str, str] = ("StartTime", "EndTime")) -> DataFrame:
    """Derive the UTC day partition column from the first non-null event timestamp.

    The reference partitions by *processing-time* wall clock (writer-side date); we partition
    by the record's own timestamp, which is deterministic and replayable (documented upgrade —
    SURVEY §2.8 STR7 note). Session timezone is UTC, so to_date == UTC day.
    """
    return df.withColumn(
        PARTITION_COL, F.to_date(F.coalesce(*[F.col(c) for c in ts_cols]))
    )


def _avro_partition_writer(
    base_dir: str,
    avsc: dict,
    partition_col: str,
    rollover_records: int | None,
    codec: str,
):
    """Executor-side closure: writes one partition's rows into per-day OCF files with
    reference-faithful names. One loggerId per task (= one logger instance)."""

    def write_rows(rows: Iterator) -> Iterator[int]:
        from .avro_ocf import OcfWriter, SystemClock, format_log_instant, generate_logger_id

        clock = SystemClock()
        logger_id = generate_logger_id()
        from ..config import DWH_ASSESSMENT_FILE_PREFIX

        open_writers: dict[str, tuple[OcfWriter, int]] = {}
        written = 0

        def open_writer(day: str) -> OcfWriter:
            day_dir = os.path.join(base_dir, day)
            os.makedirs(day_dir, exist_ok=True)
            name = (
                DWH_ASSESSMENT_FILE_PREFIX
                + format_log_instant(clock.instant())
                + "_"
                + logger_id
                + ".avro"
            )
            return OcfWriter(open(os.path.join(day_dir, name), "wb"), avsc, codec=codec)

        for row in rows:
            d = row[partition_col]
            day = d.isoformat() if d is not None else "__unknown_date__"
            writer, count = open_writers.get(day, (None, 0))
            if writer is None or (rollover_records and count >= rollover_records):
                if writer is not None:
                    writer.close()
                writer, count = open_writer(day), 0
            rec = row.asDict(recursive=True)
            rec.pop(partition_col, None)  # the day lives in the dir name, not the record
            writer.append(rec)
            open_writers[day] = (writer, count + 1)
            written += 1
        for writer, _ in open_writers.values():
            writer.close()
        yield written

    return write_rows


class DatePartitionedSink:
    """Writes QueryEvents rows into a date-partitioned table layout.

    fmt='parquet' (default, hive-style partition dirs) or 'avro' (the reference's
    container format, written by the built-in pure-Python OCF codec — no spark-avro
    needed, no silent format fallback)."""

    def __init__(
        self,
        base_dir: str,
        fmt: str = "parquet",
        rollover_records: int | None = 1_000_000,
        partition_col: str = PARTITION_COL,
        avro_codec: str = "deflate",
    ) -> None:
        if fmt not in ("parquet", "avro"):
            raise ValueError(f"unsupported sink format {fmt!r}")
        self.base_dir = base_dir
        self.fmt = fmt
        self.rollover_records = rollover_records
        self.partition_col = partition_col
        self.avro_codec = avro_codec

    def write_batch(self, df: DataFrame, mode: str = "append", time_sorted: bool = True) -> None:
        """Batch write, partitioned by UTC event date (SRC3).

        time_sorted (SRT1): records land in event-time order within each file, the
        Spark-native form of the reference's arrival-ordered, instant-named files
        (DatePartitionedRecordsWriterFactory.java:208-214). Cheap (intra-partition
        sort, no shuffle) and makes time-range scans of a file monotone.
        """
        if self.partition_col not in df.columns:
            df = with_event_date(df)
        if time_sorted:
            df = df.sortWithinPartitions(
                F.coalesce(F.col("StartTime"), F.col("EndTime"))
                if "StartTime" in df.columns
                else F.col(self.partition_col)
            )
        if self.fmt == "avro":
            self._write_batch_avro(df)
            return
        writer = df.write.mode(mode).partitionBy(self.partition_col)
        if self.rollover_records:
            # File-size rollover equivalent (SRC4): caps records per physical file the way
            # the reference's time-based rotation caps records per Avro container.
            writer = writer.option("maxRecordsPerFile", self.rollover_records)
        writer.format(self.fmt).save(self.base_dir)

    def _write_batch_avro(self, df: DataFrame) -> int:
        """SRC2: distributed OCF write — one logger instance per Spark task, one file
        per (task, UTC day), named ``dwhassessment_<instant>_<loggerId>.avro`` exactly
        like the reference (DatePartitionedRecordsWriterFactory.java:208-214)."""
        from .avro_ocf import struct_to_avsc

        record_schema = df.drop(self.partition_col).schema
        avsc = struct_to_avsc(record_schema)
        counts = df.rdd.mapPartitions(
            _avro_partition_writer(
                self.base_dir,
                avsc,
                self.partition_col,
                self.rollover_records,
                self.avro_codec,
            )
        ).collect()
        return sum(counts)

    def write_stream(
        self,
        df: DataFrame,
        checkpoint_dir: str,
        trigger_seconds: int = DEFAULT_ROLLOVER_INTERVAL_SECONDS,
        output_mode: str = "append",
    ) -> StreamingQuery:
        """Streaming write: micro-batch trigger == rollover tick (STR1/SRC4).

        Each trigger commits a new set of files under the day partition — the exact
        time-rolled layout of the reference, with exactly-once commit instead of
        flush-per-record (STR3 upgrade). The avro path runs through foreachBatch
        (idempotent per-batch OCF write; each micro-batch = one rollover window)."""
        if self.partition_col not in df.columns:
            df = with_event_date(df)
        if self.fmt == "avro":
            return (
                df.writeStream.foreachBatch(
                    lambda batch_df, _epoch: self._write_batch_avro(batch_df)
                )
                .option("checkpointLocation", checkpoint_dir)
                .trigger(processingTime=f"{trigger_seconds} seconds")
                .outputMode(output_mode)
                .start()
            )
        return (
            df.writeStream.format(self.fmt)
            .option("checkpointLocation", checkpoint_dir)
            .option("path", self.base_dir)
            .partitionBy(self.partition_col)
            .trigger(processingTime=f"{trigger_seconds} seconds")
            .outputMode(output_mode)
            .start()
        )


def compact_log_tree(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> dict:
    """Small-file compaction for a date-partitioned log tree — the standard
    maintenance pass for any long-running rollover sink (SRC4 writes many
    rollover-bounded files per day; a year of hourly rollovers is ~9k files/logger,
    and at 100 TB the NameNode/list-cost and per-file task overhead dominate scans).

    Rewrites each EventDate partition into ceil(partition_bytes / target_bytes)
    files via a staging directory + atomic-ish swap (stage, verify count, replace).
    Returns {files_before, files_after, rows}. Parquet only: the avro tree's file
    layout IS the reference's interop contract (dwhassessment_* names), so avro
    trees must not be compacted — use the parquet mirror for analytics instead.
    """
    import glob
    import math
    import os
    import shutil

    if fmt != "parquet":
        raise ValueError("compaction is parquet-only; avro layout is an interop contract")

    def _count_files(p: str) -> int:
        return len(glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True))

    files_before = _count_files(path)
    df = spark.read.parquet(path)
    rows = df.count()
    total_bytes = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    n_files = max(1, math.ceil(total_bytes / target_bytes))
    staging = path.rstrip("/") + "__compact_staging"
    (
        df.repartition(n_files)
        .write.mode("overwrite")
        .partitionBy("EventDate")
        .parquet(staging)
    )
    back = spark.read.parquet(staging)
    if back.count() != rows:  # verify before the swap — never lose data to a bad write
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError("compaction staging row count mismatch; original left intact")
    shutil.rmtree(path)
    os.rename(staging, path)
    return {"files_before": files_before, "files_after": _count_files(path), "rows": rows}
