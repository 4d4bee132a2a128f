"""Date-partitioned rolling sink (SRC2-SRC4).

Reference behavior being re-expressed (SURVEY §1.3, §2.1):
- one directory per UTC day (DatePartitionedRecordsWriterFactory.java:182-190,204-206)
- a new file per (writer × rollover window), prefix ``dwhassessment_``
  (:208-214; LoggingHookConstants.java:29)
- rollover at min(start+interval, next UTC midnight) (:196-202)

Spark-native mapping:
- day directory        → ``partitionBy(partition_col)`` hive-style ``EventDate=YYYY-MM-DD``
- file-per-window      → batch: ``maxRecordsPerFile``; streaming: one file set per micro-batch
                         with ``trigger(processingTime=...)`` playing the rollover tick
                         (EventLogger.java:112-121)
- flush-per-record     → per-commit durability via the file-sink commit protocol; this is an
                         *upgrade* (atomic rename vs partial file on crash) — SURVEY §7 known
                         hard part 4
- single writer thread → one task per output partition; no global coordination needed.

Scale notes: hive-style date partitioning is what makes downstream date-range scans
partition-prunable at 100 TB; never write one monolithic dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import DEFAULT_ROLLOVER_INTERVAL_SECONDS

PARTITION_COL = "EventDate"


def _is_missing_datasource_error(exc: Exception) -> bool:
    return "Failed to find data source" in str(exc)


def with_event_date(df: DataFrame, ts_cols: tuple[str, str] = ("StartTime", "EndTime")) -> DataFrame:
    """Derive the UTC day partition column from the first non-null event timestamp.

    The reference partitions by *processing-time* wall clock (writer-side date); we partition
    by the record's own timestamp, which is deterministic and replayable (documented upgrade —
    SURVEY §2.8 STR7 note). Session timezone is UTC, so to_date == UTC day.
    """
    return df.withColumn(
        PARTITION_COL, F.to_date(F.coalesce(*[F.col(c) for c in ts_cols]))
    )


class DatePartitionedSink:
    """Writes QueryEvents rows into a date-partitioned table layout.

    fmt='parquet' (default) or 'avro' (matches the reference's container format when the
    spark-avro module is on the classpath; falls back to parquet with a warning otherwise).
    """

    def __init__(
        self,
        base_dir: str,
        fmt: str = "parquet",
        rollover_records: int | None = 1_000_000,
        partition_col: str = PARTITION_COL,
    ) -> None:
        self.base_dir = base_dir
        self.fmt = fmt
        self.rollover_records = rollover_records
        self.partition_col = partition_col

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
        writer = df.write.mode(mode).partitionBy(self.partition_col)
        if self.rollover_records:
            # File-size rollover equivalent (SRC4): caps records per physical file the way
            # the reference's time-based rotation caps records per Avro container.
            writer = writer.option("maxRecordsPerFile", self.rollover_records)
        try:
            writer.format(self.fmt).save(self.base_dir)
        except Exception as exc:  # spark-avro module absent in some deployments
            if self.fmt == "avro" and _is_missing_datasource_error(exc):
                import warnings

                warnings.warn("spark-avro data source unavailable; falling back to parquet")
                self.fmt = "parquet"
                writer.format("parquet").save(self.base_dir)
            else:
                raise

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
        flush-per-record (STR3 upgrade).
        """
        if self.partition_col not in df.columns:
            df = with_event_date(df)
        return (
            df.writeStream.format(self.fmt)
            .option("checkpointLocation", checkpoint_dir)
            .option("path", self.base_dir)
            .partitionBy(self.partition_col)
            .trigger(processingTime=f"{trigger_seconds} seconds")
            .outputMode(output_mode)
            .start()
        )
