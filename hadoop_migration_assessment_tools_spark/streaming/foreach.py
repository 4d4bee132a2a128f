"""STR3: exactly-once-by-idempotence batch sink (foreachBatch).

The reference retries writes with quadratic backoff and can duplicate records on
retry-after-partial-write (EventLogger.java:196-239 — SURVEY §7 known hard part 4).
The Spark-native answer: route each micro-batch through ``foreachBatch`` into a
batch-id-addressed location with overwrite semantics — a replayed batch (after
checkpoint recovery) rewrites exactly the same location, so duplicates are impossible
regardless of how many times the batch is retried.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


class IdempotentBatchSink:
    """foreachBatch target writing each micro-batch to ``<base>/batch_id=<n>`` with
    overwrite — replay-safe by construction. Readable back as one dataset with
    ``spark.read.parquet(base)`` (batch_id becomes a partition column)."""

    def __init__(self, base_dir: str, fmt: str = "parquet") -> None:
        self.base_dir = base_dir
        self.fmt = fmt

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .format(self.fmt)
            .save(f"{self.base_dir}/batch_id={batch_id}")
        )

    def attach(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        trigger_seconds: int | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        writer = stream_df.writeStream.foreachBatch(self).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_seconds is not None:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()
