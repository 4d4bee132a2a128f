"""[EXT] Streaming sequence packing: chunk + FFD-pack a document stream into fixed
token budgets as data arrives (VERDICT r3 next-round #4).

Semantics: each micro-batch is an independent packing unit. That is the RIGHT
streaming semantics for training-data prep — a bin must be emittable (sealed) when
its batch commits; keeping bins open across triggers would mean unbounded state and
bins that never finalize. The cost is slightly lower fill near batch boundaries,
identical to the partition-local trade ``ext.packing.pack_sequences`` already makes
(every partition sees the same length distribution, so waste stays within a few
percent at corpus scale).

Bin ids stay globally unique across the stream's lifetime by offsetting each
micro-batch's ids with ``batch_id * num_partitions * _BIN_STRIDE`` — the same
stride discipline the batch packer uses per partition, extended one level up.

Parity contract (tested in tests/test_streaming.py): with a single availableNow
micro-batch the stream output is IDENTICAL to the batch ``pack_sequences`` result
(same hash partitioning, same FFD order, batch offset 0); with multiple
micro-batches the packing INVARIANTS hold (exactly-once, budget, unique bins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..ext.packing import _BIN_STRIDE, pack_sequences


def pack_sequences_stream(
    stream_df: DataFrame,
    token_col: str,
    output_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    budget: int = 2048,
    num_partitions: int = 32,
    available_now: bool = True,
) -> StreamingQuery:
    """Pack a streaming DataFrame of (id, token-count) rows into training bins.

    Each micro-batch runs the batch FFD packer (groupBy + applyInPandas is not
    stream-legal, so the stateless per-batch form runs inside foreachBatch — the
    standard pattern for batch-only operators, same as the avro sink's
    ``write_stream``) and writes (id, n_tokens, bin_id, overflow) to
    ``output_path/batch_id=<n>`` with OVERWRITE — the IdempotentBatchSink
    discipline (streaming/foreach.py). A batch replayed after a mid-write crash
    rewrites exactly its own location, so recovery is exactly-once across
    restarts, not just within a session (pinned by the kill-restart test in
    tests/test_streaming.py). Read back with ``spark.read.parquet(output_path)``
    (batch_id surfaces as a partition column).
    """
    from pyspark.sql import functions as F

    batch_stride = num_partitions * _BIN_STRIDE

    def pack_batch(batch_df: DataFrame, batch_id: int) -> None:
        packed = pack_sequences(
            batch_df, token_col, id_col, budget=budget, num_partitions=num_partitions
        ).withColumn("bin_id", F.col("bin_id") + F.lit(batch_id * batch_stride))
        packed.write.mode("overwrite").parquet(f"{output_path}/batch_id={batch_id}")

    writer = (
        stream_df.writeStream.foreachBatch(pack_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
