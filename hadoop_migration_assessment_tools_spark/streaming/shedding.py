"""STR2 literal mode: bounded-queue load shedding (at-most-once), reference-faithful.

The reference hook enqueues events into a bounded in-memory queue (capacity 64 by
default) and DROPS the event with a warning when the queue is full — at-most-once
delivery under overload (EventLogger.java:155-166, LoggerVarsConfig.java:25-27).
Spark's native backpressure (maxFilesPerTrigger/maxOffsetsPerTrigger) buffers instead
of dropping — a documented semantic upgrade — but byte-faithful replay of the
reference's overload behavior needs a literal drop mode. This module provides it at
the Spark granularity: a per-trigger capacity applied inside foreachBatch, keeping
the FIRST `capacity` events in event-time order (the queue admits arrivals in order)
and reporting the shed count, mirroring the reference's dropped-event warn counter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

DEFAULT_QUEUE_CAPACITY = 64  # LoggerVarsConfig default


def shed_overflow(
    batch_df: DataFrame,
    capacity: int = DEFAULT_QUEUE_CAPACITY,
    order_cols: Sequence[str] = ("EventTime",),
    group_cols: Sequence[str] = (),
) -> tuple[DataFrame, int]:
    """Keep the first `capacity` rows (per group) in arrival order; drop the rest.

    Returns ``(kept_df, n_dropped)``. With ``group_cols`` the capacity applies per
    group (e.g. per logger/writer id — each reference hook instance has its own
    queue); without, it is a global per-trigger cap, which funnels the batch through
    one window task — acceptable because capacity is tiny by definition (the
    reference's queue is 64 events), so cap the damage by filtering first at scale.

    The kept set is deterministic: ties beyond `order_cols` break on the remaining
    columns' natural order via a monotonic row digest, so replays shed identically.
    """
    if capacity < 0:
        raise ValueError(f"capacity must be >= 0, got {capacity}")
    order = [F.col(c).asc_nulls_last() for c in order_cols]
    # deterministic tie-break: full-row hash (stable across replays of the same data)
    order.append(F.xxhash64(*[F.col(c) for c in batch_df.columns]))
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order) if group_cols \
        else Window.orderBy(*order)
    ranked = batch_df.withColumn("__q_pos", F.row_number().over(w))
    kept = ranked.filter(F.col("__q_pos") <= capacity).drop("__q_pos")
    # one job for the shed count: total and kept from the same ranked pass
    # (was two separate count() actions re-ranking the batch)
    counts = ranked.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.when(F.col("__q_pos") <= capacity, 1).otherwise(0)).alias("_k"),
    ).first()
    return kept, int(counts["_n"]) - int(counts["_k"] or 0)
