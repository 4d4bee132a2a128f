"""Bucketed point-in-interval join — the scale-safe form of the range join
Spark would otherwise plan as a broadcast-nested-loop (fine for a tiny interval
side, a disaster when BOTH sides are big).

The standard trick (public lore from every timeseries engine): pick a bucket
width W, replicate each interval into every ceil(len/W)+1 time bucket it
overlaps (a narrow map — ``explode(sequence(...))``, no shuffle to build), put
each point into its single bucket, then EQUI-join on the bucket and refine with
the exact range predicate. Each (point, interval) pair meets in exactly ONE
bucket — the point's — so no post-join dedup is needed. Both sides shuffle
once on the bucket key; matching is bounded per bucket instead of all-pairs.

Picking W: ~the typical interval length. Too small → interval replication
grows (len/W copies); too large → buckets get dense and the refine filter does
more work. Either way the plan stays a hash/sort-merge EQUI join — the
catastrophic BNLJ shape is structurally impossible. Long-tail intervals only
cost extra replicas, never correctness. Skewed time ranges (one hot hour at
100 TB) respond to AQE skew-join or salting the bucket key; see plans/skew.py.

This is the interval cousin of plans/range_join.py's value-band join (JN
beyond-ref family; no reference citation — the reference has no join surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["point_in_interval_join"]


def point_in_interval_join(
    points: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 1800,
    how: str = "inner",
) -> DataFrame:
    """Join each point row (timestamp ``ts_col``) to every interval row whose
    closed interval [start_col, end_col] contains it. Returns the combined
    columns (point columns + interval columns); callers select/aggregate.
    Column names must not collide across the two inputs (rename first)."""
    w = F.lit(int(bucket_seconds)).cast("long")
    pb = points.withColumn(
        "_bkt", F.floor(F.unix_timestamp(F.col(ts_col)) / w).cast("long")
    )
    ib = intervals.withColumn(
        "_ibkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / w).cast("long"),
                F.floor(F.unix_timestamp(F.col(end_col)) / w).cast("long"),
            )
        ),
    )
    joined = pb.join(
        ib,
        (F.col("_bkt") == F.col("_ibkt"))
        & (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) <= F.col(end_col)),
        how,
    )
    return joined.drop("_bkt", "_ibkt")
