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

__all__ = ["point_in_interval_join", "point_in_interval_join_salted"]


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
    Column names must not collide across the two inputs (rename first).

    Outer-join caveat (ADVICE r9, documented semantics): the interval side is
    replicated once per covered time bucket, so ``how='right'``/``'full'``
    emit each UNMATCHED interval once per bucket replica, not once (matched
    pairs are unaffected — each meets in exactly one bucket, the point's).
    A right-join caller must therefore aggregate duplication-insensitively —
    group by the interval's columns and count only point-side values, as
    events_session_concurrency does to keep zero-concurrency incidents. The
    salted variant below RAISES on right/full instead: salting multiplies the
    duplication by salt_buckets and it has no in-repo caller needing it."""
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


def point_in_interval_join_salted(
    points: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 1800,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """The skew composition (VERDICT r8 #7): same semantics as
    ``point_in_interval_join``, with the equi-key widened to (bucket, salt) —
    the plans/skew.py move applied to the time dimension. A HOT time bucket
    (one incident hour holding a large share of 100 TB of points) hashes to
    one reducer under the plain bucket key; salting the point side and
    replicating each interval-bucket replica across every salt value splits
    that bucket across ``salt_buckets`` tasks while each (point, interval)
    pair still meets exactly once — in the point's (bucket, salt) cell — so
    results are identical row-for-row (pytest-pinned) and the join stays a
    structural equi join (no BNLJ possible). Cost: the interval side carries
    ``salt_buckets`` x its replica count — the usual salt trade, cheap when
    intervals are the small side. AQE's skew-join is the runtime alternative;
    this is the guaranteed-by-construction form.

    ``how`` is restricted to inner/left (ADVICE r9): MATCHED pairs meet
    exactly once under any ``how``, but a right/full outer join would emit
    each UNMATCHED interval once per (bucket replica x salt) instead of once
    — the replication that makes the equi key work is invisible to matched
    rows and multiplied into unmatched ones. (The plain variant already
    duplicates unmatched intervals per bucket replica, which is why it
    carries the same restriction.)"""
    if how not in ("inner", "left"):
        raise ValueError(
            f"how={how!r} unsupported: unmatched intervals would be emitted "
            "once per (bucket replica x salt); use inner or left"
        )
    w = F.lit(int(bucket_seconds)).cast("long")
    n = int(salt_buckets)
    pb = points.withColumn(
        "_bkt", F.floor(F.unix_timestamp(F.col(ts_col)) / w).cast("long")
    ).withColumn(
        # deterministic per-row spread: hash the timestamp AND a row id so a
        # hot bucket full of IDENTICAL timestamps still fans across salts
        "_salt",
        F.pmod(
            F.xxhash64(F.col(ts_col), F.monotonically_increasing_id()), F.lit(n)
        ).cast("int"),
    )
    ib = intervals.withColumn(
        "_ibkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / w).cast("long"),
                F.floor(F.unix_timestamp(F.col(end_col)) / w).cast("long"),
            )
        ),
    ).withColumn("_isalt", F.explode(F.array(*[F.lit(i) for i in range(n)])))
    joined = pb.join(
        ib,
        (F.col("_bkt") == F.col("_ibkt"))
        & (F.col("_salt") == F.col("_isalt"))
        & (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) <= F.col(end_col)),
        how,
    )
    return joined.drop("_bkt", "_ibkt", "_salt", "_isalt")
