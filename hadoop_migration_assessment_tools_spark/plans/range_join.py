"""Range (non-equi interval) join as a scalable bucket+refine equi-join.

Spark's native plan for ``fact JOIN dim ON v >= lo AND v < hi`` is a
BroadcastNestedLoopJoin — O(|fact| x |dim|) comparisons, and a non-starter when the
dim side is too big to broadcast (it degenerates to a cartesian product). The classic
scale-out strategy (used by Spark's own range-join hints in Databricks runtime and by
Flink/Trino interval joins) is:

1. bucket the fact side once: ``bucket = floor(value / width)``;
2. explode each dim interval into every bucket it overlaps
   (``sequence(floor(lo/width), floor(hi/width))`` — intervals are typically narrow,
   so this is a small constant blow-up);
3. equi-join on the bucket id — shuffle-partitionable on both sides, AQE-skew-safe;
4. refine with the exact range predicate to discard same-bucket non-overlaps.

The result is identical to the nested-loop semantics for inner joins, but the plan is
a plain shuffled hash/sort-merge equi-join: it scales to a dim side of any size and
never materializes the cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_BUCKET = "__range_join_bucket"


def range_join(
    fact: DataFrame,
    dim: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Inner-join ``fact`` rows to ``dim`` intervals with ``lo <= value < hi``.

    ``bucket_width`` should be on the order of the typical interval length: too small
    multiplies the exploded dim rows, too large puts many intervals in each bucket and
    shifts work to the refine filter. ``broadcast_dim=True`` broadcasts the exploded
    dim (the common small-band case — zero shuffle); with ``False`` both sides shuffle
    on the bucket id, which is the scale path for huge dim sides.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    fact_b = fact.withColumn(_BUCKET, F.floor(F.col(value_col) / F.lit(bucket_width)))
    dim_b = dim.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)),
                F.floor(F.col(hi_col) / F.lit(bucket_width)),
            )
        ),
    )
    if broadcast_dim:
        dim_b = F.broadcast(dim_b)
    return (
        fact_b.join(dim_b, on=_BUCKET, how="inner")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop(_BUCKET)
    )
