"""[EXT] One-pass table profiling: per-column null/distinct/min/max stats.

The data-quality pre-flight every large ingestion runs: before pointing a training
pipeline at 100 TB, know which columns are null-ridden, near-constant, or wider
than expected. The whole profile is ONE aggregation job over one scan — a naive
per-column loop launches |cols| jobs and |cols| scans.

``exact=False`` (default) uses HLL++ ``approx_count_distinct`` for cardinality —
no per-column Expand, constant memory, the only sane form at corpus scale.
``exact=True`` uses ``count_distinct`` (Spark compiles multiple distinct aggregates
into one scan with an Expand: rows are replicated |distinct-aggs| ways before the
shuffle — acceptable for oracle-checked runs at test scale, wasteful at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-column profile in one aggregation pass.

    Returns one row per column: (column, n_rows, n_nulls, null_ratio, n_distinct,
    min_value, max_value) with min/max rendered as strings so heterogeneous column
    types fit one schema. Column order of the output follows ``cols``.
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("long").alias(f"_null{i}")
        )
        if exact:
            aggs.append(F.count_distinct(col).cast("long").alias(f"_dist{i}"))
        else:
            aggs.append(F.approx_count_distinct(col, rsd).cast("long").alias(f"_dist{i}"))
        aggs.append(F.min(col).cast("string").alias(f"_min{i}"))
        aggs.append(F.max(col).cast("string").alias(f"_max{i}"))
    wide = df.agg(*aggs)

    # unpivot the single wide row into one row per column (stack is a narrow map
    # over a 1-row frame — free)
    stack_args = []
    for i, c in enumerate(cols):
        stack_args.append(f"'{c}', _null{i}, _dist{i}, _min{i}, _max{i}")
    stacked = wide.selectExpr(
        "_n",
        f"stack({len(cols)}, {', '.join(stack_args)}) "
        "as (column, n_nulls, n_distinct, min_value, max_value)",
    )
    return stacked.select(
        "column",
        F.col("_n").alias("n_rows"),
        "n_nulls",
        F.round(F.col("n_nulls") / F.greatest(F.col("_n"), F.lit(1)), 6).alias(
            "null_ratio"
        ),
        "n_distinct",
        "min_value",
        "max_value",
    )
