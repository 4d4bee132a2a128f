"""[EXT] Embedding quantization: int8 codes + per-vector scale.

At 100 TB of float32 embeddings, symmetric int8 scalar quantization cuts storage
and scan bytes 4× with a bounded reconstruction error (≤ scale/2 per component,
scale = max|x|/127). Everything is JVM-side array HOFs — one narrow map, no
shuffle, no UDF.

HOF discipline (NOTES.md perf lesson): the per-vector scale is materialized as a
plain column BEFORE any lambda references it — a subexpression inlined into a
``transform`` lambda is re-evaluated per element (64 extra max-aggregations per
vector for a 64-dim corpus)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _max_abs(vec: Column) -> Column:
    return F.aggregate(
        F.transform(vec, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, v),
    )


def with_int8_quantization(
    df: DataFrame, vec_col: str = "embedding", prefix: str = "q"
) -> DataFrame:
    """Add ``{prefix}_scale`` (double) and ``{prefix}_codes`` (array<int> in
    [-127, 127]) columns. Zero vectors get scale 0 and all-zero codes."""
    scale_col, codes_col = f"{prefix}_scale", f"{prefix}_codes"
    out = df.withColumn(scale_col, _max_abs(F.col(vec_col)) / F.lit(127.0))
    codes = F.when(
        F.col(scale_col) > 0,
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") / F.col(scale_col), 0).cast("int"),
        ),
    ).otherwise(F.transform(F.col(vec_col), lambda x: F.lit(0)))
    return out.withColumn(codes_col, codes)


def reconstruction_error(
    vec_col: str = "embedding", scale_col: str = "q_scale", codes_col: str = "q_codes"
) -> Column:
    """Max absolute per-component reconstruction error of the quantized vector."""
    return F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col(codes_col),
            lambda x, c: F.abs(x.cast("double") - c.cast("double") * F.col(scale_col)),
        ),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, v),
    )
