"""[EXT] Random-projection dimensionality reduction for embedding columns.

Achlioptas-style projection: a fixed {+1,-1} matrix R (out_dim x in_dim), with
y = R x. Johnson-Lindenstrauss: E[y_i^2] = ||x||^2 per component, so
||y||^2 / (out_dim * ||x||^2) concentrates around 1 and pairwise distances are
preserved within (1 +- eps) — the standard pre-step that makes ANN/clustering
cheaper at 100 TB (64 -> 8 dims is an 8x shrink of every downstream shuffle).

The matrix is CONTENT-ADDRESSED, not random-state-addressed: sign(i,j) comes from
md5(f"{salt}:{i}:{j}"), so every engine, every run, and every oracle reproduces the
identical matrix with no seed plumbing (same rationale as ext/sampling.py's md5).

Two execution paths:
- ``random_project`` — pure Column expressions over exact decimals (sign * decimal
  element, exact decimal sum per component, one final ROUND). Shuffle-free narrow
  map; fully reproducible in DuckDB SQL, hence oracle-checkable. The expression
  tree is out_dim * in_dim terms — fine for cheap widths (8x64 here); JVM codegen
  keeps it whole-stage.
- ``random_project_fast`` — Arrow-batched pandas UDF doing one numpy matmul per
  batch. The scale path for large in_dim; float arithmetic, so it matches the
  exact path to ~1e-6, not bit-for-bit.
"""

from __future__ import annotations

import hashlib
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType

__all__ = ["projection_signs", "nano_array", "random_project", "random_project_fast"]

NANO = 1_000_000_000  # fixed-point scale: 9 decimal digits


def projection_signs(out_dim: int, in_dim: int, salt: str = "rp") -> list[list[int]]:
    """Deterministic {+1,-1} matrix: +1 iff the first md5 nibble of 'salt:i:j' is
    < 8 (exactly half the nibble space — unbiased)."""
    return [
        [
            1 if int(hashlib.md5(f"{salt}:{i}:{j}".encode()).hexdigest()[0], 16) < 8 else -1
            for j in range(in_dim)
        ]
        for i in range(out_dim)
    ]


def nano_array(vec: Column, scale_pow: int = 9) -> Column:
    """Vector as exact fixed-point longs: float -> double (exact widening) ->
    decimal(18,scale) (one deterministic rounding) -> *10^scale -> long (exact).

    Why not stay in decimals: a 64-term Spark decimal add chain overflows precision
    38 and silently REDUCES SCALE to 6 (DecimalType(38,6) — verified), introducing
    intermediate rounding DuckDB doesn't do. Integer sums have no such cliff.

    Materialize this ONCE per row (withColumn) and fold over the materialized
    array: inlining the cast chain into every one of out_dim x in_dim terms builds
    a 1000+-node expression tree that Catalyst spends seconds analyzing (measured
    7s+ on 500 rows) — the classic interpreted-HOF/expression-blowup trap."""
    return F.transform(
        vec,
        lambda x: (x.cast("double").cast(f"decimal(18,{scale_pow})") * (10**scale_pow)).cast(
            "long"
        ),
    )


def _component(nano_col: Column, signs_row: list[int], scale: int) -> Column:
    """round( (sum_j nano_j * sign_j) / 1e9 , scale) via one zip_with + one fold —
    exact long arithmetic; fold order is irrelevant to the integer sum."""
    signs = F.array(*[F.lit(s).cast("long") for s in signs_row])
    total = F.aggregate(
        F.zip_with(nano_col, signs, lambda x, s: x * s),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.round(total.cast("double") / F.lit(float(NANO)), scale)


def random_project(
    df: DataFrame,
    vec_col: str,
    out_dim: int,
    in_dim: int,
    salt: str = "rp",
    out_col: str = "projected",
    scale: int = 6,
) -> DataFrame:
    """Exact-decimal projection: adds ``out_col`` = array<double> of out_dim rounded
    components. Narrow map, zero shuffle, oracle-reproducible."""
    signs = projection_signs(out_dim, in_dim, salt)
    with_nano = df.withColumn("_nano", nano_array(F.col(vec_col)))
    comps = [_component(F.col("_nano"), row, scale) for row in signs]
    return with_nano.withColumn(out_col, F.array(*comps)).drop("_nano")


def random_project_fast(
    df: DataFrame,
    vec_col: str,
    out_dim: int,
    in_dim: int,
    salt: str = "rp",
    out_col: str = "projected",
) -> DataFrame:
    """numpy-matmul path: one BLAS call per Arrow batch. Preferred when
    out_dim * in_dim makes the expression tree silly (e.g. 4096 -> 128)."""
    signs = np.array(projection_signs(out_dim, in_dim, salt), dtype=np.float64)

    @F.pandas_udf(ArrayType(DoubleType()))
    def _project(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy())  # (batch, in_dim)
        out = mat @ signs.T  # (batch, out_dim)
        return pd.Series(list(out))

    return df.withColumn(out_col, _project(F.col(vec_col)))
