"""Hilbert-curve clustering — the locality upgrade over Z-order (Morton).

Both curves linearize a 2-D bucket grid so range-partitioned files cover small
rectangles of the original dimensions (plans/zorder.py explains why that is
THE selective-scan lever at 100 TB). The difference is discontinuities: the
Morton curve jumps across the grid at every power-of-two boundary, so an
equal-ROW-COUNT file cut (what ``repartitionByRange`` actually produces) can
straddle a jump and inherit a huge min/max rectangle; the Hilbert curve is
continuous (every step moves one cell), so arbitrary cut points stay local.
Measured on the real orders table at 48 equal-count files (the oracled
registry row orders_hilbert_locality): total covered bucket-rectangle area
~73k for Hilbert vs ~138k for Z-order at sf0.01 — parquet min/max pruning
reads roughly half the files for the same box predicate. At power-of-4
ALIGNED prefixes the two curves tile identically (both give perfect
subsquares) — the measured edge is precisely about unaligned cuts, which is
what real file sizing produces.

The xy -> d mapping is the classic Lam-Shapiro iterative form (public
algorithm; Wikipedia "Hilbert curve", converted from the loop to an unrolled
per-level expression chain): per level s = 2^(bits-1) .. 1,

    rx = (x & s) > 0;  ry = (y & s) > 0
    d += s^2 * ((3 * rx) XOR ry)
    if ry == 0:
        if rx == 1: x, y = s-1-x, s-1-y     # flip
        x, y = y, x                          # transpose

Exact integer arithmetic throughout — identical in Spark column expressions,
DuckDB SQL (the oracle generates the same unrolled chain as CTEs) and pure
Python (the pytest replay).

No reference citation: the reference has no layout surface ([EXT] scope).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["with_hilbert_key", "cluster_by_hilbert", "hilbert_d_py"]


def with_hilbert_key(
    df: DataFrame, x: Column, y: Column, bits: int = 8, key_col: str = "_h"
) -> DataFrame:
    """Add the Hilbert index ``key_col`` of bucketized (x, y), each in
    [0, 2^bits) — the Lam-Shapiro chain unrolled as ONE PROJECTION PER LEVEL
    over named intermediate columns. The projection chain matters: as a
    single inline Column each level references the previous level's x AND y
    expressions three times, so the tree grows ~3^bits and Catalyst ANALYSIS
    itself OOMs at bits=8 (observed); per-level attributes keep it linear,
    and CollapseProject will not re-inline multiply-referenced non-cheap
    expressions. 2*bits result bits; keep bits <= 16. No UDF anywhere —
    the whole chain is codegen-able integer arithmetic."""
    if bits < 1 or bits > 16:
        raise ValueError("with_hilbert_key supports 1..16 bits per dimension")
    # ADVICE r11 #3: the chain materializes _hx/_hy and key_col as named
    # columns — a caller already carrying one of those names would get
    # duplicate/ambiguous columns instead of a clear error (zorder never
    # materializes intermediates, so only this variant needs the guard)
    clash = sorted(set(df.columns) & {"_hx", "_hy", key_col})
    if clash:
        raise ValueError(
            f"with_hilbert_key: input already has column(s) {clash}; rename "
            "them or pass a different key_col"
        )
    carry = [F.col(c) for c in df.columns]
    out = df.select(
        *carry,
        x.cast("long").alias("_hx"),
        y.cast("long").alias("_hy"),
        F.lit(0).cast("long").alias(key_col),
    )
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        cx, cy = F.col("_hx"), F.col("_hy")
        rx = F.when(cx.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(cy.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        nd = (
            F.col(key_col)
            + F.lit(s * s).cast("long") * (rx * 3).bitwiseXOR(ry).cast("long")
        )
        nx = F.when(
            ry == 0, F.when(rx == 1, F.lit(s - 1) - cy).otherwise(cy)
        ).otherwise(cx)
        ny = F.when(
            ry == 0, F.when(rx == 1, F.lit(s - 1) - cx).otherwise(cx)
        ).otherwise(cy)
        out = out.select(
            *carry,
            nx.alias("_hx"),
            ny.alias("_hy"),
            nd.alias(key_col),
        )
    return out.drop("_hx", "_hy")


def hilbert_d_py(x: int, y: int, bits: int = 8) -> int:
    """Pure-Python replay of hilbert_key_2d (tests + documentation)."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def cluster_by_hilbert(
    df: DataFrame,
    x: Column,
    y: Column,
    n_partitions: int,
    bits: int = 8,
    key_col: str = "_h",
) -> DataFrame:
    """Physically cluster rows along the Hilbert curve (the drop-in
    counterpart of plans/zorder.cluster_by_zorder, with the measured locality
    edge above): range-partition on the Hilbert key, sort within partitions,
    drop the key. Feed straight into .write."""
    return (
        with_hilbert_key(df, x, y, bits, key_col)
        .repartitionByRange(n_partitions, F.col(key_col))
        .sortWithinPartitions(key_col)
        .drop(key_col)
    )
