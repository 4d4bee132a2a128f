"""Z-order (Morton) clustering for multi-dimensional data layout.

At 100 TB the dominant cost of a selective scan is how many files the predicate
can SKIP via parquet min/max statistics. Sorting by one column optimizes one
predicate dimension and destroys the others; interleaving the bits of several
bucketized dimensions (the Z-order curve — the technique behind Delta/Iceberg
``OPTIMIZE ZORDER BY``) keeps every dimension's values locally clustered, so
min/max ranges per file stay narrow in all of them at once.

Everything here is exact integer arithmetic (shifts/masks), identical in every
engine — the locality query is DuckDB-oracle-checkable bit for bit.

Pieces:
- ``fixed_range_bucket`` — data-INdependent monotone quantizer (fixed [lo, hi)
  range -> 2^bits buckets). Data-independent on purpose: re-runs and appends
  never re-bucket old rows (same contract as the md5 splits in ext/sampling.py).
- ``zorder_key`` — bit interleave of k bucketized dimensions.
- ``cluster_by_zorder`` — range-partition + sort by the z key: the write-side
  layout operator (follow with .write; each output file covers a contiguous z
  range, hence a small hyper-rectangle of the original dimensions).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["fixed_range_bucket", "zorder_key", "cluster_by_zorder"]


def fixed_range_bucket(col: Column, lo: float, hi: float, bits: int = 8) -> Column:
    """Monotone quantize col into [0, 2^bits): floor((x - lo) * 2^bits / (hi - lo)),
    clamped. Exact for integer/date-derived inputs when (hi - lo) divides cleanly;
    deterministic everywhere regardless."""
    n = 1 << bits
    raw = F.floor((col.cast("double") - lo) * n / (hi - lo)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), raw))


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton interleave: bit i of dimension d lands at position i * k + d.
    k * bits total bits — keep k * bits <= 62 for a long key."""
    k = len(cols)
    if k < 2:
        raise ValueError("zorder needs >= 2 dimensions")
    if k * bits > 62:
        raise ValueError("z key would overflow a long")
    parts = []
    for d, c in enumerate(cols):
        for i in range(bits):
            parts.append(F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + d))
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def cluster_by_zorder(
    df: DataFrame,
    bucket_cols: list[Column],
    n_partitions: int,
    bits: int = 8,
    key_col: str = "_z",
) -> DataFrame:
    """Physically cluster rows along the Z curve: range-partition on the z key
    (each output partition = contiguous z range = small hyper-rectangle in every
    dimension), sort within partitions, drop the key. Feed straight into .write —
    parquet min/max stats then prune on ALL bucketized dimensions."""
    z = zorder_key(bucket_cols, bits)
    return (
        df.withColumn(key_col, z)
        .repartitionByRange(n_partitions, F.col(key_col))
        .sortWithinPartitions(key_col)
        .drop(key_col)
    )
