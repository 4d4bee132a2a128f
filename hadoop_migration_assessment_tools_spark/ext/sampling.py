"""[EXT] Deterministic sampling & dataset splitting for training-data pipelines.

A 100 TB corpus is never split by `rand()`: re-runs must land every document in the
same split (reproducible train/val/test), and adding documents must not reshuffle
existing assignments. The standard trick is content-addressed bucketing — hash a
stable id, map the hash to [0,1), cut at the cumulative split weights. Everything
here is a narrow, shuffle-free `Column` expression (one md5 per row, no joins, no
window over the full corpus), so a split at scale is exactly a scan.

Stratified sampling (`stratified_sample`) takes a deterministic per-stratum top-k
by hash order — one shuffle on the stratum key, skew-bounded because k caps each
group's output. Hash order is uniform, so the sample is unbiased per stratum.

md5 is used (not xxhash64) deliberately: it is bit-identical across engines
(Spark, DuckDB, Python hashlib), which makes every operator here oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["split_key", "hash_split", "stratified_sample", "SPLIT_BOUNDS_HEX"]


def split_key(id_col: Column, salt: str = "") -> Column:
    """Stable per-row key in hex: md5(salt || id). Lowercase hex in every engine."""
    return F.md5(F.concat(F.lit(salt), id_col.cast("string")))


def _bounds_hex(weights: dict[str, float], digits: int = 4) -> list[tuple[str, str]]:
    """Cumulative weight boundaries as fixed-width hex strings; comparisons against
    the md5 prefix are lexicographic and engine-agnostic."""
    total = sum(weights.values())
    space = 16**digits
    out, cum = [], 0.0
    for name, w in weights.items():
        cum += w / total
        bound = format(min(space, int(round(cum * space))), f"0{digits}x")
        out.append((name, bound))
    return out


SPLIT_BOUNDS_HEX = _bounds_hex  # exported for oracle construction


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hashed-id bucket. Deterministic,
    re-run-stable, and append-stable (new ids never move old ones). Pure map."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    prefix = F.substring(split_key(F.col(id_col), salt), 1, 4)
    expr: Column | None = None
    for name, bound in _bounds_hex(weights):
        cond = prefix < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # md5 prefix == 'ffff' edge: fold into the last split
    last = list(weights)[-1]
    return df.withColumn(out_col, expr.otherwise(F.lit(last)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows inside each stratum by
    (md5 key, id) and keep the first k. Unbiased (hash order is uniform),
    reproducible, and one bounded shuffle."""
    key = split_key(F.col(id_col), salt)
    w = Window.partitionBy(strata_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_sk", key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_sk", "_rn")
    )
