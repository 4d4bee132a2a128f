"""SCD Type-2 merge: upserts into a dimension with validity intervals.

Spark on plain parquet has no MERGE statement; the engine-level equivalent is a
join + union rewrite of the dimension. ``scd2_apply`` takes the current dimension
(rows with ``valid_from``/``valid_to``, ``valid_to IS NULL`` = current) and a batch
of updates keyed on the business key, and produces the new dimension state:

- unchanged rows pass through untouched;
- a current row with an incoming update is CLOSED (``valid_to`` = update ts);
- each update becomes the new CURRENT row (``valid_from`` = update ts,
  ``valid_to`` = NULL);
- brand-new keys simply insert as current rows.

Scale shape: one equi join on the business key (broadcast when the update batch is
dim-sized — the common case; shuffled hash otherwise, Catalyst's call) plus a union —
the full-dimension rewrite is the standard cost of SCD2 on immutable storage, and at
100 TB the dimension is by definition the small table. History rows
(``valid_to IS NOT NULL``) never join — they pass through on the cheap side of the
union untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

VALID_FROM = "valid_from"
VALID_TO = "valid_to"


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    ts_col: str,
    tracked_cols: list[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """Apply one batch of updates (one row per key) to an SCD2 dimension.

    ``dim`` columns: key_col, *tracked_cols, valid_from, valid_to.
    ``updates`` columns: key_col, *tracked_cols, ts_col (the effective time).
    Multiple updates per key in one batch are not collapsed here — pre-aggregate to
    last-per-key first (WIN1) if the feed can contain them.

    ``broadcast_updates`` (default True) hints the update batch to broadcast — the
    common case is a small delta against a big dimension. Pass False for bulk
    backfills where the batch rivals the dimension: a forced hint would override
    Catalyst's size check and risk driver OOM (ADVICE r3), so leave the join
    strategy to Catalyst there.
    """
    upd = updates.select(
        F.col(key_col),
        *[F.col(c) for c in tracked_cols],
        F.col(ts_col).alias("_eff_ts"),
    )
    history = dim.filter(F.col(VALID_TO).isNotNull())
    current = dim.filter(F.col(VALID_TO).isNull())
    upd_keys = upd.select(key_col, "_eff_ts")
    if broadcast_updates:
        upd_keys = F.broadcast(upd_keys)
    marked = current.join(upd_keys, key_col, "left")
    untouched = marked.filter(F.col("_eff_ts").isNull()).drop("_eff_ts")
    closed = (
        marked.filter(F.col("_eff_ts").isNotNull())
        .withColumn(VALID_TO, F.col("_eff_ts"))
        .drop("_eff_ts")
    )
    inserted = upd.select(
        F.col(key_col),
        *[F.col(c) for c in tracked_cols],
        F.col("_eff_ts").alias(VALID_FROM),
        F.lit(None).cast("timestamp").alias(VALID_TO),
    )
    cols = [key_col, *tracked_cols, VALID_FROM, VALID_TO]
    return (
        history.select(*cols)
        .unionByName(untouched.select(*cols))
        .unionByName(closed.select(*cols))
        .unionByName(inserted.select(*cols))
    )
