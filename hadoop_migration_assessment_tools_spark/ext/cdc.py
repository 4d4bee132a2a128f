"""[EXT] Content-defined chunking (CDC) — shift-resistant chunk boundaries.

Fixed-size chunking breaks under insertion: one added byte shifts every later
chunk boundary, so a near-identical document shares almost no chunk hashes with
its original. CDC (the LBFS / rsync-family construction) places a boundary
wherever a hash of the LOCAL window of the last ``window`` characters falls
under a threshold — boundaries depend only on nearby content, so after an
insertion the chunking re-synchronizes and all later chunks hash identically.
That re-synchronization is what makes sub-document dedup of 100 TB crawl dumps
work (the same article behind different boilerplate shells).

The boundary rule here is deliberately engine-portable: position ``i`` (1-based,
``i >= window``) ends a chunk iff the first 3 hex digits of
``md5(substring(text, i-window+1, window))`` sort below a hex threshold —
string comparison over fixed-width lowercase hex, bit-identical in Spark,
DuckDB and Python, so the full chunking (boundaries, chunk extents, chunk
hashes) is certifiable against a SQL replay. Mean chunk length is
4096/threshold_codes characters (64 for the default '040').

Scale shape: the hashing pass explodes one row per eligible position (the
per-position md5 stays in whole-stage codegen — an md5 inside a HOF lambda
would be interpreted per element, ~4x slower; NOTES.md perf lesson). Boundary
rows survive at ~1/64 density, then ONE join back to the (doc_id, text)
projection rebuilds chunk substrings. No global window: every window/groupBy
is partitioned by doc_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["CDC_WINDOW", "CDC_THRESHOLD_HEX", "cdc_chunks"]

#: window (chars) the boundary hash looks at, and the 3-hex-digit threshold the
#: hash prefix must sort below ('040' = 64/4096 codes -> mean chunk ~64 chars).
CDC_WINDOW = 16
CDC_THRESHOLD_HEX = "040"


def _is_boundary(gram: Column, threshold_hex: str) -> Column:
    return F.substring(F.md5(gram), 1, len(threshold_hex)) < F.lit(threshold_hex)


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = CDC_WINDOW,
    threshold_hex: str = CDC_THRESHOLD_HEX,
) -> DataFrame:
    """Chunk every document at content-defined boundaries.

    Returns (id_col, chunk_idx, chunk_start, chunk_len, chunk_md5) — 1-based
    ``chunk_start``, chunks covering the text exactly (concatenation of chunks
    == text). Documents shorter than ``window`` become one whole-document
    chunk. Empty/NULL texts yield no rows.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_text"),
        F.length(text_col).cast("long").alias("_n"),
    ).filter(F.col("_n") > 0)

    # positions eligible to END a chunk; sequence(window, n) must be guarded:
    # Spark's sequence(a, b) with b < a yields a DESCENDING range, not empty
    pos = base.select(
        "_id",
        "_text",
        F.explode(
            F.when(
                F.col("_n") >= window, F.sequence(F.lit(window), F.col("_n"))
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("_i"),
    )
    bounds = pos.filter(
        _is_boundary(
            F.expr(f"substring(_text, _i - {int(window) - 1}, {int(window)})"),
            threshold_hex,
        )
    ).select("_id", "_i")

    # ONE window pass builds every span: real boundaries end mid chunks; a
    # sentinel row at position n per doc ends the tail chunk (and the whole doc
    # when no boundary fired). A real boundary exactly at n makes the sentinel's
    # span empty (start > end) — filtered. The alternative (separate groupBy-max
    # for the tail) evaluates the expensive per-position md5 lineage TWICE.
    sentinels = base.select("_id", F.col("_n").alias("_i"), F.lit(1).alias("_sent"))
    allb = bounds.withColumn("_sent", F.lit(0)).unionByName(sentinels)
    w_doc = Window.partitionBy("_id").orderBy("_i", "_sent")
    spans = allb.select(
        "_id",
        (F.coalesce(F.lag("_i").over(w_doc), F.lit(0)) + 1).alias("_start"),
        F.col("_i").alias("_end"),
    ).filter(F.col("_end") >= F.col("_start"))
    out = (
        spans.join(base.select("_id", "_text"), "_id")
        .select(
            F.col("_id").alias(id_col),
            (F.row_number().over(Window.partitionBy("_id").orderBy("_start")) - 1).alias(
                "chunk_idx"
            ),
            F.col("_start").alias("chunk_start"),
            (F.col("_end") - F.col("_start") + 1).alias("chunk_len"),
            F.md5(F.expr("substring(_text, _start, _end - _start + 1)")).alias(
                "chunk_md5"
            ),
        )
    )
    return out
