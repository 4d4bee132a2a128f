"""[EXT] Verbatim repeated-span detection: substring-level duplication stats.

Document-level dedup (exact/MinHash/SimHash — ext/dedup.py) misses the common
real-corpus failure where DIFFERENT documents share long verbatim passages
(boilerplate, licenses, quoted articles). The published remedy is substring
dedup over the token stream (suffix-array "dedup trains better LMs" approach);
the distributed-SQL-expressible flavor implemented here is k-gram span
detection:

1. every length-``min_tokens`` token window (k-gram) of every doc is a
   candidate;
2. a k-gram that occurs in >= 2 DISTINCT documents marks all its occurrences
   as duplicated;
3. per document, overlapping/adjacent duplicated windows merge into MAXIMAL
   spans (standard interval union via a lag-window chain), yielding span
   bounds and the exact number of tokens covered by cross-document verbatim
   material.

Scale shape (the 100 TB plan, not just the passing one):
- duplication detection runs on ``xxhash64(gram)`` FIRST — the heavy corpus-wide
  shuffle carries (8-byte hash, doc id) pairs, never gram text;
- only CANDIDATE grams (hash seen in >= 2 distinct docs — a tiny superset of
  the truth) are re-grouped by their full text, which both eliminates hash
  collisions exactly and keeps the text shuffle bounded by duplicate density
  rather than corpus size;
- the per-doc interval-union window is partitioned by doc and sees only
  duplicated window starts.
The k-gram explode still multiplies token bytes by ~k inside the scan stage —
the documented cost of verbatim detection without a distributed suffix array.
Results are exactly the text-keyed semantics (collision-free), so the DuckDB
oracle replays the simple text-grouped formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .text import tokens

__all__ = ["repeated_spans", "span_coverage"]


def _doc_grams(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(id, n_tok, start, gram): every k-token window, 1-based start position."""
    toked = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_t")
    ).withColumn("n_tok", F.size("_t").cast("long"))
    # Guard the short-doc case explicitly: Spark's sequence(1, 0) produces a
    # DESCENDING [1, 0], not an empty array — docs with < k tokens must yield
    # zero windows, not phantom ones.
    grams = F.when(
        F.size("_t") >= k,
        F.transform(
            F.sequence(F.lit(1), F.size("_t") - (k - 1)),
            lambda i: F.struct(
                i.cast("long").alias("start"),
                F.concat_ws(" ", F.slice("_t", i, k)).alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<start:bigint,gram:string>>"))
    return toked.select(
        "_id", "n_tok", F.explode(grams).alias("g")
    ).select("_id", "n_tok", F.col("g.start").alias("start"), F.col("g.gram").alias("gram"))


def repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 8,
) -> DataFrame:
    """Maximal cross-document verbatim spans per document.

    Returns (id_col, span_start, span_end, span_tokens): 1-based inclusive token
    positions of every maximal run of duplicated ``min_tokens``-gram windows —
    i.e. every passage of >= min_tokens tokens that appears verbatim in at least
    one OTHER document. Deterministic; fully relational (DuckDB-oracle-able).
    """
    grams = _doc_grams(df, text_col, id_col, min_tokens).withColumn(
        "_gh", F.xxhash64("gram")
    )
    # Phase 1 — duplication by 8-byte gram hash: the only corpus-wide shuffle,
    # carrying (hash, id) instead of gram text. Cheap superset of the truth.
    dup_hashes = (
        grams.select("_gh", "_id")
        .groupBy("_gh")
        .agg(F.count_distinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("_gh")
    )
    # Lineage cut: candidates feeds BOTH the text verify and the hit extraction;
    # without it each branch re-expands the full gram explode (plan doubled from
    # 4 to 8 exchanges when measured). The checkpointed relation is bounded by
    # duplicate density — the one thing known to be small here.
    candidates = grams.join(dup_hashes, "_gh", "left_semi").localCheckpoint(eager=False)
    # Phase 2 — exact text verify over candidates only: kills hash collisions,
    # shuffle volume bounded by duplicate density, not corpus size.
    dup_grams = (
        candidates.groupBy("gram")
        .agg(F.count_distinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("gram")
    )
    hits = candidates.join(dup_grams, "gram", "left_semi").select("_id", "start")
    # interval union: window-starts s cover [s, s+k-1]; consecutive starts with
    # p + k >= s overlap OR touch (ADVICE r5: start-gap == k means the windows
    # are exactly adjacent — tokens [p, p+k-1][s, s+k-1] form ONE contiguous
    # duplicated run, so they merge into one maximal span). Only a gap > k
    # leaves uncovered tokens between them and starts a new span.
    w = Window.partitionBy("_id").orderBy("start")
    chained = hits.withColumn(
        "_new",
        F.when(
            F.col("start") - F.lag("start").over(w) <= min_tokens, F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn("_grp", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        chained.groupBy("_id", "_grp")
        .agg(F.min("start").alias("span_start"), F.max("start").alias("_last"))
        .select(
            F.col("_id").alias(id_col),
            F.col("span_start"),
            (F.col("_last") + (min_tokens - 1)).alias("span_end"),
            (F.col("_last") + (min_tokens - 1) - F.col("span_start") + 1).alias(
                "span_tokens"
            ),
        )
    )


def span_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 8,
) -> DataFrame:
    """Per-document verbatim-duplication profile.

    Returns (id_col, n_tokens, n_spans, dup_tokens, dup_ratio): exact token
    counts covered by cross-document verbatim spans (rounded ratio for
    cross-engine hash stability). Docs with no duplicated span report 0 — the
    left join keeps the whole corpus in the profile (a scrub policy layer
    filters on dup_ratio; detection stays policy-free)."""
    spans = repeated_spans(df, text_col, id_col, min_tokens)
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("span_tokens").cast("long").alias("dup_tokens"),
    )
    base = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_t")
    ).select(F.col(id_col), F.size("_t").cast("long").alias("n_tokens"))
    return (
        base.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
                6,
            ).alias("dup_ratio"),
        )
    )
