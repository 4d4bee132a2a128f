"""[EXT] Corpus-derived unigram language-model scoring (CCNet-style quality signal).

A standard training-data quality filter scores each document by its per-token
perplexity under a reference LM and drops the tails (CCNet; Gopher App. A). The
distributed shape matters more than the model class at 100 TB:

1. **Vocabulary build** — explode tokens, one hash shuffle on the token key, count.
   Zipf skew is bounded by map-side partial aggregation (the hot token collapses to
   one partial row per task before the exchange).
2. **Top-K truncation** — a corpus vocabulary is unbounded (typos, ids, noise); the
   scorer keeps the top-K tokens by (count desc, token asc) — deterministic ties —
   and treats the long tail as OOV. K is thousands-to-millions: always broadcastable.
3. **Scoring** — explode tokens again, broadcast-hash-join against the vocabulary
   (map-side, zero shuffle), aggregate per doc_id (second and last shuffle).

Cross-engine determinism: floating log() is NOT correctly rounded the same way in
every libm, so the oracle-checked score uses integer *surprisal bits*:

    surprisal(t) = bit_length(total_tokens) - bit_length(count(t))

i.e. -log2 p(t) rounded to whole bits, computed with exact integer arithmetic on
both engines (Spark ``conv(n,10,2)`` length == DuckDB ``printf('%b',n)`` length).
OOV tokens get count 1 — the maximum surprisal. Per-document mean bits is the
quality score; high mean-surprisal documents are the gibberish/boilerplate tail.

Reference parity note: the reference engine has no LM scorer; this extends the
assessment surface for LLM-corpus preparation (SURVEY §2 [EXT] family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens

__all__ = ["bit_length", "unigram_vocab", "score_surprisal"]


def bit_length(col: Column) -> Column:
    """floor(log2(n)) + 1 for n >= 1, as exact integer arithmetic (binary digit
    count). Engine-portable where float log2 is not."""
    return F.length(F.conv(col.cast("string"), 10, 2)).cast("int")


def unigram_vocab(df: DataFrame, text_col: str = "text", top_k: int = 1000) -> DataFrame:
    """(token, cnt) for the top_k corpus tokens by (cnt desc, token asc).

    One shuffle (token hash-agg with map-side partials); the global top-k runs on
    the already-aggregated vocabulary relation, which is orders of magnitude
    smaller than the corpus. Deterministic tie-break on the token string.
    """
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(top_k)
    )


def score_surprisal(
    df: DataFrame,
    vocab: DataFrame,
    total_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean surprisal bits under the corpus unigram LM.

    Returns (id_col, n_tokens, oov_tokens, sum_bits, avg_bits). The vocabulary
    side is broadcast — the corpus is scanned once and only reshuffles on id_col.
    avg_bits is ROUND(sum/n, 6): one double division, parity-stable.
    """
    total_bits = F.lit(int(total_tokens).bit_length()).cast("int")
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
    joined = tok.join(F.broadcast(vocab), "token", "left")
    # OOV -> count 1 -> bit_length 1 -> maximum surprisal.
    bits = total_bits - F.coalesce(bit_length(F.col("cnt")), F.lit(1))
    return (
        joined.select(
            F.col(id_col),
            bits.alias("_bits"),
            F.when(F.col("cnt").isNull(), 1).otherwise(0).alias("_oov"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("_oov").cast("long").alias("oov_tokens"),
            F.sum("_bits").cast("long").alias("sum_bits"),
            F.round(
                F.sum("_bits").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_bits"),
        )
    )
