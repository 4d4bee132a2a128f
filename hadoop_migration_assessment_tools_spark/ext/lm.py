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

__all__ = [
    "bit_length",
    "unigram_vocab",
    "score_surprisal",
    "bigram_pairs",
    "bigram_vocab",
    "score_bigram_surprisal",
]


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


def bigram_pairs(toks: Column) -> Column:
    """Adjacent (t1, t2) pairs of a token array as an array<struct<t1,t2>> —
    ``zip(toks[:-1], toks[1:])`` via two slices (array ARGUMENTS evaluate once
    per row, the SCALE.md zip_with lesson; no per-element lambda recursion).
    Arrays shorter than 2 tokens yield an empty array."""
    n = F.size(toks)
    return F.when(
        n < 2, F.array().cast("array<struct<t1:string,t2:string>>")
    ).otherwise(
        F.arrays_zip(
            F.slice(toks, 1, n - 1).alias("t1"), F.slice(toks, 2, n - 1).alias("t2")
        ).cast("array<struct<t1:string,t2:string>>")
    )


def bigram_vocab(
    df: DataFrame, text_col: str = "text", top_k: int = 2000
) -> DataFrame:
    """(t1, t2, cnt) for the top_k corpus bigrams by (cnt desc, t1 asc, t2 asc).

    Same shuffle shape as unigram_vocab: explode pairs, one hash-agg with
    map-side partials, global top-k on the aggregated (small) relation with a
    deterministic tie-break. The pair vocabulary is the conditional LM's
    numerator table; contexts come from unigram_vocab."""
    pairs = df.select(F.explode(bigram_pairs(tokens(F.col(text_col)))).alias("p"))
    return (
        pairs.select(F.col("p.t1").alias("t1"), F.col("p.t2").alias("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_cnt"))
        .orderBy(F.desc("pair_cnt"), F.asc("t1"), F.asc("t2"))
        .limit(top_k)
    )


def score_bigram_surprisal(
    tok_arrays: DataFrame,
    uni_vocab: DataFrame,
    pair_vocab: DataFrame,
    toks_col: str = "toks",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Per-row conditional surprisal bits under the corpus bigram LM (the
    CCNet-style perplexity signal, one Markov order up from score_surprisal —
    a conditional model also penalizes wrong token ORDER, which a unigram
    model provably cannot; docs_bigram_surprisal certifies exactly that with
    order-scrambled twins).

    ``tok_arrays`` carries ``id_cols`` plus an array<string> column
    ``toks_col``. Per adjacent pair (t1, t2):

        bits = max(bit_length(cnt(t1)) - bit_length(cnt(t1, t2)), 0)

    i.e. -log2 p(t2 | t1) rounded to whole bits, exact integer arithmetic on
    both engines. OOV lookups (context or pair truncated out of the top-K
    vocabularies) coalesce to count 1 -> bit_length 1; the floor at 0 covers
    the truncation asymmetry where a pair survived its top-K but its context
    did not. Returns id_cols + (n_pairs, oov_pairs, sum_bits). Both vocab
    sides broadcast; the corpus reshuffles only on id_cols."""
    ex = tok_arrays.select(
        *[F.col(c) for c in id_cols],
        F.explode(bigram_pairs(F.col(toks_col))).alias("p"),
    ).select(
        *[F.col(c) for c in id_cols],
        F.col("p.t1").alias("t1"),
        F.col("p.t2").alias("t2"),
    )
    ctx = uni_vocab.select(F.col("token").alias("t1"), F.col("cnt").alias("ctx_cnt"))
    joined = ex.join(F.broadcast(ctx), "t1", "left").join(
        F.broadcast(pair_vocab), ["t1", "t2"], "left"
    )
    bits = F.greatest(
        F.coalesce(bit_length(F.col("ctx_cnt")), F.lit(1))
        - F.coalesce(bit_length(F.col("pair_cnt")), F.lit(1)),
        F.lit(0),
    )
    return (
        joined.select(
            *[F.col(c) for c in id_cols],
            bits.alias("_bits"),
            F.when(F.col("pair_cnt").isNull(), 1).otherwise(0).alias("_oov"),
        )
        .groupBy(*id_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("_oov").cast("long").alias("oov_pairs"),
            F.sum("_bits").cast("long").alias("sum_bits"),
        )
    )
