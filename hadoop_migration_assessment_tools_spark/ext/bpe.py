"""[EXT] Byte-pair-encoding vocabulary training, distributed.

Real BPE (Sennrich et al. 2016), not the regex estimate in ext/text.py: iterate
"count adjacent symbol pairs -> merge the most frequent" over the corpus's WORD
TYPES. The scale shape is what makes this trainable at 100 TB:

1. **One corpus pass** builds the word-frequency table (tokenize, groupBy word).
   Everything after runs on word TYPES (vocabulary-sized — orders of magnitude
   smaller than the corpus), weighted by frequency. This is the standard trick:
   merging "t h" in 10^11 tokens only needs each distinct word once.
2. **Per merge iteration**: one pair-count aggregation over the word table
   (map-side partials; the pair key is tiny), one 1-row argmax collect (the
   inherently sequential heart of BPE — each merge depends on the last), and one
   narrow fold applying the merge to the symbol arrays. The word table is
   localCheckpointed per iteration: each round's plan stays one-step deep instead
   of stacking N interpreted folds (the capstone lineage lesson).
3. Deterministic end to end: tie-breaks on (count desc, pair asc); no sampling.

Merge application is a left fold (F.aggregate) with non-overlapping left-to-right
semantics — "a a a" under merge (a,a) becomes [aa, a], matching the reference
implementation every BPE paper assumes. Word arrays are short, so the interpreted
HOF is bounded per row (the hot loop is the pair AGGREGATION, which is compiled).

Engine-specific internals (iterative argmax) make this rows-only in the driver
oracle; correctness is pinned by a golden test against a pure-Python reference
BPE in tests/test_ext_operators.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens

__all__ = ["word_frequency_table", "train_bpe_merges", "apply_merge_expr", "encode_with_merges"]

END_MARK = "</w>"


def word_frequency_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, syms) for every distinct word in the corpus; syms is the
    character split plus the end-of-word marker. The single corpus-sized shuffle."""
    words = df.select(F.explode(tokens(F.col(text_col))).alias("word"))
    wf = words.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    syms = F.concat(
        F.split(F.col("word"), ""),  # character split
        F.array(F.lit(END_MARK)),
    )
    return wf.withColumn("syms", syms)


def apply_merge_expr(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) -> a+b in a symbol
    array, as a single fold."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(wf: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts over the word-type table."""
    pairs = F.when(
        F.size("syms") > 1,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at(F.col("syms"), i).alias("a"),
                F.element_at(F.col("syms"), i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        wf.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def train_bpe_merges(
    df: DataFrame, num_merges: int, text_col: str = "text"
) -> list[tuple[int, str, str, str, int]]:
    """Train num_merges BPE merges; returns [(rank, a, b, merged, pair_count)].

    Each iteration's argmax is a bounded 1-row collect — BPE is sequential by
    definition (merge k+1's counts depend on merge k having been applied)."""
    wf = word_frequency_table(df, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        top = (
            _pair_counts(wf)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merges.append((rank, a, b, a + b, int(cnt)))
        wf = wf.withColumn("syms", apply_merge_expr(F.col("syms"), a, b)).localCheckpoint()
    return merges


def encode_with_merges(
    df: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize text with a trained merge list: per word, apply merges in rank
    order (BPE encoding IS sequential application in training order). Returns
    (id_col, n_words, n_bpe_tokens).

    Arrow-batched pandas UDF: the per-word merge loop is Python, but each batch
    is one vectorized pass and the merge list is a broadcast-sized closure —
    the standard deployment shape for a trained tokenizer. Word-level caching
    inside the batch (dict per Arrow batch) exploits Zipf: each distinct word is
    encoded once per batch regardless of frequency."""
    import pandas as pd
    from pyspark.sql import types as T

    ranked = [(a, b, m) for (_, a, b, m, _) in sorted(merges)]

    def encode_word(word: str) -> int:
        syms = list(word) + [END_MARK]
        for a, b, m in ranked:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(m)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_words", T.LongType()),
            T.StructField("n_bpe_tokens", T.LongType()),
        ]
    )

    def batches(it):
        for pdf in it:
            cache: dict[str, int] = {}
            ids, n_words, n_toks = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in str(text).strip().split() if w]
                total = 0
                for w in words:
                    if w not in cache:
                        cache[w] = encode_word(w)
                    total += cache[w]
                ids.append(int(doc_id))
                n_words.append(len(words))
                n_toks.append(total)
            yield pd.DataFrame({id_col: ids, "n_words": n_words, "n_bpe_tokens": n_toks})

    return df.select(id_col, text_col).mapInPandas(batches, schema)
