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

from ..plans.checkpoints import free_local_checkpoint
from .text import tokens

__all__ = [
    "word_frequency_table",
    "train_bpe_merges",
    "train_bpe_merges_batched",
    "apply_merge_expr",
    "encode_with_merges",
]

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
    definition (merge k+1's counts depend on merge k having been applied).

    The previous round's checkpointed word table is released from executor
    storage once the new one materializes (free_local_checkpoint) — without
    that, num_merges copies of the word-type table accumulate over a long run."""
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
        prev = wf
        wf = wf.withColumn("syms", apply_merge_expr(F.col("syms"), a, b)).localCheckpoint()
        free_local_checkpoint(prev)
    return merges


def train_bpe_merges_batched(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    batch_size: int = 32,
) -> list[tuple[int, str, str, str, int]]:
    """Sequential-identical BPE training with ~batch_size× fewer Spark rounds.

    Per round: ONE pair-count job collects the top ``batch_size + 1`` pairs, the
    driver selects a prefix of them that is PROVABLY the same sequence the
    one-merge-at-a-time trainer would pick, and all selected merges are applied
    as one composed fold (one narrow job + one checkpoint per round instead of
    per merge). Output is identical to ``train_bpe_merges`` — same golden test —
    because the selection rule only admits pair p_i when no other pair can
    overtake it at sequential step i:

    - **prefix + stop-at-interaction**: iterate pairs in (count desc, a, b)
      order; STOP at the first pair sharing a symbol with an earlier selection
      (or whose symbols collide with a string a_j+b_j created in this batch, or
      whose own merged string a_i+b_i already exists as a vocabulary symbol —
      the string-collision cases where applying an earlier merge could GROW a
      later pair's count). Everything at/after the stop has count <= c_excl,
      the count at the stop position.
    - **strict-count truncation**: keep only selected pairs with count >
      c_excl. Non-selected pairs can't rise above c_excl (non-interacting
      counts are invariant; interacting ones only shrink; pairs created by a
      batch merge (x, a_j b_j) inherit occurrences from an original interacting
      pair (x, a_j), so they are bounded by c_excl too). Ties inside the batch
      resolve lexicographically — the same order they were selected in.
    - degenerate rounds (truncation empties the batch) fall back to applying
      just the top pair, which is the sequential step by definition.

    Driver state is vocabulary-sized: the symbol-string set starts as the
    corpus's distinct symbols (one bounded collect) and grows by one per merge.
    """
    wf = word_frequency_table(df, text_col).localCheckpoint()
    # Vocabulary symbol strings, for the merged-string collision guard.
    vocab_syms = {
        r["s"] for r in wf.select(F.explode("syms").alias("s")).distinct().collect()
    }
    merges: list[tuple[int, str, str, str, int]] = []
    while len(merges) < num_merges:
        rows = (
            _pair_counts(wf)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(batch_size + 1)
            .collect()
        )
        if not rows:
            break
        pairs = [(r["a"], r["b"], int(r["cnt"])) for r in rows]
        touched: set[str] = set()
        selected: list[tuple[str, str, int]] = []
        c_excl: int | None = None
        for a, b, cnt in pairs:
            interacts = (
                a in touched
                or b in touched
                or (a + b) in touched  # collides with a string created this batch
                or (a + b) in vocab_syms  # collides with a pre-existing symbol
            )
            if interacts:
                c_excl = cnt
                break
            selected.append((a, b, cnt))
            touched.update((a, b, a + b))
        else:
            if len(pairs) > batch_size:  # full page: the next count is unknown
                c_excl = selected[-1][2]
                selected = selected[:-1]
        if c_excl is not None:
            selected = [p for p in selected if p[2] > c_excl]
        if not selected:  # all ties with the exclusion boundary: sequential step
            selected = [pairs[0]]
        selected = selected[: num_merges - len(merges)]
        syms_col = F.col("syms")
        for a, b, cnt in selected:
            merges.append((len(merges), a, b, a + b, cnt))
            vocab_syms.add(a + b)
            syms_col = apply_merge_expr(syms_col, a, b)
        prev = wf
        wf = wf.withColumn("syms", syms_col).localCheckpoint()
        free_local_checkpoint(prev)
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
