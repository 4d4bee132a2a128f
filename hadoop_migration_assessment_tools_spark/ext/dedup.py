"""[EXT] Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these shapes at 100 TB):
- exact dedup: one hash-partitioned shuffle on the content hash; survivor choice is
  deterministic (min id), never dropDuplicates' arbitrary row.
- MinHash+LSH: signatures/bands are array-native per row (no explode until banding);
  the candidate join touches only rows sharing a band bucket — O(collisions), not
  O(n²). Hot buckets (boilerplate docs) are the skew risk: AQE skew-join plus an
  optional bucket-size cap handle it.
- SimHash: 64-bit fingerprint per row; near-dup = small Hamming distance, found by
  exact-matching on bit-bands (a distance-k pair must agree on ≥1 of k+1 bands).
- n-gram Jaccard: inverted-index join on shingles — sparse because word shingles are
  distinctive; verification is per-candidate array intersection, row-local.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from .text import tokens

# --- exact ------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct text (sha2-256 identity), deterministic survivor =
    min id. One shuffle; no driver-side state."""
    h = F.sha2(F.col(text_col), 256).alias("text_hash")
    w = Window.partitionBy("text_hash").orderBy(F.asc(id_col))
    return (
        df.withColumn("text_hash", h)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-dup group report: hash, multiplicity, deterministic keeper id."""
    return (
        df.withColumn("text_hash", F.sha2(F.col(text_col), 256))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("dup_count"),
            F.min(id_col).alias("keeper_id"),
        )
        .filter(F.col("dup_count") > 1)
    )


# --- shingling / MinHash / LSH ------------------------------------------------------


def token_shingles(col: Column, k: int = 4) -> Column:
    """Distinct word k-shingles (space-joined token windows). Word shingles stay
    distinctive even over small vocabularies, keeping the LSH index sparse.

    Built as a zip_with chain over k offset slices of the token array, NOT as
    ``transform(sequence(...), i -> slice(toks, i+1, k))``: a lambda that
    captures ``toks`` re-evaluates the inlined tokenization on EVERY element
    (interpreted HOFs get no subexpression elimination inside lambda bodies),
    making the transform form O(tokens²) per doc — measured 10× slower at sf0.1
    (r7). zip_with's array ARGUMENTS are evaluated once per row, and its lambda
    touches only the two zipped elements, so this form is O(tokens·k) and stays
    narrow (no shuffle). Output is element-for-element identical to the
    transform form (same window order; array_distinct keeps first occurrence).
    """
    windows, n = _shingle_windows(col, k)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(windows)
    )


def _shingle_windows(col: Column, k: int) -> tuple[Column, Column]:
    """(non-distinct window array, token count) — the zip_with shingling core
    shared by token_shingles and shingle_index. NOTE: references ``col``'s
    tokenization k+1 times (one per slice argument); when the input is a raw
    text column, tokenize into a materialized column first (see shingle_index)
    so the regex split runs once per row, not k+1 times."""
    return _shingle_windows_from_tokens(tokens(col), k)


def _shingle_windows_from_tokens(toks: Column, k: int) -> tuple[Column, Column]:
    n = F.size(toks)
    if k <= 1:
        return toks, n
    length = n - (k - 1)
    acc = F.slice(toks, 1, length)
    for off in range(2, k + 1):
        acc = F.zip_with(
            acc,
            F.slice(toks, off, length),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    return acc, n


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: for seed i, min over shingles of xxhash64(shingle, i).
    Array-native — no explode, no shuffle; null when the doc has no shingles.

    NOTE: referencing this Column from several downstream expressions re-evaluates it
    each time (projection collapse inlines it; subexpression elimination does not reach
    into lambda bodies). For pipelines, use ``minhash_signatures`` below — the
    aggregation form evaluates each shingle hash exactly once.
    """
    seeds = F.array(*[F.lit(i) for i in range(num_hashes)])
    return F.when(F.size(shingles) > 0, F.transform(
        seeds, lambda s: F.array_min(F.transform(shingles, lambda sh: F.xxhash64(sh, s)))
    ))


def shingle_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    distinct: bool = True,
) -> DataFrame:
    """Exploded (doc, shingle) index via the zip_with window chain + explode.

    r7 rewrite: this was a posexplode + window-lead pipeline, adopted in r2
    because array-form shingling via transform(sequence, i -> slice(toks, ...))
    re-evaluates the captured token array per element (O(tokens²) interpreted
    work). The zip_with chain (_shingle_windows) closed that hole — its array
    arguments evaluate once per row — so the index no longer needs the window's
    full-token-stream shuffle at all: shingling is NARROW, and downstream
    groupBy/joins see map-side partial aggregation instead of a pre-shuffled
    stream (minhash_signatures' shuffle drops from the exploded token stream to
    ~64 longs per doc). Row order within a doc differs from the window form;
    every consumer is order-insensitive (distinct / min / semi join).
    """
    tdf = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
    )
    windows, n = _shingle_windows_from_tokens(F.col("_toks"), k)
    sh = tdf.select(
        F.col("_id"),
        F.explode(F.when(n >= k, windows)).alias("_sh"),
    )
    return sh.distinct() if distinct else sh


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 4,
) -> DataFrame:
    """id -> signature array, via the shingle index + 64 map-side-combined min
    aggregates. Each shingle is hashed exactly num_hashes times (vs num_hashes ×
    consumers in the expression form), and the partial aggregation collapses the
    shuffle to one row per doc — the shape that holds at 100 TB. Duplicate shingles
    don't affect a min, so the non-distinct (cheaper) index suffices."""
    exploded = shingle_index(df, text_col, id_col, shingle_k, distinct=False)
    mins = [
        F.min(F.xxhash64(F.col("_sh"), F.lit(i))).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    return (
        exploded.groupBy("_id")
        .agg(*mins)
        .select("_id", F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("_sig"))
    )


def lsh_band_hashes(signature: Column, bands: int = 16, rows_per_band: int = 4) -> Column:
    """Split the signature into `bands` blocks of `rows_per_band` and hash each block.
    Two docs are candidates iff they collide on ≥1 band (standard banding scheme)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(signature, b * rows_per_band + 1, rows_per_band),
                    lambda v: v.cast("string"),
                ),
            ),
            b,
        ),
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 4,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """MinHash+LSH candidate pair generation: shingle → sign → band → bucket join.

    Returns distinct (id_a, id_b) with id_a < id_b. `max_bucket` drops pathological
    buckets (boilerplate collisions) — the documented skew guard at scale; dropped
    buckets are exactly the ones exact-dedup already catches.
    """
    rows_per_band = num_hashes // bands
    banded = (
        minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
        .select(
            "_id",
            F.posexplode(lsh_band_hashes(F.col("_sig"), bands, rows_per_band)).alias(
                "band_idx", "band_hash"
            ),
        )
    )
    if max_bucket is not None:
        wcnt = Window.partitionBy("band_idx", "band_hash")
        banded = banded.withColumn("_bucket_n", F.count(F.lit(1)).over(wcnt)).filter(
            F.col("_bucket_n") <= max_bucket
        ).drop("_bucket_n")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 4,
    threshold: float = 0.7,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Fused MinHash+LSH near-dup: candidates AND exact-Jaccard verification off ONE
    shingle aggregation.

    The composed form (``minhash_candidate_pairs`` then ``jaccard_verify``) shingles
    the corpus twice — once for signature mins, once for the verification sets —
    costing two tokenize scans and two corpus-sized shuffles. Here a single
    ``groupBy(_id)`` produces both the 64 signature mins AND the distinct shingle
    set per doc; banding explodes from the signature, and verification joins
    candidates back to the same per-doc table, so Catalyst's ReuseExchange shares
    the one aggregation across all branches. Measured 2.6 s → 1.5 s warm at sf0.1
    (identical output); at 100 TB it halves the dominant shuffle volume.
    """
    rows_per_band = num_hashes // bands
    mins = [
        F.min(F.xxhash64(F.col("_sh"), F.lit(i))).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    per_doc = (
        shingle_index(df, text_col, id_col, shingle_k, distinct=False)
        .groupBy("_id")
        .agg(*mins, F.collect_set("_sh").alias("_shset"))
        .select(
            "_id",
            F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("_sig"),
            "_shset",
        )
        # r14: ReuseExchange does NOT fire across the banding and verification
        # branches — column pruning gives each branch a different aggregation
        # subtree, so the tokenize+shingle map side ran TWICE (profiled as twin
        # ~50 s task-CPU stages at sf0.1). The lazy checkpoint materializes the
        # per-doc table once; banding and both verify joins read it back.
        .localCheckpoint(eager=False)
    )
    banded = per_doc.select(
        "_id",
        F.posexplode(lsh_band_hashes(F.col("_sig"), bands, rows_per_band)).alias(
            "band_idx", "band_hash"
        ),
    )
    if max_bucket is not None:
        wcnt = Window.partitionBy("band_idx", "band_hash")
        banded = (
            banded.withColumn("_bucket_n", F.count(F.lit(1)).over(wcnt))
            .filter(F.col("_bucket_n") <= max_bucket)
            .drop("_bucket_n")
        )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    sh = per_doc.select("_id", "_shset")
    return (
        cands.join(
            sh.select(F.col("_id").alias("id_a"), F.col("_shset").alias("sh_a")), "id_a"
        )
        .join(
            sh.select(F.col("_id").alias("id_b"), F.col("_shset").alias("sh_b")), "id_b"
        )
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("double"))
        .withColumn(
            "union_n", (F.size("sh_a") + F.size("sh_b") - F.col("inter")).cast("double")
        )
        .withColumn(
            "jaccard",
            F.round(
                F.when(F.col("union_n") > 0, F.col("inter") / F.col("union_n")).otherwise(0.0),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_verify(
    candidates: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """Verify candidate pairs with true shingle-set Jaccard (row-local array ops after
    two hash joins against the shingle table)."""
    sh = (
        shingle_index(df, text_col, id_col, shingle_k)
        .groupBy("_id")
        .agg(F.collect_list("_sh").alias("_shingles"))
        .select(F.col("_id").alias("_vid"), F.col("_shingles").alias("_sh"))
    )
    out = (
        candidates.join(sh.withColumnRenamed("_vid", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_vid", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("double"))
        .withColumn(
            "union_n", (F.size("sh_a") + F.size("sh_b") - F.col("inter")).cast("double")
        )
        .withColumn(
            "jaccard",
            F.round(
                F.when(F.col("union_n") > 0, F.col("inter") / F.col("union_n")).otherwise(0.0), 6
            ),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


# --- SimHash ------------------------------------------------------------------------


def simhash64(text_expr: str) -> Column:
    """64-bit SimHash over whitespace tokens: per token hash, ±1 vote per bit, sign of
    the vote sum, reassembled into one bigint. Implemented as a SQL expression because
    shiftleft with a *column* shift amount is legal in SQL while the Python wrapper
    only accepts a literal. No explode, no shuffle — a narrow map at any scale."""
    return F.expr(_simhash_sql(text_expr)).cast("long")


def _simhash_sql(text_expr: str) -> str:
    """SQL text for simhash64 over a text expression (used via F.expr)."""
    return f"""
    aggregate(
      zip_with(
        aggregate(
          split(trim({text_expr}), '\\\\s+'),
          array_repeat(0L, 64),
          (acc, t) -> zip_with(
            acc,
            transform(sequence(0, 63),
                      j -> CASE WHEN (shiftright(xxhash64(t), j) & 1L) = 1L THEN 1 ELSE -1 END),
            (a, b) -> a + b)),
        sequence(0, 63),
        (s, j) -> struct(s AS s, j AS j)),
      0L,
      (acc, x) -> acc + CASE WHEN x.s > 0 THEN shiftleft(1L, x.j) ELSE 0L END)
    """


# --- portable token hash (oracle-reproducible SimHash) ------------------------------
# xxhash64 is Spark-specific, so fingerprints built on it are rows-only for an
# external oracle. hash_mode="portable" takes its 64 bit votes straight from the
# first 64 bits of md5(token) — an intrinsic BOTH engines compile, with ideally
# distributed bits and no further mixing needed. Parsed as two 32-bit halves so
# every value stays far below the signed-64 range (overflow-free under Spark 4's
# default ANSI mode and DuckDB's checked BIGINT alike). Earlier designs (per-char
# HOF fold + avalanche) cost 4x on the whole query: Catalyst interprets lambda
# folds per element, while md5 + shiftright stay in whole-stage codegen.


def portable_token_hash_halves(col: Column) -> tuple[Column, Column]:
    """(first, second) 32 md5 bits of a token as bigints, identical in Spark and
    DuckDB. Spark spells the hex parse ``conv(substring(md5(x), i, 8), 16, 10)``;
    the DuckDB twin casts '0x'-prefixed hex (portable_half_sql). Same md5 bytes
    -> same integers."""
    digest = F.md5(col)
    return (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long"),
        F.conv(F.substring(digest, 9, 8), 16, 10).cast("long"),
    )


def _portable_bit(h1: Column, h2: Column, j: int) -> Column:
    """Bit j of the portable 64-bit token hash (md5 bits, two 32-bit halves)."""
    h, shift = (h1, j) if j < 32 else (h2, j - 32)
    return F.shiftright(h, shift).bitwiseAND(F.lit(1))


def portable_half_sql(tok_expr: str, half: int) -> str:
    """DuckDB SQL for one 32-bit half (1 or 2) of the portable token hash."""
    start = 1 if half == 1 else 9
    return f"CAST(('0x' || substr(md5({tok_expr}), {start}, 8)) AS BIGINT)"


def portable_bit_sql(h1_expr: str, h2_expr: str, j: int) -> str:
    """DuckDB SQL for _portable_bit over precomputed half expressions."""
    expr, shift = (h1_expr, j) if j < 32 else (h2_expr, j - 32)
    return f"(({expr} >> {shift}) & 1)"


def simhash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """doc id -> 64-bit SimHash fingerprint.

    Explode+aggregate form (not the array-expression form of ``simhash64``): per
    token, 64 compiled ±1 bit votes; per doc, 64 map-side-combined sums; bits with a
    positive vote reassemble into the fingerprint with literal-shift adds. Whole-stage
    codegen end to end — the HOF form interprets ~tokens×64 lambda calls per doc.
    Docs with no tokens are absent from the output (nothing to fingerprint).

    ``hash_mode``: "xxhash64" (default — fastest, engine-specific) or "portable"
    (cross-engine-exact bit votes; see portable_token_hash). Plan shape is identical
    in both modes — only the per-token bit expressions differ.
    """
    if hash_mode not in ("xxhash64", "portable"):
        raise ValueError(f"unknown hash_mode: {hash_mode!r}")
    toks = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("_t")
    )
    if hash_mode == "xxhash64":
        toks = toks.select("_id", F.xxhash64("_t").alias("_h"))
        bit = lambda j: F.shiftright(F.col("_h"), j).bitwiseAND(F.lit(1))  # noqa: E731
    else:
        h1, h2 = portable_token_hash_halves(F.col("_t"))
        toks = toks.select("_id", h1.alias("_h1"), h2.alias("_h2"))
        bit = lambda j: _portable_bit(F.col("_h1"), F.col("_h2"), j)  # noqa: E731
    vote_cols = [
        F.sum(F.when(bit(j) == 1, 1).otherwise(-1)).alias(f"_s{j}")
        for j in range(64)
    ]
    sums = toks.groupBy("_id").agg(*vote_cols)
    fp = None
    for j in range(64):
        bit_val = (1 << j) if j < 63 else -(1 << 63)  # two's-complement top bit
        term = F.when(F.col(f"_s{j}") > 0, F.lit(bit_val).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else (fp + term)
    return sums.select(F.col("_id").alias(id_col), fp.cast("long").alias("simhash"))


def hamming_distance(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints: popcount(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_distance: int = 3,
    bands: int = 4,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup pairs: band the 64 bits into `bands` blocks (a distance-k pair
    with k < bands must agree exactly on ≥1 block), bucket-join on (block_idx, block),
    verify with popcount. Same LSH economics as MinHash banding.

    When ``max_distance < bands`` the pigeonhole principle makes banding LOSSLESS
    (any pair within distance agrees exactly on >= 1 block), so the output equals
    the exact all-pairs answer — which is what the DuckDB oracle computes when
    ``hash_mode="portable"`` makes the fingerprints engine-independent."""
    bits_per = 64 // bands
    # r14: the banded self-join recomputed the whole tokenize+vote pipeline on
    # BOTH sides (the broadcast side has no shuffle exchange to reuse — the
    # r13 plan shows two complete fingerprint subtrees, zero ReusedExchange).
    # The lazy checkpoint materializes the tiny (id, simhash) relation once.
    fp = simhash_fingerprints(df, text_col, id_col, hash_mode=hash_mode).localCheckpoint(
        eager=False
    )
    mask = (1 << bits_per) - 1
    banded = fp.select(
        F.col(id_col).alias("_id"),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    (F.shiftright("simhash", i * bits_per).bitwiseAND(F.lit(mask)))
                    for i in range(bands)
                ]
            )
        ).alias("block_idx", "block"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block") == F.col("b.block"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
        .withColumn("hamming", hamming_distance(F.col("sh_a"), F.col("sh_b")).cast("long"))
    )
    return pairs.filter(F.col("hamming") <= max_distance).select("id_a", "id_b", "hamming")


def contaminated_ids(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Eval-set decontamination: ids of training docs sharing ANY word k-gram with the
    eval/benchmark set (the standard n-gram overlap check run before LLM training).

    Shape at 100 TB: the training side is the same explode+lead shingle index every
    other dedup op uses (compiled, one shuffle by doc id); the eval side is tiny by
    nature (benchmarks are thousands of docs, not billions), so its distinct k-gram
    set broadcasts and the membership probe is a map-side semi join — the corpus
    never reshuffles. ``broadcast_eval=False`` falls back to a shuffled semi join
    for outsized eval sets.
    """
    ev_sh = shingle_index(eval_df, text_col, id_col, k).select("_sh").distinct()
    if broadcast_eval:
        ev_sh = F.broadcast(ev_sh)
    tr_sh = shingle_index(train, text_col, id_col, k, distinct=False)
    return (
        tr_sh.join(ev_sh, "_sh", "left_semi")
        .select(F.col("_id").alias(id_col))
        .distinct()
    )


def two_band_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_long: int = 13,
    k_short: int = 8,
    tau: float = 0.3,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Industry two-band decontamination: flag a training doc if it shares ANY
    verbatim ``k_long``-gram with the eval set (the GPT-3/PaLM-style 13-gram exact
    check) OR if at least ``tau`` of its distinct ``k_short``-grams hit (the ratio
    band that catches paraphrase-adjacent leakage a single long n-gram misses).

    ONE corpus pass serves BOTH bands (r14, guide §2.1 one-scan rule; the r13
    zip_with rewrite still consumed the banded frame twice — once per band —
    so the tokenize + two zip_with shingle chains re-executed per band, the
    dominant CPU of docs_training_prep_pipeline at 128 s + 46 s of task time
    in the r14 profile): the short and long shingle arrays are tagged with a
    band prefix ("s\\0" / "l\\0" — distinct prefixes, no cross-band key
    collisions), concatenated, and exploded ONCE; a single broadcast probe
    join against the identically-tagged eval set and a single map-side-
    combinable groupBy produce both bands' evidence per doc. The long band's
    ANY-hit is bool_or in the same aggregation (replacing the r13 semi-join +
    distinct + join-back — two fewer shuffles and a whole corpus
    tokenize+shingle pass removed). explode_outer keeps shingle-less docs as
    a null row -> counts 0, long_hit false.

    Returns (id_col, n_short_shingles, n_short_hits, short_ratio, long_hit,
    flagged); docs shorter than ``k_short`` tokens have ratio 0 and rely on the
    long band alone (and can't long-hit either — no evidence, never flagged).
    """
    if k_short >= k_long:
        raise ValueError(f"need k_short < k_long, got {k_short}/{k_long}")
    import os

    if os.environ.get("SPARK_GRAFT_TWOBAND_TWOPASS"):  # measurement/A-B toggle
        return two_band_decontaminate_twopass(
            train, eval_df, text_col, id_col, k_long, k_short, tau, broadcast_eval
        )

    def _tagged_bands(df: DataFrame) -> DataFrame:
        """(_id, _tsh: band-tagged distinct shingles of BOTH bands, one array)."""
        toks_df = df.select(
            F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
        )
        w_s, n = _shingle_windows_from_tokens(F.col("_toks"), k_short)
        w_l, _ = _shingle_windows_from_tokens(F.col("_toks"), k_long)
        empty = F.array().cast("array<string>")
        tag = lambda prefix: (lambda sh: F.concat(F.lit(prefix + "\x00"), sh))  # noqa: E731
        return toks_df.select(
            "_id",
            F.concat(
                F.transform(
                    F.when(n < k_short, empty).otherwise(F.array_distinct(w_s)),
                    tag("s"),
                ),
                F.transform(
                    F.when(n < k_long, empty).otherwise(F.array_distinct(w_l)),
                    tag("l"),
                ),
            ).alias("_tsh"),
        )

    ev = (
        _tagged_bands(eval_df)
        .select(F.explode("_tsh").alias("_sh"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_eval:
        ev = F.broadcast(ev)

    is_s = F.col("_sh").startswith("s")
    per_doc = (
        _tagged_bands(train)
        .select("_id", F.explode_outer("_tsh").alias("_sh"))
        .join(ev, "_sh", "left")
        .groupBy("_id")
        .agg(
            F.count(F.when(is_s, 1)).cast("long").alias("n_short_shingles"),
            F.count(F.when(is_s, F.col("_hit"))).cast("long").alias("n_short_hits"),
            F.coalesce(
                F.bool_or(~is_s & F.col("_hit").isNotNull()), F.lit(False)
            ).alias("long_hit"),
        )
    )
    ratio = F.when(
        F.col("n_short_shingles") > 0,
        F.round(F.col("n_short_hits") / F.col("n_short_shingles"), 6),
    ).otherwise(F.lit(0.0))
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_short_shingles",
        "n_short_hits",
        ratio.alias("short_ratio"),
        "long_hit",
        (F.col("long_hit") | (ratio >= tau)).alias("flagged"),
    )


def two_band_decontaminate_twopass(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_long: int = 13,
    k_short: int = 8,
    tau: float = 0.3,
    broadcast_eval: bool = True,
) -> DataFrame:
    """The r13 per-band form of ``two_band_decontaminate``, kept as the
    certified reference twin (and the A/B baseline behind the
    SPARK_GRAFT_TWOBAND_TWOPASS toggle): each band consumes the banded corpus
    frame separately, so the tokenize + zip_with shingle chains execute once
    PER BAND and the long band pays a semi-join + distinct + join-back.
    Results are identical to the fused form (pinned by pytest parity)."""
    if k_short >= k_long:
        raise ValueError(f"need k_short < k_long, got {k_short}/{k_long}")

    def _bands(df: DataFrame) -> DataFrame:
        toks_df = df.select(
            F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
        )
        w_s, n = _shingle_windows_from_tokens(F.col("_toks"), k_short)
        w_l, _ = _shingle_windows_from_tokens(F.col("_toks"), k_long)
        empty = F.array().cast("array<string>")
        return toks_df.select(
            "_id",
            F.when(n < k_short, empty).otherwise(F.array_distinct(w_s)).alias("_shs"),
            F.when(n < k_long, empty).otherwise(F.array_distinct(w_l)).alias("_shl"),
        )

    ev = _bands(eval_df)
    ev_s = ev.select(F.explode("_shs").alias("_sh_s")).distinct()
    ev_l = ev.select(F.explode("_shl").alias("_sh_l")).distinct()
    if broadcast_eval:
        ev_s, ev_l = F.broadcast(ev_s), F.broadcast(ev_l)

    tr = _bands(train)
    shorts = (
        tr.select("_id", F.explode_outer("_shs").alias("_sh_s"))
        .join(ev_s.withColumn("_hit_s", F.lit(1)), "_sh_s", "left")
        .groupBy("_id")
        .agg(
            F.count("_sh_s").cast("long").alias("n_short_shingles"),
            F.count("_hit_s").cast("long").alias("n_short_hits"),
        )
    )
    longs = (
        tr.select("_id", F.explode("_shl").alias("_sh_l"))
        .join(ev_l, "_sh_l", "left_semi")
        .select("_id")
        .distinct()
        .withColumn("_long_hit", F.lit(True))
    )
    per_doc = shorts.join(longs, "_id", "left").select(
        "_id",
        "n_short_shingles",
        "n_short_hits",
        F.coalesce(F.col("_long_hit"), F.lit(False)).alias("long_hit"),
    )
    ratio = F.when(
        F.col("n_short_shingles") > 0,
        F.round(F.col("n_short_hits") / F.col("n_short_shingles"), 6),
    ).otherwise(F.lit(0.0))
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_short_shingles",
        "n_short_hits",
        ratio.alias("short_ratio"),
        "long_hit",
        (F.col("long_hit") | (ratio >= tau)).alias("flagged"),
    )


def contamination_ratio(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-doc contamination ratio: fraction of the doc's DISTINCT word k-grams that
    appear anywhere in the eval/benchmark set (the thresholded form of
    ``contaminated_ids`` — real pipelines flag on ratio > tau rather than any-hit,
    so a single boilerplate n-gram doesn't nuke a clean document).

    Same scale shape as ``contaminated_ids``: broadcast eval k-gram set, corpus-side
    left join + per-doc aggregation — one shuffle by doc id (already the shingle
    index's distribution), nothing pairwise.

    Returns (id_col, n_shingles, n_hits, ratio); docs shorter than k tokens have no
    shingles and are omitted (no evidence either way).
    """
    ev_sh = shingle_index(eval_df, text_col, id_col, k).select("_sh").distinct()
    if broadcast_eval:
        ev_sh = F.broadcast(ev_sh)
    tr_sh = shingle_index(train, text_col, id_col, k, distinct=True)
    hits = tr_sh.join(ev_sh.withColumn("_hit", F.lit(1)), "_sh", "left")
    return (
        hits.groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_hits"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_shingles",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_shingles"), 6).alias("ratio"),
        )
    )


# --- deletion-neighborhood fuzzy matching (FastSS / SymSpell family) --------------------


def deletion_neighborhood_pairs(
    df: DataFrame, key_col: str = "key", id_col: str = "doc_id"
) -> DataFrame:
    """All pairs of rows whose keys are within edit distance 1, found via the
    FastSS deletion-neighborhood index — NOT an all-pairs scan.

    For edit distance <= 1 the single-deletion neighborhood is COMPLETE: if
    ed(a, b) <= 1 then a and b share a variant (a itself, b itself, or both
    with the differing position deleted), so bucketing by variant finds every
    qualifying pair and the levenshtein verify only discards the bucket's
    false positives (strings sharing a variant at distance 2, e.g. "ab"/"ba").
    Index size is (len+1) variants per key — a bounded narrow expansion; the
    bucket groupBy is one shuffle with AQE skew handling. (ed <= 2 needs the
    O(len^2) double-deletion neighborhood — out of scope here.)

    Keys must be ASCII (levenshtein is codepoint-based in Spark but BYTE-based
    in DuckDB; the certifying query normalizes to [a-z0-9 ] first). Returns
    (id_a, id_b, key_a, key_b, dist) with id_a < id_b, distinct pairs.
    """
    base = df.select(F.col(id_col).alias("_id"), F.col(key_col).alias("_k"))
    variants = base.select(
        "_id",
        "_k",
        F.explode(
            F.expr(
                "transform(sequence(0, length(_k)), "
                "i -> CASE WHEN i = 0 THEN _k "
                "ELSE concat(substring(_k, 1, i - 1), substring(_k, i + 1)) END)"
            )
        ).alias("_v"),
    ).distinct()  # a key can repeat a variant (deleting either of a double letter)
    a, b = variants.alias("a"), variants.alias("b")
    cand = (
        a.join(b, (F.col("a._v") == F.col("b._v")) & (F.col("a._id") < F.col("b._id")))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._k").alias("key_a"),
            F.col("b._k").alias("key_b"),
        )
        .distinct()
    )
    return cand.withColumn("dist", F.levenshtein("key_a", "key_b").cast("long")).filter(
        F.col("dist") <= 1
    )
