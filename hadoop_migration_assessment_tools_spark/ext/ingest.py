"""[EXT] Incremental corpus ingestion: admission control for new document batches.

A production training corpus is append-only with re-crawls: every incoming batch
must be admitted through (1) exact-dup rejection against the corpus, (2) exact
dedup inside the batch, (3) near-dup rejection against the corpus. This module
composes the engine's dedup primitives into that admission pipeline with a full
audit trail (every rejected id carries its reason — the data-lineage requirement
of corpus governance).

Scale shapes:
- Stage 1 joins on ``xxhash64(text)`` with a text-equality residual (collision-
  safe), so the shuffle key is 8 bytes, not the document body.
- Stage 2 is one groupBy(text-hash) min-id inside the (small) batch.
- Stage 3 uses the EXACT inverted shingle index (ext/dedup.shingle_index), not
  MinHash: the incoming side is batch-sized, so candidates are
  O(shared shingles x batch), and exact Jaccard keeps admission DETERMINISTIC —
  a requirement for reproducible corpus builds (and for the DuckDB oracle).
  At very large batch sizes swap stage 3's candidate generation for
  minhash_candidate_pairs and keep the same verify.
- The corpus side is scanned once per stage it feeds (hash anti join + shingle
  index); at true scale both corpus artifacts (text-hash index, shingle index)
  would be materialized once and reused across batches — this API takes the raw
  corpus to stay self-contained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingle_index

__all__ = ["incremental_ingest", "build_corpus_index", "incremental_ingest_indexed"]

REASON_EXACT_CORPUS = "exact_vs_corpus"
REASON_EXACT_BATCH = "exact_in_batch"
REASON_NEAR_CORPUS = "near_dup_vs_corpus"
REASON_NULL_TEXT = "null_text"


def _route_null_text(
    incoming: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """Stage 0: rows with NULL text get their own audit reason instead of
    silently vanishing (NULL never equals anything, so stage 1's anti join
    passes such rows through but stage 2's survivor join then drops them —
    neither admitted nor audited, breaking the 'audit + admitted partition the
    batch' invariant). A NULL document is never admissible, so explicit
    rejection is the right governance semantics."""
    null_rejected = incoming.filter(F.col(text_col).isNull()).select(
        F.col(id_col), F.lit(REASON_NULL_TEXT).alias("reason")
    )
    return incoming.filter(F.col(text_col).isNotNull()), null_rejected


def incremental_ingest(
    existing: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.7,
    shingle_k: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Run the three-stage admission pipeline.

    Returns (admitted, audit): ``admitted`` is the incoming rows that survived all
    three gates (original schema); ``audit`` is (id_col, reason) for every
    rejected row, reason in {null_text, exact_vs_corpus, exact_in_batch,
    near_dup_vs_corpus}.
    """
    incoming, s0_rejected = _route_null_text(incoming, text_col, id_col)
    th = F.xxhash64(F.col(text_col))

    # Stage-boundary materialization (NOTES "capstone" lesson): each stage below
    # references its input 2-3 times (semi + anti, survivor join). Without lineage
    # cuts every re-reference re-expands the whole upstream plan — measured 177
    # broadcast exchanges for the registry query's 5-way-union batch; with the
    # cuts, a handful. The checkpointed relations are batch-sized.
    inc = incoming.withColumn("_th", th).localCheckpoint()
    # DISTINCT (hash, text) pairs: dedup makes the marker join below safe (a
    # left join must not multiply batch rows when the corpus holds duplicate
    # texts) and is ONE map-side-combinable corpus pass — where the r13 shape
    # paid two (a semi + an anti join each re-derived the corpus hash
    # relation: the twinned 2.1 s serial stages in the r14 profile).
    ex_hashes = (
        existing.select(
            F.xxhash64(F.col(text_col)).alias("_ex_th"),
            F.col(text_col).alias("_ex_text"),
        )
        .distinct()
        .withColumn("_corpus_hit", F.lit(1))
    )

    # Stage 1 — exact vs corpus: ONE marker join on the 8-byte hash with text
    # residual; the checkpointed batch-sized result partitions into
    # rejected/passed by filter instead of semi+anti twin joins (guide §2.1).
    marked = inc.join(
        ex_hashes,
        (inc["_th"] == ex_hashes["_ex_th"]) & (inc[text_col] == ex_hashes["_ex_text"]),
        "left",
    ).localCheckpoint()
    s1_rejected = marked.filter(F.col("_corpus_hit").isNotNull()).select(
        F.col(id_col), F.lit(REASON_EXACT_CORPUS).alias("reason")
    )
    s1_pass = marked.filter(F.col("_corpus_hit").isNull()).drop(
        "_corpus_hit", "_ex_th", "_ex_text"
    )

    # Stage 2 — exact dedup inside the batch: deterministic min-id survivor.
    min_ids = s1_pass.groupBy("_th", text_col).agg(F.min(id_col).alias("_min_id"))
    s2 = s1_pass.join(F.broadcast(min_ids), ["_th", text_col])
    s2_rejected = s2.filter(F.col(id_col) != F.col("_min_id")).select(
        F.col(id_col), F.lit(REASON_EXACT_BATCH).alias("reason")
    )
    s2_pass = s2.filter(F.col(id_col) == F.col("_min_id")).drop("_min_id").localCheckpoint()

    # Stage 3 — near-dup vs corpus: exact shingle-Jaccard over the inverted index.
    # Both shingle relations feed TWO consumers (size aggregate + intersection
    # join); without a lineage cut each consumer re-runs the whole
    # tokenize+explode+distinct derivation (the twinned 3.2 s/4.4 MB corpus
    # stages in the r14 profile). The cut materializes each ONCE — exactly the
    # "corpus artifacts are materialized once and reused" production shape the
    # module docstring promises (incremental_ingest_indexed makes it durable).
    inc_sh = shingle_index(s2_pass, text_col, id_col, k=shingle_k).localCheckpoint(
        eager=False
    )
    inc_sizes = inc_sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_na"))
    ex_sh = (
        shingle_index(existing, text_col, id_col, k=shingle_k)
        .select(F.col("_id").alias("_ex_id"), F.col("_sh"))
        .localCheckpoint(eager=False)
    )
    ex_sizes = ex_sh.groupBy("_ex_id").agg(F.count(F.lit(1)).alias("_nb"))
    inter = (
        inc_sh.join(ex_sh, "_sh")
        .groupBy("_id", "_ex_id")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    jacc = (
        inter.join(F.broadcast(inc_sizes), "_id")
        .join(ex_sizes, "_ex_id")
        .withColumn(
            "_j",
            F.round(
                F.col("_inter").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("_inter")).cast("double"),
                6,
            ),
        )
    )
    near_ids = (
        jacc.filter(F.col("_j") >= jaccard_threshold).select(F.col("_id")).distinct()
    )
    s3_rejected = near_ids.select(
        F.col("_id").alias(id_col), F.lit(REASON_NEAR_CORPUS).alias("reason")
    )
    admitted = (
        s2_pass.join(
            near_ids.withColumnRenamed("_id", id_col), id_col, "left_anti"
        ).drop("_th")
    )
    audit = (
        s0_rejected.unionByName(s1_rejected)
        .unionByName(s2_rejected)
        .unionByName(s3_rejected)
    )
    return admitted, audit


# --- amortized path: materialized corpus artifacts ----------------------------------
# At production scale the corpus-side work (text-hash index + shingle index) is paid
# once and reused across every batch, not rebuilt per admission. These helpers
# materialize both as parquet and run the same three stages against them; the
# self-contained incremental_ingest above stays the reference semantics (equality
# tested in tests/test_ext_operators.py).


def build_corpus_index(
    existing: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 4,
) -> bool:
    """Write the two corpus-side artifacts: hashes/ (text-hash + text for the
    collision-safe exact gate) and shingles/ (inverted index with per-doc sizes
    for the exact-Jaccard gate).

    Rebuilds are SKIPPED when the corpus fingerprint matches the one recorded at
    the last build — one cheap aggregate scan (count + order-independent content
    hash + the shingle_k the index was built with) instead of the full shingle
    explode. This is the amortization the production admission path is about:
    the index is paid once per corpus VERSION, not once per batch. Any content
    change (or a different shingle_k) changes the fingerprint and forces a
    rebuild. Returns True if a build ran, False if the cached index was reused.
    """
    import json
    import os

    # Two INDEPENDENT order-independent accumulators (ADVICE r5): bit_xor alone
    # cancels — any row-set change whose hash deltas xor to zero (e.g. swap two
    # rows' texts) collides at equal count, silently reusing a stale index. The
    # second channel sums a differently-salted xxhash64 as DECIMAL(38,0):
    # order-independent, overflow-free under ANSI (sum of 2^63-bounded terms
    # stays far inside 38 digits for any realistic corpus), and a cancellation
    # now requires a simultaneous zero-delta in two unrelated hash functions.
    # Marker I/O is plain local-file for this sandbox; production swaps it for
    # the object-store API.
    row = existing.select(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"bit_xor(xxhash64(cast({id_col} as string), {text_col}))").alias(
            "content"
        ),
        F.expr(
            "sum(cast(xxhash64('fp2', cast({id} as string), {t}) as decimal(38,0)))".format(
                id=id_col, t=text_col
            )
        ).alias("content2"),
    ).first()
    # v2: hashes/ is written DISTINCT so the admission path can use ONE marker
    # join instead of semi+anti twins; the version tag forces stale v1 indexes
    # (non-distinct — a marker join would multiply batch rows) to rebuild.
    fingerprint = f"v2:{row['n']}:{row['content']}:{row['content2']}:k={shingle_k}"
    marker = os.path.join(index_path, "_FINGERPRINT")
    try:
        with open(marker) as fh:
            if json.load(fh).get("fingerprint") == fingerprint:
                return False
    except (OSError, ValueError):
        pass  # no/unreadable marker: build
    existing.select(
        F.xxhash64(F.col(text_col)).alias("_th"), F.col(text_col).alias("_ex_text")
    ).distinct().write.mode("overwrite").parquet(f"{index_path}/hashes")
    sh = shingle_index(existing, text_col, id_col, k=shingle_k)
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_nb"))
    sh.join(sizes, "_id").select(
        F.col("_id").alias("_ex_id"), F.col("_sh"), F.col("_nb")
    ).write.mode("overwrite").parquet(f"{index_path}/shingles")
    os.makedirs(index_path, exist_ok=True)
    with open(marker, "w") as fh:
        json.dump({"fingerprint": fingerprint}, fh)
    return True


def incremental_ingest_indexed(
    spark,
    index_path: str,
    incoming: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.7,
    shingle_k: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Same admission semantics as incremental_ingest, against pre-built corpus
    artifacts — zero corpus scans per batch."""
    ex_hashes = spark.read.parquet(f"{index_path}/hashes")
    ex_shingles = spark.read.parquet(f"{index_path}/shingles")

    incoming, s0_rejected = _route_null_text(incoming, text_col, id_col)
    inc = incoming.withColumn("_th", F.xxhash64(F.col(text_col))).localCheckpoint()
    # hashes/ is distinct by construction (v2 build above), so ONE marker join
    # partitions the batch into rejected/passed — the r13 semi+anti twins paid
    # two scans of the index and two joins per batch (guide §2.1).
    ex_marked = ex_hashes.withColumn("_corpus_hit", F.lit(1))
    cond = (inc["_th"] == ex_marked["_th"]) & (inc[text_col] == ex_marked["_ex_text"])
    marked = (
        inc.join(ex_marked, cond, "left")
        .drop(ex_marked["_th"])
        .drop("_ex_text")
        .localCheckpoint()
    )
    s1_rejected = marked.filter(F.col("_corpus_hit").isNotNull()).select(
        F.col(id_col), F.lit(REASON_EXACT_CORPUS).alias("reason")
    )
    s1_pass = marked.filter(F.col("_corpus_hit").isNull()).drop("_corpus_hit")

    min_ids = s1_pass.groupBy("_th", text_col).agg(F.min(id_col).alias("_min_id"))
    s2 = s1_pass.join(F.broadcast(min_ids), ["_th", text_col])
    s2_rejected = s2.filter(F.col(id_col) != F.col("_min_id")).select(
        F.col(id_col), F.lit(REASON_EXACT_BATCH).alias("reason")
    )
    s2_pass = s2.filter(F.col(id_col) == F.col("_min_id")).drop("_min_id").localCheckpoint()

    inc_sh = shingle_index(s2_pass, text_col, id_col, k=shingle_k)
    inc_sizes = inc_sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_na"))
    inter = (
        inc_sh.join(ex_shingles, "_sh")
        .groupBy("_id", "_ex_id", "_nb")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    jacc = inter.join(F.broadcast(inc_sizes), "_id").withColumn(
        "_j",
        F.round(
            F.col("_inter").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_inter")).cast("double"),
            6,
        ),
    )
    near_ids = jacc.filter(F.col("_j") >= jaccard_threshold).select("_id").distinct()
    s3_rejected = near_ids.select(
        F.col("_id").alias(id_col), F.lit(REASON_NEAR_CORPUS).alias("reason")
    )
    admitted = s2_pass.join(
        near_ids.withColumnRenamed("_id", id_col), id_col, "left_anti"
    ).drop("_th")
    audit = (
        s0_rejected.unionByName(s1_rejected)
        .unionByName(s2_rejected)
        .unionByName(s3_rejected)
    )
    return admitted, audit
