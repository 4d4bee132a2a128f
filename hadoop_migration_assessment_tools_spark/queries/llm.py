"""[EXT] LLM-pipeline queries over documents/embeddings (SURVEY §2.9 [EXT]).

Oracle-checked where SQL-expressible — including hash-family operators whose
OUTPUT is engine-independent even though their internals use engine-specific
xxhash64 (fingerprint distinct-counts, minhash/sign-LSH verified pair sets).
Genuinely engine-specific outputs (SimHash distances, IVF neighbor sets,
partition-local bin ids, Misra-Gries estimates) stay rows-only and are verified
in pytest instead (planted-duplicate recovery, recall floors, invariants).

The corpus has no exact duplicates, so dedup queries plant them deterministically
in-query (doc_id % 7 == 0 re-inserted with id + 1_000_000) — mirrored in each oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..ext.dedup import (
    duplicate_groups,
    shingle_index,
    simhash_near_pairs,
)
from ..ext.multimodal import extract_features, media_summary, synthesize_media
from ..ext.similarity import (
    cosine,
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    signbucket_topk,
)
from ..ext.text import (
    STOPWORDS,
    doc_fingerprint,
    language_id,
    language_scores,
    quality_features,
    quality_score,
    token_count,
)
from ..functions.localrel import local_df
from ..functions.parity import count_big
from ..plans.spread import spread_small_scan, table_path
from ..sources.readers import load_table

DUP_OFFSET = 1_000_000


def _spread(df: DataFrame, sf_dir: str, table: str = "documents", factor: int = 1) -> DataFrame:
    """Scale-adaptive scan spread (r13 optimization, guide §2.5/§2.6): the corpus
    ships one single-row-group parquet file per table, so a scan is ONE task and
    every CPU-heavy narrow map chained on it (shingling, MinHash, per-position
    CDC hashing, codec kernels) ran single-threaded — the profiled serial hot
    stages. A no-op whenever the input's natural split count already covers the
    session's parallelism (i.e. always at production input sizes)."""
    return spread_small_scan(df, table_path(sf_dir, table), factor=factor)


def _docs_with_planted_dups(
    spark: SparkSession, sf_dir: str, spread: bool = True
) -> DataFrame:
    """``spread=False`` opts a consumer out of the scan spread — for plans whose
    per-row work is too light to amortize the exchange (docs_exact_dedup:
    sha2 + one window; A/B/A 0.43 s unspread vs 0.88 s spread). The shingle/
    MinHash/pair-graph consumers keep it (0.5-0.7x ratios measured)."""
    docs = load_table(spark, sf_dir, "documents")
    dups = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + DUP_OFFSET
    )
    aug = docs.unionByName(dups)
    return _spread(aug, sf_dir) if spread else aug

_DOCS_AUG_CTE = f"""
WITH docs_aug AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET} AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id % 7 = 0
)
"""


# --- docs_exact_dedup ---------------------------------------------------------------


def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _docs_with_planted_dups(spark, sf_dir, spread=False)
    return (
        duplicate_groups(aug, "text", "doc_id")
        .select("text_hash", "dup_count", F.col("keeper_id").cast("long").alias("keeper_id"))
        .orderBy("keeper_id")
    )


DOCS_EXACT_DEDUP_ORACLE = (
    _DOCS_AUG_CTE
    + """
SELECT
  sha256(text) AS text_hash,
  CAST(COUNT(*) AS BIGINT) AS dup_count,
  CAST(MIN(doc_id) AS BIGINT) AS keeper_id
FROM docs_aug
GROUP BY sha256(text)
HAVING COUNT(*) > 1
ORDER BY keeper_id
"""
)


# --- docs_token_stats ---------------------------------------------------------------


def docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nt = token_count(F.col("text"))
    return (
        docs.withColumn("n_tokens", nt)
        .groupBy("lang")
        .agg(
            count_big("doc_count"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.sum("n_tokens").cast("double") / F.count(F.lit(1)), 6).alias("avg_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
        .orderBy("lang")
    )


DOCS_TOKEN_STATS_ORACLE = r"""
WITH toks AS (
  SELECT
    lang, n_chars,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
  FROM documents
)
SELECT
  lang,
  CAST(COUNT(*) AS BIGINT) AS doc_count,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) AS avg_tokens,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
FROM toks
GROUP BY lang
ORDER BY lang
"""


# --- docs_quality -------------------------------------------------------------------
# Per-doc quality decomposition — every component exact/deterministic (SQL-mirrored).


def docs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    q = quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        q["n_tokens"].alias("n_tokens"),
        q["mean_token_len"].alias("mean_token_len"),
        q["punct_ratio"].alias("punct_ratio"),
        q["stopword_ratio"].alias("stopword_ratio"),
        quality_score(F.col("text")).alias("quality"),
    )


_EN_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS["en"])

DOCS_QUALITY_ORACLE = rf"""
WITH feats AS (
  SELECT
    doc_id,
    CAST(length(text) AS BIGINT) AS n_chars,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
    CAST(length(regexp_replace(text, '[\w\s]', '', 'g')) AS BIGINT) AS n_punct,
    CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper,
    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                    x -> x IN ({_EN_STOP_SQL}))) AS n_stop,
    list_sum(list_transform(string_split_regex(trim(text), '\s+'),
                            x -> length(x))) AS alpha_len
  FROM documents
), ratios AS (
  SELECT
    doc_id,
    CAST(n_tokens AS BIGINT) AS n_tokens,
    CASE WHEN n_tokens > 0 THEN ROUND(CAST(alpha_len AS DOUBLE) / n_tokens, 6) ELSE 0.0 END AS mean_token_len,
    CASE WHEN n_chars > 0 THEN ROUND(CAST(n_punct AS DOUBLE) / n_chars, 6) ELSE 0.0 END AS punct_ratio,
    CASE WHEN n_chars > 0 THEN ROUND(CAST(n_upper AS DOUBLE) / n_chars, 6) ELSE 0.0 END AS upper_ratio,
    CASE WHEN n_tokens > 0 THEN ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) ELSE 0.0 END AS stopword_ratio
  FROM feats
)
SELECT
  doc_id, n_tokens, mean_token_len, punct_ratio, stopword_ratio,
  ROUND(
    LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4 +
    (CASE WHEN mean_token_len >= 2.0 AND mean_token_len <= 12.0 THEN 1.0 ELSE 0.3 END) * 0.3 +
    GREATEST(0.0, 1.0 - (punct_ratio + upper_ratio) * 2.0) * 0.3,
  6) AS quality
FROM ratios
"""


# --- docs_lang_scores ---------------------------------------------------------------
# Language-ID evidence + argmax, fully SQL-mirrored (list_reduce == aggregate).


def docs_lang_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = language_scores(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        s["de"].cast("long").alias("de_hits"),
        s["en"].cast("long").alias("en_hits"),
        s["es"].cast("long").alias("es_hits"),
        s["fr"].cast("long").alias("fr_hits"),
        s["zh"].cast("long").alias("zh_hits"),
        language_id(F.col("text")).alias("lang_pred"),
    )


def _stop_sql(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS[lang])


DOCS_LANG_SCORES_ORACLE = rf"""
WITH scores AS (
  SELECT
    doc_id, lang,
    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x IN ({_stop_sql('de')}))) AS BIGINT) AS de_hits,
    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x IN ({_stop_sql('en')}))) AS BIGINT) AS en_hits,
    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x IN ({_stop_sql('es')}))) AS BIGINT) AS es_hits,
    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x IN ({_stop_sql('fr')}))) AS BIGINT) AS fr_hits,
    CAST(length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS BIGINT) AS zh_hits
  FROM documents
)
SELECT
  doc_id, lang, de_hits, en_hits, es_hits, fr_hits, zh_hits,
  (SELECT CASE WHEN best.score >= 1 THEN best.lang ELSE 'und' END
   FROM (SELECT list_reduce(
           [{{'score': de_hits, 'lang': 'de'}}, {{'score': en_hits, 'lang': 'en'}},
            {{'score': es_hits, 'lang': 'es'}}, {{'score': fr_hits, 'lang': 'fr'}},
            {{'score': zh_hits, 'lang': 'zh'}}],
           (acc, x) -> CASE WHEN x.score > acc.score THEN x ELSE acc END) AS best)
  ) AS lang_pred
FROM scores
"""


# --- docs_shingle_jaccard -----------------------------------------------------------
# n-gram Jaccard near-dup via inverted-index join, oracle-mirrored. Planted dups
# guarantee hits (jaccard 1.0); the index stays sparse because word 4-shingles are
# distinctive.

# 6-shingles: over the corpus's tiny (~30-word) vocabulary, 4-shingles collide by
# birthday-bound across unrelated docs and the inverted join explodes (~190M pair rows
# at sf0.1). 6-shingles push the collision space to 30^6 — the index stays sparse.
SHINGLE_K = 6
JACCARD_THRESHOLD = 0.6


def docs_shingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _docs_with_planted_dups(spark, sf_dir)
    idx = shingle_index(aug, "text", "doc_id", SHINGLE_K)
    # r8: localCheckpoint — the self-join consumes this twice, and without the
    # checkpoint BOTH branches re-ran tokenize+distinct+window (the broadcast
    # side defeats ReuseExchange); 3.4 s bench / 7.5 s first-run -> 2.8 s warm
    inv = idx.select(
        F.col("_id").alias("doc_id"),
        F.count(F.lit(1)).over(Window.partitionBy("_id")).alias("n_sh"),
        F.col("_sh").alias("sh"),
    ).localCheckpoint(eager=False)
    a, b = inv.alias("a"), inv.alias("b")
    pairs = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("id_a", "id_b", "jaccard")
    )
    return pairs


DOCS_SHINGLE_JACCARD_ORACLE = (
    _DOCS_AUG_CTE
    + rf"""
, toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM docs_aug
), shingled AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(t) - {SHINGLE_K - 1}),
                                      i -> array_to_string(t[i:i+{SHINGLE_K - 1}], ' '))) AS shingles
  FROM toks
  WHERE len(t) >= {SHINGLE_K}
), inv AS (
  SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM shingled
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS inter
  FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b,
       ROUND(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 6) AS jaccard
FROM pairs
WHERE ROUND(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 6) >= {JACCARD_THRESHOLD}
"""
)


# --- emb_cosine_topk ----------------------------------------------------------------
# Brute-force exact ANN baseline; oracle mirrors the double-precision dot in list order.

TOPK_QUERIES = 20
TOPK_K = 5


def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _spread(load_table(spark, sf_dir, "embeddings"), sf_dir, table="embeddings")
    queries = emb.filter(F.col("vec_id") < TOPK_QUERIES)
    return cosine_topk_bruteforce(emb, queries, k=TOPK_K)


EMB_COSINE_TOPK_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {TOPK_QUERIES}),
scored AS (
  SELECT
    q.query_id,
    c.vec_id AS neighbor_id,
    list_sum(list_transform(list_zip(q.qv, c.embedding),
                            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot_qc,
    sqrt(list_sum(list_transform(q.qv, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nq,
    sqrt(list_sum(list_transform(c.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nc
  FROM embeddings c, q
  WHERE c.vec_id <> q.query_id
), ranked AS (
  SELECT
    query_id, neighbor_id,
    ROUND(CASE WHEN nq > 0 AND nc > 0 THEN dot_qc / (nq * nc) ELSE 0.0 END, 6) AS cosine
  FROM scored
), final AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM ranked
)
SELECT query_id, neighbor_id, cosine, rank FROM final WHERE rank <= {TOPK_K}
"""


# --- emb_ann_recall -----------------------------------------------------------------
# [EXT] the oracle-able ANN recall harness (VERDICT r3 next-round #3): IVF's learned
# centroids aren't SQL-expressible, so recall measurement is oracled through the
# sign-bucket ANN twin (ext/similarity.py: signbucket_topk) whose bucketing IS a
# closed-form SQL expression. DuckDB reproduces candidates, ranking, and the exact
# top-k, so the per-query recall@k hash-matches end to end. The IVF path itself stays
# rows-only with its pytest recall floor + the bench crossover proof.

ANN_SIGN_BITS = 3


def emb_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < TOPK_QUERIES)
    exact = cosine_topk_bruteforce(emb, q, k=TOPK_K).select("query_id", "neighbor_id")
    ann = signbucket_topk(emb, q, k=TOPK_K, n_bits=ANN_SIGN_BITS).select(
        "query_id", "neighbor_id"
    )
    hits = (
        ann.join(exact, ["query_id", "neighbor_id"], "leftsemi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_h"))
    )
    return (
        q.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("_h"), F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce(F.col("_h"), F.lit(0)) / F.lit(float(TOPK_K)), 6
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


EMB_ANN_RECALL_ORACLE = f"""
WITH b AS (
  SELECT vec_id, embedding,
         (CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END
        + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
        + CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) AS bucket
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < {TOPK_QUERIES}
), pair AS MATERIALIZED (
  SELECT
    q.query_id, c.vec_id AS neighbor_id, c.bucket = q.bucket AS same_bucket,
    list_sum(list_transform(list_zip(q.qv, c.embedding),
                            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot_qc,
    sqrt(list_sum(list_transform(q.qv, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nq,
    sqrt(list_sum(list_transform(c.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nc
  FROM b c, q
  WHERE c.vec_id <> q.query_id
), scored AS (
  SELECT query_id, neighbor_id, same_bucket,
         ROUND(CASE WHEN nq > 0 AND nc > 0 THEN dot_qc / (nq * nc) ELSE 0.0 END, 6) AS cosine
  FROM pair
), exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS r
    FROM scored
  ) WHERE r <= {TOPK_K}
), ann AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS r
    FROM scored WHERE same_bucket
  ) WHERE r <= {TOPK_K}
), hits AS (
  SELECT ann.query_id, COUNT(*) AS n_hits
  FROM ann JOIN exact ON ann.query_id = exact.query_id AND ann.neighbor_id = exact.neighbor_id
  GROUP BY ann.query_id
)
SELECT q.query_id,
       CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
       ROUND(COALESCE(hits.n_hits, 0) / {float(TOPK_K)}, 6) AS recall
FROM q LEFT JOIN hits ON q.query_id = hits.query_id
ORDER BY q.query_id
"""


# --- emb_hard_negatives --------------------------------------------------------------
# [EXT] contrastive-pair mining: for each query vector, the most-similar vectors
# carrying a DIFFERENT label — the "hard negatives" a contrastive/embedding
# trainer pairs against its positives. Runs the sign-bucket ANN plan (bucket
# equi-join + per-query window, ~1/2^n_bits of the corpus per query) with the
# label-inequality predicate fused into the candidate join, so easy negatives
# never reach the ranking window. The closed-form bucket function keeps the
# whole thing SQL-reproducible: candidates, label filter, ranking and cosines
# all replay in DuckDB (same machinery as emb_ann_recall).

HARD_NEG_K = 3


def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..ext.similarity import _paired_cosine, l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    bucket = sum(
        (
            F.when(F.col("embedding")[i] > 0, F.lit(1 << (ANN_SIGN_BITS - 1 - i))).otherwise(
                F.lit(0)
            )
        )
        for i in range(ANN_SIGN_BITS)
    ).alias("_bucket")
    q = emb.filter(F.col("vec_id") < TOPK_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("_qvec"),
        l2_norm(F.col("embedding")).alias("_qnorm"),
        bucket,
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("_cvec"),
        l2_norm(F.col("embedding")).alias("_cnorm"),
        bucket,
    )
    scored = (
        c.join(F.broadcast(q), "_bucket")
        .filter(
            (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("neighbor_label") != F.col("query_label"))
        )
        .withColumn("cosine", _paired_cosine())
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= HARD_NEG_K)
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label", "cosine", "rank"
        )
        .orderBy("query_id", "rank")
    )


EMB_HARD_NEGATIVES_ORACLE = f"""
WITH b AS (
  SELECT vec_id, label, embedding,
         (CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END
        + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
        + CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) AS bucket
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, label AS query_label, embedding AS qv, bucket
  FROM b WHERE vec_id < {TOPK_QUERIES}
), pair AS MATERIALIZED (
  SELECT
    q.query_id, q.query_label, c.vec_id AS neighbor_id, c.label AS neighbor_label,
    list_sum(list_transform(list_zip(q.qv, c.embedding),
                            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot_qc,
    sqrt(list_sum(list_transform(q.qv, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nq,
    sqrt(list_sum(list_transform(c.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nc
  FROM b c JOIN q ON c.bucket = q.bucket
  WHERE c.vec_id <> q.query_id AND c.label <> q.query_label
), ranked AS (
  SELECT query_id, query_label, neighbor_id, neighbor_label,
         ROUND(CASE WHEN nq > 0 AND nc > 0 THEN dot_qc / (nq * nc) ELSE 0.0 END, 6) AS cosine
  FROM pair
), final AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM ranked
)
SELECT query_id, query_label, neighbor_id, neighbor_label, cosine, rank
FROM final WHERE rank <= {HARD_NEG_K}
ORDER BY query_id, rank
"""


# --- emb_label_centroids ------------------------------------------------------------
# Element-wise centroid per label: exact decimal sums keep the shuffle-order noise out.


def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim0", "v")
    ).select("label", (F.col("dim0") + 1).cast("long").alias("dim"), F.col("v"))
    return (
        exploded.groupBy("label", "dim")
        .agg(
            F.round(
                F.sum(F.col("v").cast("decimal(18,9)")).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("centroid_val"),
            count_big("n_vectors"),
        )
        .orderBy("label", "dim")
    )


EMB_LABEL_CENTROIDS_ORACLE = """
SELECT
  label,
  i AS dim,
  ROUND(CAST(SUM(CAST(embedding[i] AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) AS centroid_val,
  CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM embeddings, generate_series(1, 64) s(i)
GROUP BY label, i
ORDER BY label, dim
"""


# --- rows-only [EXT] queries (engine-specific hashes / pandas UDF paths) ------------


MINHASH_VERIFY_THRESHOLD = 0.7


def docs_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidates verified with true Jaccard.

    Oracled (round 4): the minhash signatures are engine-specific xxhash64, but the
    VERIFIED OUTPUT is exact shingle Jaccard over the candidate set, and on this
    corpus every pair >= 0.7 is a planted verbatim copy (max organic Jaccard 0.034).
    Identical texts have identical signatures, so they collide in every band and
    LSH recall on them is 1.0 by construction — the output set provably equals the
    exact all-pairs answer DuckDB computes via its inverted shingle index.

    Runs the FUSED form (one shingle aggregation feeds both signatures and
    verification sets — ext/dedup.py: minhash_near_dup_pairs); the composed
    candidate+verify API remains for pipelines that stage them separately."""
    from ..ext.dedup import minhash_near_dup_pairs

    aug = _docs_with_planted_dups(spark, sf_dir)
    return minhash_near_dup_pairs(aug, threshold=MINHASH_VERIFY_THRESHOLD).orderBy(
        "id_a", "id_b"
    )


DOCS_MINHASH_NEAR_DUP_ORACLE = (
    _DOCS_AUG_CTE
    + rf"""
, toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM docs_aug
), shingled AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(t) - 3),
                                      i -> array_to_string(t[i:i+3], ' '))) AS shingles
  FROM toks
  WHERE len(t) >= 4
), inv AS (
  SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM shingled
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS inter
  FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b,
       ROUND(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 6) AS jaccard
FROM pairs
WHERE ROUND(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 6) >= {MINHASH_VERIFY_THRESHOLD}
ORDER BY id_a, id_b
"""
)


def docs_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banded near-dup pairs — hash-matched against an exact oracle.

    Round 5 (VERDICT r4 next-round #3): runs hash_mode="portable" (cross-engine
    32-bit token hash + avalanche bit votes, ext/dedup.py) so DuckDB can rebuild
    the EXACT same 64-bit fingerprints. With max_distance=3 < bands=4 the banded
    LSH is lossless by pigeonhole, so the Spark band-join plan must produce
    byte-identical results to the oracle's all-pairs popcount — certifying the
    banding, the fingerprint math, and the verify filter in one hash. The
    xxhash64 default stays the production fast path (covered by pytest)."""
    aug = _docs_with_planted_dups(spark, sf_dir)
    return simhash_near_pairs(aug, max_distance=3, hash_mode="portable").orderBy(
        "id_a", "id_b"
    )


def _simhash_oracle_sql() -> str:
    from ..ext.dedup import portable_bit_sql, portable_half_sql

    vote_sums = ",\n         ".join(
        f"SUM(CASE WHEN {portable_bit_sql('h1', 'h2', j)} = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(64)
    )
    fp_terms = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN CAST({(1 << j) if j < 63 else -(1 << 63)} AS BIGINT) ELSE 0 END)"
        for j in range(64)
    )
    return (
        _DOCS_AUG_CTE
        + rf"""
, toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
  FROM docs_aug WHERE length(trim(text)) > 0
), th AS (
  SELECT doc_id, {portable_half_sql('t', 1)} AS h1, {portable_half_sql('t', 2)} AS h2
  FROM toks
), votes AS (
  SELECT doc_id,
         {vote_sums}
  FROM th GROUP BY doc_id
), fp AS (
  SELECT doc_id, {fp_terms} AS simhash FROM votes
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b
"""
    )


DOCS_SIMHASH_NEAR_DUP_ORACLE = _simhash_oracle_sql()


def docs_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling token-chain fingerprints + per-source distinct counts.

    Oracled despite the engine-specific xxhash64 chain (VERDICT r3 next-round #3):
    the fingerprint's equivalence classes are token SEQUENCES, so the distinct-count
    per source equals DuckDB's distinct count of whitespace-normalized text — a
    closed-form aggregate that certifies the chain's injectivity-in-practice (a
    collision would shrink the Spark count and break the hash match)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", doc_fingerprint(F.col("text")))
        .groupBy("source")
        .agg(
            count_big("doc_count"),
            F.count_distinct("fp").cast("long").alias("distinct_fingerprints"),
        )
        .orderBy("source")
    )


DOCS_FINGERPRINTS_ORACLE = r"""
SELECT
  source,
  CAST(COUNT(*) AS BIGINT) AS doc_count,
  CAST(COUNT(DISTINCT regexp_replace(trim(text), '\s+', ' ', 'g')) AS BIGINT)
    AS distinct_fingerprints
FROM documents
GROUP BY source
ORDER BY source
"""


# --- emb_ivf_fixed_topk --------------------------------------------------------------
# [EXT] the ORACLED IVF entry (VERDICT r5 #5): deterministic centroids (embeddings of
# the nlist smallest vec_ids — no Lloyd training, no learned state) make the FULL
# probe->rank pipeline DuckDB-replayable: scan-local argmin assignment with in-order
# distance folds and first-index tie-breaks, per-query nprobe probe lists, exact-cosine
# re-rank inside probed lists. One hash certifies assignment, probing, candidates,
# cosines and ranks. The learned-centroid path remains the production entry
# (emb_topk_scaled_ivf, rows-only with its pytest recall floor + bench crossover).

IVF_FIXED_NLIST = 8
IVF_FIXED_NPROBE = 2


def emb_ivf_fixed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.similarity import cosine_topk_ivf_fixed

    emb = _spread(load_table(spark, sf_dir, "embeddings"), sf_dir, table="embeddings")
    queries = emb.filter(F.col("vec_id") < TOPK_QUERIES)
    return cosine_topk_ivf_fixed(
        emb, queries, k=TOPK_K, nlist=IVF_FIXED_NLIST, nprobe=IVF_FIXED_NPROBE
    )


EMB_IVF_FIXED_TOPK_ORACLE = f"""
WITH cents AS (
  -- the nlist SMALLEST ids, mirroring fixed_centroids' orderBy().limit() exactly
  -- (ADVICE r6: a WHERE vec_id < nlist filter only agrees when ids are contiguous
  -- from 0 — QUALIFY keeps the oracle honest under gaps or a nonzero base)
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, embedding AS cv
  FROM embeddings
  QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= {IVF_FIXED_NLIST}
), cdist AS (
  SELECT e.vec_id, e.label, e.embedding, c.cidx,
         list_sum(list_transform(list_zip(e.embedding, c.cv),
                  x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                     * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))) AS d
  FROM embeddings e, cents c
), assigned AS MATERIALIZED (
  SELECT vec_id AS neighbor_id, embedding AS cvec, cidx AS centroid_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cidx ASC) AS rn
        FROM cdist)
  WHERE rn = 1
), probes AS MATERIALIZED (
  SELECT vec_id AS query_id, embedding AS qv, cidx AS centroid_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cidx ASC) AS rn
        FROM cdist WHERE vec_id < {TOPK_QUERIES})
  WHERE rn <= {IVF_FIXED_NPROBE}
), pair AS MATERIALIZED (
  SELECT p.query_id, a.neighbor_id,
         list_sum(list_transform(list_zip(p.qv, a.cvec),
                  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot_qc,
         sqrt(list_sum(list_transform(p.qv, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nq,
         sqrt(list_sum(list_transform(a.cvec, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nc
  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id
  WHERE a.neighbor_id <> p.query_id
), ranked AS (
  SELECT query_id, neighbor_id,
         ROUND(CASE WHEN nq > 0 AND nc > 0 THEN dot_qc / (nq * nc) ELSE 0.0 END, 6) AS cosine
  FROM pair
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM ranked
) WHERE rank <= {TOPK_K}
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media pipeline: synthesize real WAV audio + baseline-JPEG images ->
    Arrow-batched decode + feature extraction (duration/RMS for audio; the full
    JPEG pipeline — Huffman decode, dequant, IDCT, YCbCr->RGB (ext/jpeg.py) —
    then dimensions/mean-RGB for images; digest fallback with decoded=false for
    opaque video) -> per-(kind, format) rollup. The image/jpeg row's n_decoded
    == n_media is the honest-coverage certificate for the JPEG decoder (VERDICT
    r4 #1); multimodal_manifest keeps certifying the closed-form PPM path.

    ORACLED since r9 (VERDICT r8 #3, formerly rows-only): the rollup sums an
    integer PROBE extracted from each row's decoded features — image: decoded
    pixel width (features[0], exact float); audio: decoded sample count
    (features[0] is seconds = n/16000; x16000 recovers n to well under 0.5
    ulp); video (the decoded=false digest path): the first 32 bits of
    sha256(payload), recomputed in-plan from the payload so DuckDB can replay
    it from the text bytes. Every probe is a closed-form integer from
    (doc_id, text), so one hash certifies the JPEG decode dims, the WAV
    duration arithmetic AND the digest fallback identity. JPEG payload sizes
    (Huffman-dependent) are deliberately NOT in the output — byte accounting
    is multimodal_manifest's closed-form PPM/WAV job."""
    docs = load_table(spark, sf_dir, "documents")
    # JPEG encode+decode is the CPU-heavy honest path: spread the corpus across
    # the executor cores BEFORE the Arrow UDFs (the parquet source arrives in a
    # handful of splits, which serialized the whole pipeline onto few workers —
    # measured 27 s -> ~3 s at sf0.1 from this repartition alone). r13: the
    # fixed repartition(64, doc_id) became the scale-adaptive round-robin
    # spread — factor 2 over-partitions so variable-cost payloads rebalance
    # instead of one max-cost hash partition setting the stage wall time.
    docs = _spread(docs, sf_dir, factor=2)
    media = synthesize_media(docs, image_format="jpeg")
    feats = extract_features(
        media.withColumn("format", F.col("meta.format")),
        passthrough=["format", "payload"],
    )
    probe = (
        F.when(
            F.col("kind") == "image",
            F.element_at("features", 1).cast("long"),  # decoded width, exact
        )
        .when(
            F.col("kind") == "audio",
            F.round(F.element_at("features", 1) * 16000).cast("long"),  # n samples
        )
        .otherwise(  # digest fallback identity: first 32 bits of sha256(payload)
            F.conv(F.substring(F.sha2(F.col("payload"), 256), 1, 8), 16, 10).cast("long")
        )
    )
    return (
        feats.withColumn("_probe", probe)
        .groupBy("kind", "format")
        .agg(
            count_big("n_media"),
            F.sum(F.when(F.col("decoded"), 1).otherwise(0)).cast("long").alias("n_decoded"),
            F.sum("_probe").cast("long").alias("sum_probe"),
        )
        .orderBy("kind", "format")
    )


MULTIMODAL_FEATURES_ORACLE = """
WITH base AS (SELECT doc_id, text FROM documents)
SELECT * FROM (
  SELECT 'audio' AS kind, 'audio/wav' AS format,
         CAST(COUNT(*) AS BIGINT) AS n_media,
         CAST(COUNT(*) AS BIGINT) AS n_decoded,
         CAST(SUM(length(text) % 400 + 100) AS BIGINT) AS sum_probe
  FROM base WHERE doc_id % 3 = 1
  UNION ALL
  SELECT 'image', 'image/jpeg',
         CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT),
         CAST(SUM(length(text) % 64 + 4) AS BIGINT)
  FROM base WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'video', 'fake/raw',
         CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT),
         CAST(SUM(CAST(('0x' || substr(sha256(text), 1, 8)) AS BIGINT)) AS BIGINT)
  FROM base WHERE doc_id % 3 = 2
)
ORDER BY kind, format
"""


# --- multimodal_decode_rates -----------------------------------------------------------
# [EXT] The decode-honesty certificate as an ORACLED relation (upgrades what was
# previously a pytest-only claim): the engine runs the REAL pipeline — synthesize
# JPEG/WAV/opaque payloads, Arrow-batched decode through ext/jpeg.py and the WAV
# parser — and reports per-(kind, format) decode counts; the oracle derives the
# expected counts closed-form from the corpus (kind cycles with doc_id % 3; every
# real-format payload must decode, every opaque video row must flag
# decoded=false). A single silent decode regression in any codec path (baseline /
# progressive / 12-bit JPEG, PCM WAV) breaks the hash.


def multimodal_decode_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(load_table(spark, sf_dir, "documents"), sf_dir, factor=2)
    media = synthesize_media(docs, image_format="jpeg")
    feats = extract_features(
        media.withColumn("format", F.col("meta.format")), passthrough=["format"]
    )
    return (
        feats.groupBy("kind", "format")
        .agg(
            count_big("n_media"),
            F.sum(F.when(F.col("decoded"), 1).otherwise(0)).cast("long").alias("n_decoded"),
        )
        .orderBy("kind", "format")
    )


MULTIMODAL_DECODE_RATES_ORACLE = """
WITH base AS (SELECT doc_id FROM documents)
SELECT * FROM (
  SELECT 'audio' AS kind, 'audio/wav' AS format,
         CAST(COUNT(*) AS BIGINT) AS n_media, CAST(COUNT(*) AS BIGINT) AS n_decoded
  FROM base WHERE doc_id % 3 = 1
  UNION ALL
  SELECT 'image', 'image/jpeg', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT)
  FROM base WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'video', 'fake/raw', CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT)
  FROM base WHERE doc_id % 3 = 2
)
ORDER BY kind, format
"""


# --- emb_topk_scaled_{bruteforce,ivf} -----------------------------------------------
# [EXT] IVF crossover proof (VERDICT r1 next-round #7). At the raw corpus size the
# IVF fixed cost (sample + Lloyd + bucketing UDF) dominates and bruteforce wins; these
# two entries run the SAME top-k on the same deterministically replicated corpus
# (SCALED_REPS x vectors, perturbed per replica) with a larger query set, where
# scanning nprobe/nlist of the corpus must beat scanning all of it. BENCH_r{N} carries
# the side-by-side wall times; pytest asserts IVF recall >= 0.8 vs the exact result.

# r12 (VERDICT r11 #5): 12 -> 6. The bruteforce control exists only to dominate
# the IVF row convincingly (it had grown to ~24 s, ~10% of the whole bench);
# at 6x the scan-work ratio is still nlist/nprobe = 8x before fixed costs, and
# BENCH_r12 must show >= 2x crossover margin. Both oracles derive from this
# constant, so exact-hash parity is unaffected.
SCALED_REPS = 6
SCALED_QUERIES = 75
_SCALED_ID_STRIDE = 10_000_000


def _scaled_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicate the corpus SCALED_REPS times with a deterministic per-replica
    perturbation — array HOFs only, so scaling happens executor-side (no generation
    shuffle; the explode is a narrow map)."""
    emb = _spread(load_table(spark, sf_dir, "embeddings"), sf_dir, table="embeddings")
    reps = emb.select(
        "vec_id",
        "embedding",
        F.explode(F.sequence(F.lit(0), F.lit(SCALED_REPS - 1))).alias("rep"),
    )
    perturbed = F.transform(
        "embedding",
        lambda x, i: x.cast("double")
        + ((F.col("rep") * (i + 3)) % 11).cast("double") * 0.003,
    )
    return reps.select(
        (F.col("vec_id") + F.col("rep") * _SCALED_ID_STRIDE).alias("vec_id"),
        perturbed.cast("array<float>").alias("embedding"),
    )


def _scaled_queries(scaled: DataFrame) -> DataFrame:
    return scaled.filter(F.col("vec_id") < SCALED_QUERIES)  # rep-0 originals only


def emb_topk_scaled_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k on the replicated corpus — the crossover baseline.

    Oracled (round 4): the deterministic per-replica perturbation is SQL-expressible
    (DuckDB's generate_series supplies the element index Spark's transform lambda
    gets natively), and the float-cast quantization is reproduced with CAST AS REAL,
    so the exact neighbor sets hash-match end to end — the SCALED_REPS-x corpus baseline is
    certified, not just timed."""
    scaled = _scaled_embeddings(spark, sf_dir)
    return cosine_topk_bruteforce(scaled, _scaled_queries(scaled), k=TOPK_K)


EMB_TOPK_SCALED_BRUTEFORCE_ORACLE = f"""
WITH reps AS (
  SELECT vec_id, embedding, r.rep FROM embeddings, generate_series(0, {SCALED_REPS - 1}) r(rep)
), scaled AS (
  SELECT vec_id + rep * {_SCALED_ID_STRIDE} AS vec_id,
         list_transform(generate_series(1, len(embedding)),
             i -> CAST(CAST(embedding[i] AS DOUBLE)
                       + ((rep * (i + 2)) % 11) * 0.003 AS REAL)) AS embedding
  FROM reps
), q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM scaled WHERE vec_id < {SCALED_QUERIES}
), pair AS MATERIALIZED (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    list_sum(list_transform(list_zip(q.qv, c.embedding),
                            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot_qc,
    sqrt(list_sum(list_transform(q.qv, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nq,
    sqrt(list_sum(list_transform(c.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nc
  FROM scaled c, q WHERE c.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id,
         ROUND(CASE WHEN nq > 0 AND nc > 0 THEN dot_qc / (nq * nc) ELSE 0.0 END, 6) AS cosine
  FROM pair
), final AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM ranked
)
SELECT query_id, neighbor_id, cosine, rank FROM final WHERE rank <= {TOPK_K}
ORDER BY query_id, rank
"""


SCALED_IVF_NLIST = 32
SCALED_IVF_NPROBE = 4
SCALED_IVF_ITERS = 2
SCALED_IVF_SAMPLE_N = 2048


def emb_topk_scaled_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEARNED-centroid IVF top-k on the replicated corpus — must beat
    bruteforce here (the crossover pair in BENCH).

    ORACLED since r9 (VERDICT r8 #3, formerly rows-only): training runs
    FIXED-POINT Lloyd (ext/similarity.train_centroids_quantized — floor(x*2^20)
    quantization, exact-int squared-L2, argmin with lowest-id ties, floor-div
    means, integer-formula init), so every step is exact integer arithmetic
    that numpy, Spark long-HOFs and DuckDB's unrolled-CTE replay compute
    identically — the PageRank scaled-BIGINT precedent applied to k-means. The
    corpus assignment stays one vectorized Arrow scan (BLAS on integer-valued
    float64, exact below 2^53, so argmin ties replay exactly); ranking is the
    portable 6dp-rounded cosine on the original floats. The float-Lloyd
    ``cosine_topk_ivf`` remains in the library as the multi-iteration
    production seam (pytest recall floors).

    Round-5 cost cut preserved: the rep-0 replica IS the base table, so both
    the training sample and the query set read the base ``embeddings`` parquet
    directly (filters push down; the SCALED_REPS-x replication is never re-evaluated for
    them)."""
    from ..ext.similarity import cosine_topk_ivf_quantized

    scaled = _scaled_embeddings(spark, sf_dir)
    base = _spread(load_table(spark, sf_dir, "embeddings"), sf_dir, table="embeddings")
    queries = base.filter(F.col("vec_id") < SCALED_QUERIES)
    return cosine_topk_ivf_quantized(
        scaled,
        queries,
        k=TOPK_K,
        nlist=SCALED_IVF_NLIST,
        nprobe=SCALED_IVF_NPROBE,
        sample_n=SCALED_IVF_SAMPLE_N,
        iters=SCALED_IVF_ITERS,
        train_sample=base,
    )


def _scaled_ivf_lloyd_iteration_sql(i: int) -> str:
    """One unrolled fixed-point Lloyd round: exact-int assignment to c{i-1},
    elementwise floor-div means (the ((sv % cnt)+cnt)%cnt construction makes
    the floor division explicit and %-semantics-independent), empty clusters
    keep their previous centroid."""
    return f"""a{i} AS MATERIALIZED (
  SELECT s.sid, s.xq, c.cid,
         list_sum(list_transform(list_zip(s.xq, c.c),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM s, c{i - 1} c
), b{i} AS MATERIALIZED (
  SELECT sid, xq, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY sid ORDER BY d ASC, cid ASC) AS rn
    FROM a{i}) WHERE rn = 1
), m{i} AS (
  SELECT cid, u.i AS dim, SUM(xq[u.i]) AS sv, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM b{i}, generate_series(1, 64) u(i)
  GROUP BY cid, u.i
), u{i} AS (
  SELECT cid,
         list(CAST((sv - (((sv % cnt) + cnt) % cnt)) // cnt AS BIGINT)
              ORDER BY dim) AS c
  FROM m{i} GROUP BY cid
), c{i} AS MATERIALIZED (
  SELECT c{i - 1}.cid, COALESCE(u{i}.c, c{i - 1}.c) AS c
  FROM c{i - 1} LEFT JOIN u{i} USING (cid)
)"""


EMB_TOPK_SCALED_IVF_ORACLE = f"""
WITH reps AS (
  SELECT vec_id, embedding, r.rep FROM embeddings, generate_series(0, {SCALED_REPS - 1}) r(rep)
), scaled AS (
  SELECT vec_id + rep * {_SCALED_ID_STRIDE} AS vec_id,
         list_transform(generate_series(1, len(embedding)),
             i -> CAST(CAST(embedding[i] AS DOUBLE)
                       + ((rep * (i + 2)) % 11) * 0.003 AS REAL)) AS embedding
  FROM reps
), s AS (
  -- quantized training sample: the {SCALED_IVF_SAMPLE_N} smallest-id BASE vectors
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS sid,
         list_transform(embedding,
             v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT)) AS xq
  FROM embeddings
  QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= {SCALED_IVF_SAMPLE_N}
), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s
), c0 AS (
  -- integer-formula init: idx_i = i*(n-1) // (nlist-1)
  SELECT g.i AS cid, s.xq AS c
  FROM generate_series(0, {SCALED_IVF_NLIST - 1}) g(i), nn
  JOIN s ON s.sid = (g.i * (nn.n - 1)) // {SCALED_IVF_NLIST - 1}
), {_scaled_ivf_lloyd_iteration_sql(1)}, {_scaled_ivf_lloyd_iteration_sql(2)},
corpq AS MATERIALIZED (
  SELECT vec_id, embedding,
         list_transform(embedding,
             v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT)) AS xq
  FROM scaled
), adist AS MATERIALIZED (
  SELECT cq.vec_id, cq.embedding, c.cid,
         list_sum(list_transform(list_zip(cq.xq, c.c),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM corpq cq, c{SCALED_IVF_ITERS} c
), assigned AS MATERIALIZED (
  SELECT vec_id AS neighbor_id, embedding AS cvec, cid AS centroid_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
        FROM adist) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, embedding AS qv,
         list_transform(embedding,
             v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT)) AS qq
  FROM embeddings WHERE vec_id < {SCALED_QUERIES}
), pdist AS (
  SELECT q.query_id, q.qv, c.cid,
         list_sum(list_transform(list_zip(q.qq, c.c),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM q, c{SCALED_IVF_ITERS} c
), probes AS MATERIALIZED (
  SELECT query_id, qv, cid AS centroid_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d ASC, cid ASC) AS rn
        FROM pdist) WHERE rn <= {SCALED_IVF_NPROBE}
), pair AS MATERIALIZED (
  SELECT p.query_id, a.neighbor_id,
    list_sum(list_transform(list_zip(p.qv, a.cvec),
                            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot_qc,
    sqrt(list_sum(list_transform(p.qv, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nq,
    sqrt(list_sum(list_transform(a.cvec, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nc
  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id
  WHERE a.neighbor_id <> p.query_id
), rankedc AS (
  SELECT query_id, neighbor_id,
         ROUND(CASE WHEN nq > 0 AND nc > 0 THEN dot_qc / (nq * nc) ELSE 0.0 END, 6) AS cosine
  FROM pair
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM rankedc
) WHERE rank <= {TOPK_K}
"""


# --- emb_hier_ivf_topk ----------------------------------------------------------------
# [EXT] Two-level IVF (VERDICT r12 #3 — the 100 TB routing depth). At N~1e11
# vectors, nlist~sqrt(N)~300k centroids cannot broadcast as one relation and a
# flat query-to-all-centroids probe is a 300k-wide matmul per query; production
# systems (Faiss IVF_HNSW / SPANN) route hierarchically: a small coarse level
# first, then only the probed cells' fine centroids. Training, both assignment
# levels, and probe routing are all fixed-point-exact (the scaled-IVF Lloyd
# discipline applied per cell), so the whole stack replays in unrolled CTEs —
# hash-certified, not just recall-floored. The test-scale layout keeps the
# TOTAL fine-cell count equal to the flat control's nlist (4x8 = 32) and the
# scan budget equal (4 cells probed), so the pytest recall comparison
# (test_hier_ivf_recall_at_equal_budget) is apples-to-apples: hier recall >=
# flat recall at every SF. SCALE.md carries the 1e11 centroid arithmetic.

HIER_NCOARSE = 4
HIER_NFINE = 8
HIER_NPROBE_COARSE = 2
HIER_NPROBE_FINE = 4
HIER_COARSE_ITERS = 3
HIER_FINE_ITERS = 2


def emb_hier_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical (coarse->fine) IVF top-k on the replicated corpus, fully
    oracled: coarse Lloyd on the sample, per-cell fine Lloyd over the cell's
    members in sample order, two-stage exact-integer routing, one broadcast
    equi-join on the fine cell id, exact-cosine re-rank. Plan shape equals the
    flat learned path (no corpus shuffle; probes broadcast)."""
    from ..ext.similarity import cosine_topk_hier_ivf_quantized

    scaled = _scaled_embeddings(spark, sf_dir)
    base = _spread(load_table(spark, sf_dir, "embeddings"), sf_dir, table="embeddings")
    queries = base.filter(F.col("vec_id") < SCALED_QUERIES)
    return cosine_topk_hier_ivf_quantized(
        scaled,
        queries,
        k=TOPK_K,
        n_coarse=HIER_NCOARSE,
        n_fine=HIER_NFINE,
        nprobe_coarse=HIER_NPROBE_COARSE,
        nprobe_fine=HIER_NPROBE_FINE,
        sample_n=SCALED_IVF_SAMPLE_N,
        coarse_iters=HIER_COARSE_ITERS,
        fine_iters=HIER_FINE_ITERS,
        train_sample=base,
    )


def _hier_fine_lloyd_iteration_sql(i: int) -> str:
    """One unrolled PER-CELL fixed-point Lloyd round for the fine level: each
    sample row competes only against ITS coarse cell's fine centroids (join on
    cid), floor-div means per (cid, j), empty fine clusters keep their
    previous centroid — exactly ext/similarity._lloyd_int run cell-by-cell."""
    return f"""fa{i} AS MATERIALIZED (
  SELECT o.sid, o.xq, o.cid, f.j,
         list_sum(list_transform(list_zip(o.xq, f.c),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM ordm o JOIN f{i - 1} f ON f.cid = o.cid
), fb{i} AS MATERIALIZED (
  SELECT sid, xq, cid, j FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY sid ORDER BY d ASC, j ASC) AS rn
    FROM fa{i}) WHERE rn = 1
), fm{i} AS (
  SELECT cid, j, u.i AS dim, SUM(xq[u.i]) AS sv, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM fb{i}, generate_series(1, 64) u(i)
  GROUP BY cid, j, u.i
), fu{i} AS (
  SELECT cid, j,
         list(CAST((sv - (((sv % cnt) + cnt) % cnt)) // cnt AS BIGINT)
              ORDER BY dim) AS c
  FROM fm{i} GROUP BY cid, j
), f{i} AS MATERIALIZED (
  SELECT p.cid, p.j, COALESCE(fu{i}.c, p.c) AS c
  FROM f{i - 1} p LEFT JOIN fu{i} ON fu{i}.cid = p.cid AND fu{i}.j = p.j
)"""


def _hier_train_sql(
    n_coarse: int, n_fine: int, coarse_iters: int, fine_iters: int
) -> str:
    """The two-level trainer's CTE chain, parameterized (r13 — shared by the
    hier top-k oracle and the hier residual-PQ stack). Expects a CTE named
    ``s`` (sid, xq) — the quantized training sample in id order. Produces the
    final coarse table ``c{coarse_iters}`` and fine table ``f{fine_iters}``
    (cid, j, c)."""
    coarse_rounds = ", ".join(
        _scaled_ivf_lloyd_iteration_sql(i) for i in range(1, coarse_iters + 1)
    )
    fine_rounds = ", ".join(
        _hier_fine_lloyd_iteration_sql(i) for i in range(1, fine_iters + 1)
    )
    return f"""nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s
), c0 AS (
  SELECT g.i AS cid, s.xq AS c
  FROM generate_series(0, {n_coarse - 1}) g(i), nn
  JOIN s ON s.sid = (g.i * (nn.n - 1)) // {n_coarse - 1}
), {coarse_rounds},
sa0 AS MATERIALIZED (
  -- assign the sample to its final coarse cell (exact int, lowest-cid ties)
  SELECT s.sid, s.xq, c.cid,
         list_sum(list_transform(list_zip(s.xq, c.c),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM s, c{coarse_iters} c
), ordm AS MATERIALIZED (
  -- per-cell member positions IN SAMPLE ORDER (the python trainer's implicit order)
  SELECT sid, xq, cid,
         ROW_NUMBER() OVER (PARTITION BY cid ORDER BY sid) - 1 AS pos
  FROM (SELECT sid, xq, cid FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY sid ORDER BY d ASC, cid ASC) AS rn
          FROM sa0) WHERE rn = 1)
), cellsz AS (
  SELECT cid, CAST(COUNT(*) AS BIGINT) AS m FROM ordm GROUP BY cid
), f0 AS MATERIALIZED (
  -- per-cell integer-formula init: fine j starts at member pos j*(m-1)//(nfine-1);
  -- a cell with no members inherits its coarse centroid (deterministic, unroutable)
  SELECT c.cid, gj.j, COALESCE(o.xq, c.c) AS c
  FROM c{coarse_iters} c
  CROSS JOIN generate_series(0, {n_fine - 1}) gj(j)
  LEFT JOIN cellsz z ON z.cid = c.cid
  LEFT JOIN ordm o ON o.cid = c.cid AND o.pos = (gj.j * (z.m - 1)) // {n_fine - 1}
), {fine_rounds}"""


EMB_HIER_IVF_TOPK_ORACLE = f"""
WITH reps AS (
  SELECT vec_id, embedding, r.rep FROM embeddings, generate_series(0, {SCALED_REPS - 1}) r(rep)
), scaled AS (
  SELECT vec_id + rep * {_SCALED_ID_STRIDE} AS vec_id,
         list_transform(generate_series(1, len(embedding)),
             i -> CAST(CAST(embedding[i] AS DOUBLE)
                       + ((rep * (i + 2)) % 11) * 0.003 AS REAL)) AS embedding
  FROM reps
), s AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS sid,
         list_transform(embedding,
             v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT)) AS xq
  FROM embeddings
  QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= {SCALED_IVF_SAMPLE_N}
), {_hier_train_sql(HIER_NCOARSE, HIER_NFINE, HIER_COARSE_ITERS, HIER_FINE_ITERS)},
corpq AS MATERIALIZED (
  SELECT vec_id, embedding,
         list_transform(embedding,
             v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT)) AS xq
  FROM scaled
), cad AS MATERIALIZED (
  -- corpus: nearest coarse cell
  SELECT cq.vec_id, cq.embedding, cq.xq, c.cid,
         list_sum(list_transform(list_zip(cq.xq, c.c),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM corpq cq, c{HIER_COARSE_ITERS} c
), cas AS MATERIALIZED (
  SELECT vec_id, embedding, xq, cid
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
        FROM cad) WHERE rn = 1
), fad AS MATERIALIZED (
  -- then nearest fine centroid WITHIN that cell; global id = cid*nfine + j
  SELECT a.vec_id, a.embedding, a.cid * {HIER_NFINE} + f.j AS fid,
         list_sum(list_transform(list_zip(a.xq, f.c),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM cas a JOIN f{HIER_FINE_ITERS} f ON f.cid = a.cid
), assigned AS MATERIALIZED (
  SELECT vec_id AS neighbor_id, embedding AS cvec, fid AS centroid_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, fid ASC) AS rn
        FROM fad) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, embedding AS qv,
         list_transform(embedding,
             v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT)) AS qq
  FROM embeddings WHERE vec_id < {SCALED_QUERIES}
), qcd AS (
  -- query routing stage 1: nprobe_coarse nearest coarse cells
  SELECT q.query_id, q.qv, q.qq, c.cid,
         list_sum(list_transform(list_zip(q.qq, c.c),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM q, c{HIER_COARSE_ITERS} c
), qcs AS MATERIALIZED (
  SELECT query_id, qv, qq, cid
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d ASC, cid ASC) AS rn
        FROM qcd) WHERE rn <= {HIER_NPROBE_COARSE}
), qfd AS (
  -- stage 2: nprobe_fine nearest fine cells among the probed cells' union
  SELECT p.query_id, p.qv, f.cid * {HIER_NFINE} + f.j AS fid,
         list_sum(list_transform(list_zip(p.qq, f.c),
                  p2 -> (p2[1] - p2[2]) * (p2[1] - p2[2]))) AS d
  FROM qcs p JOIN f{HIER_FINE_ITERS} f ON f.cid = p.cid
), probes AS MATERIALIZED (
  SELECT query_id, qv, fid AS centroid_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d ASC, fid ASC) AS rn
        FROM qfd) WHERE rn <= {HIER_NPROBE_FINE}
), pair AS MATERIALIZED (
  SELECT p.query_id, a.neighbor_id,
    list_sum(list_transform(list_zip(p.qv, a.cvec),
                            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot_qc,
    sqrt(list_sum(list_transform(p.qv, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nq,
    sqrt(list_sum(list_transform(a.cvec, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nc
  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id
  WHERE a.neighbor_id <> p.query_id
), rankedc AS (
  SELECT query_id, neighbor_id,
         ROUND(CASE WHEN nq > 0 AND nc > 0 THEN dot_qc / (nq * nc) ELSE 0.0 END, 6) AS cosine
  FROM pair
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM rankedc
) WHERE rank <= {TOPK_K}
"""


# --- emb_near_dup_pairs -------------------------------------------------------------
# [EXT] embedding-cosine near-dup. The corpus has no natural near-dups (max pairwise
# cosine ~0.51), so duplicates are planted exactly like the docs queries: vec_id % 25
# == 0 re-inserted with id + DUP_OFFSET (cosine 1.0). The scored entry runs the
# SCALE-SAFE plan (VERDICT r3 #1): sign-LSH bucket equi-join for candidates + exact
# cosine verification. Against this data the result set is provably identical to the
# all-pairs oracle: every pair >= 0.9 is a planted exact duplicate, identical vectors
# hash identically in every LSH table (recall 1.0 by construction — asserted in
# test_signlsh_near_dup_recovers_planted), and verification is exact so false
# positives are filtered. Same answer, O(collisions) instead of O(n²). The scope
# filter bounds only the DuckDB oracle's O(n²) cost, not the Spark plan shape.

NEAR_DUP_SCOPE = 250
NEAR_DUP_THRESHOLD = 0.9


def _embeddings_with_planted_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dups = emb.filter(F.col("vec_id") % 25 == 0).withColumn(
        "vec_id", F.col("vec_id") + DUP_OFFSET
    )
    return emb.unionByName(dups)


def emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.similarity import signlsh_near_dup_pairs

    aug = _embeddings_with_planted_dups(spark, sf_dir).filter(
        (F.col("vec_id") % DUP_OFFSET) < NEAR_DUP_SCOPE
    )
    return signlsh_near_dup_pairs(aug, threshold=NEAR_DUP_THRESHOLD).orderBy("id_a", "id_b")


EMB_NEAR_DUP_PAIRS_ORACLE = f"""
WITH emb_aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {DUP_OFFSET} AS vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0
), scoped AS (
  SELECT * FROM emb_aug WHERE (vec_id % {DUP_OFFSET}) < {NEAR_DUP_SCOPE}
), pairs AS (
  SELECT
    a.vec_id AS id_a, b.vec_id AS id_b,
    list_sum(list_transform(list_zip(a.embedding, b.embedding),
                            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot_ab,
    sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS na,
    sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nb
  FROM scoped a JOIN scoped b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b,
       ROUND(CASE WHEN na > 0 AND nb > 0 THEN dot_ab / (na * nb) ELSE 0.0 END, 6) AS cosine
FROM pairs
WHERE ROUND(CASE WHEN na > 0 AND nb > 0 THEN dot_ab / (na * nb) ELSE 0.0 END, 6) >= {NEAR_DUP_THRESHOLD}
ORDER BY id_a, id_b
"""


def emb_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH near-dup over the FULL augmented corpus (no scope filter).

    Oracled (round 4) by the same argument as the scored scoped entry: every pair
    above the 0.9 threshold is a planted identical vector, which collides in every
    LSH table, and verification is exact — so the output equals DuckDB's all-pairs
    answer (pytest asserts lsh == exact on this corpus). The oracle's O(n²) cost is
    DuckDB's problem at sf0.01 (~0.4 s); the Spark plan stays O(collisions)."""
    from ..ext.similarity import signlsh_near_dup_pairs

    aug = _embeddings_with_planted_dups(spark, sf_dir)
    return signlsh_near_dup_pairs(aug, threshold=NEAR_DUP_THRESHOLD).orderBy("id_a", "id_b")


EMB_NEAR_DUP_LSH_ORACLE = f"""
WITH emb_aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {DUP_OFFSET} AS vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0
), pairs AS (
  SELECT
    a.vec_id AS id_a, b.vec_id AS id_b,
    list_sum(list_transform(list_zip(a.embedding, b.embedding),
                            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot_ab,
    sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS na,
    sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nb
  FROM emb_aug a JOIN emb_aug b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b,
       ROUND(CASE WHEN na > 0 AND nb > 0 THEN dot_ab / (na * nb) ELSE 0.0 END, 6) AS cosine
FROM pairs
WHERE ROUND(CASE WHEN na > 0 AND nb > 0 THEN dot_ab / (na * nb) ELSE 0.0 END, 6) >= {NEAR_DUP_THRESHOLD}
ORDER BY id_a, id_b
"""


# --- docs_tfidf_top_terms -----------------------------------------------------------
# [EXT] TF-IDF top terms per doc, fully oracle-mirrored (ln() is deterministic on both
# engines; ranking by rounded score with term tie-break).


def docs_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.text import tf_idf_terms

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return tf_idf_terms(docs, top_k=5).orderBy("doc_id", "term_rank")


DOCS_TFIDF_ORACLE = r"""
WITH scoped AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
), toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term FROM scoped
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term
), n AS (
  SELECT COUNT(*) AS n_docs FROM scoped
), scored AS (
  SELECT
    tf.doc_id, tf.term, tf.tf, df.doc_freq,
    ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.doc_freq), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
), ranked AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS BIGINT) AS term_rank
  FROM scored
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(doc_freq AS BIGINT) AS doc_freq, tfidf, term_rank
FROM ranked WHERE term_rank <= 5
ORDER BY doc_id, term_rank
"""


# --- docs_bpe_token_stats -----------------------------------------------------------
# [EXT] BPE-ish subword counting (word-piece pre-tokenizer regex), oracled: Spark's
# Java \p{L}/\p{N} classes and DuckDB's RE2 agree on this corpus's codepoints.


def docs_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.text import bpe_ish_token_count, token_count

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("ws_tokens"),
        bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
    ).orderBy("doc_id")


DOCS_BPE_TOKEN_STATS_ORACLE = r"""
SELECT
  doc_id,
  CAST(CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
       ELSE len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '(\p{L}+|\p{N}+|[^\p{L}\p{N}\s])')) AS BIGINT) AS bpe_tokens
FROM documents
ORDER BY doc_id
"""


# --- emb_cluster_profile ------------------------------------------------------------
# [EXT] embedding clustering profile with label purity, over DETERMINISTIC centroids
# (the nlist smallest vec_ids — ext/similarity.py assign_centroids_fixed), which makes
# the whole assignment->profile pipeline DuckDB-replayable: the oracle recomputes the
# same centroids relationally, the same in-order distance folds and first-index
# tie-breaks, the same majority-label selection (r6 upgrade from rows-only — VERDICT
# r5 #5; the LEARNED Lloyd path stays pytest-covered via the IVF recall floors and
# the emb_topk_scaled_ivf bench crossover).

CLUSTER_NLIST = 10


def emb_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.similarity import assign_centroids_fixed, fixed_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = fixed_centroids(emb, CLUSTER_NLIST)
    assigned = assign_centroids_fixed(emb, cents)
    label_counts = assigned.groupBy("centroid_id", "label").agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("centroid_id")
    return (
        label_counts.withColumn("cluster_size", F.sum("n").over(w).cast("long"))
        .withColumn("_rn", F.row_number().over(w.orderBy(F.desc("n"), F.asc("label"))))
        .filter(F.col("_rn") == 1)
        .select(
            "centroid_id",
            "cluster_size",
            F.col("label").alias("majority_label"),
            F.round(F.col("n").cast("double") / F.col("cluster_size"), 6).alias("purity"),
        )
        .orderBy("centroid_id")
    )


EMB_CLUSTER_PROFILE_ORACLE = f"""
WITH cents AS (
  -- nlist SMALLEST ids via QUALIFY, mirroring fixed_centroids (see the IVF oracle)
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, embedding AS cv
  FROM embeddings
  QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= {CLUSTER_NLIST}
), cdist AS (
  SELECT e.vec_id, e.label, c.cidx,
         list_sum(list_transform(list_zip(e.embedding, c.cv),
                  x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                     * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))) AS d
  FROM embeddings e, cents c
), assigned AS MATERIALIZED (
  SELECT vec_id, label, CAST(cidx AS INTEGER) AS centroid_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cidx ASC) AS rn
        FROM cdist)
  WHERE rn = 1
), counts AS (
  SELECT centroid_id, label, COUNT(*) AS n FROM assigned GROUP BY centroid_id, label
), prof AS (
  SELECT centroid_id, label, n,
         SUM(n) OVER (PARTITION BY centroid_id) AS cluster_size,
         ROW_NUMBER() OVER (PARTITION BY centroid_id ORDER BY n DESC, label ASC) AS rn
  FROM counts
)
SELECT centroid_id,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       label AS majority_label,
       ROUND(CAST(n AS DOUBLE) / cluster_size, 6) AS purity
FROM prof WHERE rn = 1
ORDER BY centroid_id
"""


# --- docs_length_histogram ----------------------------------------------------------
# [EXT] corpus length profile: 200-char buckets with doc counts and exact mean token
# counts — the quick-look distribution a data-pipeline owner checks before filtering.


def docs_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.floor(F.length("text") / 200).cast("long")
    return (
        docs.select(bucket.alias("len_bucket"), token_count(F.col("text")).alias("n_tok"))
        .groupBy("len_bucket")
        .agg(
            count_big("n_docs"),
            F.round(F.sum(F.col("n_tok").cast("decimal(18,0)")).cast("double") / F.count(F.lit(1)), 6)
            .alias("avg_tokens"),
        )
        .orderBy("len_bucket")
    )


DOCS_LENGTH_HISTOGRAM_ORACLE = """
WITH toks AS (
  SELECT
    CAST(FLOOR(LENGTH(text) / 200) AS BIGINT) AS len_bucket,
    CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(TRIM(regexp_replace(text, '^\\s+|\\s+$', '', 'g')), '\\s+'))
    END AS n_tok
  FROM documents
)
SELECT len_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(CAST(n_tok AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*), 6) AS avg_tokens
FROM toks
GROUP BY len_bucket
ORDER BY len_bucket
"""


# --- docs_heavy_terms ---------------------------------------------------------------
# [EXT] Misra-Gries heavy hitters over the token stream (ext/sketch.py). Rows-only:
# estimates depend on partition layout (the MG undercount varies with the split), so
# there is no engine-independent hash; the pytest verifier asserts every true top
# term survives into the sketch's top-k on planted-skew corpora, and the row count
# (k) is what the driver records.


def docs_heavy_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus terms via Misra-Gries candidates + exact verification.

    Round 5 upgrade (rows-only -> oracled): the two-phase sketch-then-verify
    plan (ext/sketch.py: heavy_hitters_verified) reports EXACT counts for the
    reported items, so the result is deterministic and equals DuckDB's plain
    exact GROUP BY top-k — the oracle certifies both the MG recall (a missed
    true hitter would change the set) and the verify pass. The raw bounded-
    memory summary stays available as heavy_hitters (pytest-verified)."""
    from ..ext.sketch import heavy_hitters_verified
    from ..ext.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("term"))
    return heavy_hitters_verified(toks, "term", k=20)


# --- docs_shingle_hll ---------------------------------------------------------------
# [EXT] dedup-index sizing via an ENGINE-PORTABLE HyperLogLog: estimate the distinct
# 3-token-shingle cardinality (what a MinHash/ingest shingle index will hold) in ONE
# register-bounded pass (ext/sketch.py: hll_registers/hll_estimate). Every sketch
# intermediate — md5-prefix hash, register index, leading-zero rank, scaled-integer
# harmonic sum — is exact integer arithmetic both engines compute identically, so the
# oracle replays the ENTIRE sketch (registers, sum, estimate), not just a tolerance
# band. The exact COUNT(DISTINCT) rides along as the certification control (rel_err
# makes the sketch's accuracy a checked output); at production scale the control is
# dropped and only the one-shuffle register pass runs. Shingles (not bare terms) are
# the estimated key because the synthetic corpus's 31-word vocabulary would sit in
# HLL's linear-counting regime, whose ln()-based correction is NOT cross-engine
# exact; 3-shingles are ~16k distinct at every tested SF — far above 2.5*m, the raw
# estimate's domain.

HLL_P = 8  # 256 registers: rsd ~6.5%
HLL_SHINGLE_K = 3


def docs_shingle_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r7 (VERDICT r6 #2): hll_certified computes sketch + exact control in ONE
    # corpus scan (the exact control counts distinct 60-bit hashes per register
    # inside the same groupBy, so nothing is tokenized/shingled twice and the
    # control shuffle moves 8-byte keys, not shingle strings).
    from ..ext.dedup import token_shingles
    from ..ext.sketch import hll_certified

    docs = _spread(load_table(spark, sf_dir, "documents"), sf_dir)
    sh = docs.select(
        F.explode(token_shingles(F.lower(F.col("text")), k=HLL_SHINGLE_K)).alias("shingle")
    )
    return hll_certified(sh, "shingle", p=HLL_P).select(
        "n_regs_used",
        "s_total",
        "est_distinct",
        "exact_distinct",
        F.round(
            F.abs(F.col("est_distinct") - F.col("exact_distinct").cast("double"))
            / F.col("exact_distinct").cast("double"),
            4,
        ).alias("rel_err"),
    )


DOCS_SHINGLE_HLL_ORACLE = rf"""
WITH toks AS (
  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
), shingled AS (
  SELECT list_distinct(list_transform(generate_series(1, len(t) - {HLL_SHINGLE_K - 1}),
                                      i -> array_to_string(t[i:i+{HLL_SHINGLE_K - 1}], ' '))) AS shingles
  FROM toks WHERE len(t) >= {HLL_SHINGLE_K}
), sh AS (
  SELECT unnest(shingles) AS shingle FROM shingled
), hashed AS (
  SELECT CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h FROM sh
), ranked AS (
  SELECT (h & 255) AS reg,
         CASE WHEN (h >> 8) = 0 THEN 53
              ELSE 53 - length(printf('%b', h >> 8)) END AS r
  FROM hashed
), regs AS (
  SELECT reg, MAX(r) AS max_rank FROM ranked GROUP BY reg
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_regs_used,
         CAST(SUM(CAST(1 AS BIGINT) << (53 - max_rank)) AS BIGINT) AS s_present
  FROM regs
), est AS (
  SELECT n_regs_used,
         CAST(s_present + (256 - n_regs_used) * CAST(9007199254740992 AS BIGINT) AS BIGINT) AS s_total
  FROM agg
), est2 AS (
  SELECT n_regs_used, s_total,
         ROUND(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE))
               * CAST(65536.0 AS DOUBLE) * CAST(9007199254740992.0 AS DOUBLE)
               / CAST(s_total AS DOUBLE), 4) AS est_distinct
  FROM est
), ex AS (
  -- mirrors the engine's one-scan control: distinct 60-bit HASHES, not strings
  SELECT CAST(COUNT(DISTINCT h) AS BIGINT) AS exact_distinct FROM hashed
)
SELECT n_regs_used, s_total, est_distinct, exact_distinct,
       ROUND(ABS(est_distinct - CAST(exact_distinct AS DOUBLE))
             / CAST(exact_distinct AS DOUBLE), 4) AS rel_err
FROM est2, ex
"""


# --- docs_split_hll_overlap ------------------------------------------------------------
# [EXT] Sketch SET ALGEBRA: the distinct-shingle overlap between two hash
# splits estimated by inclusion-exclusion over three register sets (A, B, and
# their elementwise-MAX union merge) — the cross-corpus overlap question
# ("how much does my new crawl share with what I already have?") answered
# from per-corpus sketches alone, no re-scan of either side. p=12 here:
# HLL intersection error scales with the UNION's cardinality, not the
# intersection's (sigma ~ 1.04/sqrt(m) of each estimate; at m=256 this
# overlap estimate goes NEGATIVE on this corpus), so set algebra needs more
# registers than plain counting — that trade-off is part of what this query
# documents. The exact overlap rides along as the control; the oracle replays
# all three register sets, the three estimates and the subtraction.

OVERLAP_P = 12


def docs_split_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.dedup import token_shingles
    from ..ext.sketch import HLL_HASH_BITS, hll_alpha

    p = OVERLAP_P
    m = 1 << p
    sb = HLL_HASH_BITS - p + 1
    scale = 1 << sb

    docs = _spread(load_table(spark, sf_dir, "documents"), sf_dir)
    split = F.when(
        F.substring(F.md5(F.concat(F.lit("ovl"), F.col("doc_id").cast("string"))), 1, 4)
        < "8000",
        F.lit("a"),
    ).otherwise(F.lit("b"))
    sh = docs.select(
        split.alias("split"),
        F.explode(token_shingles(F.lower(F.col("text")), k=HLL_SHINGLE_K)).alias(
            "shingle"
        ),
    )
    from ..ext.sketch import portable_hash60

    h = portable_hash60("shingle")
    # the distinct (split, hash) level feeds four consumers (regs a/b/union,
    # exact overlap) — materialize once (review discipline)
    lvl = sh.select("split", h.alias("h")).distinct().localCheckpoint(eager=True)
    rest = F.shiftright(F.col("h"), p)
    bl = F.length(F.conv(rest.cast("string"), 10, 2))
    rank = F.when(rest == 0, F.lit(sb)).otherwise(F.lit(sb) - bl).cast("int")
    regs = (
        lvl.select(
            "split",
            F.col("h").bitwiseAND(F.lit(m - 1)).cast("int").alias("reg"),
            rank.alias("r"),
        )
        .groupBy("split", "reg")
        .agg(F.max("r").alias("max_rank"))
        .localCheckpoint(eager=True)  # tiny (<= 2 * 2^p rows), three consumers
    )

    def estimate(rdf: DataFrame, name: str) -> DataFrame:
        agg = rdf.agg(
            F.count(F.lit(1)).cast("long").alias("_nu"),
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {sb} - max_rank)"))
            .cast("long")
            .alias("_sp"),
        )
        s_total = (F.col("_sp") + (F.lit(m) - F.col("_nu")) * F.lit(scale)).cast(
            "double"
        )
        est = (
            F.lit(hll_alpha(p)) * F.lit(float(m * m)) * F.lit(float(scale)) / s_total
        )
        return agg.select(F.round(est, 4).alias(name))

    est_a = estimate(regs.filter(F.col("split") == "a"), "est_a")
    est_b = estimate(regs.filter(F.col("split") == "b"), "est_b")
    est_u = estimate(
        regs.groupBy("reg").agg(F.max("max_rank").alias("max_rank")), "est_union"
    )
    exact = (
        lvl.groupBy("h")
        .agg(F.count_distinct("split").alias("_ns"))
        .filter(F.col("_ns") == 2)
        .agg(F.count(F.lit(1)).cast("long").alias("exact_overlap"))
    )
    return (
        est_a.join(est_b)
        .join(est_u)
        .join(exact)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 4).alias(
                "est_overlap"
            ),
            "exact_overlap",
            F.round(
                F.abs(
                    F.col("est_a") + F.col("est_b") - F.col("est_union")
                    - F.col("exact_overlap").cast("double")
                )
                / F.col("exact_overlap").cast("double"),
                4,
            ).alias("rel_err"),
        )
    )


DOCS_SPLIT_HLL_OVERLAP_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
), shingled AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(generate_series(1, len(t) - {HLL_SHINGLE_K - 1}),
                i -> array_to_string(t[i:i+{HLL_SHINGLE_K - 1}], ' ')))) AS shingle
  FROM toks WHERE len(t) >= {HLL_SHINGLE_K}
), lvl AS (
  SELECT DISTINCT
         CASE WHEN substring(md5('ovl' || CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
              THEN 'a' ELSE 'b' END AS split,
         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h
  FROM shingled
), ranked AS (
  SELECT split, (h & {(1 << OVERLAP_P) - 1}) AS reg,
         CASE WHEN (h >> {OVERLAP_P}) = 0 THEN {60 - OVERLAP_P + 1}
              ELSE {60 - OVERLAP_P + 1} - length(printf('%b', h >> {OVERLAP_P})) END AS r
  FROM lvl
), regsab AS (SELECT split, reg, MAX(r) AS mr FROM ranked GROUP BY split, reg),
regsu AS (SELECT reg, MAX(mr) AS mr FROM regsab GROUP BY reg),
agg_a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nu,
         CAST(SUM(CAST(1 AS BIGINT) << ({60 - OVERLAP_P + 1} - mr)) AS BIGINT) AS sp
  FROM regsab WHERE split = 'a'
), agg_b AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nu,
         CAST(SUM(CAST(1 AS BIGINT) << ({60 - OVERLAP_P + 1} - mr)) AS BIGINT) AS sp
  FROM regsab WHERE split = 'b'
), agg_u AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nu,
         CAST(SUM(CAST(1 AS BIGINT) << ({60 - OVERLAP_P + 1} - mr)) AS BIGINT) AS sp
  FROM regsu
), ests AS (
  SELECT
    (SELECT ROUND(CAST({{ALPHA}} AS DOUBLE) * CAST({{MM}} AS DOUBLE) * CAST({{SCALE}} AS DOUBLE)
      / CAST(sp + ({{M}} - nu) * CAST({{SCALE_I}} AS BIGINT) AS DOUBLE), 4) FROM agg_a) AS est_a,
    (SELECT ROUND(CAST({{ALPHA}} AS DOUBLE) * CAST({{MM}} AS DOUBLE) * CAST({{SCALE}} AS DOUBLE)
      / CAST(sp + ({{M}} - nu) * CAST({{SCALE_I}} AS BIGINT) AS DOUBLE), 4) FROM agg_b) AS est_b,
    (SELECT ROUND(CAST({{ALPHA}} AS DOUBLE) * CAST({{MM}} AS DOUBLE) * CAST({{SCALE}} AS DOUBLE)
      / CAST(sp + ({{M}} - nu) * CAST({{SCALE_I}} AS BIGINT) AS DOUBLE), 4) FROM agg_u) AS est_union,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM (
       SELECT h FROM lvl GROUP BY h HAVING COUNT(DISTINCT split) = 2)) AS exact_overlap
)
SELECT est_a, est_b, est_union,
       ROUND(est_a + est_b - est_union, 4) AS est_overlap,
       exact_overlap,
       ROUND(ABS(est_a + est_b - est_union - CAST(exact_overlap AS DOUBLE))
             / CAST(exact_overlap AS DOUBLE), 4) AS rel_err
FROM ests
"""

def _hll_alpha_py(p: int) -> float:
    from ..ext.sketch import hll_alpha

    return hll_alpha(p)


DOCS_SPLIT_HLL_OVERLAP_ORACLE = DOCS_SPLIT_HLL_OVERLAP_ORACLE.format(
    ALPHA=repr(_hll_alpha_py(OVERLAP_P)),
    MM=repr(float((1 << OVERLAP_P) ** 2)),
    SCALE=repr(float(1 << (60 - OVERLAP_P + 1))),
    M=1 << OVERLAP_P,
    SCALE_I=1 << (60 - OVERLAP_P + 1),
)


# --- docs_shingle_hll_by_lang --------------------------------------------------------
# [EXT] GROUPED HLL + the mergeability certification (r7). Per-language register
# sets estimate each language's distinct-shingle cardinality in one keyed shuffle
# (ext/sketch.py: hll_registers_grouped is the production form). The '*ALL*' row is
# the heart of the certification: the ENGINE computes it by elementwise-MAX MERGING
# the per-language registers, while the ORACLE computes the same row from the global
# distinct set directly — a hash match proves merge(per-group sketches) ==
# sketch(union) relationally, the property that lets a pipeline keep per-day /
# per-source registers and union them without rescanning history. Per-language
# cardinalities are 3.0k-27k at every tested SF — far above the 2.5*m raw-estimate
# floor (see docs_shingle_hll's regime note).


def docs_shingle_hll_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.dedup import token_shingles
    from ..ext.sketch import hll_grouped_certified

    docs = _spread(load_table(spark, sf_dir, "documents"), sf_dir)
    sh = docs.select(
        "lang",
        F.explode(token_shingles(F.lower(F.col("text")), k=HLL_SHINGLE_K)).alias(
            "shingle"
        ),
    )
    out = hll_grouped_certified(sh, "lang", "shingle", p=HLL_P)
    return out.select(
        "lang",
        "n_regs_used",
        "s_total",
        "est_distinct",
        "exact_distinct",
        F.round(
            F.abs(F.col("est_distinct") - F.col("exact_distinct").cast("double"))
            / F.col("exact_distinct").cast("double"),
            4,
        ).alias("rel_err"),
    ).orderBy("lang")


DOCS_SHINGLE_HLL_BY_LANG_ORACLE = rf"""
WITH toks AS (
  SELECT lang, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
), sh AS (
  SELECT lang,
         unnest(list_transform(generate_series(1, len(t) - {HLL_SHINGLE_K - 1}),
                i -> array_to_string(t[i:i+{HLL_SHINGLE_K - 1}], ' '))) AS shingle
  FROM toks WHERE len(t) >= {HLL_SHINGLE_K}
), hashed AS (
  SELECT DISTINCT lang, CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h
  FROM sh
), ranked AS (
  SELECT lang, h, (h & 255) AS reg,
         CASE WHEN (h >> 8) = 0 THEN 53
              ELSE 53 - length(printf('%b', h >> 8)) END AS r
  FROM hashed
), regs AS (
  SELECT lang, reg, MAX(r) AS max_rank, CAST(COUNT(*) AS BIGINT) AS reg_distinct
  FROM ranked GROUP BY 1, 2
), agg AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_regs_used,
         CAST(SUM(CAST(1 AS BIGINT) << (53 - max_rank)) AS BIGINT) AS s_present,
         CAST(SUM(reg_distinct) AS BIGINT) AS exact_distinct
  FROM regs GROUP BY 1
), gran AS (
  -- the merged row from the GLOBAL distinct set (NOT by merging): equality with
  -- the engine's register-merge is the certification
  SELECT h, (h & 255) AS reg,
         CASE WHEN (h >> 8) = 0 THEN 53
              ELSE 53 - length(printf('%b', h >> 8)) END AS r
  FROM (SELECT DISTINCT h FROM hashed)
), gregs AS (
  SELECT reg, MAX(r) AS max_rank FROM gran GROUP BY 1
), gagg AS (
  SELECT '*ALL*' AS lang, CAST(COUNT(*) AS BIGINT) AS n_regs_used,
         CAST(SUM(CAST(1 AS BIGINT) << (53 - max_rank)) AS BIGINT) AS s_present,
         (SELECT CAST(COUNT(DISTINCT h) AS BIGINT) FROM hashed) AS exact_distinct
  FROM gregs
), unioned AS (
  SELECT * FROM agg UNION ALL SELECT * FROM gagg
), est AS (
  SELECT lang, n_regs_used,
         CAST(s_present + (256 - n_regs_used) * CAST(9007199254740992 AS BIGINT) AS BIGINT) AS s_total,
         exact_distinct
  FROM unioned
)
SELECT lang, n_regs_used, s_total, est_distinct, exact_distinct,
       ROUND(ABS(est_distinct - CAST(exact_distinct AS DOUBLE))
             / CAST(exact_distinct AS DOUBLE), 4) AS rel_err
FROM (
  SELECT lang, n_regs_used, s_total,
         ROUND(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE))
               * CAST(65536.0 AS DOUBLE) * CAST(9007199254740992.0 AS DOUBLE)
               / CAST(s_total AS DOUBLE), 4) AS est_distinct,
         exact_distinct
  FROM est
)
ORDER BY lang
"""



# --- docs_shingle_cms ---------------------------------------------------------------
# [EXT] Engine-portable COUNT-MIN point-frequency sketch (ext/sketch.py), completing
# the certified-sketch family: Bloom = membership, HLL = distinct cardinality,
# Misra-Gries = top-k identity, Count-Min = point frequency. The corpus's 3-token
# shingle occurrences (~16k distinct keys at every tested SF — 16x the w=1024
# counter width, so collisions and therefore real overcounts are GUARANTEED) are
# folded into d=4 x w=1024 exact-integer counters; the query then looks up the
# top-20 shingles and reports est vs exact side by side. The oracle replays the
# ENTIRE sketch — md5-half hashes, Kirsch-Mitzenmacher positions, counter sums,
# min-over-rows lookups — so the overcount column (the collision mass, the part a
# tolerance-band check would wave through) is certified exactly, and the CMS
# guarantee est >= exact is additionally enforced in-plan by assert_true.
# Single-scan discipline (VERDICT r6 #2 lesson): the corpus is shingled ONCE into
# the vocabulary-sized exact-count relation (localCheckpoint), from which BOTH the
# counter table (weighted build — equal to the occurrence build by associativity of
# SUM; pytest asserts it) and the top-20 query set derive.

CMS_SHINGLE_K = 3
CMS_TOP_N = 20


def docs_shingle_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.dedup import shingle_index
    from ..ext.sketch import cms_counters_weighted, cms_lookup

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id"), F.lower(F.col("text")).alias("text")
    )
    occ = shingle_index(docs, k=CMS_SHINGLE_K, distinct=False)
    exact = (
        occ.groupBy(F.col("_sh").alias("term"))
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
        .localCheckpoint(eager=False)
    )
    counters = cms_counters_weighted(exact, "term", "exact_count")
    top = exact.orderBy(F.desc("exact_count"), F.asc("term")).limit(CMS_TOP_N)
    looked = cms_lookup(top, "term", counters)
    guarded = looked.withColumn(
        "_g",
        F.assert_true(
            F.col("cms_count") >= F.col("exact_count"),
            F.concat(
                F.lit("Count-Min undercounted term "),
                F.col("term"),
                F.lit(": est "),
                F.col("cms_count").cast("string"),
                F.lit(" < exact "),
                F.col("exact_count").cast("string"),
            ),
        ),
    ).filter(F.col("_g").isNull())
    return guarded.select(
        "term",
        "exact_count",
        "cms_count",
        (F.col("cms_count") - F.col("exact_count")).cast("long").alias("overcount"),
    ).orderBy(F.desc("exact_count"), F.asc("term"))


DOCS_SHINGLE_CMS_ORACLE = rf"""
WITH toks AS (
  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
), occ AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - {CMS_SHINGLE_K - 1}),
                i -> array_to_string(t[i:i+{CMS_SHINGLE_K - 1}], ' '))) AS term
  FROM toks WHERE len(t) >= {CMS_SHINGLE_K}
), exact AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_count FROM occ GROUP BY term
), hashed AS (
  SELECT term, exact_count,
         CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(term), 9, 8)) AS BIGINT) AS h2
  FROM exact
), cells AS (
  SELECT i.i AS r, (h1 + i.i * h2) % 1024 AS p, exact_count
  FROM hashed, generate_series(0, 3) AS i(i)
), counters AS (
  SELECT r, p, CAST(SUM(exact_count) AS BIGINT) AS cnt FROM cells GROUP BY r, p
), top AS (
  SELECT term, exact_count, h1, h2 FROM hashed
  ORDER BY exact_count DESC, term ASC LIMIT {CMS_TOP_N}
), probes AS MATERIALIZED (
  SELECT t.term, t.exact_count, c.cnt
  FROM top t
  CROSS JOIN generate_series(0, 3) AS i(i)
  LEFT JOIN counters c ON c.r = i.i AND c.p = (t.h1 + i.i * t.h2) % 1024
), lk AS (
  SELECT term, exact_count, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS cms_count
  FROM probes GROUP BY term, exact_count
)
SELECT term, exact_count, cms_count,
       CAST(cms_count - exact_count AS BIGINT) AS overcount
FROM lk ORDER BY exact_count DESC, term ASC
"""


DOCS_HEAVY_TERMS_ORACLE = r"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS item
  FROM documents WHERE length(trim(text)) > 0
)
SELECT item, CAST(COUNT(*) AS BIGINT) AS exact_count
FROM toks GROUP BY item
ORDER BY exact_count DESC, item ASC
LIMIT 20
"""


# --- docs_quality_dedup_pipeline ----------------------------------------------------
# [EXT] The composed training-data pipeline, scored as one hash: planted-dup corpus
# -> quality_score filter -> exact dedup (min-id survivor) -> per-source funnel
# counts. The oracle re-derives the quality formula (same SQL as DOCS_QUALITY_ORACLE)
# over the augmented corpus and replays the filter+dedup relationally — a match
# certifies the chained operators end to end, not each in isolation.

QUALITY_KEEP_THRESHOLD = 0.5


def docs_quality_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.dedup import exact_dedup

    aug = _docs_with_planted_dups(spark, sf_dir)
    scored = aug.withColumn("quality", quality_score(F.col("text")))
    kept = scored.filter(F.col("quality") >= QUALITY_KEEP_THRESHOLD)
    survivors = exact_dedup(kept)
    n_in = aug.groupBy("source").agg(count_big("n_docs"))
    n_kept = kept.groupBy("source").agg(count_big("n_quality"))
    n_surv = survivors.groupBy("source").agg(count_big("n_survivors"))
    return (
        n_in.join(n_kept, "source", "left")
        .join(n_surv, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_quality", F.lit(0)).cast("long").alias("n_quality"),
            F.coalesce("n_survivors", F.lit(0)).cast("long").alias("n_survivors"),
        )
        .orderBy("source")
    )


DOCS_QUALITY_DEDUP_PIPELINE_ORACLE = rf"""
WITH docs_aug AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET} AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id % 7 = 0
), feats AS (
  SELECT
    doc_id, source, text,
    CAST(length(text) AS BIGINT) AS n_chars,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
    CAST(length(regexp_replace(text, '[\w\s]', '', 'g')) AS BIGINT) AS n_punct,
    CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper,
    list_sum(list_transform(string_split_regex(trim(text), '\s+'),
                            x -> length(x))) AS alpha_len
  FROM docs_aug
), ratios AS (
  SELECT
    doc_id, source, text, n_tokens,
    CASE WHEN n_tokens > 0 THEN ROUND(CAST(alpha_len AS DOUBLE) / n_tokens, 6) ELSE 0.0 END AS mean_token_len,
    CASE WHEN n_chars > 0 THEN ROUND(CAST(n_punct AS DOUBLE) / n_chars, 6) ELSE 0.0 END AS punct_ratio,
    CASE WHEN n_chars > 0 THEN ROUND(CAST(n_upper AS DOUBLE) / n_chars, 6) ELSE 0.0 END AS upper_ratio
  FROM feats
), scored AS (
  SELECT doc_id, source, text,
    ROUND(
      LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4 +
      (CASE WHEN mean_token_len >= 2.0 AND mean_token_len <= 12.0 THEN 1.0 ELSE 0.3 END) * 0.3 +
      GREATEST(0.0, 1.0 - (punct_ratio + upper_ratio) * 2.0) * 0.3,
    6) AS quality
  FROM ratios
), kept AS (
  SELECT * FROM scored WHERE quality >= {QUALITY_KEEP_THRESHOLD}
), survivors AS (
  -- the survivor is the min-id ROW; its source travels with it. MIN(source)
  -- independently of MIN(doc_id) diverges when duplicate texts span sources
  -- (latent until sf0.1, where organic cross-source duplicate texts exist —
  -- caught by the tri-SF sweep).
  SELECT MIN(doc_id) AS keeper_id, arg_min(source, doc_id) AS source
  FROM kept GROUP BY text
)
SELECT
  i.source,
  CAST(i.n_docs AS BIGINT) AS n_docs,
  CAST(COALESCE(k.n_quality, 0) AS BIGINT) AS n_quality,
  CAST(COALESCE(s.n_survivors, 0) AS BIGINT) AS n_survivors
FROM (SELECT source, COUNT(*) AS n_docs FROM docs_aug GROUP BY source) i
LEFT JOIN (SELECT source, COUNT(*) AS n_quality FROM kept GROUP BY source) k USING (source)
LEFT JOIN (SELECT source, COUNT(*) AS n_survivors FROM survivors GROUP BY source) s USING (source)
ORDER BY i.source
"""


# --- emb_quantization_error ---------------------------------------------------------
# [EXT] int8 quantization certified by its error bound: per label, the max
# reconstruction error must stay within scale/2 per component, and the oracle
# recomputes codes + errors with DuckDB list HOFs — a hash match certifies the
# quantize/dequantize arithmetic end to end.


def emb_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.quantize import reconstruction_error, with_int8_quantization

    emb = load_table(spark, sf_dir, "embeddings")
    q = with_int8_quantization(emb)
    per_vec = q.select(
        "label",
        F.round(reconstruction_error(), 9).cast("decimal(18,9)").alias("err"),
        F.round(F.col("q_scale") / 2, 9).cast("decimal(18,9)").alias("half_scale"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            count_big("n_vectors"),
            F.round(F.max("err").cast("double"), 6).alias("max_err"),
            F.round(F.sum("err").cast("double") / F.count(F.lit(1)), 6).alias("avg_err"),
            F.sum(F.when(F.col("err") <= F.col("half_scale"), 1).otherwise(0))
            .cast("long")
            .alias("n_within_bound"),
        )
        .orderBy("label")
    )


EMB_QUANTIZATION_ERROR_ORACLE = """
WITH scaled AS (
  SELECT
    label, embedding,
    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS q_scale
  FROM embeddings
), coded AS (
  SELECT
    label, q_scale,
    CASE WHEN q_scale > 0
         THEN list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) / q_scale, 0) AS INTEGER))
         ELSE list_transform(embedding, x -> 0) END AS q_codes,
    embedding
  FROM scaled
), errs AS (
  SELECT
    label,
    CAST(ROUND(list_max(list_transform(list_zip(embedding, q_codes),
        p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * q_scale))), 9) AS DECIMAL(18,9)) AS err,
    CAST(ROUND(q_scale / 2, 9) AS DECIMAL(18,9)) AS half_scale
  FROM coded
)
SELECT
  label,
  CAST(COUNT(*) AS BIGINT) AS n_vectors,
  ROUND(CAST(MAX(err) AS DOUBLE), 6) AS max_err,
  ROUND(CAST(SUM(err) AS DOUBLE) / COUNT(*), 6) AS avg_err,
  CAST(SUM(CASE WHEN err <= half_scale THEN 1 ELSE 0 END) AS BIGINT) AS n_within_bound
FROM errs
GROUP BY label
ORDER BY label
"""


# --- docs_dup_clusters ---------------------------------------------------------------


def docs_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate clustering: connected components (large-star/small-star,
    ext/components.py) over a planted pair graph whose clusters are only reachable
    transitively — chains doc -> copy1 -> copy2 plus cross-links doc -> doc+7 that
    merge two chains into one component of diameter 4. The DuckDB oracle computes
    the same components via a recursive-CTE transitive closure, so the iterative
    Spark algorithm is hash-checked against an independent formulation."""
    from ..ext.components import dup_clusters

    pairs = _planted_pair_graph(spark, sf_dir)
    return (
        dup_clusters(pairs)
        .select(
            F.col("component").cast("long").alias("component"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("max_member").cast("long").alias("max_member"),
        )
        .orderBy("component")
    )


DOCS_DUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE edges AS (
  SELECT doc_id AS a, doc_id + {DUP_OFFSET} AS b FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + {DUP_OFFSET} AS a, doc_id + {2 * DUP_OFFSET} AS b
  FROM documents WHERE doc_id % 14 = 0
  UNION ALL
  SELECT d.doc_id AS a, e.doc_id AS b
  FROM documents d JOIN documents e ON e.doc_id = d.doc_id + 7
  WHERE d.doc_id % 21 = 0
),
und AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
reach(node, other) AS (
  SELECT a AS node, a AS other FROM und
  UNION
  SELECT r.node, u.b AS other FROM reach r JOIN und u ON u.a = r.other
),
labels AS (SELECT node, MIN(other) AS component FROM reach GROUP BY node)
SELECT
  CAST(component AS BIGINT) AS component,
  CAST(COUNT(*) AS BIGINT) AS n_members,
  CAST(MAX(node) AS BIGINT) AS max_member
FROM labels
GROUP BY component
ORDER BY component
"""


# --- docs_dup_pagerank -----------------------------------------------------------------
# [EXT] Graph authority over the planted duplicate graph: which member of each
# duplicate cluster is the most-connected representative (a principled survivor
# pick vs min-id). PageRank in SCALED-INTEGER arithmetic (ext/components.py
# pagerank_fixed_point): every round is BIGINT div/sum only, so the DuckDB
# oracle's five unrolled iterations reproduce the engine's iterative
# join+groupBy loop bit for bit — float PageRank never certifies (parallel
# double sums are order-dependent; libm differs across engines).

_PR_EDGES_SQL = f"""
  SELECT doc_id AS a, doc_id + {DUP_OFFSET} AS b FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + {DUP_OFFSET} AS a, doc_id + {2 * DUP_OFFSET} AS b
  FROM documents WHERE doc_id % 14 = 0
  UNION ALL
  SELECT d.doc_id AS a, e.doc_id AS b
  FROM documents d JOIN documents e ON e.doc_id = d.doc_id + 7
  WHERE d.doc_id % 21 = 0
"""

PR_SCALE = 10**12
PR_ITERATIONS = 5


def _planted_pair_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The docs_dup_clusters planted pair graph (chains + cross-links), reused."""
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    e1 = ids.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + DUP_OFFSET).alias("id_b")
    )
    e2 = ids.filter(F.col("doc_id") % 14 == 0).select(
        (F.col("doc_id") + DUP_OFFSET).alias("id_a"),
        (F.col("doc_id") + 2 * DUP_OFFSET).alias("id_b"),
    )
    e3 = (
        ids.alias("d")
        .join(ids.alias("e"), F.col("e.doc_id") == F.col("d.doc_id") + 7)
        .filter(F.col("d.doc_id") % 21 == 0)
        .select(F.col("d.doc_id").alias("id_a"), F.col("e.doc_id").alias("id_b"))
    )
    return e1.unionByName(e2).unionByName(e3)


def docs_dup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 duplicate-graph authorities by fixed-point PageRank (5 rounds,
    scale 10^12, damping 85/100) over the symmetrized planted pair graph."""
    from ..ext.components import pagerank_fixed_point

    pairs = _planted_pair_graph(spark, sf_dir)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    ranked = pagerank_fixed_point(edges, iterations=PR_ITERATIONS, scale=PR_SCALE)
    return (
        ranked.select(
            F.col("node").cast("long").alias("node"),
            F.col("rank_fp").cast("long").alias("rank_fp"),
            F.col("outdeg").cast("long").alias("outdeg"),
        )
        .orderBy(F.desc("rank_fp"), F.asc("node"))
        .limit(20)
    )


def _pr_iteration_sql(prev: str) -> str:
    return f"""
  SELECT u.dst AS node,
         (15 * ({PR_SCALE} // n.cnt) + 85 * SUM(r.rank // d.outdeg)) // 100 AS rank
  FROM {prev} r JOIN und u ON u.src = r.node JOIN deg d ON d.src = r.node, n
  GROUP BY u.dst, n.cnt
"""


DOCS_DUP_PAGERANK_ORACLE = f"""
WITH edges AS ({_PR_EDGES_SQL}),
und AS (SELECT a AS src, b AS dst FROM edges UNION SELECT b AS src, a AS dst FROM edges),
deg AS (SELECT src, COUNT(*) AS outdeg FROM und GROUP BY src),
n AS (SELECT COUNT(DISTINCT src) AS cnt FROM und),
r0 AS (SELECT DISTINCT src AS node, ({PR_SCALE} // cnt) AS rank FROM und, n),
it1 AS ({_pr_iteration_sql('r0')}),
it2 AS ({_pr_iteration_sql('it1')}),
it3 AS ({_pr_iteration_sql('it2')}),
it4 AS ({_pr_iteration_sql('it3')}),
it5 AS ({_pr_iteration_sql('it4')})
SELECT CAST(it5.node AS BIGINT) AS node,
       CAST(it5.rank AS BIGINT) AS rank_fp,
       CAST(deg.outdeg AS BIGINT) AS outdeg
FROM it5 JOIN deg ON deg.src = it5.node
ORDER BY rank_fp DESC, node ASC
LIMIT 20
"""


# --- docs_pps_sample -------------------------------------------------------------------
# [EXT] Weight-proportional systematic sampling (Madow PPS) — importance sampling
# by document size with EXACT sample count and integer-only arithmetic. The
# engine runs the distributed two-phase prefix sum (ext/sampling.py:
# range-shuffle once, narrow per-partition running sum, #partitions-row offset
# table broadcast back); the oracle replays the definition with one naive global
# window. Identical output certifies that the distributed prefix-sum
# decomposition is exactly the sequential cumulative sum.

PPS_K = 37


def docs_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k=37 size-weighted systematic sample of the corpus (weight =
    n_chars + 1), with each row's weight interval and hit count."""
    from ..ext.sampling import pps_systematic_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("n_chars") + 1).alias("w")
    )
    return pps_systematic_sample(docs, "w", PPS_K).orderBy("doc_id")


DOCS_PPS_SAMPLE_ORACLE = f"""
WITH base AS (
  SELECT doc_id, n_chars + 1 AS w,
         md5('pps' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents
),
tot AS (SELECT SUM(w) AS wt FROM base),
cums AS (
  SELECT doc_id, w,
         SUM(w) OVER (ORDER BY k, doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM base
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(w AS BIGINT) AS weight,
       CAST(cum AS BIGINT) AS cum_weight,
       CAST((cum * {PPS_K}) // wt - ((cum - w) * {PPS_K}) // wt AS BIGINT) AS n_hits
FROM cums, tot
WHERE (cum * {PPS_K}) // wt > ((cum - w) * {PPS_K}) // wt
ORDER BY doc_id
"""


# --- docs_priority_sample --------------------------------------------------------------
# [EXT] Priority sampling (Duffield-Lund-Thorup, JACM 2007; r11) — ONE k-row
# weighted sample answering ANY later subset-sum query with the max(w, tau)
# estimator: the '100 TB corpus, bounded sample, arbitrary questions'
# primitive a training pipeline stores beside its manifests. All-integer
# mechanics (portable 30-bit md5 variate, q = (w << 30) DIV u, top-k by
# (q desc, id asc), tau = the (k+1)-th priority), so the oracle replays the
# draw, the threshold and every estimate to the bit. Certified per SOURCE:
# the estimate, the exact subset-sum control a 100 TB run could not afford,
# and the OBSERVED relative error (a deterministic number, not a
# probabilistic claim). Plan shape: one narrow priority scan; the top-(k+1)
# is TakeOrderedAndProject (map-side partial top-k — the corpus never
# shuffles); tau and the k-row sample re-enter as broadcasts.

PRIO_K = 128


def docs_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.sampling import priority_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", (F.col("n_chars") + 1).alias("w")
    )
    samp = priority_sample(docs.select("doc_id", "w"), "w", PRIO_K, salt="prio")
    tau_df = samp.agg(F.max("tau").cast("long").alias("tau"))
    est = (
        docs.select("doc_id", "source")
        .join(F.broadcast(samp), "doc_id")
        .groupBy("source")
        .agg(
            count_big("n_sampled"),
            F.sum("w_hat").cast("long").alias("est_chars"),
        )
    )
    exact = docs.groupBy("source").agg(F.sum("w").cast("long").alias("exact_chars"))
    return (
        exact.join(est, "source", "left")
        .crossJoin(F.broadcast(tau_df))
        .select(
            "source",
            F.coalesce(F.col("n_sampled"), F.lit(0)).cast("long").alias("n_sampled"),
            "tau",
            F.coalesce(F.col("est_chars"), F.lit(0)).cast("long").alias("est_chars"),
            "exact_chars",
            F.round(
                (F.coalesce(F.col("est_chars"), F.lit(0)) - F.col("exact_chars"))
                .cast("double")
                / F.col("exact_chars"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("source")
    )


DOCS_PRIORITY_SAMPLE_ORACLE = f"""
WITH base AS (
  SELECT doc_id, source, n_chars + 1 AS w,
         (CAST(('0x' || substr(md5('prio' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % {1 << 30}) + 1 AS u
  FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
), pr AS (
  SELECT *, (w * {1 << 30}) // u AS q FROM base
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY q DESC, doc_id ASC) AS rn FROM pr
), tau AS (
  SELECT CAST(COALESCE(MAX(CASE WHEN rn = {PRIO_K + 1} THEN q END), 0) AS BIGINT) AS tau
  FROM ranked
), samp AS (
  SELECT r.doc_id, r.source, r.w, GREATEST(r.w, t.tau) AS w_hat
  FROM ranked r, tau t WHERE r.rn <= {PRIO_K}
), est AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
         CAST(SUM(w_hat) AS BIGINT) AS est_chars
  FROM samp GROUP BY source
), ex AS (
  SELECT source, CAST(SUM(w) AS BIGINT) AS exact_chars FROM base GROUP BY source
)
SELECT ex.source,
       CAST(COALESCE(est.n_sampled, 0) AS BIGINT) AS n_sampled,
       (SELECT tau FROM tau) AS tau,
       CAST(COALESCE(est.est_chars, 0) AS BIGINT) AS est_chars,
       ex.exact_chars,
       ROUND(CAST(COALESCE(est.est_chars, 0) - ex.exact_chars AS DOUBLE)
             / ex.exact_chars, 6) AS rel_err
FROM ex LEFT JOIN est USING (source)
ORDER BY ex.source
"""


# --- docs_cdc_chunking -------------------------------------------------------------------
# [EXT] Content-defined chunking (ext/cdc.py): the LBFS/rsync boundary rule with
# an engine-portable hash (md5-prefix string compare), certified end to end —
# chunk extents, conservation (chunk chars == text chars), AND the property CDC
# exists for: planted twins with an inserted prefix re-synchronize, so most of
# each original's chunk hashes reappear in its twin. The oracle replays
# positions, boundaries, chunk reconstruction and the shared-chunk ratio.

CDC_TWIN_OFFSET = 10_000_000
CDC_TWIN_PREFIX = "PREFIX>> "


def docs_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One certified row: corpus-wide CDC chunk stats plus the shift-resistance
    measurement over planted prefix-perturbed twins (doc_id % 5 == 0)."""
    from ..ext.cdc import cdc_chunks

    docs = _spread(load_table(spark, sf_dir, "documents"), sf_dir).select("doc_id", "text")
    twins = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + CDC_TWIN_OFFSET).alias("doc_id"),
        F.concat(F.lit(CDC_TWIN_PREFIX), F.col("text")).alias("text"),
    )
    # materialize the chunk table once: four consumers (totals, oc, tc/shared)
    # must not re-run the per-position md5 explode over corpus+twins (the
    # committed explain showed 4 Generate subtrees / 48 scans without the cut)
    chunks = cdc_chunks(docs.unionByName(twins)).localCheckpoint(eager=True)

    oc = chunks.filter(
        (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < CDC_TWIN_OFFSET)
    ).select("doc_id", "chunk_start", "chunk_md5")
    tc = chunks.filter(F.col("doc_id") >= CDC_TWIN_OFFSET).select(
        (F.col("doc_id") - CDC_TWIN_OFFSET).alias("doc_id"),
        F.col("chunk_md5").alias("twin_md5"),
    )
    shared = oc.join(
        tc,
        (oc["doc_id"] == tc["doc_id"]) & (oc["chunk_md5"] == tc["twin_md5"]),
        "left_semi",
    )
    totals = chunks.agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("chunk_len").cast("long").alias("total_chunk_chars"),
        F.round(F.sum("chunk_len") / F.count(F.lit(1)), 4).alias("avg_chunk_len"),
    )
    pair_stats = oc.agg(F.count(F.lit(1)).cast("long").alias("orig_chunks")).join(
        shared.agg(F.count(F.lit(1)).cast("long").alias("shared_chunks"))
    )
    return totals.join(pair_stats).select(
        "n_docs",
        "n_chunks",
        "total_chunk_chars",
        "avg_chunk_len",
        "orig_chunks",
        "shared_chunks",
        F.round(F.col("shared_chunks") / F.col("orig_chunks"), 6).alias("shared_ratio"),
    )


DOCS_CDC_CHUNKING_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {CDC_TWIN_OFFSET} AS doc_id, '{CDC_TWIN_PREFIX}' || text AS text
  FROM documents WHERE doc_id % 5 = 0
),
base AS (
  SELECT doc_id, text, length(text) AS n FROM corpus
  WHERE text IS NOT NULL AND length(text) > 0
),
b AS (
  SELECT doc_id, i
  FROM base, unnest(generate_series(16, n)) AS t(i)
  WHERE n >= 16
    AND substring(md5(substring(text, i - 15, 16)), 1, 3) < '040'
),
mid AS (
  SELECT doc_id,
         COALESCE(LAG(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1 AS s,
         i AS e
  FROM b
),
tail AS (
  SELECT base.doc_id, COALESCE(MAX(b.i), 0) + 1 AS s, MAX(base.n) AS e
  FROM base LEFT JOIN b USING (doc_id)
  GROUP BY base.doc_id
  HAVING MAX(base.n) >= COALESCE(MAX(b.i), 0) + 1
),
spans AS (SELECT * FROM mid UNION ALL SELECT * FROM tail),
chunks AS (
  SELECT s.doc_id, s.s, s.e - s.s + 1 AS clen,
         md5(substring(base.text, s.s, s.e - s.s + 1)) AS h
  FROM spans s JOIN base USING (doc_id)
),
oc AS (
  SELECT doc_id, s, h FROM chunks
  WHERE doc_id % 5 = 0 AND doc_id < {CDC_TWIN_OFFSET}
),
tc AS (
  SELECT doc_id - {CDC_TWIN_OFFSET} AS doc_id, h FROM chunks
  WHERE doc_id >= {CDC_TWIN_OFFSET}
),
shr AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS shared_chunks
  FROM oc
  WHERE EXISTS (SELECT 1 FROM tc WHERE tc.doc_id = oc.doc_id AND tc.h = oc.h)
)
SELECT
  CAST(COUNT(DISTINCT chunks.doc_id) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS BIGINT) AS n_chunks,
  CAST(SUM(clen) AS BIGINT) AS total_chunk_chars,
  ROUND(CAST(SUM(clen) AS DOUBLE) / COUNT(*), 4) AS avg_chunk_len,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM oc) AS orig_chunks,
  (SELECT shared_chunks FROM shr) AS shared_chunks,
  ROUND(CAST((SELECT shared_chunks FROM shr) AS DOUBLE)
        / (SELECT COUNT(*) FROM oc), 6) AS shared_ratio
FROM chunks
"""


# --- docs_fuzzy_typo_pairs ---------------------------------------------------------------
# [EXT] Typo-level fuzzy dedup via the FastSS deletion-neighborhood index
# (ext/dedup.py deletion_neighborhood_pairs). The single-deletion neighborhood
# is COMPLETE for edit distance <= 1, so the engine's index+verify result must
# equal the DEFINITION — the oracle computes all-pairs levenshtein directly
# (the simhash pattern: a lossless index means the indexed plan must
# hash-equal the exact quadratic form). Keys are ASCII-normalized because
# DuckDB's levenshtein is byte-based while Spark's is codepoint-based.

FUZZY_TWIN_OFFSET = 20_000_000


def docs_fuzzy_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All key pairs within edit distance 1 over normalized 24-char prefixes,
    with planted single-substitution typo twins (doc_id % 6 == 0)."""
    from ..ext.dedup import deletion_neighborhood_pairs

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(F.lower(F.substring("text", 1, 24)), "[^a-z0-9 ]", "").alias(
            "key"
        ),
    ).filter(F.length("key") >= 4)
    twins = docs.filter(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + FUZZY_TWIN_OFFSET).alias("doc_id"),
        F.concat(
            F.expr("substring(key, 1, CAST(doc_id % 8 + 1 AS INT))"),
            F.lit("q"),
            F.expr("substring(key, CAST(doc_id % 8 + 3 AS INT))"),
        ).alias("key"),
    )
    pairs = deletion_neighborhood_pairs(docs.unionByName(twins), "key", "doc_id")
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "key_a",
        "key_b",
        "dist",
    ).orderBy("id_a", "id_b")


DOCS_FUZZY_TYPO_PAIRS_ORACLE = f"""
WITH keys0 AS (
  SELECT doc_id,
         regexp_replace(lower(substring(text, 1, 24)), '[^a-z0-9 ]', '', 'g') AS key
  FROM documents
),
keys AS (SELECT doc_id, key FROM keys0 WHERE length(key) >= 4),
twins AS (
  SELECT doc_id + {FUZZY_TWIN_OFFSET} AS doc_id,
         substring(key, 1, CAST(doc_id % 8 + 1 AS INT)) || 'q'
           || substring(key, CAST(doc_id % 8 + 3 AS INT)) AS key
  FROM keys WHERE doc_id % 6 = 0
),
corpus AS (SELECT * FROM keys UNION ALL SELECT * FROM twins)
SELECT CAST(a.doc_id AS BIGINT) AS id_a,
       CAST(b.doc_id AS BIGINT) AS id_b,
       a.key AS key_a,
       b.key AS key_b,
       CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
FROM corpus a JOIN corpus b ON a.doc_id < b.doc_id
WHERE levenshtein(a.key, b.key) <= 1
ORDER BY id_a, id_b
"""


# --- media_image_dhash ---------------------------------------------------------------
# [EXT] Perceptual image hashing (dHash — the image-dedup primitive), certified
# END TO END through real bytes: the engine builds each image from a closed-form
# pixel formula, round-trips it through the PPM codec (encode -> parse), and
# hashes the decoded pixels; the oracle recomputes the 9x8 sampled grid, the
# integer gray, the 64 gradient bits and the hex hash analytically — it never
# materializes an image. Planted brightness-shifted twins (+3 per channel; gray
# shifts EXACTLY +3 because 299+587+114 = 1000) provably collide with their
# originals in both engines — the robustness property perceptual hashes exist
# for, certified rather than asserted.

DHASH_TWIN_OFFSET = 30_000_000


def media_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, w, h, dhash) for formula-keyed images plus brightness twins
    (doc_id % 10 == 0). Engine path: numpy image -> PPM bytes -> parse -> dHash."""
    docs = _spread(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .filter(F.col("n_chars").isNotNull()),
        sf_dir,
        factor=2,
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        from ..ext.multimodal import dhash64, make_ppm_bytes, parse_ppm

        for pdf in batches:
            out = {"media_id": [], "w": [], "h": [], "dhash": []}
            for did, n in zip(pdf["doc_id"], pdf["n_chars"]):
                did, n = int(did), int(n)
                w, h = n % 40 + 9, n % 30 + 8
                i, j = np.indices((h, w), dtype=np.int64)
                base = np.stack(
                    [
                        (i * 7 + j * 13 + did * 5) % 250,
                        (i * 3 + j * 5 + did * 11) % 250,
                        (i * 11 + j + did * 7) % 250,
                    ],
                    axis=-1,
                )
                variants = [(did, 0)]
                if did % 10 == 0:
                    variants.append((did + DHASH_TWIN_OFFSET, 3))
                for mid, shift in variants:
                    px = (base + shift).astype(np.uint8)
                    decoded = parse_ppm(make_ppm_bytes(px))  # real byte roundtrip
                    out["media_id"].append(mid)
                    out["w"].append(w)
                    out["h"].append(h)
                    out["dhash"].append(dhash64(decoded))
            yield pd.DataFrame(out)

    return (
        docs.mapInPandas(gen, "media_id long, w long, h long, dhash string")
        .orderBy("media_id")
    )


MEDIA_IMAGE_DHASH_ORACLE = f"""
WITH base AS (
  SELECT doc_id AS id, doc_id AS src, 0 AS shift,
         n_chars % 40 + 9 AS w, n_chars % 30 + 8 AS h
  FROM documents WHERE n_chars IS NOT NULL
  UNION ALL
  SELECT doc_id + {DHASH_TWIN_OFFSET} AS id, doc_id AS src, 3 AS shift,
         n_chars % 40 + 9 AS w, n_chars % 30 + 8 AS h
  FROM documents WHERE n_chars IS NOT NULL AND doc_id % 10 = 0
),
pts AS (
  SELECT b.id, b.src, b.shift, b.w, b.h, gr.r AS r, gc.c AS c,
         (gr.r * b.h) // 8 AS ri, (gc.c * b.w) // 9 AS ci
  FROM base b,
       unnest(generate_series(0, 7)) AS gr(r),
       unnest(generate_series(0, 8)) AS gc(c)
),
gray AS (
  SELECT id, w, h, r, c,
         (299 * ((ri * 7 + ci * 13 + src * 5) % 250 + shift)
          + 587 * ((ri * 3 + ci * 5 + src * 11) % 250 + shift)
          + 114 * ((ri * 11 + ci + src * 7) % 250 + shift)) // 1000 AS g
  FROM pts
),
bits AS (
  SELECT a.id, a.w, a.h, a.r, a.c,
         CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
  FROM gray a
  JOIN gray b ON b.id = a.id AND b.r = a.r AND b.c = a.c + 1
  WHERE a.c < 8
),
vals AS (
  SELECT id, MAX(w) AS w, MAX(h) AS h,
         CAST(SUM(CASE WHEN r < 4 THEN bit << (r * 8 + c) ELSE 0 END) AS BIGINT) AS hi,
         CAST(SUM(CASE WHEN r >= 4 THEN bit << ((r - 4) * 8 + c) ELSE 0 END) AS BIGINT) AS lo
  FROM bits GROUP BY id
)
SELECT CAST(id AS BIGINT) AS media_id,
       CAST(w AS BIGINT) AS w,
       CAST(h AS BIGINT) AS h,
       printf('%08x%08x', hi, lo) AS dhash
FROM vals
ORDER BY media_id
"""


# --- docs_hash_split -----------------------------------------------------------------


def docs_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (ext/sampling.py hash_split): md5-bucketed,
    re-run- and append-stable, pure narrow map (no shuffle before the report agg).
    The oracle replays the same md5-prefix cuts in DuckDB — bit-identical because
    md5 is engine-agnostic, unlike xxhash64."""
    from ..ext.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    assigned = hash_split(docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}, salt="s1")
    return (
        assigned.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
            F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6).alias("avg_chars"),
        )
        .orderBy("split", "lang")
    )


DOCS_HASH_SPLIT_ORACLE = """
WITH assigned AS (
  SELECT
    doc_id, lang, n_chars,
    CASE
      WHEN substring(md5('s1' || CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'train'
      WHEN substring(md5('s1' || CAST(doc_id AS VARCHAR)), 1, 4) < 'f333' THEN 'val'
      ELSE 'test'
    END AS split
  FROM documents
)
SELECT
  split,
  lang,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
  ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars
FROM assigned
GROUP BY split, lang
ORDER BY split, lang
"""


# --- docs_stratified_sample ----------------------------------------------------------


def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25-per-language sample (ext/sampling.py stratified_sample):
    rank inside each stratum by (md5 key, id), keep the first 25. Row-level parity
    with a DuckDB QUALIFY twin — checks the hash, the window order, and the cut."""
    from ..ext.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return (
        stratified_sample(docs, "lang", 25, id_col="doc_id", salt="s2")
        .select("lang", F.col("doc_id").cast("long").alias("doc_id"), F.col("n_chars").cast("long").alias("n_chars"))
        .orderBy("lang", "doc_id")
    )


DOCS_STRATIFIED_SAMPLE_ORACLE = """
SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY lang
  ORDER BY md5('s2' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
) <= 25
ORDER BY lang, doc_id
"""


# --- docs_gopher_filters -------------------------------------------------------------


def docs_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style corpus filtering report (ext/text.py repetition_features +
    gopher_flags). The synthetic corpus is single-line prose, so document structure
    is planted in-query (bullet blocks, duplicated lines, ellipsis endings on
    deterministic id classes) — mirrored verbatim in the oracle — to exercise every
    rule on both code paths. Per-source rule pass counts + exact-decimal mean
    fractions."""
    from ..ext.text import gopher_flags, repetition_features

    docs = load_table(spark, sf_dir, "documents")
    structured = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("\n- item one\n- item two\n- item three")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 9 == 0, F.lit("\nrepeat me\nrepeat me\nrepeat me")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit("\nto be continued...\nand more...")).otherwise(F.lit("")),
        ),
    )
    q = repetition_features(F.col("text"))
    flags = gopher_flags(F.col("text"))
    feat = structured.select(
        "source",
        q["dup_line_frac"].alias("dup_line_frac"),
        q["bullet_line_frac"].alias("bullet_line_frac"),
        q["ellipsis_line_frac"].alias("ellipsis_line_frac"),
        *[flags[n].alias(n) for n in (
            "ok_word_count", "ok_symbol_ratio", "ok_bullet",
            "ok_ellipsis", "ok_alpha", "ok_dup_lines", "pass_all",
        )],
    )

    def n_ok(name: str):
        return F.sum(F.when(F.col(name), 1).otherwise(0)).cast("long").alias(f"n_{name}")

    def avg6(name: str):
        return F.round(
            F.sum(F.col(name).cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 6
        ).alias(f"avg_{name}")

    return (
        feat.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            n_ok("ok_word_count"), n_ok("ok_symbol_ratio"), n_ok("ok_bullet"),
            n_ok("ok_ellipsis"), n_ok("ok_alpha"), n_ok("ok_dup_lines"), n_ok("pass_all"),
            avg6("dup_line_frac"), avg6("bullet_line_frac"), avg6("ellipsis_line_frac"),
        )
        .orderBy("source")
    )


DOCS_GOPHER_FILTERS_ORACLE = r"""
WITH structured AS (
  SELECT
    doc_id, source,
    text ||
    CASE WHEN doc_id % 5 = 0
         THEN chr(10) || '- item one' || chr(10) || '- item two' || chr(10) || '- item three'
         ELSE '' END ||
    CASE WHEN doc_id % 9 = 0
         THEN chr(10) || 'repeat me' || chr(10) || 'repeat me' || chr(10) || 'repeat me'
         ELSE '' END ||
    CASE WHEN doc_id % 11 = 0
         THEN chr(10) || 'to be continued...' || chr(10) || 'and more...'
         ELSE '' END AS text
  FROM documents
), feats AS (
  SELECT
    source,
    list_filter(string_split(text, chr(10)), x -> length(x) > 0) AS nonempty,
    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         ELSE string_split_regex(trim(text), '\s+') END AS toks,
    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
    CAST(len(regexp_extract_all(text, '\.\.\.')) AS BIGINT) AS n_ellipsis,
    text
  FROM structured
), counts AS (
  SELECT
    source,
    CAST(len(nonempty) AS BIGINT) AS n_lines,
    CAST(len(nonempty) - len(list_distinct(nonempty)) AS BIGINT) AS n_dup_lines,
    CAST(len(list_filter(nonempty, x -> substring(x, 1, 1) IN ('-', '*'))) AS BIGINT) AS n_bullet,
    CAST(len(list_filter(nonempty, x -> right(x, 3) = '...')) AS BIGINT) AS n_ell_lines,
    CAST(len(toks) AS BIGINT) AS n_words,
    CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
    n_hash, n_ellipsis
  FROM feats
), ratios AS (
  SELECT
    source, n_words,
    CASE WHEN n_lines > 0 THEN ROUND(CAST(n_dup_lines AS DOUBLE) / n_lines, 6) ELSE 0.0 END AS dup_line_frac,
    CASE WHEN n_lines > 0 THEN ROUND(CAST(n_bullet AS DOUBLE) / n_lines, 6) ELSE 0.0 END AS bullet_line_frac,
    CASE WHEN n_lines > 0 THEN ROUND(CAST(n_ell_lines AS DOUBLE) / n_lines, 6) ELSE 0.0 END AS ellipsis_line_frac,
    CASE WHEN n_words > 0 THEN ROUND(CAST(n_hash + n_ellipsis AS DOUBLE) / n_words, 6) ELSE 0.0 END AS symbol_word_ratio,
    CASE WHEN n_words > 0 THEN ROUND(CAST(n_alpha_words AS DOUBLE) / n_words, 6) ELSE 0.0 END AS alpha_word_frac
  FROM counts
), flagged AS (
  SELECT
    source, dup_line_frac, bullet_line_frac, ellipsis_line_frac,
    (n_words BETWEEN 50 AND 100000) AS ok_word_count,
    (symbol_word_ratio < 0.1) AS ok_symbol_ratio,
    (bullet_line_frac < 0.9) AS ok_bullet,
    (ellipsis_line_frac < 0.3) AS ok_ellipsis,
    (alpha_word_frac > 0.8) AS ok_alpha,
    (dup_line_frac < 0.3) AS ok_dup_lines
  FROM ratios
)
SELECT
  source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN ok_word_count THEN 1 ELSE 0 END) AS BIGINT) AS n_ok_word_count,
  CAST(SUM(CASE WHEN ok_symbol_ratio THEN 1 ELSE 0 END) AS BIGINT) AS n_ok_symbol_ratio,
  CAST(SUM(CASE WHEN ok_bullet THEN 1 ELSE 0 END) AS BIGINT) AS n_ok_bullet,
  CAST(SUM(CASE WHEN ok_ellipsis THEN 1 ELSE 0 END) AS BIGINT) AS n_ok_ellipsis,
  CAST(SUM(CASE WHEN ok_alpha THEN 1 ELSE 0 END) AS BIGINT) AS n_ok_alpha,
  CAST(SUM(CASE WHEN ok_dup_lines THEN 1 ELSE 0 END) AS BIGINT) AS n_ok_dup_lines,
  CAST(SUM(CASE WHEN ok_word_count AND ok_symbol_ratio AND ok_bullet AND ok_ellipsis
                 AND ok_alpha AND ok_dup_lines THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all,
  ROUND(CAST(SUM(CAST(dup_line_frac AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_dup_line_frac,
  ROUND(CAST(SUM(CAST(bullet_line_frac AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_bullet_line_frac,
  ROUND(CAST(SUM(CAST(ellipsis_line_frac AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_ellipsis_line_frac
FROM flagged
GROUP BY source
ORDER BY source
"""


# --- docs_pii_scrub ------------------------------------------------------------------


def docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact report (ext/text.py pii_counts / scrub_pii). The corpus
    contains no PII, so id-varying emails/phones/IPs are planted in-query on
    deterministic id classes (mirrored in the oracle); the report checks match
    counts per kind, docs-clean counts, and the exact redacted-character budget
    (pre/post scrub length delta) — so the oracle verifies the REPLACEMENT, not
    just the detection."""
    from ..ext.text import pii_counts, scrub_pii

    docs = load_table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 13 == 0,
                   F.concat(F.lit(" contact user"), sid, F.lit("@example.com now"))).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 17 == 0,
                   F.concat(F.lit(" call +1-555-010-"), F.lpad(sid, 4, "0"))).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 19 == 0,
                   F.concat(F.lit(" host 10.0.0."), F.pmod(F.col("doc_id"), F.lit(200)).cast("string"), F.lit(" up"))).otherwise(F.lit("")),
        ),
    )
    c = pii_counts(F.col("text"))
    feat = planted.select(
        "source",
        c["email"].alias("n_email"),
        c["phone"].alias("n_phone"),
        c["ipv4"].alias("n_ipv4"),
        (F.length(F.col("text")) - F.length(scrub_pii(F.col("text")))).cast("long").alias("redacted_chars"),
    )
    return (
        feat.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_email").cast("long").alias("total_emails"),
            F.sum("n_phone").cast("long").alias("total_phones"),
            F.sum("n_ipv4").cast("long").alias("total_ipv4s"),
            F.sum(F.when((F.col("n_email") + F.col("n_phone") + F.col("n_ipv4")) == 0, 1).otherwise(0))
            .cast("long").alias("n_clean_docs"),
            F.sum("redacted_chars").cast("long").alias("total_redacted_chars"),
        )
        .orderBy("source")
    )


DOCS_PII_SCRUB_ORACLE = r"""
WITH planted AS (
  SELECT
    source,
    text ||
    CASE WHEN doc_id % 13 = 0
         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END ||
    CASE WHEN doc_id % 17 = 0
         THEN ' call +1-555-010-' || lpad(CAST(doc_id AS VARCHAR), 4, '0') ELSE '' END ||
    CASE WHEN doc_id % 19 = 0
         THEN ' host 10.0.0.' || CAST(doc_id % 200 AS VARCHAR) || ' up' ELSE '' END AS text
  FROM documents
), feats AS (
  SELECT
    source,
    CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
    CAST(len(regexp_extract_all(text, '\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
    CAST(len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
    CAST(length(text) - length(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
          '\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
        '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IPV4]', 'g')
    ) AS BIGINT) AS redacted_chars
  FROM planted
)
SELECT
  source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_email) AS BIGINT) AS total_emails,
  CAST(SUM(n_phone) AS BIGINT) AS total_phones,
  CAST(SUM(n_ipv4) AS BIGINT) AS total_ipv4s,
  CAST(SUM(CASE WHEN n_email + n_phone + n_ipv4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_docs,
  CAST(SUM(redacted_chars) AS BIGINT) AS total_redacted_chars
FROM feats
GROUP BY source
ORDER BY source
"""


# --- docs_decontaminate -------------------------------------------------------------
# [EXT] eval-set decontamination (n-gram overlap vs a benchmark set) — the standard
# pre-training hygiene pass. The corpus has no natural leaks (30-word vocabulary makes
# an accidental 8-gram match ~30^-8), so leaks are planted deterministically: every
# eval doc is re-inserted into the training side verbatim under source='leaked'. The
# per-source funnel then shows the leaked bucket fully flagged while organic sources
# stay (near-)clean; the oracle reproduces the same n-gram membership check in SQL.

DECON_K = 8
DECON_EVAL_MOD = 50
DECON_LEAK_OFFSET = 2_000_000


def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.dedup import contaminated_ids

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % DECON_EVAL_MOD == 3)
    leaks = ev.withColumn("doc_id", F.col("doc_id") + DECON_LEAK_OFFSET).withColumn(
        "source", F.lit("leaked")
    )
    train = docs.filter(F.col("doc_id") % DECON_EVAL_MOD != 3).unionByName(leaks)
    bad = contaminated_ids(train, ev, k=DECON_K).withColumn("_bad", F.lit(1))
    return (
        train.join(F.broadcast(bad), "doc_id", "left")
        .groupBy("source")
        .agg(
            count_big("n_train"),
            F.sum(F.when(F.col("_bad").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_contaminated"),
        )
        .orderBy("source")
    )


DOCS_DECONTAMINATE_ORACLE = rf"""
WITH ev AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {DECON_EVAL_MOD} = 3
), train AS (
  SELECT doc_id, text, source FROM documents WHERE doc_id % {DECON_EVAL_MOD} <> 3
  UNION ALL
  SELECT doc_id + {DECON_LEAK_OFFSET} AS doc_id, text, 'leaked' AS source
  FROM documents WHERE doc_id % {DECON_EVAL_MOD} = 3
), ev_toks AS (
  SELECT string_split_regex(trim(text), '\s+') AS t FROM ev
), ev_sh AS (
  SELECT DISTINCT unnest(list_transform(generate_series(1, len(t) - {DECON_K - 1}),
                                        i -> array_to_string(t[i:i+{DECON_K - 1}], ' '))) AS sh
  FROM ev_toks WHERE len(t) >= {DECON_K}
), tr_toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM train
), tr_sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(t) - {DECON_K - 1}),
                               i -> array_to_string(t[i:i+{DECON_K - 1}], ' '))) AS sh
  FROM tr_toks WHERE len(t) >= {DECON_K}
), bad AS (
  SELECT DISTINCT doc_id FROM tr_sh JOIN ev_sh USING (sh)
)
SELECT
  source,
  CAST(COUNT(*) AS BIGINT) AS n_train,
  CAST(SUM(CASE WHEN b.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
FROM train LEFT JOIN bad b USING (doc_id)
GROUP BY source
ORDER BY source
"""


# --- docs_chunking ------------------------------------------------------------------
# [EXT] context-window chunking (ext/text.py: chunk_documents): overlapping token
# windows, the document -> model-sized-sequence prep step. The oracle re-derives chunk
# counts and per-chunk token sums by closed-form arithmetic on the token count,
# independently validating the slicing implementation.

CHUNK_MAX_TOKENS = 50
CHUNK_OVERLAP = 10
_CHUNK_STRIDE = CHUNK_MAX_TOKENS - CHUNK_OVERLAP


def docs_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, max_tokens=CHUNK_MAX_TOKENS, overlap=CHUNK_OVERLAP)
    return (
        chunks.join(F.broadcast(docs.select("doc_id", "lang")), "doc_id")
        .groupBy("lang")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            count_big("n_chunks"),
            F.sum("chunk_tokens").cast("long").alias("total_chunk_tokens"),
            F.max("chunk_tokens").cast("long").alias("max_chunk_tokens"),
        )
        .orderBy("lang")
    )


DOCS_CHUNKING_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, lang,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n
  FROM documents
), c AS (
  SELECT doc_id, lang, n,
         CASE WHEN n <= {CHUNK_MAX_TOKENS} THEN 1
              ELSE CAST(ceil((n - {CHUNK_MAX_TOKENS}) / {_CHUNK_STRIDE}.0) AS BIGINT) + 1
         END AS n_chunks
  FROM toks
), per_chunk AS (
  SELECT lang, doc_id, least({CHUNK_MAX_TOKENS}, n - i * {_CHUNK_STRIDE}) AS chunk_tokens
  FROM c, unnest(generate_series(0, n_chunks - 1)) AS t(i)
)
SELECT lang,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS BIGINT) AS n_chunks,
  CAST(SUM(chunk_tokens) AS BIGINT) AS total_chunk_tokens,
  CAST(MAX(chunk_tokens) AS BIGINT) AS max_chunk_tokens
FROM per_chunk
GROUP BY lang
ORDER BY lang
"""


# --- docs_pack_sequences ------------------------------------------------------------
# [EXT] chunk -> pack composition (ext/packing.py): chunk to 128-token windows, then
# first-fit-decreasing pack the chunks into 512-token training bins, partition-local
# (no shuffle beyond one hash repartition). r7 upgrade (rows-only -> oracled): the
# certifying form partitions by the PORTABLE key chunk_uid % 32 (production default
# stays xxhash64 — partition_expr seam), which lets DuckDB replay the EXACT
# per-group FFD fold with a recursive CTE: the fold state is each group's open-bin
# capacity LIST, one lockstep iteration per within-group rank, first-fit =
# list_position over a c >= n scan, bin count = final list length. n_seqs /
# total_tokens / n_overflow are closed-form; n_bins — the only fold-dependent
# output, and with it utilization — is what the recursive replay certifies.
# Utilization ~0.74 at sf0.01: partition-local FFD tails off with only ~60 chunks
# per partition; fill improves with corpus size.

PACK_CHUNK_TOKENS = 128
PACK_CHUNK_OVERLAP = 16
PACK_BUDGET = 512
PACK_N_PARTS = 32


def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.packing import pack_sequences
    from ..ext.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(
        docs, max_tokens=PACK_CHUNK_TOKENS, overlap=PACK_CHUNK_OVERLAP
    ).withColumn(
        "chunk_uid", F.col("doc_id") * 10_000 + F.col("chunk_idx")
    )
    # Portable group key = doc_id % 32 (chunk_uid % 32 would collapse to two
    # groups: 10000 = 16 mod 32, so the uid's low bits carry only doc parity).
    # Keying by doc also means a doc's chunks pack together — the locality a
    # training pipeline wants anyway.
    packed = pack_sequences(
        chunks,
        "chunk_tokens",
        "chunk_uid",
        budget=PACK_BUDGET,
        num_partitions=PACK_N_PARTS,
        partition_expr=F.pmod(F.col("doc_id"), F.lit(PACK_N_PARTS)),
    )
    agg = packed.agg(
        count_big("n_seqs"),
        F.count_distinct("bin_id").cast("long").alias("n_bins"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("overflow"), 1).otherwise(0)).cast("long").alias("n_overflow"),
    )
    return agg.select(
        "*",
        F.round(
            F.col("total_tokens") / (F.col("n_bins") * F.lit(PACK_BUDGET)), 4
        ).alias("utilization"),
    )



# The oracle replays the EXACT per-group FFD fold as a recursive CTE: state =
# each group's open-bin capacity list, one lockstep iteration per within-group
# rank (32 rows per iteration), first-fit = list_position of the first capacity
# >= n (DuckDB's list_position returns 0-or-NULL for "not found" depending on
# version — both guarded), bin update = slice/concat around the hit index.
# chunks/ranked are MATERIALIZED so the recursive member joins a computed table
# instead of re-deriving tokenize+window per iteration (120x measured). Only
# n_bins (and through it utilization) needs the fold; the other outputs are
# closed-form and double as cross-checks that the fold consumed every chunk.

DOCS_PACK_SEQUENCES_ORACLE = rf"""
WITH RECURSIVE t AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n
  FROM documents
), c AS (
  SELECT doc_id, n,
         CASE WHEN n <= {PACK_CHUNK_TOKENS} THEN 1
              ELSE CAST(ceil((n - {PACK_CHUNK_TOKENS}) / {PACK_CHUNK_TOKENS - PACK_CHUNK_OVERLAP}.0) AS BIGINT) + 1 END AS n_chunks
  FROM t
), chunks AS MATERIALIZED (
  SELECT doc_id, doc_id * 10000 + i AS chunk_uid,
         least({PACK_CHUNK_TOKENS}, n - i * {PACK_CHUNK_TOKENS - PACK_CHUNK_OVERLAP}) AS n_tok
  FROM c, unnest(generate_series(0, n_chunks - 1)) AS u(i)
), ranked AS MATERIALIZED (
  SELECT doc_id % {PACK_N_PARTS} AS g, chunk_uid, n_tok,
         ROW_NUMBER() OVER (PARTITION BY doc_id % {PACK_N_PARTS}
                            ORDER BY n_tok DESC, chunk_uid ASC) AS rn
  FROM chunks
), steps AS (
  SELECT g, 0 AS rn, CAST([] AS BIGINT[]) AS caps
  FROM (SELECT DISTINCT g FROM ranked) AS gg
  UNION ALL
  SELECT g, rn,
         CASE WHEN n_tok > {PACK_BUDGET} THEN caps || [CAST(0 AS BIGINT)]
              WHEN idx IS NULL OR idx = 0 THEN caps || [CAST({PACK_BUDGET} AS BIGINT) - n_tok]
              ELSE caps[1:idx-1] || [caps[idx] - n_tok] || caps[idx+1:]
         END AS caps
  FROM (
    SELECT r.g AS g, r.rn AS rn, r.n_tok AS n_tok, s.caps AS caps,
           list_position(list_transform(s.caps, x -> x >= r.n_tok), true) AS idx
    FROM steps s JOIN ranked r ON r.g = s.g AND r.rn = s.rn + 1
  ) AS step
), fin AS (
  SELECT g, caps FROM (
    SELECT g, caps, ROW_NUMBER() OVER (PARTITION BY g ORDER BY rn DESC) AS rk
    FROM steps
  ) WHERE rk = 1
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM chunks) AS n_seqs,
  CAST(SUM(len(caps)) AS BIGINT) AS n_bins,
  (SELECT CAST(SUM(n_tok) AS BIGINT) FROM chunks) AS total_tokens,
  (SELECT CAST(SUM(CASE WHEN n_tok > {PACK_BUDGET} THEN 1 ELSE 0 END) AS BIGINT) FROM chunks) AS n_overflow,
  ROUND(CAST((SELECT SUM(n_tok) FROM chunks) AS DOUBLE)
        / (CAST(SUM(len(caps)) AS BIGINT) * {PACK_BUDGET}), 4) AS utilization
FROM fin
"""


# --- docs_pack_invariants -----------------------------------------------------------
# [EXT] the oracled face of sequence packing (VERDICT r3 next-round #3): bin ids are
# partition-dependent, but the packing INVARIANTS are closed-form — every doc packed
# exactly once (count + distinct-count conservation), token mass conserved, overflow
# flags exactly the docs longer than the budget, zero non-overflow bins above budget,
# and the bin count bounded by [ceil(tokens/budget), n_nonoverflow_docs]. DuckDB
# recomputes the exact columns from the raw table and pins the invariant columns at
# their must-hold values; any packing bug (double-pack, drop, over-fill) breaks the
# value hash.


def docs_pack_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select("doc_id", token_count(F.col("text")).alias("n_tok"))
    packed = pack_sequences(sized, "n_tok", budget=PACK_BUDGET)
    doc_agg = packed.agg(
        count_big("total_docs"),
        F.count_distinct("doc_id").cast("long").alias("distinct_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("overflow"), 1).otherwise(0))
        .cast("long")
        .alias("overflow_docs"),
    )
    bin_agg = (
        packed.filter(~F.col("overflow"))
        .groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("_fill"))
        .agg(
            F.sum(F.when(F.col("_fill") > PACK_BUDGET, 1).otherwise(0))
            .cast("long")
            .alias("budget_violations"),
            F.count(F.lit(1)).alias("_n_bins"),
            F.sum("_fill").alias("_nov_tokens"),
        )
    )
    # one job: two 1-row aggregates cross-joined (the events_funnel discipline)
    return doc_agg.crossJoin(bin_agg).select(
        "total_docs",
        "distinct_docs",
        "total_tokens",
        "overflow_docs",
        "budget_violations",
        (
            (F.col("_n_bins") >= F.ceil(F.col("_nov_tokens") / F.lit(PACK_BUDGET)))
            & (F.col("_n_bins") <= F.col("total_docs") - F.col("overflow_docs"))
        ).alias("bin_bounds_ok"),
    )


DOCS_PACK_INVARIANTS_ORACLE = rf"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n
  FROM documents
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS total_docs,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS distinct_docs,
  CAST(SUM(n) AS BIGINT) AS total_tokens,
  CAST(SUM(CASE WHEN n > {PACK_BUDGET} THEN 1 ELSE 0 END) AS BIGINT) AS overflow_docs,
  CAST(0 AS BIGINT) AS budget_violations,
  TRUE AS bin_bounds_ok
FROM t
"""


# --- docs_pack_stream_parity --------------------------------------------------------
# [EXT] streaming packing scored end to end (VERDICT r3 next-round #4, made
# driver-visible like qe_stream_batch_parity): document token sizes are file-streamed
# in multiple micro-batches through streaming/packing.py's foreachBatch FFD packer,
# then the materialized bins are compared against the input — every doc packed
# exactly once with its token count intact, zero non-overflow bins over budget. The
# summary is deterministic, so DuckDB asserts it relationally from the raw table.


def docs_pack_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..config import scratch_dir
    from ..streaming.packing import pack_sequences_stream

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select("doc_id", token_count(F.col("text")).alias("n_tok"))

    tmp = scratch_dir("docs_pack_stream", sf_dir, wipe=True)  # fresh checkpoint
    src, out, ckpt = (os.path.join(tmp, d) for d in ("src", "packed", "ckpt"))
    # 3 source files + maxFilesPerTrigger=1 -> 3 micro-batches: the parity below
    # holds across real batch boundaries, not just the trivial single-batch case
    sized.coalesce(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, n_tok long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    pack_sequences_stream(
        stream, "n_tok", out, ckpt, budget=PACK_BUDGET, num_partitions=4
    ).awaitTermination()

    packed = spark.read.parquet(out)
    n_docs = sized.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    n_packed = packed.agg(F.count(F.lit(1)).cast("long").alias("n_packed"))
    n_match = (
        packed.join(
            sized,
            (packed["doc_id"] == sized["doc_id"]) & (packed["n_tokens"] == sized["n_tok"]),
            "inner",
        ).agg(F.count(F.lit(1)).cast("long").alias("n_token_matches"))
    )
    viol = (
        packed.filter(~F.col("overflow"))
        .groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("_fill"))
        .agg(
            F.sum(F.when(F.col("_fill") > PACK_BUDGET, 1).otherwise(0))
            .cast("long")
            .alias("budget_violations")
        )
    )
    return n_docs.crossJoin(n_packed).crossJoin(n_match).crossJoin(viol)


DOCS_PACK_STREAM_PARITY_ORACLE = """
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS BIGINT) AS n_packed,
  CAST(COUNT(*) AS BIGINT) AS n_token_matches,
  CAST(0 AS BIGINT) AS budget_violations
FROM documents
"""


# --- docs_contamination_ratio -------------------------------------------------------
# [EXT] thresholded decontamination (ext/dedup.py: contamination_ratio): per-doc
# fraction of distinct 8-grams found in the eval set, the flag-on-ratio>tau form real
# pipelines use. Planted evidence at both extremes: full verbatim leaks (ratio 1.0)
# and partial leaks built as first-half-of-eval-doc + a clean neighbor doc's text
# (ratio strictly between 0 and 1); organic sources sit at 0.

DECON_PART_OFFSET = 3_000_000
DECON_RATIO_TAU = 0.3


def docs_contamination_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.dedup import contamination_ratio
    from ..ext.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % DECON_EVAL_MOD == 3)
    nb = docs.select(
        F.col("doc_id").alias("nb_id"), F.col("text").alias("nb_text")
    )
    toks = tokens(F.col("text"))
    half = F.slice(toks, 1, F.ceil(F.size(toks) / 2).cast("int"))
    partial = (
        ev.join(nb, ev["doc_id"] + 1 == nb["nb_id"], "inner")
        .select(
            (F.col("doc_id") + DECON_PART_OFFSET).alias("doc_id"),
            F.concat(F.concat_ws(" ", half), F.lit(" "), F.col("nb_text")).alias("text"),
            F.lit("leaked_part").alias("source"),
        )
    )
    full = ev.select(
        (F.col("doc_id") + DECON_LEAK_OFFSET).alias("doc_id"),
        "text",
        F.lit("leaked_full").alias("source"),
    )
    train = (
        docs.filter(F.col("doc_id") % DECON_EVAL_MOD != 3)
        .select("doc_id", "text", "source")
        .unionByName(full)
        .unionByName(partial)
    )
    ratios = contamination_ratio(train, ev, k=DECON_K)
    return (
        train.join(ratios, "doc_id", "inner")
        .groupBy("source")
        .agg(
            count_big("n_docs"),
            F.round(
                F.sum(F.col("ratio").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_ratio"),
            F.sum(F.when(F.col("ratio") >= DECON_RATIO_TAU, 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
        )
        .orderBy("source")
    )


DOCS_CONTAMINATION_RATIO_ORACLE = rf"""
WITH ev AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {DECON_EVAL_MOD} = 3
), partial AS (
  SELECT e.doc_id + {DECON_PART_OFFSET} AS doc_id,
         array_to_string(
           (string_split_regex(trim(e.text), '\s+'))[1:CAST(ceil(len(string_split_regex(trim(e.text), '\s+')) / 2.0) AS BIGINT)],
           ' ') || ' ' || n.text AS text,
         'leaked_part' AS source
  FROM ev e JOIN documents n ON n.doc_id = e.doc_id + 1
), train AS (
  SELECT doc_id, text, source FROM documents WHERE doc_id % {DECON_EVAL_MOD} <> 3
  UNION ALL
  SELECT doc_id + {DECON_LEAK_OFFSET}, text, 'leaked_full' FROM ev
  UNION ALL
  SELECT doc_id, text, source FROM partial
), ev_sh AS (
  SELECT DISTINCT unnest(list_transform(generate_series(1, len(t) - {DECON_K - 1}),
                                        i -> array_to_string(t[i:i+{DECON_K - 1}], ' '))) AS sh
  FROM (SELECT string_split_regex(trim(text), '\s+') AS t FROM ev)
  WHERE len(t) >= {DECON_K}
), tr_sh AS (
  SELECT DISTINCT doc_id, source,
         unnest(list_transform(generate_series(1, len(t) - {DECON_K - 1}),
                               i -> array_to_string(t[i:i+{DECON_K - 1}], ' '))) AS sh
  FROM (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t FROM train)
  WHERE len(t) >= {DECON_K}
), per_doc AS (
  SELECT t.doc_id, t.source,
         ROUND(CAST(SUM(CASE WHEN e.sh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*), 6) AS ratio
  FROM tr_sh t LEFT JOIN ev_sh e USING (sh)
  GROUP BY t.doc_id, t.source
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  ROUND(CAST(SUM(CAST(ratio AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_ratio,
  CAST(SUM(CASE WHEN ratio >= {DECON_RATIO_TAU} THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM per_doc
GROUP BY source
ORDER BY source
"""


# --- docs_two_band_decon ------------------------------------------------------------
# [EXT] the industry double-check (GPT-3/PaLM style): verbatim 13-gram band OR
# >= tau of distinct 8-grams hit. One tokenize pass serves both bands
# (ext/dedup.py: two_band_decontaminate). Planted evidence: full leaks trip BOTH
# bands; partial leaks (eval first-half + clean neighbor text) trip the long band on
# their verbatim half AND sit near tau on the ratio band; organic docs trip neither.

DECON_K_LONG = 13


def docs_two_band_decon(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.dedup import two_band_decontaminate
    from ..ext.text import tokens

    # NOT spread (r14 interleaved A/B with InferFiltersFromGenerate excluded:
    # 0.92 s unspread vs 1.31 s spread min-of-5) — the docs scan feeds the
    # broadcast eval build, the leaked-pair join AND the train side, so the
    # repartition stalls the broadcast builds (the r13 retrieval conflict)
    # for less parallel-compute than it buys on this corpus
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % DECON_EVAL_MOD == 3)
    nb = docs.select(F.col("doc_id").alias("nb_id"), F.col("text").alias("nb_text"))
    toks = tokens(F.col("text"))
    half = F.slice(toks, 1, F.ceil(F.size(toks) / 2).cast("int"))
    partial = ev.join(nb, ev["doc_id"] + 1 == nb["nb_id"], "inner").select(
        (F.col("doc_id") + DECON_PART_OFFSET).alias("doc_id"),
        F.concat(F.concat_ws(" ", half), F.lit(" "), F.col("nb_text")).alias("text"),
        F.lit("leaked_part").alias("source"),
    )
    full = ev.select(
        (F.col("doc_id") + DECON_LEAK_OFFSET).alias("doc_id"),
        "text",
        F.lit("leaked_full").alias("source"),
    )
    train = (
        docs.filter(F.col("doc_id") % DECON_EVAL_MOD != 3)
        .select("doc_id", "text", "source")
        .unionByName(full)
        .unionByName(partial)
    )
    res = two_band_decontaminate(
        train, ev, k_long=DECON_K_LONG, k_short=DECON_K, tau=DECON_RATIO_TAU
    )
    return (
        train.select("doc_id", "source")
        .join(res, "doc_id", "left")
        .groupBy("source")
        .agg(
            count_big("n_docs"),
            F.sum(F.when(F.col("long_hit"), 1).otherwise(0))
            .cast("long")
            .alias("n_long_hits"),
            F.sum(F.when(F.col("short_ratio") >= DECON_RATIO_TAU, 1).otherwise(0))
            .cast("long")
            .alias("n_ratio_flagged"),
            F.sum(F.when(F.col("flagged"), 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
        )
        .orderBy("source")
    )


DOCS_TWO_BAND_DECON_ORACLE = rf"""
WITH ev AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {DECON_EVAL_MOD} = 3
), partial AS (
  SELECT e.doc_id + {DECON_PART_OFFSET} AS doc_id,
         array_to_string(
           (string_split_regex(trim(e.text), '\s+'))[1:CAST(ceil(len(string_split_regex(trim(e.text), '\s+')) / 2.0) AS BIGINT)],
           ' ') || ' ' || n.text AS text,
         'leaked_part' AS source
  FROM ev e JOIN documents n ON n.doc_id = e.doc_id + 1
), train AS (
  SELECT doc_id, text, source FROM documents WHERE doc_id % {DECON_EVAL_MOD} <> 3
  UNION ALL
  SELECT doc_id + {DECON_LEAK_OFFSET}, text, 'leaked_full' FROM ev
  UNION ALL
  SELECT doc_id, text, source FROM partial
), ev_t AS (
  SELECT string_split_regex(trim(text), '\s+') AS t FROM ev
), ev8 AS (
  SELECT DISTINCT unnest(list_transform(generate_series(1, len(t) - {DECON_K - 1}),
                                        i -> array_to_string(t[i:i+{DECON_K - 1}], ' '))) AS sh
  FROM ev_t WHERE len(t) >= {DECON_K}
), ev13 AS (
  SELECT DISTINCT unnest(list_transform(generate_series(1, len(t) - {DECON_K_LONG - 1}),
                                        i -> array_to_string(t[i:i+{DECON_K_LONG - 1}], ' '))) AS sh
  FROM ev_t WHERE len(t) >= {DECON_K_LONG}
), tr_t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM train
), tr8 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(t) - {DECON_K - 1}),
                               i -> array_to_string(t[i:i+{DECON_K - 1}], ' '))) AS sh
  FROM tr_t WHERE len(t) >= {DECON_K}
), tr13 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(t) - {DECON_K_LONG - 1}),
                               i -> array_to_string(t[i:i+{DECON_K_LONG - 1}], ' '))) AS sh
  FROM tr_t WHERE len(t) >= {DECON_K_LONG}
), ratio8 AS (
  SELECT t.doc_id,
         ROUND(CAST(SUM(CASE WHEN e.sh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*), 6) AS ratio
  FROM tr8 t LEFT JOIN ev8 e USING (sh)
  GROUP BY t.doc_id
), long13 AS (
  SELECT DISTINCT t.doc_id FROM tr13 t JOIN ev13 e USING (sh)
)
SELECT tr.source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_long_hits,
  CAST(SUM(CASE WHEN COALESCE(r.ratio, 0) >= {DECON_RATIO_TAU} THEN 1 ELSE 0 END) AS BIGINT) AS n_ratio_flagged,
  CAST(SUM(CASE WHEN l.doc_id IS NOT NULL OR COALESCE(r.ratio, 0) >= {DECON_RATIO_TAU}
           THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM train tr
LEFT JOIN ratio8 r ON tr.doc_id = r.doc_id
LEFT JOIN long13 l ON tr.doc_id = l.doc_id
GROUP BY tr.source
ORDER BY tr.source
"""


# --- docs_training_prep_pipeline ----------------------------------------------------
# [EXT] the capstone composition, scored as ONE funnel hash: planted-dup corpus ->
# quality filter -> two-band decontamination against the eval slice (which overlaps
# the corpus: eval originals and their planted copies are genuine full leaks) ->
# exact dedup (min-id survivor) -> context-window chunking. Every stage is
# SQL-expressible, so the oracle replays the entire pipeline relationally — a match
# certifies the five chained operators end to end, including the stage interfaces
# (who consumes whose survivors), not each operator in isolation.


def docs_training_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.dedup import exact_dedup, two_band_decontaminate
    from ..ext.text import chunk_documents

    aug = _docs_with_planted_dups(spark, sf_dir)
    # Stage materialization (localCheckpoint, deterministic stages): each stage is
    # consumed by both the next stage AND its own funnel count, and a real 100 TB
    # pipeline persists between stages anyway — without the cut, the five funnel
    # branches re-run the upstream pipeline per branch (a 49-shuffle static plan).
    kept = (
        aug.withColumn("quality", quality_score(F.col("text")))
        .filter(F.col("quality") >= QUALITY_KEEP_THRESHOLD)
        .localCheckpoint(eager=False)
    )
    # the eval side feeds ONLY the broadcast probe set, so spreading it cannot
    # stall a big-side exchange (the r13 retrieval conflict) — it just
    # parallelizes the tokenize + both-band shingle build that was an 8.4 s
    # single-task stage in the r14 profile
    ev = _spread(
        load_table(spark, sf_dir, "documents"), sf_dir
    ).filter(F.col("doc_id") % DECON_EVAL_MOD == 3)
    decon = two_band_decontaminate(
        kept, ev, k_long=DECON_K_LONG, k_short=DECON_K, tau=DECON_RATIO_TAU
    )
    clean = kept.join(
        decon.filter(F.col("flagged")).select("doc_id"), "doc_id", "left_anti"
    ).localCheckpoint(eager=False)
    unique = exact_dedup(clean).localCheckpoint(eager=False)
    chunks = chunk_documents(unique, max_tokens=CHUNK_MAX_TOKENS, overlap=CHUNK_OVERLAP)

    a_raw = aug.agg(count_big("n_raw"))
    a_quality = kept.agg(count_big("n_quality"))
    a_clean = clean.agg(count_big("n_clean"))
    a_unique = unique.agg(count_big("n_unique"))
    a_chunks = chunks.agg(
        count_big("n_chunks"),
        F.sum("chunk_tokens").cast("long").alias("chunk_tokens"),
    )
    return (
        a_raw.crossJoin(a_quality)
        .crossJoin(a_clean)
        .crossJoin(a_unique)
        .crossJoin(a_chunks)
    )


DOCS_TRAINING_PREP_PIPELINE_ORACLE = rf"""
WITH docs_aug AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + {DUP_OFFSET} AS doc_id, text, source
  FROM documents WHERE doc_id % 7 = 0
), feats AS (
  SELECT
    doc_id, source, text,
    CAST(length(text) AS BIGINT) AS n_chars,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
    CAST(length(regexp_replace(text, '[\w\s]', '', 'g')) AS BIGINT) AS n_punct,
    CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper,
    list_sum(list_transform(string_split_regex(trim(text), '\s+'),
                            x -> length(x))) AS alpha_len
  FROM docs_aug
), ratios AS (
  SELECT
    doc_id, source, text, n_tokens,
    CASE WHEN n_tokens > 0 THEN ROUND(CAST(alpha_len AS DOUBLE) / n_tokens, 6) ELSE 0.0 END AS mean_token_len,
    CASE WHEN n_chars > 0 THEN ROUND(CAST(n_punct AS DOUBLE) / n_chars, 6) ELSE 0.0 END AS punct_ratio,
    CASE WHEN n_chars > 0 THEN ROUND(CAST(n_upper AS DOUBLE) / n_chars, 6) ELSE 0.0 END AS upper_ratio
  FROM feats
), kept AS (
  SELECT doc_id, source, text FROM (
    SELECT doc_id, source, text,
      ROUND(
        LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4 +
        (CASE WHEN mean_token_len >= 2.0 AND mean_token_len <= 12.0 THEN 1.0 ELSE 0.3 END) * 0.3 +
        GREATEST(0.0, 1.0 - (punct_ratio + upper_ratio) * 2.0) * 0.3,
      6) AS quality
    FROM ratios
  ) WHERE quality >= {QUALITY_KEEP_THRESHOLD}
), ev_t AS (
  SELECT string_split_regex(trim(text), '\s+') AS t
  FROM documents WHERE doc_id % {DECON_EVAL_MOD} = 3
), ev8 AS (
  SELECT DISTINCT unnest(list_transform(generate_series(1, len(t) - {DECON_K - 1}),
                                        i -> array_to_string(t[i:i+{DECON_K - 1}], ' '))) AS sh
  FROM ev_t WHERE len(t) >= {DECON_K}
), ev13 AS (
  SELECT DISTINCT unnest(list_transform(generate_series(1, len(t) - {DECON_K_LONG - 1}),
                                        i -> array_to_string(t[i:i+{DECON_K_LONG - 1}], ' '))) AS sh
  FROM ev_t WHERE len(t) >= {DECON_K_LONG}
), tr_t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM kept
), tr8 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(t) - {DECON_K - 1}),
                               i -> array_to_string(t[i:i+{DECON_K - 1}], ' '))) AS sh
  FROM tr_t WHERE len(t) >= {DECON_K}
), tr13 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(t) - {DECON_K_LONG - 1}),
                               i -> array_to_string(t[i:i+{DECON_K_LONG - 1}], ' '))) AS sh
  FROM tr_t WHERE len(t) >= {DECON_K_LONG}
), flagged AS (
  SELECT doc_id FROM (
    SELECT t.doc_id,
           ROUND(CAST(SUM(CASE WHEN e.sh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS ratio
    FROM tr8 t LEFT JOIN ev8 e USING (sh) GROUP BY t.doc_id
  ) WHERE ratio >= {DECON_RATIO_TAU}
  UNION
  SELECT DISTINCT t.doc_id FROM tr13 t JOIN ev13 e USING (sh)
), clean AS (
  SELECT * FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
), unique_docs AS (
  SELECT MIN(doc_id) AS doc_id, text FROM clean GROUP BY text
), u_tok AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n
  FROM unique_docs
), chunked AS (
  SELECT doc_id, n,
         CASE WHEN n <= {CHUNK_MAX_TOKENS} THEN 1
              ELSE CAST(ceil((n - {CHUNK_MAX_TOKENS}) / {_CHUNK_STRIDE}.0) AS BIGINT) + 1
         END AS n_chunks
  FROM u_tok
), per_chunk AS (
  SELECT doc_id, least({CHUNK_MAX_TOKENS}, n - i * {_CHUNK_STRIDE}) AS chunk_tokens
  FROM chunked, unnest(generate_series(0, n_chunks - 1)) AS t(i)
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM docs_aug) AS n_raw,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS n_quality,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM clean) AS n_clean,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM unique_docs) AS n_unique,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM per_chunk) AS n_chunks,
  (SELECT CAST(SUM(chunk_tokens) AS BIGINT) FROM per_chunk) AS chunk_tokens
"""


# --- multimodal_manifest ------------------------------------------------------------
# [EXT] multimodal upgraded from rows-only to ORACLED evidence: the synthetic corpus
# is generated through the REAL binary pipeline (mapInPandas WAV/PPM encoders), and
# every payload's byte size is closed-form derivable from the text length — PPM P6 is
# "P6\n{w} {h}\n255\n" + 3*w*h, WAV is a 44-byte header + 2 bytes/sample, video is
# the raw utf-8 text. A hash match on per-kind byte/pixel/duration totals certifies
# the encoders, the metadata plumbing, and the Arrow boundary end to end (the float
# feature path stays rows-only in multimodal_features by necessity).


def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.multimodal import synthesize_media

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs)
    return (
        media.select(
            "kind",
            F.length("payload").alias("_nbytes"),
            F.col("meta.width").alias("_w"),
            F.col("meta.height").alias("_h"),
            F.col("meta.duration_ms").alias("_dur"),
        )
        .groupBy("kind")
        .agg(
            count_big("n_media"),
            F.sum("_nbytes").cast("long").alias("total_bytes"),
            F.sum(F.coalesce(F.col("_w") * F.col("_h"), F.lit(0)))
            .cast("long")
            .alias("sum_pixels"),
            F.sum(F.coalesce("_dur", F.lit(0))).cast("long").alias("sum_duration_ms"),
        )
        .orderBy("kind")
    )


MULTIMODAL_MANIFEST_ORACLE = """
WITH m AS (
  SELECT doc_id, text, length(text) AS n,
    CASE CAST(doc_id % 3 AS INTEGER)
      WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
    length(text) % 64 + 4 AS w,
    length(text) % 48 + 4 AS h,
    length(text) % 400 + 100 AS cnt
  FROM documents
)
SELECT kind,
  CAST(COUNT(*) AS BIGINT) AS n_media,
  CAST(SUM(CASE kind
    WHEN 'image' THEN 9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) + 3 * w * h
    WHEN 'audio' THEN 44 + 2 * cnt
    ELSE strlen(text) END) AS BIGINT) AS total_bytes,
  CAST(SUM(CASE WHEN kind = 'image' THEN w * h ELSE 0 END) AS BIGINT) AS sum_pixels,
  CAST(SUM(CASE WHEN kind = 'audio' THEN cnt * 1000 // 16000
                WHEN kind = 'video' THEN n * 10 ELSE 0 END) AS BIGINT) AS sum_duration_ms
FROM m
GROUP BY kind
ORDER BY kind
"""


# --- docs_unigram_surprisal ----------------------------------------------------------
# CCNet-style LM quality scoring (ext/lm.py): corpus unigram vocabulary (one token
# shuffle, top-K truncation), broadcast vocab scoring (zero corpus shuffle), per-doc
# surprisal-bits aggregation, per-lang roll-up. The per-doc avg is rounded then
# decimal-summed for the lang mean (parity discipline: order-independent).

UNIGRAM_TOP_K = 800
UNIGRAM_HIGH_BITS = 9.0


def docs_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.lm import score_surprisal, unigram_vocab

    docs = load_table(spark, sf_dir, "documents")
    vocab = unigram_vocab(docs, top_k=UNIGRAM_TOP_K).localCheckpoint()
    # Bounded driver action (1 long), same cost class as the documented IVF
    # training sample: the vocabulary relation is already materialized above.
    total_tokens = docs.select(
        F.sum(token_count(F.col("text"))).alias("t")
    ).collect()[0]["t"]
    scored = score_surprisal(docs, vocab, total_tokens)
    return (
        scored.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            count_big("doc_count"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("oov_tokens").cast("long").alias("oov_tokens"),
            F.sum("sum_bits").cast("long").alias("sum_bits"),
            F.round(
                F.sum(F.col("avg_bits").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_avg_bits"),
            F.sum(F.when(F.col("avg_bits") > UNIGRAM_HIGH_BITS, 1).otherwise(0))
            .cast("long")
            .alias("high_surprisal_docs"),
        )
        .orderBy("lang")
    )


DOCS_UNIGRAM_SURPRISAL_ORACLE = rf"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', ''), '\s+')) AS token
  FROM documents
  WHERE length(regexp_replace(text, '^\s+|\s+$', '')) > 0
),
vc AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vc),
vocab AS (SELECT token, cnt FROM vc ORDER BY cnt DESC, token ASC LIMIT {UNIGRAM_TOP_K}),
scored AS (
  SELECT t.doc_id,
         length(printf('%b', (SELECT total FROM tot)))
           - COALESCE(length(printf('%b', v.cnt)), 1) AS bits,
         CASE WHEN v.cnt IS NULL THEN 1 ELSE 0 END AS oov
  FROM tok t LEFT JOIN vocab v USING (token)
),
perdoc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(oov) AS BIGINT) AS oov_tokens,
         CAST(SUM(bits) AS BIGINT) AS sum_bits,
         ROUND(CAST(SUM(bits) AS DOUBLE) / COUNT(*), 6) AS avg_bits
  FROM scored GROUP BY doc_id
)
SELECT
  lang,
  CAST(COUNT(*) AS BIGINT) AS doc_count,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  CAST(SUM(oov_tokens) AS BIGINT) AS oov_tokens,
  CAST(SUM(sum_bits) AS BIGINT) AS sum_bits,
  ROUND(CAST(SUM(CAST(avg_bits AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_avg_bits,
  CAST(SUM(CASE WHEN avg_bits > {UNIGRAM_HIGH_BITS} THEN 1 ELSE 0 END) AS BIGINT) AS high_surprisal_docs
FROM perdoc JOIN documents USING (doc_id)
GROUP BY lang
ORDER BY lang
"""


# --- docs_bigram_surprisal -----------------------------------------------------------
# [EXT] The conditional (bigram) LM quality signal — one Markov order up from
# docs_unigram_surprisal (CCNet scores with a 5-gram KenLM; the distributed
# shape is identical at any order: vocabulary shuffles, broadcast scoring,
# per-doc aggregation). bits = max(bl(cnt(t1)) - bl(cnt(t1,t2)), 0) is
# -log2 p(t2|t1) in whole bits, exact integer arithmetic both engines.
#
# The certification is the ORDER-SENSITIVITY theorem, in one hash: every doc
# is scored alongside its REVERSED twin (token order destroyed, token multiset
# preserved — a unigram model provably cannot tell them apart), under the SAME
# LM trained on originals only. Both variants' pair counts, OOV counts and
# surprisal sums land per-lang in the output, plus rev_higher_docs (how many
# docs the conditional model correctly flags as degraded when scrambled) and
# pair_parity_docs (must equal doc_count: reversal preserves pair COUNT
# exactly — an in-hash structural invariant). 100 TB shape: two vocabulary
# shuffles (token, pair — both map-side-combined, top-K truncated to
# broadcastable size), then ONE corpus scan per variant with broadcast-only
# joins and a doc_id shuffle.

BIGRAM_TOP_K = 2000


def docs_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.lm import bigram_vocab, score_bigram_surprisal, unigram_vocab
    from ..ext.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    uni = unigram_vocab(docs, top_k=UNIGRAM_TOP_K).localCheckpoint()
    pairs = bigram_vocab(docs, top_k=BIGRAM_TOP_K).localCheckpoint()
    toks = docs.select("doc_id", "lang", tokens(F.col("text")).alias("toks"))
    both = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.array(
                F.struct(F.lit("orig").alias("variant"), F.col("toks").alias("toks")),
                F.struct(
                    F.lit("rev").alias("variant"), F.reverse("toks").alias("toks")
                ),
            )
        ).alias("v"),
    ).select("doc_id", "lang", F.col("v.variant").alias("variant"), F.col("v.toks").alias("toks"))
    scored = score_bigram_surprisal(
        both, uni, pairs, toks_col="toks", id_cols=("doc_id", "lang", "variant")
    )
    o = scored.where(F.col("variant") == "orig").select(
        "doc_id",
        "lang",
        F.col("n_pairs").alias("o_pairs"),
        F.col("oov_pairs").alias("o_oov"),
        F.col("sum_bits").alias("o_bits"),
    )
    r = scored.where(F.col("variant") == "rev").select(
        "doc_id",
        F.col("n_pairs").alias("r_pairs"),
        F.col("oov_pairs").alias("r_oov"),
        F.col("sum_bits").alias("r_bits"),
    )
    return (
        o.join(r, "doc_id")
        .groupBy("lang")
        .agg(
            count_big("doc_count"),
            F.sum("o_pairs").cast("long").alias("total_pairs"),
            F.sum("o_oov").cast("long").alias("oov_pairs_orig"),
            F.sum("r_oov").cast("long").alias("oov_pairs_rev"),
            F.sum("o_bits").cast("long").alias("sum_bits_orig"),
            F.sum("r_bits").cast("long").alias("sum_bits_rev"),
            F.sum(F.when(F.col("r_bits") > F.col("o_bits"), 1).otherwise(0))
            .cast("long")
            .alias("rev_higher_docs"),
            F.sum(F.when(F.col("r_pairs") == F.col("o_pairs"), 1).otherwise(0))
            .cast("long")
            .alias("pair_parity_docs"),
        )
        .orderBy("lang")
    )


DOCS_BIGRAM_SURPRISAL_ORACLE = rf"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, lang,
         string_split_regex(regexp_replace(text, '^\s+|\s+$', ''), '\s+') AS l
  FROM documents
  WHERE length(regexp_replace(text, '^\s+|\s+$', '')) > 0
), uni AS MATERIALIZED (
  SELECT token, COUNT(*) AS cnt
  FROM (SELECT unnest(l) AS token FROM tok) GROUP BY token
  ORDER BY cnt DESC, token ASC LIMIT {UNIGRAM_TOP_K}
), allpairs AS MATERIALIZED (
  SELECT doc_id, lang, variant, l[i] AS t1, l[i + 1] AS t2
  FROM (
    SELECT doc_id, lang, variant, l,
           unnest(generate_series(1, len(l) - 1)) AS i
    FROM (SELECT doc_id, lang, 'orig' AS variant, l FROM tok
          UNION ALL SELECT doc_id, lang, 'rev', list_reverse(l) FROM tok) v
    WHERE len(l) >= 2
  )
), pv AS MATERIALIZED (
  SELECT t1, t2, COUNT(*) AS pair_cnt
  FROM allpairs WHERE variant = 'orig' GROUP BY t1, t2
  ORDER BY pair_cnt DESC, t1 ASC, t2 ASC LIMIT {BIGRAM_TOP_K}
), scored AS (
  SELECT p.doc_id, p.lang, p.variant,
         GREATEST(COALESCE(length(printf('%b', u.cnt)), 1)
                  - COALESCE(length(printf('%b', v.pair_cnt)), 1), 0) AS bits,
         CASE WHEN v.pair_cnt IS NULL THEN 1 ELSE 0 END AS oov
  FROM allpairs p
  LEFT JOIN uni u ON u.token = p.t1
  LEFT JOIN pv v ON v.t1 = p.t1 AND v.t2 = p.t2
), perdoc AS (
  SELECT doc_id, lang, variant,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(oov) AS BIGINT) AS oov,
         CAST(SUM(bits) AS BIGINT) AS bits
  FROM scored GROUP BY doc_id, lang, variant
)
SELECT o.lang,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(SUM(o.n_pairs) AS BIGINT) AS total_pairs,
       CAST(SUM(o.oov) AS BIGINT) AS oov_pairs_orig,
       CAST(SUM(r.oov) AS BIGINT) AS oov_pairs_rev,
       CAST(SUM(o.bits) AS BIGINT) AS sum_bits_orig,
       CAST(SUM(r.bits) AS BIGINT) AS sum_bits_rev,
       CAST(SUM(CASE WHEN r.bits > o.bits THEN 1 ELSE 0 END) AS BIGINT)
         AS rev_higher_docs,
       CAST(SUM(CASE WHEN r.n_pairs = o.n_pairs THEN 1 ELSE 0 END) AS BIGINT)
         AS pair_parity_docs
FROM perdoc o
JOIN perdoc r ON r.doc_id = o.doc_id AND r.variant = 'rev'
WHERE o.variant = 'orig'
GROUP BY o.lang
ORDER BY o.lang
"""


# --- docs_temperature_mixture --------------------------------------------------------
# sqrt-temperature domain mixture (ext/sampling.py temperature_sample): certifies the
# exact sampled SET cross-engine (membership via portable md5 bound, checksummed with
# sum(doc_id)), not just its size. alpha fixed at 0.5 — see ext/sampling.py for why
# (sqrt is the only correctly-rounded power).

MIX_TARGET_FRACTION = 0.4


def docs_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.sampling import MIX_HEX_DIGITS, split_key, temperature_sample

    docs = load_table(spark, sf_dir, "documents")
    # Bounded driver action (1 long): the target budget is a fraction of the corpus.
    target = MIX_TARGET_FRACTION * docs.count()
    sampled = temperature_sample(docs, "source", target, salt="mix")
    return (
        sampled.groupBy("source")
        .agg(
            count_big("n_sampled"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
            F.sum("n_chars").cast("long").alias("chars_sampled"),
        )
        .orderBy("source")
    )


DOCS_TEMPERATURE_MIXTURE_ORACLE = rf"""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(ROUND(SQRT(CAST(COUNT(*) AS DOUBLE)), 6) AS DECIMAL(18,6)) AS w
  FROM documents GROUP BY source
),
tw AS (SELECT SUM(w) AS total_w FROM counts),
corpus AS (SELECT CAST(COUNT(*) AS DOUBLE) * {MIX_TARGET_FRACTION} AS target FROM documents),
rates AS (
  SELECT source,
         CASE WHEN ROUND(rate, 6) >= 1.0 THEN 'g'
              ELSE printf('%0{6}x', CAST(ROUND(ROUND(rate, 6) * 16777216, 0) AS BIGINT))
         END AS bound
  FROM (
    SELECT source,
           LEAST(1.0, (CAST(w AS DOUBLE) * (SELECT target FROM corpus))
                       / (CAST((SELECT total_w FROM tw) AS DOUBLE) * CAST(n_docs AS DOUBLE))) AS rate
    FROM counts
  )
)
SELECT
  d.source,
  CAST(COUNT(*) AS BIGINT) AS n_sampled,
  CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
  CAST(SUM(n_chars) AS BIGINT) AS chars_sampled
FROM documents d JOIN rates r ON d.source = r.source
WHERE substring(md5('mix' || CAST(doc_id AS VARCHAR)), 1, {6}) < r.bound
GROUP BY d.source
ORDER BY d.source
"""


# --- emb_random_projection -----------------------------------------------------------
# JL random projection (ext/projection.py): 64 -> 8 dims with the content-addressed
# +-1 matrix, certified cross-engine by re-deriving the SAME matrix constants into the
# oracle SQL. Output: per-label norm-preservation stats (the JL ratio concentrates
# near 1 — this is the property that makes the projection safe to put in front of
# ANN/clustering at scale). Narrow map, zero shuffle before the label roll-up.

RP_OUT_DIM = 8
RP_IN_DIM = 64


def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce as _reduce

    from ..ext.projection import random_project

    from ..ext.projection import nano_array

    emb = _spread(load_table(spark, sf_dir, "embeddings"), sf_dir, table="embeddings")
    proj = random_project(emb, "embedding", RP_OUT_DIM, RP_IN_DIM).withColumn(
        "_micro", nano_array(F.col("embedding"), 6)
    )
    # Exact micro-scaled integer squares: decimal chains of 64 adds overflow Spark's
    # precision cap and silently drop scale (see ext/projection.py nano_array); long
    # sums do not. micro (1e6) keeps 64 squared ~2e6-scale terms far inside BIGINT;
    # one materialized array + one fold, not a 128-term inline tree.
    norm2_orig = (
        F.aggregate(
            F.col("_micro"), F.lit(0).cast("long"), lambda acc, x: acc + x * x
        ).cast("double")
        / F.lit(1.0e12)
    )
    comp = lambda i: F.element_at(F.col("projected"), i + 1)  # noqa: E731
    norm2_proj = _reduce(lambda a, b: a + b, [comp(i) * comp(i) for i in range(RP_OUT_DIM)])
    ratio = F.round(norm2_proj / (F.lit(float(RP_OUT_DIM)) * norm2_orig), 6)
    return (
        proj.withColumn("_ratio", ratio)
        .groupBy("label")
        .agg(
            count_big("n_vectors"),
            F.round(
                F.sum(F.col("_ratio").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_ratio"),
            F.min("_ratio").alias("min_ratio"),
            F.max("_ratio").alias("max_ratio"),
        )
        .orderBy("label")
    )


def _rp_oracle() -> str:
    from ..ext.projection import projection_signs

    signs = projection_signs(RP_OUT_DIM, RP_IN_DIM)
    comps = []
    for i, row in enumerate(signs):
        terms = " + ".join(
            f"CAST(CAST(CAST(embedding[{j + 1}] AS DOUBLE) AS DECIMAL(18,9)) * 1000000000 AS BIGINT) * {s}"
            for j, s in enumerate(row)
        )
        comps.append(f"ROUND(CAST(({terms}) AS DOUBLE) / 1000000000.0, 6) AS c{i}")
    m = "CAST(CAST(CAST(embedding[{k}] AS DOUBLE) AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
    norm2_orig = " + ".join(
        f"{m.format(k=j + 1)} * {m.format(k=j + 1)}" for j in range(RP_IN_DIM)
    )
    norm2_proj = " + ".join(f"c{i} * c{i}" for i in range(RP_OUT_DIM))
    return f"""
WITH projected AS (
  SELECT label,
         CAST(({norm2_orig}) AS DOUBLE) / 1e12 AS norm2_orig,
         {", ".join(comps)}
  FROM embeddings
),
ratios AS (
  SELECT label,
         ROUND(({norm2_proj}) / ({float(RP_OUT_DIM)} * norm2_orig), 6) AS ratio
  FROM projected
)
SELECT
  label,
  CAST(COUNT(*) AS BIGINT) AS n_vectors,
  ROUND(CAST(SUM(CAST(ratio AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_ratio,
  MIN(ratio) AS min_ratio,
  MAX(ratio) AS max_ratio
FROM ratios
GROUP BY label
ORDER BY label
"""


EMB_RANDOM_PROJECTION_ORACLE = _rp_oracle()


# --- multimodal_frame_sample ---------------------------------------------------------
# Video frame-sampling certification: synthesize real PVID payloads (raw RGB24
# container — the minimal in-repo video container; the ISO-BMFF path is certified
# separately by media_mp4_container_stats below), sample every
# 2nd frame via the Arrow-batched mapInPandas extractor, re-encode each frame as PPM,
# and roll up per lang. Every output quantity is closed-form from (doc_id, length
# (text)), so DuckDB certifies the container generation, the parse, the sampling
# stride, and the per-frame PPM re-encode — the whole video path — in one hash.


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.multimodal import sample_video_frames, synthesize_media

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs, video_format="pvid")
    frames = sample_video_frames(media, every_k=2)
    return (
        frames.join(
            docs.select(F.col("doc_id").alias("media_id"), "lang"), "media_id"
        )
        .groupBy("lang")
        .agg(
            F.countDistinct("media_id").cast("long").alias("n_videos"),
            count_big("n_frames_sampled"),
            F.sum(F.length("frame")).cast("long").alias("frames_bytes"),
            F.sum("frame_idx").cast("long").alias("sum_frame_idx"),
            F.sum(F.col("width") * F.col("height")).cast("long").alias("sum_frame_pixels"),
        )
        .orderBy("lang")
    )


MULTIMODAL_FRAME_SAMPLE_ORACLE = """
WITH v AS (
  SELECT doc_id, lang,
         length(text) % 32 + 2 AS w,
         length(text) % 24 + 2 AS h,
         2 + CAST(doc_id % 4 AS INTEGER) AS nf
  FROM documents WHERE doc_id % 3 = 2
), s AS (
  SELECT lang, doc_id, w, h, (nf + 1) // 2 AS c
  FROM v
)
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_videos,
  CAST(SUM(c) AS BIGINT) AS n_frames_sampled,
  CAST(SUM(c * (9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) + 3 * w * h)) AS BIGINT) AS frames_bytes,
  CAST(SUM(c * (c - 1)) AS BIGINT) AS sum_frame_idx,
  CAST(SUM(c * w * h) AS BIGINT) AS sum_frame_pixels
FROM s
GROUP BY lang
ORDER BY lang
"""


# --- media_mp4_container_stats ---------------------------------------------------------
# [EXT] The ISO-BMFF (MP4) container path certified end to end: the engine
# synthesizes REAL MJPEG-in-MP4 files (ext/mp4.py writer: ftyp|mdat|moov, full
# stsd/stts/stsc/stsz/stco sample table), then — in a separate Arrow-batched
# pass that sees only bytes — walks the box tree, reconstructs every sample's
# exact byte range from the chunk runs, decodes each sample with the in-repo
# JPEG decoder, and replays the duration from mdhd/stts. Every reported
# quantity (frame counts, stsd dimensions, durations) is closed-form from
# (doc_id, length(text)), so DuckDB certifies the writer, the box walk, the
# sample-table reconstruction AND the per-sample decode in one hash; dims_ok
# additionally pins stsd metadata == decoded pixels == synthesis meta. A torn
# stco/stsz offset would surface as a JPEG decode failure or dimension
# mismatch and break the hash. 100 TB shape: payloads are opaque binary cells
# in Arrow batches; the walk+decode is mapInPandas executor-side, grouped
# output is bounded by the (n_frames x width x height) key space, never rows.


def media_mp4_container_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.multimodal import synthesize_media

    docs = _spread(
        load_table(spark, sf_dir, "documents").where(
            F.pmod(F.col("doc_id"), F.lit(3)) == 2  # the video slice
        ),
        sf_dir,
        factor=2,
    )
    media = synthesize_media(docs, video_format="mp4")

    stats_schema = (
        "media_id long, n_frames long, width long, height long, "
        "duration_ms long, dims_ok boolean"
    )

    def walk(batches):
        import pandas as pd

        from ..ext.mp4 import parse_mp4, parse_mp4_mjpeg

        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "n_frames", "width", "height", "duration_ms", "dims_ok")}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                info = parse_mp4(bytes(payload))
                n, w, h, _frames, dur = parse_mp4_mjpeg(bytes(payload))
                ok = (
                    (info["width"], info["height"]) == (w, h)
                    and len(info["samples"]) == n
                    and int(meta["width"]) == w
                    and int(meta["height"]) == h
                    and dur == n * 100  # stts/mdhd replay at fps=10
                )
                out["media_id"].append(int(mid))
                out["n_frames"].append(n)
                out["width"].append(w)
                out["height"].append(h)
                out["duration_ms"].append(int(dur))
                out["dims_ok"].append(bool(ok))
            yield pd.DataFrame(out)

    stats = media.mapInPandas(walk, stats_schema)
    return (
        stats.groupBy("n_frames", "width", "height")
        .agg(
            count_big("n_containers"),
            F.sum("n_frames").cast("long").alias("frames_decoded"),
            F.sum("duration_ms").cast("long").alias("total_duration_ms"),
            F.expr("bool_and(dims_ok)").alias("all_dims_ok"),
        )
        .orderBy("n_frames", "width", "height")
    )


MEDIA_MP4_CONTAINER_STATS_ORACLE = """
WITH vids AS (
  SELECT CAST(2 + doc_id % 4 AS BIGINT) AS n_frames,
         CAST(length(text) % 32 + 4 AS BIGINT) AS width,
         CAST(length(text) % 24 + 4 AS BIGINT) AS height
  FROM documents WHERE doc_id % 3 = 2
)
SELECT n_frames, width, height,
       CAST(COUNT(*) AS BIGINT) AS n_containers,
       CAST(SUM(n_frames) AS BIGINT) AS frames_decoded,
       CAST(SUM(n_frames) * 100 AS BIGINT) AS total_duration_ms,
       TRUE AS all_dims_ok
FROM vids
GROUP BY n_frames, width, height
ORDER BY n_frames, width, height
"""


# --- media_mp3_stream_stats -------------------------------------------------------------
# [EXT] The MP3 stream path certified end to end (ext/mp3.py): the engine
# synthesizes REAL MPEG-1 Layer III frame streams (valid headers whose lengths
# tile the bytes exactly; ID3v2 prefix + ID3v1 trailer; CBR and VBR profiles),
# then — in a separate Arrow-batched pass that sees only bytes — walks every
# frame header and reports duration / bitrate / sample-rate / tag stats. Every
# reported quantity is integer closed-form from (doc_id, length(text)), so
# DuckDB certifies the writer, the header walk, the ID3 skip accounting, the
# frame-length arithmetic (144·kbps·1000 // rate) and the duration replay
# (n_frames·1152·1000 // rate) in one hash. The audio ESSENCE stays
# decoded=false (ext/mp4.py's honesty contract — a header walk is the manifest
# capability; Huffman+IMDCT belong to external libs). 100 TB shape: payloads
# are opaque binary cells in Arrow batches; the walk is mapInPandas
# executor-side; grouped output is bounded by (sample_rate, is_cbr), never rows.

MP3_BITRATE_CBR = 128  # index 9 (MPEG1 L3)
MP3_BITRATE_VBR_ALT = 224  # index 12, alternated on odd frames in VBR streams


def media_mp3_stream_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.multimodal import synthesize_media

    docs = _spread(
        load_table(spark, sf_dir, "documents").where(
            F.pmod(F.col("doc_id"), F.lit(3)) == 1  # the audio slice
        ),
        sf_dir,
        factor=2,
    )
    media = synthesize_media(docs, audio_encoding="mp3")

    stats_schema = (
        "media_id long, sample_rate long, is_cbr boolean, n_frames long, "
        "duration_ms long, stream_bytes long, mean_kbps long, "
        "id3v2 boolean, id3v1 boolean, meta_ok boolean"
    )

    def walk(batches):
        import pandas as pd

        from ..ext.mp3 import parse_mp3

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "sample_rate", "is_cbr", "n_frames", "duration_ms",
                "stream_bytes", "mean_kbps", "id3v2", "id3v1", "meta_ok",
            )}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                info = parse_mp3(bytes(payload))
                out["media_id"].append(int(mid))
                out["sample_rate"].append(info["sample_rate"])
                out["is_cbr"].append(info["is_cbr"])
                out["n_frames"].append(info["n_frames"])
                out["duration_ms"].append(info["duration_ms"])
                out["stream_bytes"].append(info["stream_bytes"])
                out["mean_kbps"].append(info["mean_bitrate_kbps"])
                out["id3v2"].append(info["has_id3v2"])
                out["id3v1"].append(info["has_id3v1"])
                # the walked stats must agree with the synthesis metadata
                out["meta_ok"].append(
                    int(meta["sample_rate"]) == info["sample_rate"]
                    and int(meta["duration_ms"]) == info["duration_ms"]
                    and not info["decoded"]  # essence honesty pinned in-plan
                )
            yield pd.DataFrame(out)

    stats = media.mapInPandas(walk, stats_schema)
    return (
        stats.groupBy("sample_rate", "is_cbr")
        .agg(
            count_big("n_streams"),
            F.sum("n_frames").cast("long").alias("total_frames"),
            F.sum("duration_ms").cast("long").alias("total_duration_ms"),
            F.sum("stream_bytes").cast("long").alias("total_stream_bytes"),
            F.sum("mean_kbps").cast("long").alias("sum_mean_kbps"),
            F.sum(F.col("id3v2").cast("long")).cast("long").alias("n_id3v2"),
            F.expr("bool_and(id3v1)").alias("all_id3v1"),
            F.expr("bool_and(meta_ok)").alias("all_meta_ok"),
        )
        .orderBy("sample_rate", "is_cbr")
    )


MEDIA_MP3_STREAM_STATS_ORACLE = f"""
WITH streams AS (
  SELECT CAST(length(text) % 40 + 5 AS BIGINT) AS nf,
         CASE (doc_id // 3) % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS sample_rate,
         (doc_id // 9) % 2 = 0 AS is_cbr,
         length(text) % 17 > 0 AS id3v2
  FROM documents WHERE doc_id % 3 = 1
), sized AS (
  -- frame lengths: 144 * kbps * 1000 // rate, no padding; VBR alternates
  -- {MP3_BITRATE_CBR}/{MP3_BITRATE_VBR_ALT} kbps starting at frame 0
  SELECT nf, sample_rate, is_cbr, id3v2,
         CASE WHEN is_cbr
              THEN nf * (144 * {MP3_BITRATE_CBR} * 1000 // sample_rate)
              ELSE ((nf + 1) // 2) * (144 * {MP3_BITRATE_CBR} * 1000 // sample_rate)
                   + (nf // 2) * (144 * {MP3_BITRATE_VBR_ALT} * 1000 // sample_rate)
         END AS stream_bytes,
         nf * 1152 * 1000 // sample_rate AS duration_ms
  FROM streams
)
SELECT CAST(sample_rate AS BIGINT) AS sample_rate, is_cbr,
       CAST(COUNT(*) AS BIGINT) AS n_streams,
       CAST(SUM(nf) AS BIGINT) AS total_frames,
       CAST(SUM(duration_ms) AS BIGINT) AS total_duration_ms,
       CAST(SUM(stream_bytes) AS BIGINT) AS total_stream_bytes,
       CAST(SUM(stream_bytes * 8 * sample_rate // (nf * 1152) // 1000) AS BIGINT)
         AS sum_mean_kbps,
       CAST(SUM(CASE WHEN id3v2 THEN 1 ELSE 0 END) AS BIGINT) AS n_id3v2,
       TRUE AS all_id3v1,
       TRUE AS all_meta_ok
FROM sized
GROUP BY sample_rate, is_cbr
ORDER BY sample_rate, is_cbr
"""


# --- docs_incremental_ingest ---------------------------------------------------------
# Admission-control certification (ext/ingest.py): a synthetic incoming batch with
# all four fates — verbatim re-crawls (exact_vs_corpus), suffix-edited near-dups
# (near_dup_vs_corpus via exact shingle Jaccard), genuinely new reversed-token texts
# (admitted), and an in-batch duplicate pair (exact_in_batch) — flows through the
# three-stage pipeline; DuckDB replays every stage relationally and one hash
# certifies the admission decisions AND the audit trail.

INGEST_THRESHOLD = 0.7
INGEST_SHINGLE_K = 4


def _ingest_incoming(docs: DataFrame) -> DataFrame:
    """The synthetic incoming batch shared by the self-contained and indexed
    admission queries: verbatim re-crawls, suffix edits, reversed-token fresh
    docs, and an in-batch duplicate pair — all four audit fates represented."""
    from ..ext.text import tokens

    rev = F.array_join(F.reverse(tokens(F.col("text"))), " ")
    return (
        docs.filter(F.col("doc_id") % 4 == 0)
        .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 4 == 1).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" upd")).alias("text"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 4 == 2).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"), rev.alias("text")
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 4 == 3).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"), rev.alias("text")
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 4 == 3).select(
                (F.col("doc_id") + 3_000_000).alias("doc_id"), rev.alias("text")
            )
        )
    )


def _admission_rollup(admitted: DataFrame, audit: DataFrame) -> DataFrame:
    rejected = audit.groupBy("reason").agg(
        count_big("n"), F.sum("doc_id").cast("long").alias("id_checksum")
    )
    adm = admitted.agg(
        count_big("n"), F.sum("doc_id").cast("long").alias("id_checksum")
    ).select(F.lit("admitted").alias("reason"), "n", "id_checksum")
    return rejected.unionByName(adm).orderBy("reason")


def docs_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.ingest import incremental_ingest

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Spread ONLY the corpus side: its hash-relation and shingle-index builds
    # are the profiled serial single-task stages (r14 interleaved A/B: 4.56 s
    # spread vs 5.24 unspread). The incoming batch is a 5-way union of slices
    # of `docs` — spreading `docs` itself multiplied the union into 160
    # partitions across every checkpointed admission stage (measured 2x
    # slower from per-task overheads), so the batch side stays scan-partitioned.
    admitted, audit = incremental_ingest(
        _spread(docs, sf_dir),
        _ingest_incoming(docs),
        jaccard_threshold=INGEST_THRESHOLD,
        shingle_k=INGEST_SHINGLE_K,
    )
    return _admission_rollup(admitted, audit)


DOCS_INCREMENTAL_INGEST_ORACLE = rf"""
WITH rev AS (
  SELECT doc_id,
         array_to_string(list_reverse(string_split_regex(regexp_replace(text, '^\s+|\s+$', ''), '\s+')), ' ') AS rtext
  FROM documents
),
incoming AS (
  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id + 2000000, text || ' upd' FROM documents WHERE doc_id % 4 = 1
  UNION ALL
  SELECT r.doc_id + 2000000, r.rtext FROM rev r WHERE r.doc_id % 4 = 2
  UNION ALL
  SELECT r.doc_id + 2000000, r.rtext FROM rev r WHERE r.doc_id % 4 = 3
  UNION ALL
  SELECT r.doc_id + 3000000, r.rtext FROM rev r WHERE r.doc_id % 4 = 3
),
s1_rej AS (
  SELECT i.doc_id FROM incoming i
  WHERE EXISTS (SELECT 1 FROM documents d WHERE d.text = i.text)
),
s1_pass AS (
  SELECT * FROM incoming WHERE doc_id NOT IN (SELECT doc_id FROM s1_rej)
),
mins AS (SELECT text, MIN(doc_id) AS mid FROM s1_pass GROUP BY text),
s2_rej AS (
  SELECT p.doc_id FROM s1_pass p JOIN mins m ON p.text = m.text WHERE p.doc_id <> m.mid
),
s2_pass AS (
  SELECT p.doc_id, p.text FROM s1_pass p JOIN mins m ON p.text = m.text AND p.doc_id = m.mid
),
tok_in AS (
  SELECT doc_id, string_split_regex(regexp_replace(text, '^\s+|\s+$', ''), '\s+') AS t
  FROM s2_pass WHERE length(regexp_replace(text, '^\s+|\s+$', '')) > 0
),
sh_in AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(t) - {INGEST_SHINGLE_K - 1}),
                                      i -> array_to_string(t[i:i+{INGEST_SHINGLE_K - 1}], ' '))) AS sh
  FROM tok_in WHERE len(t) >= {INGEST_SHINGLE_K}
),
inv_in AS (SELECT doc_id, len(sh) AS na, unnest(sh) AS s FROM sh_in),
tok_ex AS (
  SELECT doc_id, string_split_regex(regexp_replace(text, '^\s+|\s+$', ''), '\s+') AS t
  FROM documents WHERE length(regexp_replace(text, '^\s+|\s+$', '')) > 0
),
sh_ex AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(t) - {INGEST_SHINGLE_K - 1}),
                                      i -> array_to_string(t[i:i+{INGEST_SHINGLE_K - 1}], ' '))) AS sh
  FROM tok_ex WHERE len(t) >= {INGEST_SHINGLE_K}
),
inv_ex AS (SELECT doc_id AS ex_id, len(sh) AS nb, unnest(sh) AS s FROM sh_ex),
pairs AS (
  SELECT a.doc_id, a.na, b.nb, COUNT(*) AS inter
  FROM inv_in a JOIN inv_ex b ON a.s = b.s
  GROUP BY 1, 2, 3
),
near AS (
  SELECT DISTINCT doc_id FROM pairs
  WHERE ROUND(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 6) >= {INGEST_THRESHOLD}
),
audit AS (
  SELECT doc_id, 'exact_vs_corpus' AS reason FROM s1_rej
  UNION ALL
  SELECT doc_id, 'exact_in_batch' FROM s2_rej
  UNION ALL
  SELECT doc_id, 'near_dup_vs_corpus' FROM near
),
admitted AS (
  SELECT doc_id FROM s2_pass WHERE doc_id NOT IN (SELECT doc_id FROM near)
)
SELECT reason, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM audit GROUP BY reason
UNION ALL
SELECT 'admitted', CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT) FROM admitted
ORDER BY reason
"""


# --- docs_ingest_indexed_parity ------------------------------------------------------
# [EXT] the PRODUCTION admission path (VERDICT r4 next-round #6): corpus-side
# artifacts (text-hash index + inverted shingle index with per-doc sizes) are
# materialized once to parquet, then the SAME incoming batch is admitted against
# them with ZERO corpus scans in the admission plan. The oracle is byte-identical
# to docs_incremental_ingest's — one hash certifies that the amortized path admits
# EXACTLY the set the self-contained reference semantics admit. Per-batch cost at
# scale: batch-sized joins against two indexed parquet artifacts, vs the reference
# form's two full corpus scans per batch (BENCH carries both rows side by side).


def docs_ingest_indexed_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..config import scratch_dir
    from ..ext.ingest import build_corpus_index, incremental_ingest_indexed

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index_path = scratch_dir("ingest_index", sf_dir)
    build_corpus_index(
        docs, index_path, shingle_k=INGEST_SHINGLE_K
    )  # fingerprint-cached: reruns on an unchanged corpus skip the build entirely
    # (a corpus spread into the build was tried in r13 and REVERTED as a net
    # loss in the paired A/B — this path runs unspread; see 6d39e28)
    admitted, audit = incremental_ingest_indexed(
        spark,
        index_path,
        _ingest_incoming(docs),
        jaccard_threshold=INGEST_THRESHOLD,
        shingle_k=INGEST_SHINGLE_K,
    )
    return _admission_rollup(admitted, audit)


DOCS_INGEST_INDEXED_PARITY_ORACLE = DOCS_INCREMENTAL_INGEST_ORACLE


# --- docs_split_leakage --------------------------------------------------------------
# [EXT] train/test contamination audit: near-duplicate pairs whose members landed
# in DIFFERENT hash splits leak evaluation content into training. The planted-dup
# corpus makes this real — a dup copy has a different doc_id, so the id-keyed
# split can (and does) place it across the boundary from its original. The plan
# composes two certified operators: bucketed MinHash+verify near-dup pairs and
# the md5-prefix split assignment applied as a PURE EXPRESSION of each pair's
# ids (no join back to the corpus). Oracle replays exact all-pairs Jaccard plus
# the same split CASE; the decimal-sum/round discipline keeps the jaccard
# checksum hash-stable across engines.

LEAKAGE_SALT = "s1"


def docs_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.dedup import minhash_near_dup_pairs
    from ..ext.sampling import split_expr

    aug = _docs_with_planted_dups(spark, sf_dir)
    pairs = minhash_near_dup_pairs(aug, threshold=MINHASH_VERIFY_THRESHOLD)
    assigned = pairs.select(
        split_expr(F.col("id_a"), salt=LEAKAGE_SALT).alias("split_a"),
        split_expr(F.col("id_b"), salt=LEAKAGE_SALT).alias("split_b"),
        "id_a",
        "id_b",
        "jaccard",
    )
    return (
        assigned.groupBy("split_a", "split_b")
        .agg(
            count_big("n_pairs"),
            F.sum(F.col("id_a") + F.col("id_b")).cast("long").alias("id_checksum"),
            F.round(
                F.sum(F.col("jaccard").cast("decimal(18,6)")).cast("double"), 4
            ).alias("sum_jaccard"),
        )
        .select(
            "split_a",
            "split_b",
            (F.col("split_a") != F.col("split_b")).alias("leaked"),
            "n_pairs",
            "id_checksum",
            "sum_jaccard",
        )
        .orderBy("split_a", "split_b")
    )


_SPLIT_CASE = (
    "CASE WHEN substring(md5('" + LEAKAGE_SALT + "' || CAST({id} AS VARCHAR)), 1, 4) < 'e666' THEN 'train' "
    "WHEN substring(md5('" + LEAKAGE_SALT + "' || CAST({id} AS VARCHAR)), 1, 4) < 'f333' THEN 'val' "
    "ELSE 'test' END"
)

DOCS_SPLIT_LEAKAGE_ORACLE = (
    _DOCS_AUG_CTE
    + rf"""
, toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM docs_aug
), shingled AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(t) - 3),
                                      i -> array_to_string(t[i:i+3], ' '))) AS shingles
  FROM toks
  WHERE len(t) >= 4
), inv AS (
  SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM shingled
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS inter
  FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
), near AS (
  SELECT id_a, id_b,
         ROUND(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 6) AS jaccard
  FROM pairs
  WHERE ROUND(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 6)
        >= {MINHASH_VERIFY_THRESHOLD}
), assigned AS MATERIALIZED (
  SELECT {_SPLIT_CASE.format(id='id_a')} AS split_a,
         {_SPLIT_CASE.format(id='id_b')} AS split_b,
         id_a, id_b, jaccard
  FROM near
)
SELECT split_a, split_b, (split_a <> split_b) AS leaked,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(id_a + id_b) AS BIGINT) AS id_checksum,
       ROUND(CAST(SUM(CAST(jaccard AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_jaccard
FROM assigned
GROUP BY split_a, split_b
ORDER BY split_a, split_b
"""
)


# --- docs_repeated_spans -------------------------------------------------------------
# [EXT] substring-level dedup (ext/spans.py): document-level dedup misses shared
# verbatim PASSAGES (boilerplate, licenses, quoted articles). The corpus is
# augmented two ways so both span shapes exist: a fixed 12-token legal boilerplate
# appended to every doc_id % 5 == 0 row (partial tail spans), and the standard
# whole-doc planted dups (full-coverage spans). DuckDB replays the entire k-gram
# pipeline — windows, distinct-doc duplication, interval union — relationally;
# one hash certifies span bounds AND exact covered-token counts for every doc.

SPAN_MIN_TOKENS = 8
_BOILERPLATE = " ".join(f"legal{i}" for i in range(12))


def _docs_with_boilerplate_and_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    aug = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" " + _BOILERPLATE))
        ).otherwise(F.col("text")),
    )
    dups = aug.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + DUP_OFFSET
    )
    return aug.unionByName(dups)


def docs_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.spans import span_coverage

    aug = _docs_with_boilerplate_and_dups(spark, sf_dir)
    return span_coverage(aug, min_tokens=SPAN_MIN_TOKENS).orderBy("doc_id")


DOCS_REPEATED_SPANS_ORACLE = rf"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' {_BOILERPLATE}' ELSE text END AS text
  FROM documents
), aug AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + {DUP_OFFSET}, text FROM base WHERE doc_id % 7 = 0
), toked AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\s+') END AS t
  FROM aug
), g AS (
  -- unnest(list) supports lateral column refs; the generate_series TABLE
  -- function does not. An empty list (len(t) < k) yields zero rows.
  SELECT doc_id, gs.i AS start,
         array_to_string(t[gs.i:gs.i + {SPAN_MIN_TOKENS - 1}], ' ') AS gram
  FROM toked, unnest(generate_series(1, len(t) - {SPAN_MIN_TOKENS - 1})) AS gs(i)
), dup AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
), hits AS (
  SELECT g.doc_id, g.start FROM g SEMI JOIN dup ON g.gram = dup.gram
), chained AS (
  SELECT doc_id, start,
         CASE WHEN start - LAG(start) OVER (PARTITION BY doc_id ORDER BY start)
                   <= {SPAN_MIN_TOKENS} THEN 0 ELSE 1 END AS new_grp
  FROM hits
), grouped AS (
  SELECT doc_id, start,
         SUM(new_grp) OVER (PARTITION BY doc_id ORDER BY start
                            ROWS UNBOUNDED PRECEDING) AS grp
  FROM chained
), spans AS (
  SELECT doc_id, MIN(start) AS span_start,
         MAX(start) + {SPAN_MIN_TOKENS - 1} AS span_end
  FROM grouped GROUP BY doc_id, grp
), per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         CAST(SUM(span_end - span_start + 1) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       ROUND(CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE)
             / GREATEST(len(t.t), 1), 6) AS dup_ratio
FROM toked t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
ORDER BY t.doc_id
"""


# --- docs_bpe_train ------------------------------------------------------------------
# [EXT] real BPE vocabulary training (ext/bpe.py) over the corpus. Runs the BATCHED
# trainer (provably sequential-identical selection, one count job + one fold per round
# instead of per merge — the production shape for 32k-merge vocabularies); equality
# with the sequential trainer AND a pure-Python reference BPE is golden-tested
# (tests/test_ext_operators.py::test_bpe_matches_reference_implementation).
#
# ORACLED since r7 (VERDICT r6 #9; was rows-only): the iterative argmax is not
# RECURSIVE SQL-expressible in general, but at a FIXED small merge count the rounds
# unroll as chained CTEs. Each round: pair-count the word-type table, argmax with the
# trainer's exact tie-break (cnt DESC, a ASC, b ASC), then apply the merge with
# left-to-right non-overlapping semantics via string replace() over a
# sentinel-delimited symbol string — every token is enclosed in its own chr(31)
# sentinels (join with a DOUBLED sentinel), so consecutive matches never share a
# boundary character and replace() reproduces apply_merge_expr's fold exactly
# (including the "a a a" -> [aa, a] case). The oracle replays ALL six rounds — word
# table, counts, tie-breaks, merge application — not just the final list.

BPE_NUM_MERGES = 6


def _bpe_oracle_sql(num_merges: int) -> str:
    s = "chr(31)"
    ss = f"{s}||{s}"
    ctes = [
        """w0 AS (
  SELECT syms, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT list_append(string_split(word, ''), '</w>') AS syms FROM (
      SELECT unnest(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS word
      FROM documents
      WHERE lang = 'en' AND length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) > 0
    )
  ) GROUP BY syms
)"""
    ]
    for r in range(1, num_merges + 1):
        prev = r - 1
        ctes.append(
            f"""p{r} AS (
  SELECT p.a AS a, p.b AS b, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms)-1),
           i -> {{'a': syms[i], 'b': syms[i+1]}})) AS p
    FROM w{prev} WHERE len(syms) > 1
  ) GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"m{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)"
        )
        if r < num_merges:
            ctes.append(
                f"""w{r} AS (
  SELECT freq, string_split(substr(s2, 2, length(s2) - 2), {ss}) AS syms FROM (
    SELECT w.freq,
           replace({s} || array_to_string(w.syms, {ss}) || {s},
                   {s} || m.a || {ss} || m.b || {s},
                   {s} || m.a || m.b || {s}) AS s2
    FROM w{prev} w, m{r} m
  )
)"""
            )
    final = "\nUNION ALL ".join(
        f"SELECT CAST({r - 1} AS INTEGER) AS rank, a AS sym_a, b AS sym_b,"
        f" a||b AS merged, cnt AS pair_count FROM m{r}"
        for r in range(1, num_merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\nSELECT * FROM (" + final + ") ORDER BY rank"


DOCS_BPE_TRAIN_ORACLE = _bpe_oracle_sql(BPE_NUM_MERGES)


def docs_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.bpe import train_bpe_merges_batched

    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    merges = train_bpe_merges_batched(docs, BPE_NUM_MERGES)
    return local_df(
        spark, merges, "rank int, sym_a string, sym_b string, merged string, pair_count long"
    ).orderBy("rank")


# --- multimodal_resize ---------------------------------------------------------------
# Thumbnail-pass certification: synthesize PPM images (+WAV/raw-video rows), run
# resize_media(8,8) (integer box-average / nearest-neighbor re-encode to PPM), and
# roll up per-kind byte totals. Image payload sizes after resize are closed-form
# (9 + len('8')*2 + 8*8*3 bytes each); audio/video rows must pass through with
# their original closed-form sizes — one hash certifies the resize geometry, the
# re-encode, and the non-image passthrough.

RESIZE_H = 8
RESIZE_W = 8


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.multimodal import resize_media, synthesize_media

    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs)  # ppm images, wav audio, raw-text video
    resized = resize_media(media, RESIZE_H, RESIZE_W)
    return (
        resized.groupBy("kind")
        .agg(
            count_big("n_media"),
            F.sum(F.length("payload")).cast("long").alias("total_bytes"),
            F.sum(F.coalesce(F.col("meta.width"), F.lit(0))).cast("long").alias("sum_width"),
            F.sum(F.coalesce(F.col("meta.height"), F.lit(0))).cast("long").alias("sum_height"),
        )
        .orderBy("kind")
    )


MULTIMODAL_RESIZE_ORACLE = f"""
WITH m AS (
  SELECT doc_id, text, length(text) AS n,
    CASE CAST(doc_id % 3 AS INTEGER)
      WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
    length(text) % 400 + 100 AS cnt
  FROM documents
)
SELECT kind,
  CAST(COUNT(*) AS BIGINT) AS n_media,
  CAST(SUM(CASE kind
    WHEN 'image' THEN 9 + length(CAST({RESIZE_W} AS VARCHAR)) + length(CAST({RESIZE_H} AS VARCHAR)) + 3 * {RESIZE_W} * {RESIZE_H}
    WHEN 'audio' THEN 44 + 2 * cnt
    ELSE strlen(text) END) AS BIGINT) AS total_bytes,
  CAST(SUM(CASE WHEN kind = 'image' THEN {RESIZE_W} ELSE 0 END) AS BIGINT) AS sum_width,
  CAST(SUM(CASE WHEN kind = 'image' THEN {RESIZE_H} ELSE 0 END) AS BIGINT) AS sum_height
FROM m
GROUP BY kind
ORDER BY kind
"""


# --- docs_epoch_schedule -------------------------------------------------------------
# Training-order certification (ext/sampling.py interleave_schedule): md5-shuffled
# within domain, round-robin across domains. DuckDB reproduces the exact position
# assignment (md5 is engine-portable), so one hash certifies the shuffle order, the
# domain indexing, and the interleave arithmetic.


def docs_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.sampling import interleave_schedule

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sched = interleave_schedule(docs, "source")
    return (
        sched.groupBy("source")
        .agg(
            count_big("n_docs"),
            F.min("position").cast("long").alias("min_pos"),
            F.max("position").cast("long").alias("max_pos"),
            F.sum("position").cast("long").alias("sum_pos"),
        )
        .orderBy("source")
    )


DOCS_EPOCH_SCHEDULE_ORACLE = """
WITH d AS (
  SELECT source, CAST(COUNT(DISTINCT source) OVER () AS BIGINT) AS n_dom,
         doc_id,
         DENSE_RANK() OVER (ORDER BY source) - 1 AS didx,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('epoch0' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
         ) - 1 AS rnk
  FROM documents
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(MIN(rnk * n_dom + didx) AS BIGINT) AS min_pos,
  CAST(MAX(rnk * n_dom + didx) AS BIGINT) AS max_pos,
  CAST(SUM(rnk * n_dom + didx) AS BIGINT) AS sum_pos
FROM d
GROUP BY source
ORDER BY source
"""


# --- docs_hybrid_search --------------------------------------------------------------
# Flagship retrieval composite: lexical candidate generation (integer-IDF token
# overlap — bit-length IDF from ext/lm.py's portable-arithmetic playbook) feeding an
# embedding cosine re-rank. The two-stage shape is the production retrieval
# architecture: the cheap inverted-index stage bounds the candidate set, the
# expensive vector stage runs only on LEX_TOPK rows. documents.doc_id aligns with
# embeddings.vec_id in this corpus (both 0..N-1). Fully DuckDB-oracled: integer IDF
# sums are exact, and the cosine follows the proven list-order dot idiom.

HYBRID_QUERY_DOC = 0
HYBRID_LEX_TOPK = 20


def docs_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.lm import bit_length
    from ..ext.similarity import cosine
    from ..ext.text import tokens

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")
    n_docs = docs.count()  # bounded 1-value driver action (IDF normalizer)

    doc_tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
    )
    q_tok = doc_tok.filter(F.col("doc_id") == HYBRID_QUERY_DOC).select("tok")
    idf = doc_tok.groupBy("tok").agg(
        (F.lit(int(n_docs).bit_length()) - bit_length(F.count(F.lit(1)))).alias("bits")
    )
    lex = (
        doc_tok.filter(F.col("doc_id") != HYBRID_QUERY_DOC)
        .join(F.broadcast(q_tok), "tok", "left_semi")
        .join(F.broadcast(idf.join(F.broadcast(q_tok), "tok", "left_semi")), "tok")
        .groupBy("doc_id")
        .agg(F.sum("bits").cast("long").alias("lex_score"))
        .orderBy(F.desc("lex_score"), F.asc("doc_id"))
        .limit(HYBRID_LEX_TOPK)
    )
    q_vec = emb.filter(F.col("vec_id") == HYBRID_QUERY_DOC).select(
        F.col("embedding").alias("_qv")
    )
    reranked = (
        lex.join(emb, lex["doc_id"] == emb["vec_id"])
        .crossJoin(F.broadcast(q_vec))
        .withColumn("cosine", F.round(cosine(F.col("embedding"), F.col("_qv")), 6))
        .select("doc_id", "lex_score", "cosine")
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    return (
        reranked.withColumn("rank", F.row_number().over(w).cast("long"))
        .orderBy("rank")
    )


DOCS_HYBRID_SEARCH_ORACLE = rf"""
WITH all_tok AS (
  SELECT doc_id,
         unnest(list_distinct(string_split_regex(regexp_replace(text, '^\s+|\s+$', ''), '\s+'))) AS tok
  FROM documents
  WHERE length(regexp_replace(text, '^\s+|\s+$', '')) > 0
),
n_docs AS (SELECT COUNT(*) AS n FROM documents),
q_tok AS (SELECT DISTINCT tok FROM all_tok WHERE doc_id = {HYBRID_QUERY_DOC}),
idf AS (
  SELECT tok,
         length(printf('%b', (SELECT n FROM n_docs))) - length(printf('%b', COUNT(*))) AS bits
  FROM all_tok GROUP BY tok
),
lex AS (
  SELECT t.doc_id, CAST(SUM(i.bits) AS BIGINT) AS lex_score
  FROM all_tok t
  JOIN q_tok q ON t.tok = q.tok
  JOIN idf i ON t.tok = i.tok
  WHERE t.doc_id <> {HYBRID_QUERY_DOC}
  GROUP BY t.doc_id
  ORDER BY lex_score DESC, doc_id ASC
  LIMIT {HYBRID_LEX_TOPK}
),
qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = {HYBRID_QUERY_DOC}),
scored AS (
  SELECT l.doc_id, l.lex_score,
         list_sum(list_transform(list_zip(e.embedding, (SELECT v FROM qv)),
                                 x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot_qc,
         sqrt(list_sum(list_transform(e.embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) AS nc,
         sqrt(list_sum(list_transform((SELECT v FROM qv), y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) AS nq
  FROM lex l JOIN embeddings e ON l.doc_id = e.vec_id
),
ranked AS (
  SELECT doc_id, lex_score,
         ROUND(CASE WHEN nq > 0 AND nc > 0 THEN dot_qc / (nc * nq) ELSE 0.0 END, 6) AS cosine
  FROM scored
)
SELECT doc_id, lex_score, cosine,
       CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC) AS BIGINT) AS rank
FROM ranked
ORDER BY rank
"""


# --- emb_semantic_dedup ---------------------------------------------------------------
# [EXT] SemDeDup-style cluster-scoped embedding dedup (Abbas et al. 2023,
# arXiv:2303.09540, public paper): assign every vector to its nearest centroid, then
# look for near-duplicates ONLY within each cluster — the canonical way to avoid the
# global all-pairs comparison at corpus scale. Pair work is bounded by sum(|cluster|^2)
# instead of N^2, and the pair join is keyed on the cluster id, so at 100 TB it
# shuffles each vector once to its cluster's partition and never crosses clusters.
#
# Certification twin discipline (same as emb_ivf_fixed_topk / emb_cluster_profile):
# DETERMINISTIC centroids (the nlist smallest vec_ids) make the whole
# assignment -> within-cluster pairs -> survivor-count pipeline DuckDB-replayable.
# Production would swap in learned Lloyd centroids + BLAS assignment
# (ext/similarity.py assign_centroids) with the identical downstream plan. Survivor
# rule: a vector is REMOVED iff it has cosine >= tau with any LOWER-id vector in its
# cluster (deterministic keep-lowest-id, the same survivor convention as
# docs_exact_dedup). Planted duplicates are exact copies (cosine 1.0) and organic
# pairs top out near 0.51 on this corpus, so the tau=0.9 decision is never within
# rounding distance of the boundary. The assignment stage feeds three consumers
# (both join sides + cluster sizes) -> localCheckpoint once (the r7 lesson).

SEMDEDUP_NLIST = 8
SEMDEDUP_TAU = 0.9
SEMDEDUP_SCOPE = 500


def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.similarity import (
        _paired_cosine,
        assign_centroids_fixed,
        fixed_centroids,
        l2_norm,
    )

    aug = _embeddings_with_planted_dups(spark, sf_dir).filter(
        (F.col("vec_id") % DUP_OFFSET) < SEMDEDUP_SCOPE
    )
    cents = fixed_centroids(aug, SEMDEDUP_NLIST)
    assigned = (
        assign_centroids_fixed(aug, cents)
        .select(
            "vec_id",
            "centroid_id",
            F.col("embedding").alias("_vec"),
            l2_norm(F.col("embedding")).alias("_norm"),
        )
        .localCheckpoint()
    )
    a = assigned.select(
        "centroid_id",
        F.col("vec_id").alias("id_a"),
        F.col("_vec").alias("_qvec"),
        F.col("_norm").alias("_qnorm"),
    )
    b = assigned.select(
        "centroid_id",
        F.col("vec_id").alias("id_b"),
        F.col("_vec").alias("_cvec"),
        F.col("_norm").alias("_cnorm"),
    )
    removed = (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _paired_cosine())
        .filter(F.col("cosine") >= SEMDEDUP_TAU)
        .select("centroid_id", F.col("id_b").alias("vec_id"))
        .distinct()
    )
    sizes = assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    rem = removed.groupBy("centroid_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_removed")
    )
    n_removed = F.coalesce(F.col("n_removed"), F.lit(0)).cast("long")
    return (
        sizes.join(rem, "centroid_id", "left")
        .select(
            "centroid_id",
            "cluster_size",
            n_removed.alias("n_removed"),
            (F.col("cluster_size") - n_removed).cast("long").alias("n_kept"),
            F.round(n_removed.cast("double") / F.col("cluster_size"), 6).alias(
                "removal_rate"
            ),
        )
        .orderBy("centroid_id")
    )


EMB_SEMANTIC_DEDUP_ORACLE = f"""
WITH emb_aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {DUP_OFFSET} AS vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0
), scoped AS (
  SELECT vec_id, embedding FROM emb_aug WHERE (vec_id % {DUP_OFFSET}) < {SEMDEDUP_SCOPE}
), cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, embedding AS cv
  FROM scoped
  QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= {SEMDEDUP_NLIST}
), cdist AS (
  SELECT e.vec_id, e.embedding, c.cidx,
         list_sum(list_transform(list_zip(e.embedding, c.cv),
                  x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                     * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))) AS d
  FROM scoped e, cents c
), assigned AS MATERIALIZED (
  SELECT vec_id, embedding, CAST(cidx AS INTEGER) AS centroid_id,
         sqrt(list_sum(list_transform(embedding,
              v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nrm
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cidx ASC) AS rn
        FROM cdist)
  WHERE rn = 1
), pairs AS (
  SELECT a.centroid_id, b.vec_id AS id_b,
         list_sum(list_transform(list_zip(a.embedding, b.embedding),
                  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot_ab,
         a.nrm AS na, b.nrm AS nb
  FROM assigned a JOIN assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
), dups AS (
  SELECT DISTINCT centroid_id, id_b
  FROM pairs
  WHERE ROUND(CASE WHEN na > 0 AND nb > 0 THEN dot_ab / (na * nb) ELSE 0.0 END, 6)
        >= {SEMDEDUP_TAU}
), sizes AS (
  SELECT centroid_id, COUNT(*) AS cluster_size FROM assigned GROUP BY centroid_id
), rem AS (
  SELECT centroid_id, COUNT(*) AS n_removed FROM dups GROUP BY centroid_id
)
SELECT s.centroid_id,
       CAST(s.cluster_size AS BIGINT) AS cluster_size,
       CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
       CAST(s.cluster_size - COALESCE(r.n_removed, 0) AS BIGINT) AS n_kept,
       ROUND(CAST(COALESCE(r.n_removed, 0) AS DOUBLE) / s.cluster_size, 6) AS removal_rate
FROM sizes s LEFT JOIN rem r ON s.centroid_id = r.centroid_id
ORDER BY s.centroid_id
"""


# --- docs_shingle_kmv -----------------------------------------------------------------
# [EXT] KMV (k-minimum values) distinct sketch with its MERGE certified relationally.
# KMV is the sketch a pipeline reaches for when it needs cardinality AND a mergeable,
# inspectable summary: the sketch is literally the k smallest distinct hashes, so
# union-merge is "k smallest of the concatenated sketches" — a theorem (any of the k
# smallest of A union B is among the k smallest of its own side) this query turns
# into a checked output instead of a comment. The corpus is split two ways; the
# engine builds the global sketch AND the two per-split sketches from ONE
# materialized (split, hash) distinct level, merges the split sketches, and emits:
# the global and merged k-th hashes (equal iff merge is lossless), the sketch
# overlap count (== k), the KMV estimate (k-1) * 2^60 / h_k, the exact distinct
# control, and rel_err. The oracle replays every stage — bottom-k sets, the merge,
# the estimate arithmetic — so a wrong merge OR a wrong estimator breaks the hash.
# Estimator accuracy at k=256 is ~1/sqrt(k-2) ~ 6%, same regime as the p=8 HLL row
# (the two sketches answer the same question; KMV buys replayable merges and
# quantile-like inspectability for k * 8 bytes instead of 2^p registers).

KMV_K = 256


def docs_shingle_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.dedup import token_shingles
    from ..ext.sketch import HLL_HASH_BITS, kmv_bottom_k_hashes, kmv_hash

    docs = _spread(load_table(spark, sf_dir, "documents"), sf_dir)
    # one corpus scan: tokenize/shingle/hash once into the distinct (split, h)
    # level; everything downstream (global sketch, split sketches, exact
    # control) reads the checkpoint, never the corpus
    base = (
        docs.select(
            F.pmod(F.col("doc_id"), F.lit(2)).cast("int").alias("split"),
            F.explode(
                token_shingles(F.lower(F.col("text")), k=HLL_SHINGLE_K)
            ).alias("shingle"),
        )
        .select("split", kmv_hash("shingle").alias("h"))
        .distinct()
        .localCheckpoint()
    )
    sketch_g = kmv_bottom_k_hashes(base, KMV_K).localCheckpoint()
    from pyspark.sql.window import Window as W

    split_rn = F.row_number().over(W.partitionBy("split").orderBy("h"))
    merged = kmv_bottom_k_hashes(
        base.withColumn("_rn", split_rn).filter(F.col("_rn") <= KMV_K), KMV_K
    ).localCheckpoint()
    kg = sketch_g.agg(F.max("h").alias("kth_hash"))
    km = merged.agg(F.max("h").alias("merged_kth_hash"))
    ov = sketch_g.join(merged, "h").agg(
        F.count(F.lit(1)).cast("long").alias("merge_overlap")
    )
    ex = base.select("h").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("exact_distinct")
    )
    out = (
        kg.crossJoin(km)
        .crossJoin(ov)
        .crossJoin(ex)
        .select(
            F.lit(KMV_K).cast("long").alias("k"),
            "kth_hash",
            "merged_kth_hash",
            "merge_overlap",
            F.round(
                F.lit(float(KMV_K - 1))
                * F.lit(float(1 << HLL_HASH_BITS))
                / F.col("kth_hash").cast("double"),
                4,
            ).alias("est_distinct"),
            "exact_distinct",
        )
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("est_distinct") - F.col("exact_distinct").cast("double"))
                / F.col("exact_distinct").cast("double"),
                4,
            ),
        )
    )
    return out


DOCS_SHINGLE_KMV_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id % 2 AS split, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
), shingled AS (
  SELECT split,
         list_distinct(list_transform(generate_series(1, len(t) - {HLL_SHINGLE_K - 1}),
                                      i -> array_to_string(t[i:i+{HLL_SHINGLE_K - 1}], ' '))) AS shingles
  FROM toks WHERE len(t) >= {HLL_SHINGLE_K}
), sh AS (
  SELECT split, unnest(shingles) AS shingle FROM shingled
), base AS (
  SELECT DISTINCT split, CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h FROM sh
), g AS (
  SELECT DISTINCT h FROM base
), sk_g AS (
  SELECT h FROM g ORDER BY h LIMIT {KMV_K}
), split_sk AS (
  SELECT split, h
  FROM (SELECT split, h, ROW_NUMBER() OVER (PARTITION BY split ORDER BY h) AS rn FROM base)
  WHERE rn <= {KMV_K}
), merged AS (
  SELECT DISTINCT h FROM split_sk ORDER BY h LIMIT {KMV_K}
), kg AS (
  SELECT MAX(h) AS kth_hash FROM sk_g
), km AS (
  SELECT MAX(h) AS merged_kth_hash FROM merged
), ov AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS merge_overlap FROM sk_g JOIN merged USING (h)
), ex AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM g
), est AS (
  SELECT CAST({KMV_K} AS BIGINT) AS k, kth_hash, merged_kth_hash, merge_overlap,
         ROUND(CAST({KMV_K - 1} AS DOUBLE) * CAST({1 << 60} AS DOUBLE)
               / CAST(kth_hash AS DOUBLE), 4) AS est_distinct,
         exact_distinct
  FROM kg, km, ov, ex
)
SELECT k, kth_hash, merged_kth_hash, merge_overlap, est_distinct, exact_distinct,
       ROUND(ABS(est_distinct - CAST(exact_distinct AS DOUBLE))
             / CAST(exact_distinct AS DOUBLE), 4) AS rel_err
FROM est
"""


# --- docs_split_kmv_jaccard -----------------------------------------------------------
# [EXT] Sketch set algebra, the KMV way: Jaccard similarity and intersection size of
# two corpus splits estimated from their bottom-k sketches ALONE (Broder/Cohen bottom-k
# similarity estimation, public literature). The estimator rides on a small lemma the
# docstring is the proof of: for any h in bottomk(A u B), h in A  <=>  h in bottomk(A)
# (h <= h_k(A u B) <= h_k(A), since the union has at least as many elements below any
# threshold) — so membership tests against the SKETCHES are exact for union-sketch
# elements, and J_hat = |{h in sk_u : h in sk_a and h in sk_b}| / k needs no access to
# the full sets. Contrast with docs_split_hll_overlap: HLL gets intersections by
# inclusion-exclusion, whose error scales with the UNION's cardinality (it needed
# p=12 to keep the estimate positive); the KMV estimator samples the union uniformly,
# so its error scales with sqrt(J(1-J)/k) — structurally better for small overlaps,
# and the pair of queries documents that trade-off. Exact Jaccard and overlap ride
# along as controls; the oracle replays the three sketch sets, the membership counts
# and every arithmetic step.

KMV_J_K = 256


def docs_split_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.dedup import token_shingles
    from ..ext.sketch import HLL_HASH_BITS, kmv_bottom_k_hashes, kmv_hash

    docs = load_table(spark, sf_dir, "documents")
    # lazy checkpoints (r14): the eager chain paid four serial driver
    # actions before the report even started; lazy keeps the reuse cut
    # (each level still materializes once) inside ONE job DAG
    base = (
        docs.select(
            F.pmod(F.col("doc_id"), F.lit(2)).cast("int").alias("split"),
            F.explode(
                token_shingles(F.lower(F.col("text")), k=HLL_SHINGLE_K)
            ).alias("shingle"),
        )
        .select("split", kmv_hash("shingle").alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sk_a = kmv_bottom_k_hashes(base.filter(F.col("split") == 0), KMV_J_K).localCheckpoint(
        eager=False
    )
    sk_b = kmv_bottom_k_hashes(base.filter(F.col("split") == 1), KMV_J_K).localCheckpoint(
        eager=False
    )
    sk_u = kmv_bottom_k_hashes(sk_a.unionAll(sk_b), KMV_J_K).localCheckpoint(eager=False)

    common = sk_u.join(sk_a, "h").join(sk_b, "h").agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    kth_u = sk_u.agg(F.max("h").alias("kth_union_hash"))
    # exact controls from the same distinct (split, hash) level
    ex = base.groupBy("h").agg(
        F.count(F.lit(1)).alias("_sides")  # distinct level: 1 or 2
    ).agg(
        F.count(F.lit(1)).cast("long").alias("exact_union"),
        F.sum(F.when(F.col("_sides") == 2, 1).otherwise(0))
        .cast("long")
        .alias("exact_overlap"),
    )
    u_est = (
        F.lit(float(KMV_J_K - 1))
        * F.lit(float(1 << HLL_HASH_BITS))
        / F.col("kth_union_hash").cast("double")
    )
    j_est = F.col("n_common").cast("double") / F.lit(float(KMV_J_K))
    return (
        common.crossJoin(kth_u)
        .crossJoin(ex)
        .select(
            F.lit(KMV_J_K).cast("long").alias("k"),
            "n_common",
            F.round(j_est, 4).alias("jaccard_est"),
            F.round(u_est, 4).alias("union_est"),
            F.round(j_est * u_est, 4).alias("overlap_est"),
            "exact_union",
            "exact_overlap",
            F.round(
                F.col("exact_overlap").cast("double")
                / F.col("exact_union").cast("double"),
                4,
            ).alias("exact_jaccard"),
        )
        .withColumn(
            "overlap_rel_err",
            F.round(
                F.abs(F.col("overlap_est") - F.col("exact_overlap").cast("double"))
                / F.col("exact_overlap").cast("double"),
                4,
            ),
        )
    )


DOCS_SPLIT_KMV_JACCARD_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id % 2 AS split, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
), shingled AS (
  SELECT split,
         list_distinct(list_transform(generate_series(1, len(t) - {HLL_SHINGLE_K - 1}),
                                      i -> array_to_string(t[i:i+{HLL_SHINGLE_K - 1}], ' '))) AS shingles
  FROM toks WHERE len(t) >= {HLL_SHINGLE_K}
), sh AS (
  SELECT split, unnest(shingles) AS shingle FROM shingled
), base AS (
  SELECT DISTINCT split, CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h FROM sh
), sk_a AS (
  SELECT h FROM base WHERE split = 0 ORDER BY h LIMIT {KMV_J_K}
), sk_b AS (
  SELECT h FROM base WHERE split = 1 ORDER BY h LIMIT {KMV_J_K}
), sk_u AS (
  SELECT DISTINCT h FROM (SELECT h FROM sk_a UNION ALL SELECT h FROM sk_b)
  ORDER BY h LIMIT {KMV_J_K}
), common AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_common
  FROM sk_u JOIN sk_a USING (h) JOIN sk_b USING (h)
), kth AS (
  SELECT MAX(h) AS kth_union_hash FROM sk_u
), ex AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
         CAST(SUM(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS BIGINT) AS exact_overlap
  FROM (SELECT h, COUNT(*) AS sides FROM base GROUP BY h)
), est AS (
  SELECT CAST({KMV_J_K} AS BIGINT) AS k, n_common,
         ROUND(CAST(n_common AS DOUBLE) / CAST({KMV_J_K} AS DOUBLE), 4) AS jaccard_est,
         ROUND(CAST({KMV_J_K - 1} AS DOUBLE) * CAST({1 << 60} AS DOUBLE)
               / CAST(kth_union_hash AS DOUBLE), 4) AS union_est,
         ROUND((CAST(n_common AS DOUBLE) / CAST({KMV_J_K} AS DOUBLE))
               * (CAST({KMV_J_K - 1} AS DOUBLE) * CAST({1 << 60} AS DOUBLE)
                  / CAST(kth_union_hash AS DOUBLE)), 4) AS overlap_est,
         exact_union, exact_overlap,
         ROUND(CAST(exact_overlap AS DOUBLE) / CAST(exact_union AS DOUBLE), 4) AS exact_jaccard
  FROM common, kth, ex
)
SELECT k, n_common, jaccard_est, union_est, overlap_est, exact_union, exact_overlap,
       exact_jaccard,
       ROUND(ABS(overlap_est - CAST(exact_overlap AS DOUBLE))
             / CAST(exact_overlap AS DOUBLE), 4) AS overlap_rel_err
FROM est
"""


# --- emb_pq_topk ------------------------------------------------------------------------
# [EXT] Product quantization (Jégou et al., public literature) — the production
# ANN compression standard, certified end to end with DETERMINISTIC codebooks
# (subvectors of the ksub smallest-id vectors — the fixed_centroids idea per
# subspace): encode the corpus to M=4 codes per vector (4 bytes vs 256 — the
# 64x storage cut a 100 TB embedding store runs on), build each query's ADC
# distance table ONCE on the broadcast query side, scan CODES (M array lookups
# per pair, never raw floats), rank by ADC distance. True squared-L2 rides
# along per emitted row, so the hash certifies codebooks, encoding argmins,
# ADC tables, ranking AND the approximation itself. The k-means-trained
# codebook drops in via the same seam at the cost of oracle-ability (the IVF
# learned/fixed twin precedent); pytest pins recall vs exact top-k.

PQ_TOPK_K = 5


def emb_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.quantize import (
        PQ_M,
        pq_codebooks,
        with_pq_adc_tables_arrow,
        with_pq_codes,
    )
    from ..ext.similarity import sq_l2

    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    cbs = pq_codebooks(emb)  # bounded driver rows: ksub vectors
    corpus = with_pq_codes(emb.select("vec_id", "embedding"), cbs).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cvec"),
        *[F.col(f"pq_{s}") for s in range(PQ_M)],
    )
    # Arrow ADC tables (r10): the HOF builder costs ~2.5 s of Catalyst
    # analysis per run at ANY SF; the kernel is pinned bitwise against it
    queries = with_pq_adc_tables_arrow(
        emb.where(F.col("vec_id") < TOPK_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        ),
        cbs,
    )
    pairs = corpus.crossJoin(F.broadcast(queries)).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    adc = F.lit(0.0)
    for s in range(PQ_M):
        adc = adc + F.element_at(F.col(f"_pqt_{s}"), F.col(f"pq_{s}") + F.lit(1))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("adc_d", adc)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= PQ_TOPK_K)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round("adc_d", 6).alias("adc_dist"),
            F.round(sq_l2(F.col("qv"), F.col("cvec")), 6).alias("exact_dist"),
        )
        .orderBy("query_id", "rank")
    )


EMB_PQ_TOPK_ORACLE = f"""
WITH cw AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c, embedding AS v
  FROM embeddings WHERE embedding IS NOT NULL
  QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= 16
), enc AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, s.s, c.c,
         list_sum(list_transform(
           list_zip(e.embedding[s.s*16+1 : s.s*16+16], c.v[s.s*16+1 : s.s*16+16]),
           x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
              * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))) AS d
  FROM embeddings e, generate_series(0, 3) s(s), cw c
  WHERE e.embedding IS NOT NULL
), codes AS (
  SELECT vec_id, embedding, s, c AS code
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d ASC, c ASC) AS rn
        FROM enc)
  WHERE rn = 1
), codesp AS MATERIALIZED (
  SELECT vec_id AS neighbor_id, embedding AS cvec,
         MAX(CASE WHEN s = 0 THEN code END) AS c0,
         MAX(CASE WHEN s = 1 THEN code END) AS c1,
         MAX(CASE WHEN s = 2 THEN code END) AS c2,
         MAX(CASE WHEN s = 3 THEN code END) AS c3
  FROM codes GROUP BY vec_id, embedding
), q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id < {TOPK_QUERIES} AND embedding IS NOT NULL
), pair AS MATERIALIZED (
  SELECT q.query_id, p.neighbor_id, q.qv, p.cvec,
    list_sum(list_transform(list_zip(q.qv[1:16],   w0.v[1:16]),
      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))
  + list_sum(list_transform(list_zip(q.qv[17:32],  w1.v[17:32]),
      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))
  + list_sum(list_transform(list_zip(q.qv[33:48],  w2.v[33:48]),
      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))
  + list_sum(list_transform(list_zip(q.qv[49:64],  w3.v[49:64]),
      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))
    AS adc_d
  FROM q, codesp p
  JOIN cw w0 ON w0.c = p.c0
  JOIN cw w1 ON w1.c = p.c1
  JOIN cw w2 ON w2.c = p.c2
  JOIN cw w3 ON w3.c = p.c3
  WHERE p.neighbor_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, adc_d, qv, cvec,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY adc_d ASC, neighbor_id ASC) AS BIGINT) AS rank
  FROM pair
)
SELECT query_id, rank, neighbor_id,
       ROUND(adc_d, 6) AS adc_dist,
       ROUND(list_sum(list_transform(list_zip(qv, cvec),
             x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))), 6) AS exact_dist
FROM ranked
WHERE rank <= {PQ_TOPK_K}
ORDER BY query_id, rank
"""


# --- emb_ivfpq_topk ---------------------------------------------------------------------
# [EXT] IVFADC — the production ANN architecture (Jégou et al.), composed from
# the repo's two certified halves: fixed-centroid IVF prunes the corpus to
# nprobe lists per query (emb_ivf_fixed_topk's shape) and PQ/ADC ranks the
# survivors from CODES alone (emb_pq_topk's shape). At 100 TB this is the whole
# point of both structures: the scan touches nprobe/nlist of the corpus, and
# what it touches is M bytes per vector, not the floats. Simplification kept
# deliberately oracle-able: PQ encodes RAW vectors (classic IVFADC encodes
# residuals x - centroid; the residual refinement belongs to the learned path,
# same trade as learned-vs-fixed centroids). True L2 rides along per emitted
# row, so one hash certifies centroids, probe lists, codebooks, codes, ADC
# tables, candidate pruning AND ranking.


def emb_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.quantize import PQ_M, pq_codebooks, with_pq_codes, with_query_adc_probes
    from ..ext.similarity import assign_centroids_fixed, fixed_centroids, sq_l2

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull())
    cents = fixed_centroids(emb, IVF_FIXED_NLIST)
    cbs = pq_codebooks(emb)

    corpus = with_pq_codes(
        assign_centroids_fixed(emb.select("vec_id", "embedding"), cents), cbs
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cvec"),
        "centroid_id",
        *[F.col(f"pq_{s}") for s in range(PQ_M)],
    )
    # Fused Arrow query pass (r10): ADC tables + probe lists in one kernel —
    # the HOF-fold/array_sort construction it replaces costs ~2.5 s of
    # Catalyst analysis per run at ANY SF; pinned bitwise against it in
    # tests/test_ext_operators.py (tables, probe ids, and probe order)
    probes = with_query_adc_probes(
        emb.where(F.col("vec_id") < TOPK_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        ),
        cents,
        cbs,
        IVF_FIXED_NPROBE,
        vec_col="qv",
    ).select(
        "query_id",
        "qv",
        *[F.col(f"_pqt_{s}") for s in range(PQ_M)],
        F.explode(F.col("_probe_ids")).alias("centroid_id"),
    )
    cand = corpus.join(F.broadcast(probes), "centroid_id").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    adc = F.lit(0.0)
    for s in range(PQ_M):
        adc = adc + F.element_at(F.col(f"_pqt_{s}"), F.col(f"pq_{s}") + F.lit(1))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("adc_d", adc)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= PQ_TOPK_K)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            "centroid_id",
            F.round("adc_d", 6).alias("adc_dist"),
            F.round(sq_l2(F.col("qv"), F.col("cvec")), 6).alias("exact_dist"),
        )
        .orderBy("query_id", "rank")
    )


EMB_IVFPQ_TOPK_ORACLE = f"""
WITH cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, embedding AS cv
  FROM embeddings WHERE embedding IS NOT NULL
  QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= {IVF_FIXED_NLIST}
), cdist AS (
  SELECT e.vec_id, e.embedding, c.cidx,
         list_sum(list_transform(list_zip(e.embedding, c.cv),
                  x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                     * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))) AS d
  FROM embeddings e, cents c WHERE e.embedding IS NOT NULL
), assigned AS MATERIALIZED (
  SELECT vec_id AS neighbor_id, embedding AS cvec, cidx AS centroid_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cidx ASC) AS rn
        FROM cdist)
  WHERE rn = 1
), cw AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c, embedding AS v
  FROM embeddings WHERE embedding IS NOT NULL
  QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= 16
), enc AS MATERIALIZED (
  SELECT a.neighbor_id, a.cvec, a.centroid_id, s.s, c.c,
         list_sum(list_transform(
           list_zip(a.cvec[s.s*16+1 : s.s*16+16], c.v[s.s*16+1 : s.s*16+16]),
           x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
              * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))) AS d
  FROM assigned a, generate_series(0, 3) s(s), cw c
), codesp AS MATERIALIZED (
  SELECT neighbor_id, cvec, centroid_id,
         MAX(CASE WHEN s = 0 THEN code END) AS c0,
         MAX(CASE WHEN s = 1 THEN code END) AS c1,
         MAX(CASE WHEN s = 2 THEN code END) AS c2,
         MAX(CASE WHEN s = 3 THEN code END) AS c3
  FROM (SELECT neighbor_id, cvec, centroid_id, s, c AS code
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY neighbor_id, s
                                           ORDER BY d ASC, c ASC) AS rn FROM enc)
        WHERE rn = 1)
  GROUP BY neighbor_id, cvec, centroid_id
), probes AS MATERIALIZED (
  SELECT vec_id AS query_id, embedding AS qv, cidx AS centroid_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cidx ASC) AS rn
        FROM cdist WHERE vec_id < {TOPK_QUERIES})
  WHERE rn <= {IVF_FIXED_NPROBE}
), pair AS MATERIALIZED (
  SELECT q.query_id, p.neighbor_id, p.centroid_id, q.qv, p.cvec,
    list_sum(list_transform(list_zip(q.qv[1:16],  w0.v[1:16]),
      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))
  + list_sum(list_transform(list_zip(q.qv[17:32], w1.v[17:32]),
      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))
  + list_sum(list_transform(list_zip(q.qv[33:48], w2.v[33:48]),
      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))
  + list_sum(list_transform(list_zip(q.qv[49:64], w3.v[49:64]),
      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))
    AS adc_d
  FROM probes q
  JOIN codesp p ON p.centroid_id = q.centroid_id
  JOIN cw w0 ON w0.c = p.c0
  JOIN cw w1 ON w1.c = p.c1
  JOIN cw w2 ON w2.c = p.c2
  JOIN cw w3 ON w3.c = p.c3
  WHERE p.neighbor_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, centroid_id, adc_d, qv, cvec,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY adc_d ASC, neighbor_id ASC) AS BIGINT) AS rank
  FROM pair
)
SELECT query_id, rank, neighbor_id, centroid_id,
       ROUND(adc_d, 6) AS adc_dist,
       ROUND(list_sum(list_transform(list_zip(qv, cvec),
             x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))), 6) AS exact_dist
FROM ranked
WHERE rank <= {PQ_TOPK_K}
ORDER BY query_id, rank
"""


# --- emb_ivfpq_rerank_topk --------------------------------------------------------------
# [EXT] The production IVFADC REFINE step (Faiss's IndexRefine pattern): ADC
# ranks a WIDENED short-list (R = 5k candidates) from codes alone, then true
# L2 on the floats re-ranks only those R rows per query. This is the answer to
# the measured recall cap in BASELINE §C's sweep table — codes-only ranking
# is NOT monotone in nprobe, so production systems buy recall back with an
# exact re-rank whose cost is R float-vector reads per query (bounded,
# broadcast-side) instead of a full exact scan. Fully oracle-able: both
# rankings use machinery the IVFPQ oracle already replays. 100 TB shape: the
# corpus scan still touches nprobe/nlist of the data and only M bytes per
# candidate; the float vectors of just R rows per query flow into the re-rank.

PQ_RERANK_R = 25  # ADC short-list width (5x the final k)


def emb_ivfpq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r10 rework (VERDICT r9 #1): every per-vector kernel is Arrow-vectorized
    and the candidate stream carries ONLY (query_id, neighbor_id, codes/adc_d)
    through the ADC window shuffle — the raw float vectors re-enter AFTER the
    R-row shortlist, via a broadcast join back to the corpus (Faiss
    IndexRefine: R x |Q| float reads, independent of corpus size). Three
    kernels, each bitwise-parity-tested against its lambda-HOF twin:
    with_ivf_pq_codes (corpus assign+encode, one pass), with_query_adc_probes
    (per-query ADC tables + probe lists — kills the m*ksub*sub literal-HOF
    trees whose Catalyst analysis alone cost seconds per run), with_sq_l2
    (exact re-rank — the last interpreted fold on a hot path, now numpy)."""
    from ..ext.quantize import (
        PQ_M,
        pq_codebooks,
        with_ivf_pq_codes,
        with_query_adc_probes,
    )
    from ..ext.similarity import fixed_centroids, with_sq_l2

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull())
    cents = fixed_centroids(emb, IVF_FIXED_NLIST)
    cbs = pq_codebooks(emb)

    # Corpus pass: ONE Arrow kernel assigns the IVF list + M PQ codes; the
    # floats are dropped here — candidates cost M bytes each, not dim*4.
    corpus = with_ivf_pq_codes(emb.select("vec_id", "embedding"), cents, cbs).select(
        F.col("vec_id").alias("neighbor_id"),
        "centroid_id",
        *[F.col(f"pq_{s}") for s in range(PQ_M)],
    )
    queries = emb.where(F.col("vec_id") < TOPK_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    probes = with_query_adc_probes(
        queries, cents, cbs, IVF_FIXED_NPROBE, vec_col="qv"
    ).select(
        "query_id",
        *[F.col(f"_pqt_{s}") for s in range(PQ_M)],
        F.explode(F.col("_probe_ids")).alias("centroid_id"),
    )
    cand = corpus.join(F.broadcast(probes), "centroid_id").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    adc = F.lit(0.0)
    for s in range(PQ_M):
        adc = adc + F.element_at(F.col(f"_pqt_{s}"), F.col(f"pq_{s}") + F.lit(1))
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_d").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        cand.withColumn("adc_d", adc)
        .select("query_id", "neighbor_id", "adc_d")  # narrow shuffle: 3 columns
        .withColumn("adc_rank", F.row_number().over(w_adc))
        .where(F.col("adc_rank") <= PQ_RERANK_R)
    )
    # Refine: floats come back only for the R x |Q| shortlist rows — query
    # vectors from the tiny broadcast probe table, corpus vectors via ONE more
    # scan broadcast-joined against the shortlist.
    refine = with_sq_l2(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cvec"))
        .join(F.broadcast(shortlist.join(F.broadcast(queries), "query_id")), "neighbor_id")
        .select("query_id", "neighbor_id", "adc_d", "qv", "cvec"),
        "qv",
        "cvec",
        out_col="true_d",
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.col("true_d").asc(), F.col("neighbor_id").asc()
    )
    return (
        refine.withColumn("rank", F.row_number().over(w_final).cast("long"))
        .where(F.col("rank") <= PQ_TOPK_K)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round("adc_d", 6).alias("adc_dist"),
            F.round("true_d", 6).alias("exact_dist"),
        )
        .orderBy("query_id", "rank")
    )


EMB_IVFPQ_RERANK_TOPK_ORACLE = f"""
WITH cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, embedding AS cv
  FROM embeddings WHERE embedding IS NOT NULL
  QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= {IVF_FIXED_NLIST}
), cdist AS (
  SELECT e.vec_id, e.embedding, c.cidx,
         list_sum(list_transform(list_zip(e.embedding, c.cv),
                  x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                     * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))) AS d
  FROM embeddings e, cents c WHERE e.embedding IS NOT NULL
), assigned AS MATERIALIZED (
  SELECT vec_id AS neighbor_id, embedding AS cvec, cidx AS centroid_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cidx ASC) AS rn
        FROM cdist)
  WHERE rn = 1
), cw AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c, embedding AS v
  FROM embeddings WHERE embedding IS NOT NULL
  QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= 16
), enc AS MATERIALIZED (
  SELECT a.neighbor_id, a.cvec, a.centroid_id, s.s, c.c,
         list_sum(list_transform(
           list_zip(a.cvec[s.s*16+1 : s.s*16+16], c.v[s.s*16+1 : s.s*16+16]),
           x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
              * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))) AS d
  FROM assigned a, generate_series(0, 3) s(s), cw c
), codesp AS MATERIALIZED (
  SELECT neighbor_id, cvec, centroid_id,
         MAX(CASE WHEN s = 0 THEN code END) AS c0,
         MAX(CASE WHEN s = 1 THEN code END) AS c1,
         MAX(CASE WHEN s = 2 THEN code END) AS c2,
         MAX(CASE WHEN s = 3 THEN code END) AS c3
  FROM (SELECT neighbor_id, cvec, centroid_id, s, c AS code
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY neighbor_id, s
                                           ORDER BY d ASC, c ASC) AS rn FROM enc)
        WHERE rn = 1)
  GROUP BY neighbor_id, cvec, centroid_id
), probes AS MATERIALIZED (
  SELECT vec_id AS query_id, embedding AS qv, cidx AS centroid_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cidx ASC) AS rn
        FROM cdist WHERE vec_id < {TOPK_QUERIES})
  WHERE rn <= {IVF_FIXED_NPROBE}
), pair AS MATERIALIZED (
  SELECT q.query_id, p.neighbor_id, p.centroid_id, q.qv, p.cvec,
    list_sum(list_transform(list_zip(q.qv[1:16],  w0.v[1:16]),
      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))
  + list_sum(list_transform(list_zip(q.qv[17:32], w1.v[17:32]),
      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))
  + list_sum(list_transform(list_zip(q.qv[33:48], w2.v[33:48]),
      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))
  + list_sum(list_transform(list_zip(q.qv[49:64], w3.v[49:64]),
      x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))
    AS adc_d
  FROM probes q
  JOIN codesp p ON p.centroid_id = q.centroid_id
  JOIN cw w0 ON w0.c = p.c0
  JOIN cw w1 ON w1.c = p.c1
  JOIN cw w2 ON w2.c = p.c2
  JOIN cw w3 ON w3.c = p.c3
  WHERE p.neighbor_id <> q.query_id
), shortlist AS (
  SELECT query_id, neighbor_id, adc_d, qv, cvec
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY adc_d ASC, neighbor_id ASC) AS adc_rank
        FROM pair)
  WHERE adc_rank <= {PQ_RERANK_R}
), rer AS (
  SELECT query_id, neighbor_id, adc_d,
         list_sum(list_transform(list_zip(qv, cvec),
             x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))) AS true_d
  FROM shortlist
)
SELECT query_id, rank, neighbor_id,
       ROUND(adc_d, 6) AS adc_dist,
       ROUND(true_d, 6) AS exact_dist
FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY true_d ASC, neighbor_id ASC) AS BIGINT) AS rank
      FROM rer)
WHERE rank <= {PQ_TOPK_K}
ORDER BY query_id, rank
"""


# --- emb_residual_pq_topk -----------------------------------------------------------
# [EXT] RESIDUAL product quantization — production IVFADC's actual encoding
# (VERDICT r9 #4): codes quantize x - centroid(x), not x, so ksub codewords
# cover one list's diameter instead of the whole space. Runs ENTIRELY in the
# fixed-point integer domain (floor(x*2^20), the r9 Lloyd seam): quantized-
# Lloyd centroids, integer residuals, integer codebooks, integer ADC — every
# number in the pipeline is exact int64, so the oracle replays it with ZERO
# rounding discipline (the adc_d output column is a BIGINT).
#
# The corpus is a CLUSTERED derivation (each vector pulled 9/10 toward its
# vec_id%64 anchor) because residual PQ's advantage IS cluster structure:
# measured honestly at r10, on the isotropic base corpus residual == raw
# (~0.14-0.22 vs 0.21-0.24 — nothing to remove, the documented PQ worst
# case), while here residual beats raw-codes ranking at EVERY nprobe
# (sf0.01: 0.71-0.73 vs 0.68-0.71; sf0.1: 0.25-0.26 vs 0.12 — the pytest
# floor test_residual_pq_beats_raw_pq_on_clustered_corpus pins this at equal
# nprobe over the SAME candidates). 100 TB shape: identical to emb_ivfpq —
# one fused Arrow corpus pass (assign + residual encode, M bytes per
# candidate), |Q| x nprobe broadcast probe rows (residual ADC tables are
# per-list, unlike raw PQ's per-query), WindowGroupLimit top-k.

RES_PQ_ANCHORS = 64
RES_PQ_NLIST = 64
RES_PQ_NPROBE = 8
RES_PQ_ITERS = 2
RES_PQ_SAMPLE_N = 512


def _clustered_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec pulled 9/10 toward its vec_id%64 anchor — deterministic float32
    arithmetic both engines reproduce bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull())
    anchors = emb.where(F.col("vec_id") < RES_PQ_ANCHORS).select(
        F.col("vec_id").alias("aid"), F.col("embedding").alias("av")
    )
    return (
        emb.select("vec_id", "embedding")
        .withColumn("aid", F.pmod(F.col("vec_id"), F.lit(RES_PQ_ANCHORS)))
        .join(F.broadcast(anchors), "aid")
        .select(
            "vec_id",
            F.zip_with(
                "av",
                "embedding",
                lambda a, b: (
                    F.lit(0.9) * a.cast("double") + F.lit(0.1) * b.cast("double")
                ).cast("float"),
            ).alias("embedding"),
        )
    )


def emb_residual_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.quantize import (
        PQ_M,
        residual_pq_codebooks_int,
        with_ivf_residual_pq_codes,
        with_residual_adc_probes,
    )
    from ..ext.similarity import train_centroids_quantized

    # the clustered relation feeds 4 consumers (training sample, codebooks,
    # corpus pass, query set) — checkpoint it once
    clustered = _clustered_embeddings(spark, sf_dir).localCheckpoint(eager=False)
    sample = [
        r[0]
        for r in clustered.orderBy("vec_id")
        .limit(RES_PQ_SAMPLE_N)
        .select("embedding")
        .collect()
    ]
    cents = train_centroids_quantized(sample, RES_PQ_NLIST, RES_PQ_ITERS)
    cbs = residual_pq_codebooks_int(clustered, cents)
    corpus = with_ivf_residual_pq_codes(clustered, cents, cbs).select(
        F.col("vec_id").alias("neighbor_id"),
        "centroid_id",
        *[F.col(f"pq_{s}") for s in range(PQ_M)],
    )
    queries = clustered.where(F.col("vec_id") < TOPK_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    probes = with_residual_adc_probes(queries, cents, cbs, RES_PQ_NPROBE).drop("qv")
    cand = corpus.join(F.broadcast(probes), "centroid_id").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    adc = F.lit(0).cast("long")
    for s in range(PQ_M):
        adc = adc + F.element_at(F.col(f"_pqt_{s}"), F.col(f"pq_{s}") + F.lit(1))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("adc_d", adc)
        .select("query_id", "neighbor_id", "adc_d")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= PQ_TOPK_K)
        .select("query_id", "rank", "neighbor_id", "adc_d")
        .orderBy("query_id", "rank")
    )


#: The clustered-corpus CTE prefix shared by the residual-PQ oracles (the
#: default-knob rows read it directly; the production-knob row wraps it in a
#: SCALED_REPS-x replicate-and-perturb derivation).
_RES_PQ_CORPUS_CTES = f"""anch AS (
  SELECT vec_id AS aid, embedding AS av FROM embeddings
  WHERE embedding IS NOT NULL AND vec_id < {RES_PQ_ANCHORS}
), clustered AS MATERIALIZED (
  SELECT e.vec_id,
         list_transform(list_zip(a.av, e.embedding),
             p -> CAST(0.9 * CAST(p[1] AS DOUBLE) + 0.1 * CAST(p[2] AS DOUBLE) AS REAL)) AS embedding
  FROM embeddings e JOIN anch a ON a.aid = e.vec_id % {RES_PQ_ANCHORS}
  WHERE e.embedding IS NOT NULL
)"""


def _residual_pq_oracle_ctes(
    corpus_ctes: str, sample_n: int, nlist: int, nprobe: int, n_queries: int
) -> str:
    """Shared CTE chain for the residual-PQ family, parameterized (r11 — one
    relational replay serves the default knobs AND the production knobs of
    emb_residual_rerank_scaled): ``corpus_ctes`` must define a CTE named
    ``clustered`` (vec_id, embedding float32). Chain: quantized training
    sample -> 2 unrolled fixed-point Lloyd rounds -> residual encode (codes)
    -> per-(query, probed-list) residual ADC tables -> candidate pairs with
    integer ADC distances. Consumers read from `pair` (and `corpq` for exact
    re-rank vectors)."""
    return f"""
WITH {corpus_ctes}, s AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS sid,
         list_transform(embedding,
             v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT)) AS xq
  FROM clustered
  QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= {sample_n}
), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s
), c0 AS MATERIALIZED (
  SELECT g.i AS cid, s.xq AS c
  FROM generate_series(0, {nlist - 1}) g(i), nn
  JOIN s ON s.sid = (g.i * (nn.n - 1)) // {nlist - 1}
), {_scaled_ivf_lloyd_iteration_sql(1)}, {_scaled_ivf_lloyd_iteration_sql(2)},
corpq AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
             v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT)) AS xq
  FROM clustered
), adist AS MATERIALIZED (
  SELECT cq.vec_id, cq.xq, c.cid, c.c,
         list_sum(list_transform(list_zip(cq.xq, c.c),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM corpq cq, c{RES_PQ_ITERS} c
), assigned AS MATERIALIZED (
  SELECT vec_id AS neighbor_id, cid AS centroid_id,
         list_transform(list_zip(xq, c), p -> p[1] - p[2]) AS rq
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
        FROM adist) WHERE rn = 1
), cw AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY neighbor_id) - 1 AS code, rq
  FROM assigned
  QUALIFY ROW_NUMBER() OVER (ORDER BY neighbor_id) <= 16
), enc AS MATERIALIZED (
  SELECT a.neighbor_id, a.centroid_id, s2.s, w.code,
         list_sum(list_transform(
             list_zip(a.rq[s2.s*16+1 : s2.s*16+16], w.rq[s2.s*16+1 : s2.s*16+16]),
             p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM assigned a, generate_series(0, 3) s2(s), cw w
), codesp AS MATERIALIZED (
  SELECT neighbor_id, centroid_id,
         MAX(CASE WHEN s = 0 THEN code END) AS k0,
         MAX(CASE WHEN s = 1 THEN code END) AS k1,
         MAX(CASE WHEN s = 2 THEN code END) AS k2,
         MAX(CASE WHEN s = 3 THEN code END) AS k3
  FROM (SELECT neighbor_id, centroid_id, s, code
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY neighbor_id, s
                                           ORDER BY d ASC, code ASC) AS rn FROM enc)
        WHERE rn = 1)
  GROUP BY neighbor_id, centroid_id
), q AS (
  SELECT vec_id AS query_id, xq FROM corpq WHERE vec_id < {n_queries}
), pdist AS (
  SELECT q.query_id, q.xq, c.cid, c.c,
         list_sum(list_transform(list_zip(q.xq, c.c),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM q, c{RES_PQ_ITERS} c
), probes AS MATERIALIZED (
  SELECT query_id, cid AS centroid_id,
         list_transform(list_zip(xq, c), p -> p[1] - p[2]) AS qrq
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d ASC, cid ASC) AS rn
        FROM pdist) WHERE rn <= {nprobe}
), qadc AS MATERIALIZED (
  SELECT p.query_id, p.centroid_id, s2.s, w.code,
         list_sum(list_transform(
             list_zip(p.qrq[s2.s*16+1 : s2.s*16+16], w.rq[s2.s*16+1 : s2.s*16+16]),
             z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d
  FROM probes p, generate_series(0, 3) s2(s), cw w
), pair AS MATERIALIZED (
  SELECT p.query_id, a.neighbor_id, t0.d + t1.d + t2.d + t3.d AS adc_d
  FROM probes p
  JOIN codesp a ON a.centroid_id = p.centroid_id
  JOIN qadc t0 ON t0.query_id = p.query_id AND t0.centroid_id = p.centroid_id
              AND t0.s = 0 AND t0.code = a.k0
  JOIN qadc t1 ON t1.query_id = p.query_id AND t1.centroid_id = p.centroid_id
              AND t1.s = 1 AND t1.code = a.k1
  JOIN qadc t2 ON t2.query_id = p.query_id AND t2.centroid_id = p.centroid_id
              AND t2.s = 2 AND t2.code = a.k2
  JOIN qadc t3 ON t3.query_id = p.query_id AND t3.centroid_id = p.centroid_id
              AND t3.s = 3 AND t3.code = a.k3
  WHERE a.neighbor_id <> p.query_id
)"""


_RES_PQ_ORACLE_CTES = _residual_pq_oracle_ctes(
    _RES_PQ_CORPUS_CTES, RES_PQ_SAMPLE_N, RES_PQ_NLIST, RES_PQ_NPROBE, TOPK_QUERIES
)

EMB_RESIDUAL_PQ_TOPK_ORACLE = (
    _RES_PQ_ORACLE_CTES
    + f"""
SELECT query_id, rank, neighbor_id, CAST(adc_d AS BIGINT) AS adc_d
FROM (SELECT *, CAST(ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY adc_d ASC, neighbor_id ASC) AS BIGINT) AS rank
      FROM pair)
WHERE rank <= {PQ_TOPK_K}
ORDER BY query_id, rank
"""
)


# --- emb_residual_pq_rerank_topk ------------------------------------------------------
# [EXT] The FULL production ANN stack composed in the integer-exact seam:
# learned IVF (fixed-point Lloyd) -> residual PQ codes -> ADC shortlist of R
# candidates per query -> EXACT re-rank of just the shortlist (integer
# squared-L2 on the quantized vectors) -> final top-k. This is Faiss's
# IndexIVFPQ + IndexRefine pair (Jegou et al.; the architecture every
# production vector store runs), and — unlike the float refine in
# emb_ivfpq_rerank_topk — every stage here is exact int64, so ONE oracle hash
# certifies training, residual encoding, probing, ADC ranking, the shortlist
# cut AND the exact refine with zero rounding discipline. Scale shape: the
# ADC window shuffle carries only (query_id, neighbor_id, adc_d); quantized
# vectors re-enter post-shortlist via a broadcast of the R*|Q|-row shortlist
# (never a corpus shuffle); the refine fold runs on R*|Q| rows, independent
# of corpus size. [EXT] — no reference citation; public-literature design.

RES_RERANK_R = 64


def _residual_rerank_pipeline(
    corpus: DataFrame,
    nlist: int,
    nprobe: int,
    iters: int,
    sample_n: int,
    r_shortlist: int,
    k: int,
    n_queries: int,
) -> DataFrame:
    """The composed IVF+residual-PQ+refine pipeline, parameterized (r11 —
    the SAME code path serves the oracled default-knob row and the oracled
    production-knob row emb_residual_rerank_scaled at nlist=256 on the SCALED_REPS-x
    corpus). ``corpus`` is a (vec_id, embedding) relation the caller has
    checkpointed (it feeds 4 consumers)."""
    from ..ext.quantize import (
        PQ_M,
        residual_pq_codebooks_int,
        with_ivf_residual_pq_codes,
        with_residual_adc_probes,
    )
    from ..ext.similarity import int_sq_l2, quantize_vec, train_centroids_quantized

    sample = [
        r[0]
        for r in corpus.orderBy("vec_id")
        .limit(sample_n)
        .select("embedding")
        .collect()
    ]
    cents = train_centroids_quantized(sample, nlist, iters)
    cbs = residual_pq_codebooks_int(corpus, cents)
    coded = with_ivf_residual_pq_codes(corpus, cents, cbs).select(
        F.col("vec_id").alias("neighbor_id"),
        "centroid_id",
        *[F.col(f"pq_{s}") for s in range(PQ_M)],
    )
    queries = corpus.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    probes = with_residual_adc_probes(queries, cents, cbs, nprobe).drop("qv")
    cand = coded.join(F.broadcast(probes), "centroid_id").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    adc = F.lit(0).cast("long")
    for s in range(PQ_M):
        adc = adc + F.element_at(F.col(f"_pqt_{s}"), F.col(f"pq_{s}") + F.lit(1))
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_d").asc(), F.col("neighbor_id").asc()
    )
    # shortlist shuffle carries ONLY (query_id, neighbor_id, adc_d)
    shortlist = (
        cand.withColumn("adc_d", adc)
        .select("query_id", "neighbor_id", "adc_d")
        .withColumn("_radc", F.row_number().over(w_adc))
        .where(F.col("_radc") <= r_shortlist)
        .drop("_radc")
    )
    # quantized vectors re-enter post-shortlist: broadcast the R*|Q|-row
    # shortlist into the corpus scan (no corpus shuffle), queries broadcast too
    nvecs = corpus.select(
        F.col("vec_id").alias("neighbor_id"), quantize_vec(F.col("embedding")).alias("nq")
    )
    qvecs = corpus.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), quantize_vec(F.col("embedding")).alias("qq")
    )
    w_true = Window.partitionBy("query_id").orderBy(
        F.col("true_d").asc(), F.col("neighbor_id").asc()
    )
    return (
        nvecs.join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .withColumn("true_d", int_sq_l2(F.col("qq"), F.col("nq")))
        .select("query_id", "neighbor_id", "adc_d", "true_d")
        .withColumn("rank", F.row_number().over(w_true).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc_d", "true_d")
        .orderBy("query_id", "rank")
    )


def emb_residual_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    clustered = _clustered_embeddings(spark, sf_dir).localCheckpoint(eager=False)
    return _residual_rerank_pipeline(
        clustered,
        nlist=RES_PQ_NLIST,
        nprobe=RES_PQ_NPROBE,
        iters=RES_PQ_ITERS,
        sample_n=RES_PQ_SAMPLE_N,
        r_shortlist=RES_RERANK_R,
        k=PQ_TOPK_K,
        n_queries=TOPK_QUERIES,
    )


def _residual_rerank_oracle_tail(r_shortlist: int, k: int) -> str:
    """Refine tail shared by the default- and production-knob rerank oracles:
    ADC shortlist of ``r_shortlist`` -> exact integer squared-L2 re-rank ->
    top ``k``. Reads `pair` and `corpq` from _residual_pq_oracle_ctes."""
    return f""",
short AS (
  SELECT query_id, neighbor_id, adc_d
  FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY adc_d ASC, neighbor_id ASC) AS radc
        FROM pair)
  WHERE radc <= {r_shortlist}
), ex AS (
  SELECT s.query_id, s.neighbor_id, s.adc_d,
         list_sum(list_transform(list_zip(cq.xq, cn2.xq),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS true_d
  FROM short s
  JOIN corpq cq ON cq.vec_id = s.query_id
  JOIN corpq cn2 ON cn2.vec_id = s.neighbor_id
)
SELECT query_id, rank, neighbor_id,
       CAST(adc_d AS BIGINT) AS adc_d, CAST(true_d AS BIGINT) AS true_d
FROM (SELECT *, CAST(ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY true_d ASC, neighbor_id ASC) AS BIGINT) AS rank
      FROM ex)
WHERE rank <= {k}
ORDER BY query_id, rank
"""


EMB_RESIDUAL_PQ_RERANK_TOPK_ORACLE = _RES_PQ_ORACLE_CTES + _residual_rerank_oracle_tail(
    RES_RERANK_R, PQ_TOPK_K
)


# --- emb_residual_rerank_scaled -------------------------------------------------------
# [EXT] The production ANN stack at PRODUCTION-SHAPED knobs (VERDICT r10 #4 —
# the default-knob row certifies correctness at nlist=64 on the base corpus;
# this row certifies the SAME pipeline at nlist=256 over the SCALED_REPS-x replicated
# clustered corpus, the emb_topk_scaled_* derivation applied to residual
# IVFADC). Every stage stays exact int64, so the ORACLE replays training
# (2 fixed-point Lloyd rounds over a 2048-vector sample at 256 centroids),
# residual encoding of the full SCALED_REPS-x corpus, probing at nprobe=16, the ADC
# shortlist AND the exact integer refine — one hash, production knobs. The
# scale evidence this row exists for: corpus work is ONE fused Arrow pass
# (assign + encode against 256 centroids), candidates are bounded by
# nprobe/nlist = 1/16 of the corpus per query, and the refine cost R*|Q| is
# CONSTANT in corpus size — tools/scale_curve.py carries its measured curve
# (SCALE.md), and tests/test_ext_operators.py pins the recall floor vs the
# exact numpy bruteforce. [EXT] — public-literature design (Faiss IVFPQ+Refine).

SCALED_RES_NLIST = 256
SCALED_RES_NPROBE = 16
SCALED_RES_SAMPLE_N = 2048


def _scaled_clustered_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clustered corpus (anchor pull — residual PQ's edge IS cluster
    structure) replicated SCALED_REPS x with the same tiny deterministic
    per-replica perturbation as _scaled_embeddings: perturbation magnitude
    (<= 0.03) stays well under the 0.9 anchor pull, so cluster structure
    survives the scale-up. Executor-side explode; no generation shuffle."""
    base = _clustered_embeddings(spark, sf_dir)
    reps = base.select(
        "vec_id",
        "embedding",
        F.explode(F.sequence(F.lit(0), F.lit(SCALED_REPS - 1))).alias("rep"),
    )
    perturbed = F.transform(
        "embedding",
        lambda x, i: x.cast("double")
        + ((F.col("rep") * (i + 3)) % 11).cast("double") * 0.003,
    )
    return reps.select(
        (F.col("vec_id") + F.col("rep") * _SCALED_ID_STRIDE).alias("vec_id"),
        perturbed.cast("array<float>").alias("embedding"),
    )


def emb_residual_rerank_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    scaled = _scaled_clustered_embeddings(spark, sf_dir).localCheckpoint(eager=False)
    return _residual_rerank_pipeline(
        scaled,
        nlist=SCALED_RES_NLIST,
        nprobe=SCALED_RES_NPROBE,
        iters=RES_PQ_ITERS,
        sample_n=SCALED_RES_SAMPLE_N,
        r_shortlist=RES_RERANK_R,
        k=PQ_TOPK_K,
        n_queries=TOPK_QUERIES,
    )


#: clustered0 = the anchor-pulled base corpus; clustered = its SCALED_REPS-x replicate-
#: and-perturb derivation (rep-0 keeps the original vectors, so queries are
#: identical to the base row's).
_SCALED_RES_CORPUS_CTES = f"""anch AS (
  SELECT vec_id AS aid, embedding AS av FROM embeddings
  WHERE embedding IS NOT NULL AND vec_id < {RES_PQ_ANCHORS}
), clustered0 AS MATERIALIZED (
  SELECT e.vec_id,
         list_transform(list_zip(a.av, e.embedding),
             p -> CAST(0.9 * CAST(p[1] AS DOUBLE) + 0.1 * CAST(p[2] AS DOUBLE) AS REAL)) AS embedding
  FROM embeddings e JOIN anch a ON a.aid = e.vec_id % {RES_PQ_ANCHORS}
  WHERE e.embedding IS NOT NULL
), clustered AS MATERIALIZED (
  SELECT vec_id + r.rep * {_SCALED_ID_STRIDE} AS vec_id,
         list_transform(generate_series(1, len(embedding)),
             i -> CAST(CAST(embedding[i] AS DOUBLE)
                       + ((r.rep * (i + 2)) % 11) * 0.003 AS REAL)) AS embedding
  FROM clustered0, generate_series(0, {SCALED_REPS - 1}) r(rep)
)"""

EMB_RESIDUAL_RERANK_SCALED_ORACLE = _residual_pq_oracle_ctes(
    _SCALED_RES_CORPUS_CTES,
    SCALED_RES_SAMPLE_N,
    SCALED_RES_NLIST,
    SCALED_RES_NPROBE,
    TOPK_QUERIES,
) + _residual_rerank_oracle_tail(RES_RERANK_R, PQ_TOPK_K)


# --- docs_bm25_topk / docs_hybrid_rrf -------------------------------------------------
# [EXT] The retrieval half of the pipeline (ext/retrieval.py): Okapi BM25 over the
# documents corpus, then reciprocal-rank fusion with the exact embedding ranking —
# the production hybrid lexical+vector retrieval stack, certified end to end in one
# hash. Engine parity is exact by construction: the per-term BM25 contribution is
# quantized ONCE (floor(contrib * 1e6) -> BIGINT), all cross-term/cross-system
# aggregation is integer arithmetic, and RRF is integer division throughout.
# Scale shape: query terms broadcast; the exploded corpus token stream is left-semi
# filtered before any aggregation (non-matching tokens never leave their partition);
# doc length rides the postings groupBy key; corpus stats re-enter as a broadcast
# 1-row relation; the vector leg is the existing certified bruteforce ranking.

# QMOD 50: the synthetic corpus draws from a ~30-word vocabulary, so every
# query term matches most docs and scored pairs grow as queries x corpus —
# 100 queries at sf0.1 certify the same mechanics at 2.5x less bench cost
BM25_QMOD = 50
BM25_QREM = 7
BM25_QTERMS = 12
BM25_TOPK = 10
RRF_FUSE_K = 10


def _bm25_queries(docs: DataFrame) -> DataFrame:
    return docs.filter(F.col("doc_id") % BM25_QMOD == BM25_QREM).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )


def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.retrieval import bm25_topk

    # NOT spread — measured twice. r13 all-spread: 2.9 unspread vs 4.3 s. r14
    # retried VERDICT r13 #7's split (corpus leg spread, query-term builds off
    # the raw scan): STILL loses, interleaved A/B 2.35 unspread vs 2.96 s —
    # the repartition exchange write is itself ONE task carrying the full
    # text payload, so it costs more than the serial tokenizes it replaces.
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(
        docs, _bm25_queries(docs), k=BM25_TOPK, q_terms=BM25_QTERMS
    ).orderBy("query_id", "rank")


#: shared oracle CTEs: tokenization identical to ext/text.tokens (regex trim, \s+
#: split, empty -> []), then postings restricted to the query-term set
_BM25_ORACLE_CTES = f"""base AS (
  SELECT doc_id AS id,
         CASE WHEN regexp_replace(lower(text), '^\\s+|\\s+$', '') = ''
              THEN []::VARCHAR[]
              ELSE string_split_regex(regexp_replace(lower(text), '^\\s+|\\s+$', ''), '\\s+')
         END AS toks
  FROM documents
), lens AS (
  SELECT id, toks, CAST(len(toks) AS BIGINT) AS dl FROM base
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM lens
), qterms AS (
  SELECT DISTINCT id AS qid, unnest(toks[1:{BM25_QTERMS}]) AS term
  FROM base WHERE id % {BM25_QMOD} = {BM25_QREM}
), posting AS (
  SELECT l.id, l.dl, t.term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM lens l, unnest(l.toks) AS u(term) , (SELECT DISTINCT term FROM qterms) t
  WHERE u.term = t.term
  GROUP BY l.id, l.dl, t.term
), dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM posting GROUP BY term
), contrib AS (
  -- every operand cast to DOUBLE so DuckDB cannot take a decimal-arithmetic
  -- path; parenthesization mirrors the Spark Column AST operation for
  -- operation (ext/retrieval._bm25_contrib_e6)
  SELECT q.qid, p.id, p.term,
         CAST(FLOOR(
           ln(CAST(1.0 AS DOUBLE)
              + (s.n_docs - CAST(d.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                / (CAST(d.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
           * ((CAST(p.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
              / (CAST(p.tf AS DOUBLE)
                 + CAST(1.2 AS DOUBLE)
                   * (CAST(0.25 AS DOUBLE)
                      + (CAST(0.75 AS DOUBLE) * CAST(p.dl AS DOUBLE)) / s.avgdl)))
           * CAST(1000000.0 AS DOUBLE)
         ) AS BIGINT) AS c
  FROM posting p
  JOIN dfreq d USING (term)
  JOIN qterms q USING (term)
  CROSS JOIN stats s
  WHERE p.id <> q.qid
), scored AS (
  SELECT qid, id,
         CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
         CAST(SUM(c) AS BIGINT) AS score_e6
  FROM contrib GROUP BY qid, id
), ranked AS (
  SELECT qid, id, n_terms_matched, score_e6,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY qid ORDER BY score_e6 DESC, id ASC) AS BIGINT) AS rank
  FROM scored
)"""

DOCS_BM25_TOPK_ORACLE = f"""
WITH {_BM25_ORACLE_CTES}
SELECT qid AS query_id, id AS doc_id, n_terms_matched, score_e6, rank
FROM ranked WHERE rank <= {BM25_TOPK}
ORDER BY query_id, rank
"""


def docs_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranking fused with the exact cosine
    embedding ranking by integer RRF. Queries are the corpus docs that ALSO
    carry an embedding (the realistic hybrid condition: both legs can run);
    each leg contributes its top-k and absence from one leg simply
    contributes nothing (partial-overlap corpora are the norm — at sf0.1
    only ids < 2000 have vectors)."""
    from ..ext.retrieval import bm25_topk, rrf_fuse
    from ..ext.similarity import cosine_topk_bruteforce

    # NOT spread — r13 all-spread lost (3.5 vs 4.7 s); the r14 split-leg retry
    # (VERDICT r13 #7: corpus leg spread, query builds off the raw scan) ALSO
    # lost, interleaved A/B 3.30 unspread vs 4.14 s — see docs_bm25_topk.
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    q_ids = _bm25_queries(docs).join(
        emb.select(F.col("vec_id").alias("query_id")), "query_id", "left_semi"
    )
    lex = bm25_topk(docs, q_ids, k=BM25_TOPK, q_terms=BM25_QTERMS)
    qvec = emb.join(
        q_ids.select(F.col("query_id").alias("vec_id")), "vec_id", "left_semi"
    )
    vec = cosine_topk_bruteforce(emb, qvec, k=BM25_TOPK).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return rrf_fuse(lex, vec, k=RRF_FUSE_K).orderBy("query_id", "fused_rank")


DOCS_HYBRID_RRF_ORACLE = f"""
WITH {_BM25_ORACLE_CTES}, qset AS (
  SELECT DISTINCT b.id AS query_id
  FROM base b JOIN embeddings e ON e.vec_id = b.id
  WHERE b.id % {BM25_QMOD} = {BM25_QREM} AND e.embedding IS NOT NULL
), lex AS (
  SELECT r.qid AS query_id, r.id AS doc_id, r.rank
  FROM ranked r JOIN qset ON qset.query_id = r.qid
  WHERE r.rank <= {BM25_TOPK}
), pair AS MATERIALIZED (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    list_sum(list_transform(list_zip(qe.embedding, c.embedding),
                            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot_qc,
    sqrt(list_sum(list_transform(qe.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nq,
    sqrt(list_sum(list_transform(c.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nc
  FROM qset q
  JOIN embeddings qe ON qe.vec_id = q.query_id
  JOIN embeddings c ON c.embedding IS NOT NULL AND c.vec_id <> q.query_id
  WHERE qe.embedding IS NOT NULL
), vec AS (
  SELECT query_id, neighbor_id AS doc_id, rank FROM (
    SELECT query_id, neighbor_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
             ROUND(CASE WHEN nq > 0 AND nc > 0 THEN dot_qc / (nq * nc) ELSE 0.0 END, 6) DESC,
             neighbor_id ASC) AS BIGINT) AS rank
    FROM pair
  ) WHERE rank <= {BM25_TOPK}
), fused AS (
  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
         COALESCE(l.doc_id, v.doc_id) AS doc_id,
         l.rank AS rank_lex, v.rank AS rank_vec,
         CAST(COALESCE(1000000 // (60 + l.rank), 0)
            + COALESCE(1000000 // (60 + v.rank), 0) AS BIGINT) AS rrf_e6
  FROM lex l FULL OUTER JOIN vec v
    ON l.query_id = v.query_id AND l.doc_id = v.doc_id
)
SELECT query_id, doc_id, rank_lex, rank_vec, rrf_e6,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY rrf_e6 DESC, doc_id ASC) AS BIGINT) AS fused_rank
FROM fused
QUALIFY fused_rank <= {RRF_FUSE_K}
ORDER BY query_id, fused_rank
"""


# --- docs_bm25_stream_index_parity ----------------------------------------------------
# [EXT] The retrieval stack's PRODUCTION ingest loop: documents arrive as a real
# 4-micro-batch stream, each batch is tokenized once into a batch-id-addressed
# inverted-index tree (streaming/indexing.BM25IndexIngestSink — replay-idempotent by
# construction), and BM25 scoring then runs FROM THE MATERIALIZED INDEX
# (ext/retrieval.bm25_topk_from_index) — the corpus text is never re-tokenized after
# ingest. The oracle recomputes BM25 from the raw documents table in SQL, so the hash
# certifies the whole loop: stream-built index content == full-corpus derivation,
# AND the from-index scoring path == the formula. Same constants as docs_bm25_topk,
# hence the same certified output relation through a completely different physical
# path (the strongest parity form this repo uses: qe_stream_batch_parity's pattern
# applied to retrieval).


def docs_bm25_stream_index_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..config import scratch_dir
    from ..ext.retrieval import bm25_topk_from_index
    from ..streaming.indexing import BM25IndexIngestSink

    docs = load_table(spark, sf_dir, "documents")
    tmp = scratch_dir("docs_bm25_stream_index", sf_dir, wipe=True)
    src = f"{tmp}/src"
    # 4 files + maxFilesPerTrigger=1 forces a genuinely multi-batch ingest
    docs.coalesce(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sink = BM25IndexIngestSink(f"{tmp}/index")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")  # tiny per-batch groupBys
    try:
        sink.attach(
            stream, checkpoint_dir=f"{tmp}/ckpt", available_now=True
        ).awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    index = spark.read.parquet(f"{tmp}/index").select("doc_id", "dl", "term", "tf")
    return bm25_topk_from_index(
        index, _bm25_queries(docs), k=BM25_TOPK, q_terms=BM25_QTERMS
    ).orderBy("query_id", "rank")


#: identical output to docs_bm25_topk — the whole point: a different physical
#: path (stream-built materialized index) must land on the same certified rows
DOCS_BM25_STREAM_INDEX_PARITY_ORACLE = DOCS_BM25_TOPK_ORACLE


# --- docs_retrieval_metrics -----------------------------------------------------------
# [EXT] The eval half of the retrieval loop (ext/retrieval.retrieval_metrics): the
# BM25 ranking judged against a metadata relevance set (same-source docs — the
# deterministic ground truth this corpus affords), per-query hits@k / precision /
# recall / MRR / nDCG. Integer-exact end to end: counts and div-based ratios are
# BIGINT, and the one irrational function (log2 discounts) enters as a PRECOMPUTED
# LITERAL table consumed identically by both engines — zero cross-engine float risk;
# the single reported float is ROUND(dcg/idcg, 6), one division of two identical
# integers. Scale: metrics touch only the top-k relation and the per-query relevance
# counts — nothing re-reads the corpus.


def docs_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.retrieval import bm25_topk, retrieval_metrics

    docs = load_table(spark, sf_dir, "documents")
    queries = _bm25_queries(docs)
    ranked = bm25_topk(docs, queries, k=BM25_TOPK, q_terms=BM25_QTERMS)
    q_src = docs.filter(F.col("doc_id") % BM25_QMOD == BM25_QREM).select(
        F.col("doc_id").alias("query_id"), F.col("source").alias("_qsrc")
    )
    relevance = (
        q_src.join(
            F.broadcast(docs.select("doc_id", "source")),
            F.col("source") == F.col("_qsrc"),
        )
        .filter(F.col("doc_id") != F.col("query_id"))
        .select("query_id", "doc_id")
    )
    return retrieval_metrics(ranked, relevance, k=BM25_TOPK).orderBy("query_id")


def _ndcg_case(col: str) -> str:
    from ..ext.retrieval import NDCG_DISCOUNT_E6

    whens = " ".join(f"WHEN {r} THEN {d}" for r, d in sorted(NDCG_DISCOUNT_E6.items()))
    return f"CASE {col} {whens} ELSE 0 END"


def _idcg_case(col: str, k: int) -> str:
    from ..ext.retrieval import NDCG_DISCOUNT_E6

    acc, parts = 0, []
    for i in range(1, k + 1):
        acc += NDCG_DISCOUNT_E6[i]
        parts.append(f"WHEN {i} THEN {acc}")
    return f"CASE {col} WHEN 0 THEN 0 " + " ".join(parts) + " ELSE 0 END"


# --- docs_hybrid_metrics ----------------------------------------------------------------
# [EXT] VERDICT r12 #4: judge the HYBRID ranking, not just BM25 — the lexical leg,
# the vector leg, and the RRF-fused ranking all scored against the SAME relevance
# relation (same-source docs, restricted to the hybrid query set), per-leg rows in
# ONE hash. The r12 fusion row's quality claim is now a certified measured output
# instead of an assumption: dcg_e6 is integer-exact and idcg is identical across
# legs per query, so per-query leg comparisons are exact integer comparisons.
# MEASURED OUTCOME (pin date r13): on THIS synthetic corpus hybrid does NOT beat
# the better leg — total dcg_e6 (lex, rrf, vec) = (1.78M, 1.47M, 1.47M) at
# sf0.001, (4.75M, 3.35M, 2.54M) at sf0.01, (4.12M, 3.36M, 5.85M) at sf0.1. The
# ~30-word synthetic vocabulary and random same-source relevance make the two
# legs' signals nearly independent noise, so RRF averages rather than amplifies
# (Cormack et al.'s gains assume correlated-but-complementary rankers). That is
# exactly what this row exists to surface: the fusion pipeline's value claim is
# corpus-dependent, and this engine MEASURES it instead of assuming it.
# Scale: every input here is a top-k relation (queries x k rows); the metrics
# never touch the corpus.


def docs_hybrid_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.retrieval import bm25_topk, retrieval_metrics, rrf_fuse
    from ..ext.similarity import cosine_topk_bruteforce

    docs = _spread(load_table(spark, sf_dir, "documents"), sf_dir)
    emb = _spread(load_table(spark, sf_dir, "embeddings"), sf_dir, table="embeddings").where(F.col("embedding").isNotNull())
    q_ids = _bm25_queries(docs).join(
        emb.select(F.col("vec_id").alias("query_id")), "query_id", "left_semi"
    )
    lex = bm25_topk(docs, q_ids, k=BM25_TOPK, q_terms=BM25_QTERMS)
    qvec = emb.join(
        q_ids.select(F.col("query_id").alias("vec_id")), "vec_id", "left_semi"
    )
    vec = cosine_topk_bruteforce(emb, qvec, k=BM25_TOPK).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    fused = rrf_fuse(lex, vec, k=RRF_FUSE_K).select(
        "query_id", "doc_id", F.col("fused_rank").alias("rank")
    )
    q_src = docs.select(
        F.col("doc_id").alias("query_id"), F.col("source").alias("_qsrc")
    ).join(q_ids, "query_id", "left_semi")
    relevance = (
        q_src.join(
            F.broadcast(docs.select("doc_id", "source")),
            F.col("source") == F.col("_qsrc"),
        )
        .filter(F.col("doc_id") != F.col("query_id"))
        .select("query_id", "doc_id")
    )
    out = None
    for leg, ranked in (("lex", lex), ("rrf", fused), ("vec", vec)):
        m = retrieval_metrics(ranked, relevance, k=BM25_TOPK).withColumn(
            "leg", F.lit(leg)
        )
        out = m if out is None else out.unionByName(m)
    return out.select(
        "query_id",
        "leg",
        "n_rel",
        "hits_at_k",
        "precision_e6",
        "recall_e6",
        "rr_e6",
        "dcg_e6",
        "idcg_e6",
        "ndcg",
    ).orderBy("query_id", "leg")


def _leg_metrics_sql(leg: str, topk_rel: str, k: int) -> str:
    """One leg's per-query metrics block against the shared rel/nrel CTEs —
    the DOCS_RETRIEVAL_METRICS_ORACLE body parameterized by the top-k
    relation, with the leg as a literal tag column."""
    idcg = _idcg_case(f"LEAST({k}, n.n_rel)", k)
    return f"""
SELECT n.qid AS query_id, '{leg}' AS leg, n.n_rel,
       CAST(COALESCE(h.hits_at_k, 0) AS BIGINT) AS hits_at_k,
       CAST(COALESCE(h.hits_at_k, 0) * {1_000_000} // {k} AS BIGINT) AS precision_e6,
       CAST(COALESCE(h.hits_at_k, 0) * {1_000_000} // n.n_rel AS BIGINT) AS recall_e6,
       CAST(COALESCE({1_000_000} // h.first_rel, 0) AS BIGINT) AS rr_e6,
       CAST(COALESCE(h.dcg_e6, 0) AS BIGINT) AS dcg_e6,
       CAST({idcg} AS BIGINT) AS idcg_e6,
       CASE WHEN {idcg} > 0
            THEN ROUND(CAST(COALESCE(h.dcg_e6, 0) AS DOUBLE) / CAST({idcg} AS DOUBLE), 6)
            ELSE 0.0 END AS ndcg
FROM nrel n LEFT JOIN (
  SELECT t.qid,
         CAST(COUNT(r.id) AS BIGINT) AS hits_at_k,
         MIN(CASE WHEN r.id IS NOT NULL THEN t.rank END) AS first_rel,
         CAST(SUM(CASE WHEN r.id IS NOT NULL THEN {_ndcg_case('t.rank')} ELSE 0 END) AS BIGINT) AS dcg_e6
  FROM {topk_rel} t LEFT JOIN rel r ON r.qid = t.qid AND r.id = t.id
  GROUP BY t.qid) h ON h.qid = n.qid"""


def _docs_hybrid_metrics_oracle() -> str:
    return f"""
WITH {_BM25_ORACLE_CTES}, qset AS (
  SELECT DISTINCT b.id AS query_id
  FROM base b JOIN embeddings e ON e.vec_id = b.id
  WHERE b.id % {BM25_QMOD} = {BM25_QREM} AND e.embedding IS NOT NULL
), lex AS (
  SELECT r.qid, r.id, r.rank
  FROM ranked r JOIN qset ON qset.query_id = r.qid
  WHERE r.rank <= {BM25_TOPK}
), pair AS MATERIALIZED (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    list_sum(list_transform(list_zip(qe.embedding, c.embedding),
                            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot_qc,
    sqrt(list_sum(list_transform(qe.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nq,
    sqrt(list_sum(list_transform(c.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nc
  FROM qset q
  JOIN embeddings qe ON qe.vec_id = q.query_id
  JOIN embeddings c ON c.embedding IS NOT NULL AND c.vec_id <> q.query_id
  WHERE qe.embedding IS NOT NULL
), vec AS (
  SELECT query_id AS qid, neighbor_id AS id, rank FROM (
    SELECT query_id, neighbor_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
             ROUND(CASE WHEN nq > 0 AND nc > 0 THEN dot_qc / (nq * nc) ELSE 0.0 END, 6) DESC,
             neighbor_id ASC) AS BIGINT) AS rank
    FROM pair
  ) WHERE rank <= {BM25_TOPK}
), fused AS (
  SELECT COALESCE(l.qid, v.qid) AS qid,
         COALESCE(l.id, v.id) AS id,
         CAST(COALESCE(1000000 // (60 + l.rank), 0)
            + COALESCE(1000000 // (60 + v.rank), 0) AS BIGINT) AS rrf_e6
  FROM lex l FULL OUTER JOIN vec v ON l.qid = v.qid AND l.id = v.id
), rrf AS (
  SELECT qid, id,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf_e6 DESC, id ASC) AS BIGINT) AS rank
  FROM fused
  QUALIFY rank <= {RRF_FUSE_K}
), qsrc AS (
  SELECT d.doc_id AS qid, d.source AS qs
  FROM documents d JOIN qset ON qset.query_id = d.doc_id
), rel AS (
  SELECT q.qid, d.doc_id AS id
  FROM qsrc q JOIN documents d ON d.source = q.qs AND d.doc_id <> q.qid
), nrel AS (
  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_rel FROM rel GROUP BY qid
)
{_leg_metrics_sql('lex', 'lex', BM25_TOPK)}
UNION ALL
{_leg_metrics_sql('rrf', 'rrf', BM25_TOPK)}
UNION ALL
{_leg_metrics_sql('vec', 'vec', BM25_TOPK)}
ORDER BY query_id, leg
"""


DOCS_RETRIEVAL_METRICS_ORACLE = f"""
WITH {_BM25_ORACLE_CTES}, topk AS (
  SELECT qid, id, rank FROM ranked WHERE rank <= {BM25_TOPK}
), qsrc AS (
  SELECT doc_id AS qid, source AS qs FROM documents
  WHERE doc_id % {BM25_QMOD} = {BM25_QREM}
), rel AS (
  SELECT q.qid, d.doc_id AS id
  FROM qsrc q JOIN documents d ON d.source = q.qs AND d.doc_id <> q.qid
), nrel AS (
  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_rel FROM rel GROUP BY qid
), hits AS (
  SELECT t.qid,
         CAST(COUNT(r.id) AS BIGINT) AS hits_at_k,
         MIN(CASE WHEN r.id IS NOT NULL THEN t.rank END) AS first_rel,
         CAST(SUM(CASE WHEN r.id IS NOT NULL THEN {_ndcg_case('t.rank')} ELSE 0 END) AS BIGINT) AS dcg_e6
  FROM topk t LEFT JOIN rel r ON r.qid = t.qid AND r.id = t.id
  GROUP BY t.qid
)
SELECT n.qid AS query_id,
       n.n_rel,
       CAST(COALESCE(h.hits_at_k, 0) AS BIGINT) AS hits_at_k,
       CAST(COALESCE(h.hits_at_k, 0) * {1_000_000} // {BM25_TOPK} AS BIGINT) AS precision_e6,
       CAST(COALESCE(h.hits_at_k, 0) * {1_000_000} // n.n_rel AS BIGINT) AS recall_e6,
       CAST(COALESCE({1_000_000} // h.first_rel, 0) AS BIGINT) AS rr_e6,
       CAST(COALESCE(h.dcg_e6, 0) AS BIGINT) AS dcg_e6,
       CAST({_idcg_case(f'LEAST({BM25_TOPK}, n.n_rel)', BM25_TOPK)} AS BIGINT) AS idcg_e6,
       CASE WHEN {_idcg_case(f'LEAST({BM25_TOPK}, n.n_rel)', BM25_TOPK)} > 0
            THEN ROUND(CAST(COALESCE(h.dcg_e6, 0) AS DOUBLE)
                       / CAST({_idcg_case(f'LEAST({BM25_TOPK}, n.n_rel)', BM25_TOPK)} AS DOUBLE), 6)
            ELSE 0.0 END AS ndcg
FROM nrel n LEFT JOIN hits h ON h.qid = n.qid
ORDER BY query_id
"""

DOCS_HYBRID_METRICS_ORACLE = _docs_hybrid_metrics_oracle()


# --- docs_viterbi_tokenize --------------------------------------------------------------
# [EXT] VERDICT r12 #5: SentencePiece-style unigram Viterbi segmentation (Kudo 2018)
# — the tokenizer family's second production scheme beside BPE. Fully self-contained:
# the piece table is derived from the corpus (all substring counts over word
# occurrences; every single char + top-24 longer pieces, whole-bit surprisal costs —
# the ext/lm.py integer -log2), the DP runs per DISTINCT word as an Arrow kernel
# carrying (cost, n_pieces, seg) in its state (ties -> smallest j == longest final
# piece), and per-doc segmentations re-assemble through a broadcast join. The oracle
# replays the ENTIRE pipeline in SQL: substring counting, table selection, surprisal
# costs, and the DP itself as WORD_CAP unrolled argmin CTE rounds (the Lloyd-unroll
# precedent applied to dynamic programming), then string_aggs the per-doc output.
# One hash certifies table + DP + assembly. Scale: the DP is vocabulary-sized, the
# corpus is touched twice (counting scan, token join), the piece table is
# alphabet+24 rows by construction (its collect is the one bounded driver action).


def docs_viterbi_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.unigram import viterbi_tokenize_docs

    docs = load_table(spark, sf_dir, "documents")
    return viterbi_tokenize_docs(docs).orderBy("doc_id")


def _viterbi_dp_round_sql(i: int, max_len: int) -> str:
    """One unrolled Viterbi position: candidates extend every best prefix at
    positions i-max_len..i-1 by a table piece; ROW_NUMBER (cost ASC, j ASC)
    keeps the winner — ties to the smallest j, the longest final piece."""
    return f"""va{i} AS (
  SELECT d.word, {i} AS pos, d.cost + p.cost AS cost, d.np + 1 AS np,
         CASE WHEN d.pos = 0 THEN substr(d.word, d.pos + 1, {i} - d.pos)
              ELSE d.seg || '+' || substr(d.word, d.pos + 1, {i} - d.pos) END AS seg,
         d.pos AS j
  FROM vall{i - 1} d
  JOIN vpc p ON p.piece = substr(d.word, d.pos + 1, {i} - d.pos)
  WHERE d.pos BETWEEN {i - max_len} AND {i - 1} AND length(d.word) >= {i}
), vd{i} AS (
  SELECT word, pos, cost, np, seg FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY word ORDER BY cost ASC, j ASC) AS rn
    FROM va{i}) WHERE rn = 1
), vall{i} AS MATERIALIZED (
  SELECT * FROM vall{i - 1} UNION ALL SELECT * FROM vd{i}
)"""


def _docs_viterbi_tokenize_oracle() -> str:
    from ..ext.unigram import MAX_PIECE_LEN, PIECE_TOP_K, WORD_CAP

    rounds = ",\n".join(
        _viterbi_dp_round_sql(i, MAX_PIECE_LEN) for i in range(1, WORD_CAP + 1)
    )
    return f"""
WITH vtok AS MATERIALIZED (
  -- tokenization identical to ext/text.tokens (regex trim, \\s+ split), words
  -- truncated to WORD_CAP chars exactly as the engine truncates them
  SELECT d.doc_id, s.i AS pos, substr(d.arr[s.i], 1, {WORD_CAP}) AS word
  FROM (SELECT doc_id,
               string_split_regex(regexp_replace(text, '^\\s+|\\s+$', ''), '\\s+') AS arr
        FROM documents
        WHERE regexp_replace(text, '^\\s+|\\s+$', '') <> '') d,
       unnest(generate_series(1, len(d.arr))) s(i)
  WHERE d.arr[s.i] <> ''
), vsubs AS (
  SELECT substr(t.word, s.i, e.j - s.i + 1) AS piece
  FROM vtok t,
       unnest(generate_series(1, length(t.word))) s(i),
       unnest(generate_series(s.i, LEAST(s.i + {MAX_PIECE_LEN - 1}, length(t.word)))) e(j)
), vcnt AS (
  SELECT piece, CAST(COUNT(*) AS BIGINT) AS cnt FROM vsubs GROUP BY piece
), vmulti AS (
  SELECT piece, cnt FROM vcnt WHERE length(piece) > 1
  ORDER BY cnt DESC, piece ASC LIMIT {PIECE_TOP_K}
), vkept AS (
  SELECT piece, cnt FROM vcnt WHERE length(piece) = 1
  UNION ALL SELECT piece, cnt FROM vmulti
), vtot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM vkept
), vpc AS MATERIALIZED (
  -- whole-bit surprisal: bit_length(total) - bit_length(cnt), both as binary
  -- digit counts (printf('%b') length == Spark conv(n,10,2) length)
  SELECT piece,
         CAST(length(printf('%b', vtot.t)) - length(printf('%b', cnt)) AS BIGINT) AS cost
  FROM vkept, vtot
), vwords AS (SELECT DISTINCT word FROM vtok
), vall0 AS MATERIALIZED (
  SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost, CAST(0 AS BIGINT) AS np, '' AS seg
  FROM vwords
), {rounds},
vseg AS MATERIALIZED (
  SELECT word, cost, np, seg FROM vall{WORD_CAP} WHERE pos = length(word)
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(w.np) AS BIGINT) AS n_pieces,
       CAST(SUM(w.cost) AS BIGINT) AS cost_bits,
       string_agg(w.seg, ' ' ORDER BY t.pos) AS segmented
FROM vtok t JOIN vseg w USING (word)
GROUP BY t.doc_id
ORDER BY doc_id
"""


DOCS_VITERBI_TOKENIZE_ORACLE = _docs_viterbi_tokenize_oracle()


# --- emb_hier_residual_rerank_topk ------------------------------------------------------
# [EXT] The 1e11-vector PRODUCTION configuration composed end to end: TWO-LEVEL
# routing (emb_hier_ivf_topk's coarse->fine trainer) feeding the residual-PQ +
# ADC-shortlist + exact-integer-refine stack (emb_residual_pq_rerank_topk's
# seam). This is Faiss's IVF_HNSW-coarse-quantizer + IndexIVFPQ + IndexRefine
# triple — the architecture a 1e11-vector deployment actually runs, where the
# flat sqrt(N)~300k centroid table can neither broadcast nor be probed as one
# matmul (SCALE.md r13). Residuals are taken against the hier-assigned FINE
# centroid; every stage is exact int64, so ONE oracle hash certifies coarse
# Lloyd, per-cell fine Lloyd, hierarchical assignment, residual encoding,
# two-stage routing, per-list ADC tables, the shortlist cut AND the exact
# refine. Layout keeps total fine cells (8x8 = 64) and the scanned-cell budget
# (8) equal to the flat production row (nlist=64, nprobe=8) — the recall
# comparison in pytest is apples-to-apples.

HRES_NCOARSE = 8
HRES_NFINE = 8
HRES_NPC = 4
HRES_NPF = RES_PQ_NPROBE  # 8 — same scanned-cell budget as the flat row
HRES_CI = 2
HRES_FI = 1


def emb_hier_residual_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.quantize import (
        PQ_M,
        hier_residual_pq_codebooks_int,
        with_hier_residual_adc_probes,
        with_hier_residual_pq_codes,
    )
    from ..ext.similarity import (
        int_sq_l2,
        quantize_vec,
        train_hier_centroids_quantized,
    )

    corpus = _clustered_embeddings(spark, sf_dir).localCheckpoint(eager=False)
    sample = [
        r[0]
        for r in corpus.orderBy("vec_id")
        .limit(RES_PQ_SAMPLE_N)
        .select("embedding")
        .collect()
    ]
    coarse, fine = train_hier_centroids_quantized(
        sample, HRES_NCOARSE, HRES_NFINE, HRES_CI, HRES_FI
    )
    cbs = hier_residual_pq_codebooks_int(corpus, coarse, fine)
    coded = with_hier_residual_pq_codes(corpus, coarse, fine, cbs).select(
        F.col("vec_id").alias("neighbor_id"),
        "centroid_id",
        *[F.col(f"pq_{s}") for s in range(PQ_M)],
    )
    queries = corpus.where(F.col("vec_id") < TOPK_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    probes = with_hier_residual_adc_probes(
        queries, coarse, fine, cbs, HRES_NPC, HRES_NPF
    ).drop("qv")
    cand = coded.join(F.broadcast(probes), "centroid_id").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    adc = F.lit(0).cast("long")
    for s in range(PQ_M):
        adc = adc + F.element_at(F.col(f"_pqt_{s}"), F.col(f"pq_{s}") + F.lit(1))
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_d").asc(), F.col("neighbor_id").asc()
    )
    # the tail is _residual_rerank_pipeline's verbatim: shortlist shuffle
    # carries only (query_id, neighbor_id, adc_d); quantized vectors re-enter
    # post-shortlist via broadcasts — never a corpus shuffle
    shortlist = (
        cand.withColumn("adc_d", adc)
        .select("query_id", "neighbor_id", "adc_d")
        .withColumn("_radc", F.row_number().over(w_adc))
        .where(F.col("_radc") <= RES_RERANK_R)
        .drop("_radc")
    )
    nvecs = corpus.select(
        F.col("vec_id").alias("neighbor_id"), quantize_vec(F.col("embedding")).alias("nq")
    )
    qvecs = corpus.where(F.col("vec_id") < TOPK_QUERIES).select(
        F.col("vec_id").alias("query_id"), quantize_vec(F.col("embedding")).alias("qq")
    )
    w_true = Window.partitionBy("query_id").orderBy(
        F.col("true_d").asc(), F.col("neighbor_id").asc()
    )
    return (
        nvecs.join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .withColumn("true_d", int_sq_l2(F.col("qq"), F.col("nq")))
        .select("query_id", "neighbor_id", "adc_d", "true_d")
        .withColumn("rank", F.row_number().over(w_true).cast("long"))
        .where(F.col("rank") <= PQ_TOPK_K)
        .select("query_id", "rank", "neighbor_id", "adc_d", "true_d")
        .orderBy("query_id", "rank")
    )


def _hier_residual_oracle_ctes() -> str:
    """The hier residual stack's relational replay: _residual_pq_oracle_ctes
    with the flat-Lloyd training / assignment / probing blocks swapped for the
    two-level forms (_hier_train_sql + coarse->fine argmins); the encode /
    codesp / qadc / pair sections are the flat oracle's verbatim — the PQ seam
    is identical, only the routing changed."""
    nf = HRES_NFINE
    return f"""
WITH {_RES_PQ_CORPUS_CTES}, s AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS sid,
         list_transform(embedding,
             v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT)) AS xq
  FROM clustered
  QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= {RES_PQ_SAMPLE_N}
), {_hier_train_sql(HRES_NCOARSE, HRES_NFINE, HRES_CI, HRES_FI)},
corpq AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
             v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT)) AS xq
  FROM clustered
), had AS MATERIALIZED (
  SELECT cq.vec_id, cq.xq, c.cid,
         list_sum(list_transform(list_zip(cq.xq, c.c),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM corpq cq, c{HRES_CI} c
), hca AS MATERIALIZED (
  SELECT vec_id, xq, cid
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
        FROM had) WHERE rn = 1
), hfd AS (
  SELECT a.vec_id, a.xq, f.cid * {nf} + f.j AS fid, f.c,
         list_sum(list_transform(list_zip(a.xq, f.c),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM hca a JOIN f{HRES_FI} f ON f.cid = a.cid
), assigned AS MATERIALIZED (
  SELECT vec_id AS neighbor_id, fid AS centroid_id,
         list_transform(list_zip(xq, c), p -> p[1] - p[2]) AS rq
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, fid ASC) AS rn
        FROM hfd) WHERE rn = 1
), cw AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY neighbor_id) - 1 AS code, rq
  FROM assigned
  QUALIFY ROW_NUMBER() OVER (ORDER BY neighbor_id) <= 16
), enc AS MATERIALIZED (
  SELECT a.neighbor_id, a.centroid_id, s2.s, w.code,
         list_sum(list_transform(
             list_zip(a.rq[s2.s*16+1 : s2.s*16+16], w.rq[s2.s*16+1 : s2.s*16+16]),
             p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM assigned a, generate_series(0, 3) s2(s), cw w
), codesp AS MATERIALIZED (
  SELECT neighbor_id, centroid_id,
         MAX(CASE WHEN s = 0 THEN code END) AS k0,
         MAX(CASE WHEN s = 1 THEN code END) AS k1,
         MAX(CASE WHEN s = 2 THEN code END) AS k2,
         MAX(CASE WHEN s = 3 THEN code END) AS k3
  FROM (SELECT neighbor_id, centroid_id, s, code
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY neighbor_id, s
                                           ORDER BY d ASC, code ASC) AS rn FROM enc)
        WHERE rn = 1)
  GROUP BY neighbor_id, centroid_id
), q AS (
  SELECT vec_id AS query_id, xq FROM corpq WHERE vec_id < {TOPK_QUERIES}
), hqd AS (
  SELECT q.query_id, q.xq, c.cid,
         list_sum(list_transform(list_zip(q.xq, c.c),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM q, c{HRES_CI} c
), hqc AS MATERIALIZED (
  SELECT query_id, xq, cid
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d ASC, cid ASC) AS rn
        FROM hqd) WHERE rn <= {HRES_NPC}
), hqf AS (
  SELECT p.query_id, p.xq, f.cid * {nf} + f.j AS fid, f.c,
         list_sum(list_transform(list_zip(p.xq, f.c),
                  p2 -> (p2[1] - p2[2]) * (p2[1] - p2[2]))) AS d
  FROM hqc p JOIN f{HRES_FI} f ON f.cid = p.cid
), probes AS MATERIALIZED (
  SELECT query_id, fid AS centroid_id,
         list_transform(list_zip(xq, c), p -> p[1] - p[2]) AS qrq
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d ASC, fid ASC) AS rn
        FROM hqf) WHERE rn <= {HRES_NPF}
), qadc AS MATERIALIZED (
  SELECT p.query_id, p.centroid_id, s2.s, w.code,
         list_sum(list_transform(
             list_zip(p.qrq[s2.s*16+1 : s2.s*16+16], w.rq[s2.s*16+1 : s2.s*16+16]),
             z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d
  FROM probes p, generate_series(0, 3) s2(s), cw w
), pair AS MATERIALIZED (
  SELECT p.query_id, a.neighbor_id, t0.d + t1.d + t2.d + t3.d AS adc_d
  FROM probes p
  JOIN codesp a ON a.centroid_id = p.centroid_id
  JOIN qadc t0 ON t0.query_id = p.query_id AND t0.centroid_id = p.centroid_id
              AND t0.s = 0 AND t0.code = a.k0
  JOIN qadc t1 ON t1.query_id = p.query_id AND t1.centroid_id = p.centroid_id
              AND t1.s = 1 AND t1.code = a.k1
  JOIN qadc t2 ON t2.query_id = p.query_id AND t2.centroid_id = p.centroid_id
              AND t2.s = 2 AND t2.code = a.k2
  JOIN qadc t3 ON t3.query_id = p.query_id AND t3.centroid_id = p.centroid_id
              AND t3.s = 3 AND t3.code = a.k3
  WHERE a.neighbor_id <> p.query_id
)"""


EMB_HIER_RESIDUAL_RERANK_TOPK_ORACLE = (
    _hier_residual_oracle_ctes() + _residual_rerank_oracle_tail(RES_RERANK_R, PQ_TOPK_K)
)


# --- emb_hier_ivf_stream_index_parity ---------------------------------------------------
# [EXT] Streaming ANN index maintenance — the retrieval stack's production ingest
# loop applied to VECTORS (the docs_bm25_stream_index_parity certification trick):
# the replicated corpus arrives as a REAL 4-micro-batch stream, each batch is routed
# through the two-level assigner into a batch-id-addressed cell-assigned index tree
# (streaming/indexing.HierIVFIndexIngestSink — replay-idempotent because assignment
# is per-row deterministic against FIXED pre-trained centroids), and the top-k query
# then probes THE MATERIALIZED INDEX — raw unrouted vectors are never touched again
# after ingest. The oracle is EMB_HIER_IVF_TOPK_ORACLE verbatim (the full-corpus
# derivation), so one hash certifies stream-built index content == batch routing AND
# the from-index probe path == the definitional hier search. This is how a vector
# store actually ingests at 1e11 scale: new vectors route cell-by-cell as they
# arrive; a full-corpus re-assignment never happens again.


def emb_hier_ivf_stream_index_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..config import scratch_dir
    from ..ext.similarity import (
        _paired_cosine,
        hier_probe_ids,
        l2_norm,
        train_hier_centroids_quantized,
    )
    from ..streaming.indexing import HierIVFIndexIngestSink

    base = load_table(spark, sf_dir, "embeddings")
    sample = [
        r[0]
        for r in base.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(SCALED_IVF_SAMPLE_N)
        .select("embedding")
        .collect()
    ]
    coarse, fine = train_hier_centroids_quantized(
        sample, HIER_NCOARSE, HIER_NFINE, HIER_COARSE_ITERS, HIER_FINE_ITERS
    )

    tmp = scratch_dir("emb_hier_stream_index", sf_dir, wipe=True)
    src = f"{tmp}/src"
    # 4 files + maxFilesPerTrigger=1 forces a genuinely multi-batch ingest.
    # coalesce kept after r14 A/B: round-robin repartition(4) LOSES (5.12 vs
    # 4.39 s — sortBeforeRepartition's local sort of the wide vector rows) and
    # keyed repartition is a wash (4.2-5.1 vs 4.4-4.9 across rep pairs) — the
    # wall here is the 4 deliberate serial micro-batches, not the write.
    _scaled_embeddings(spark, sf_dir).coalesce(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sink = HierIVFIndexIngestSink(f"{tmp}/index", coarse, fine)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")  # tiny per-batch writes
    try:
        sink.attach(
            stream, checkpoint_dir=f"{tmp}/ckpt", available_now=True
        ).awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    index = spark.read.parquet(f"{tmp}/index").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("_cvec"),
        l2_norm(F.col("embedding")).alias("_cnorm"),
        "centroid_id",
    )
    probes = (
        base.filter(F.col("vec_id") < SCALED_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("_qvec"),
            l2_norm(F.col("embedding")).alias("_qnorm"),
        )
        .withColumn(
            "_probe_ids",
            hier_probe_ids(coarse, fine, HIER_NPROBE_COARSE, HIER_NPROBE_FINE)(
                F.col("_qvec")
            ),
        )
        .select(
            "query_id",
            "_qvec",
            "_qnorm",
            F.explode(F.col("_probe_ids")).alias("centroid_id"),
        )
    )
    scored = (
        index.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _paired_cosine())
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


#: identical output to emb_hier_ivf_topk — the point: a completely different
#: physical path (stream-built materialized cell index) must land on the same
#: certified rows as the full-corpus derivation
EMB_HIER_IVF_STREAM_INDEX_PARITY_ORACLE = EMB_HIER_IVF_TOPK_ORACLE


# --- emb_filtered_topk ------------------------------------------------------------------
# [EXT] Metadata-FILTERED vector search — THE production vector-store feature
# (Qdrant/Milvus/Vespa all ship it): top-k restricted to corpus rows matching a
# metadata predicate, with the STRATEGY chosen from measured selectivity (the
# advisor discipline applied to ANN):
#   - selective filter (share <= tau): PRE-FILTER + exact brute force — the
#     filtered set is small, scanning it exactly is cheaper and recall-perfect;
#   - unselective filter (share > tau): probe the SHARED two-level IVF index
#     (built over the WHOLE corpus — one index serves every filter) and
#     POST-FILTER the probed candidates before ranking.
# The query runs BOTH live branches in one output (a ~14% lang='de' filter and a
# ~60% lang<>'en' filter — stable at every SF), each tagged with its integer
# selectivity and the CASE-derived strategy, so one hash certifies the decision
# AND both result sets; the oracle replays the exact cosine for the prefilter
# branch and the full hier train/assign/probe/post-filter pipeline for the other.
# 100 TB shape: the selectivity probe is one map-side-combined 1-row aggregate;
# the prefilter branch scans only the filtered rows; the postfilter branch adds a
# WHERE to the existing probed-cells join — neither reshuffles the corpus.

FILT_SEL_TAU_E6 = 250_000  # <= 25% of corpus -> prefilter + exact scan


def emb_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.similarity import (
        _paired_cosine,
        assign_centroids_hier_quantized,
        hier_probe_ids,
        l2_norm,
        train_hier_centroids_quantized,
    )

    emb = _spread(load_table(spark, sf_dir, "embeddings"), sf_dir, table="embeddings").where(F.col("embedding").isNotNull())
    meta = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    # the SCALED corpus (the structured one IVF is built for), each replica
    # inheriting its base row's metadata — the realistic shape: vectors carry
    # filterable attributes from their source documents
    corpus = (
        _scaled_embeddings(spark, sf_dir)
        .withColumn("_base", F.col("vec_id") % _SCALED_ID_STRIDE)
        .join(F.broadcast(meta), F.col("_base") == F.col("doc_id"))
        .select("vec_id", "embedding", "lang")
    )
    # ONE bounded 1-row aggregate measures every filter's selectivity
    sel = corpus.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("lang") == "de", 1).otherwise(0)).cast("long").alias("n_de"),
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).cast("long").alias("n_ne"),
    ).collect()[0]
    sel_e6 = {
        "de_only": sel["n_de"] * 1_000_000 // sel["n"],
        "non_en": sel["n_ne"] * 1_000_000 // sel["n"],
    }
    preds = {"de_only": F.col("lang") == "de", "non_en": F.col("lang") != "en"}

    queries = emb.filter(F.col("vec_id") < TOPK_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("_qvec"),
        l2_norm(F.col("embedding")).alias("_qnorm"),
    )
    # the SHARED index: trained and assigned ONCE over the whole corpus,
    # reused by every postfilter-branch filter (built lazily below)
    hier = {}

    def shared_index():
        if not hier:
            sample = [
                r[0]
                for r in emb.select("vec_id", "embedding")
                .orderBy("vec_id")
                .limit(SCALED_IVF_SAMPLE_N)
                .select("embedding")
                .collect()
            ]
            coarse, fine = train_hier_centroids_quantized(
                sample, HIER_NCOARSE, HIER_NFINE, HIER_COARSE_ITERS, HIER_FINE_ITERS
            )
            hier["cents"] = (coarse, fine)
            hier["assigned"] = assign_centroids_hier_quantized(
                corpus, coarse, fine, "embedding"
            ).select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("_cvec"),
                l2_norm(F.col("embedding")).alias("_cnorm"),
                "lang",
                "centroid_id",
            )
        return hier["cents"], hier["assigned"]

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = None
    for name in ("de_only", "non_en"):
        if sel_e6[name] <= FILT_SEL_TAU_E6:
            strategy = "prefilter_bruteforce"
            cand = corpus.filter(preds[name]).select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("_cvec"),
                l2_norm(F.col("embedding")).alias("_cnorm"),
            )
            scored = cand.join(F.broadcast(queries)).where(
                F.col("neighbor_id") != F.col("query_id")
            )
        else:
            strategy = "probe_postfilter"
            (coarse, fine), assigned = shared_index()
            # the production probe-widening rule, integer-exact: a filter that
            # keeps share s of the corpus thins every probed cell by ~s, so
            # the fine probe width scales by 1/s (ceil division), capped at
            # the routed candidate set (npc x n_fine cells)
            npf_eff = min(
                HIER_NPROBE_COARSE * HIER_NFINE,
                (HIER_NPROBE_FINE * 1_000_000 + sel_e6[name] - 1) // sel_e6[name],
            )
            probes = queries.withColumn(
                "_probe_ids",
                hier_probe_ids(coarse, fine, HIER_NPROBE_COARSE, npf_eff)(
                    F.col("_qvec")
                ),
            ).select(
                "query_id",
                "_qvec",
                "_qnorm",
                F.explode(F.col("_probe_ids")).alias("centroid_id"),
            )
            scored = (
                assigned.filter(preds[name])
                .join(F.broadcast(probes), "centroid_id")
                .where(F.col("neighbor_id") != F.col("query_id"))
            )
        ranked = (
            scored.withColumn("cosine", _paired_cosine())
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= TOPK_K)
            .select(
                F.lit(name).alias("filter_name"),
                "query_id",
                "neighbor_id",
                "cosine",
                "rank",
                F.lit(sel_e6[name]).cast("long").alias("selectivity_e6"),
                F.lit(strategy).alias("strategy"),
            )
        )
        out = ranked if out is None else out.unionByName(ranked)
    return out.orderBy("filter_name", "query_id", "rank")


def _emb_filtered_topk_oracle() -> str:
    return f"""
WITH reps AS (
  SELECT vec_id, embedding, r.rep FROM embeddings, generate_series(0, {SCALED_REPS - 1}) r(rep)
), scaledf AS (
  SELECT vec_id + rep * {_SCALED_ID_STRIDE} AS vec_id,
         list_transform(generate_series(1, len(embedding)),
             i -> CAST(CAST(embedding[i] AS DOUBLE)
                       + ((rep * (i + 2)) % 11) * 0.003 AS REAL)) AS embedding
  FROM reps
), corpus AS MATERIALIZED (
  SELECT s.vec_id, s.embedding, d.lang
  FROM scaledf s JOIN documents d ON d.doc_id = s.vec_id % {_SCALED_ID_STRIDE}
), sel AS (
  SELECT CAST(COUNT(*) FILTER (lang = 'de') * 1000000 // COUNT(*) AS BIGINT) AS de_e6,
         CAST(COUNT(*) FILTER (lang <> 'en') * 1000000 // COUNT(*) AS BIGINT) AS ne_e6
  FROM corpus
), q AS (
  SELECT vec_id AS query_id, embedding AS qv,
         list_transform(embedding,
             v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT)) AS qq
  FROM embeddings WHERE vec_id < {TOPK_QUERIES} AND embedding IS NOT NULL
), pairA AS MATERIALIZED (
  -- de_only branch: PRE-FILTER + exact cosine over the filtered rows only
  SELECT q.query_id, c.vec_id AS neighbor_id,
    list_sum(list_transform(list_zip(q.qv, c.embedding),
                            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot_qc,
    sqrt(list_sum(list_transform(q.qv, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nq,
    sqrt(list_sum(list_transform(c.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nc
  FROM corpus c, q
  WHERE c.lang = 'de' AND c.vec_id <> q.query_id
), rankedA AS (
  SELECT query_id, neighbor_id,
         ROUND(CASE WHEN nq > 0 AND nc > 0 THEN dot_qc / (nq * nc) ELSE 0.0 END, 6) AS cosine
  FROM pairA
), s AS MATERIALIZED (
  -- non_en branch: the SHARED hier index over the WHOLE corpus, then post-filter
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS sid,
         list_transform(embedding,
             v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT)) AS xq
  FROM embeddings
  WHERE embedding IS NOT NULL
  QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= {SCALED_IVF_SAMPLE_N}
), {_hier_train_sql(HIER_NCOARSE, HIER_NFINE, HIER_COARSE_ITERS, HIER_FINE_ITERS)},
corpq AS MATERIALIZED (
  SELECT vec_id, embedding, lang,
         list_transform(embedding,
             v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT)) AS xq
  FROM corpus
), cad AS MATERIALIZED (
  SELECT cq.vec_id, cq.embedding, cq.lang, cq.xq, c.cid,
         list_sum(list_transform(list_zip(cq.xq, c.c),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM corpq cq, c{HIER_COARSE_ITERS} c
), cas AS MATERIALIZED (
  SELECT vec_id, embedding, lang, xq, cid
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
        FROM cad) WHERE rn = 1
), fad AS MATERIALIZED (
  SELECT a.vec_id, a.embedding, a.lang, a.cid * {HIER_NFINE} + f.j AS fid,
         list_sum(list_transform(list_zip(a.xq, f.c),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM cas a JOIN f{HIER_FINE_ITERS} f ON f.cid = a.cid
), assigned AS MATERIALIZED (
  SELECT vec_id AS neighbor_id, embedding AS cvec, lang, fid AS centroid_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, fid ASC) AS rn
        FROM fad) WHERE rn = 1
), qcd AS (
  SELECT q.query_id, q.qv, q.qq, c.cid,
         list_sum(list_transform(list_zip(q.qq, c.c),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
  FROM q, c{HIER_COARSE_ITERS} c
), qcs AS MATERIALIZED (
  SELECT query_id, qv, qq, cid
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d ASC, cid ASC) AS rn
        FROM qcd) WHERE rn <= {HIER_NPROBE_COARSE}
), qfd AS (
  SELECT p.query_id, p.qv, f.cid * {HIER_NFINE} + f.j AS fid,
         list_sum(list_transform(list_zip(p.qq, f.c),
                  p2 -> (p2[1] - p2[2]) * (p2[1] - p2[2]))) AS d
  FROM qcs p JOIN f{HIER_FINE_ITERS} f ON f.cid = p.cid
), probes AS MATERIALIZED (
  -- the probe-widening rule, same integer arithmetic as the engine:
  -- npf_eff = min(npc*n_fine, ceil(npf / selectivity))
  SELECT query_id, qv, fid AS centroid_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d ASC, fid ASC) AS rn
        FROM qfd) t, sel
  WHERE rn <= LEAST({HIER_NPROBE_COARSE * HIER_NFINE},
                    ({HIER_NPROBE_FINE} * 1000000 + sel.ne_e6 - 1) // sel.ne_e6)
), pairB AS MATERIALIZED (
  SELECT p.query_id, a.neighbor_id,
    list_sum(list_transform(list_zip(p.qv, a.cvec),
                            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot_qc,
    sqrt(list_sum(list_transform(p.qv, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nq,
    sqrt(list_sum(list_transform(a.cvec, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS nc
  FROM probes p JOIN assigned a ON a.centroid_id = p.centroid_id
  WHERE a.lang <> 'en' AND a.neighbor_id <> p.query_id
), rankedB AS (
  SELECT query_id, neighbor_id,
         ROUND(CASE WHEN nq > 0 AND nc > 0 THEN dot_qc / (nq * nc) ELSE 0.0 END, 6) AS cosine
  FROM pairB
)
SELECT 'de_only' AS filter_name, query_id, neighbor_id, cosine, rank,
       sel.de_e6 AS selectivity_e6,
       CASE WHEN sel.de_e6 <= {FILT_SEL_TAU_E6} THEN 'prefilter_bruteforce'
            ELSE 'probe_postfilter' END AS strategy
FROM (SELECT *, CAST(ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
      FROM rankedA), sel
WHERE rank <= {TOPK_K}
UNION ALL
SELECT 'non_en' AS filter_name, query_id, neighbor_id, cosine, rank,
       sel.ne_e6 AS selectivity_e6,
       CASE WHEN sel.ne_e6 <= {FILT_SEL_TAU_E6} THEN 'prefilter_bruteforce'
            ELSE 'probe_postfilter' END AS strategy
FROM (SELECT *, CAST(ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
      FROM rankedB), sel
WHERE rank <= {TOPK_K}
ORDER BY filter_name, query_id, rank
"""


EMB_FILTERED_TOPK_ORACLE = _emb_filtered_topk_oracle()
