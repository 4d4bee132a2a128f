"""Lexical + hybrid retrieval over a document corpus — BM25 top-k and
reciprocal-rank fusion (RRF) of lexical and embedding rankings.

[EXT] — no reference citation; this is the retrieval half of a training-data /
RAG pipeline (the embedding half lives in ext/similarity.py). Public-literature
designs: Okapi BM25 (Robertson-Walker-Jones TREC-3) and RRF (Cormack et al.,
SIGIR 2009).

Engine-parity discipline (the repo's fixed-point rule): BM25's per-term
contribution is an irrational double (ln + divisions), but both engines compute
the SAME IEEE expression on the same inputs, so the value is quantized ONCE via
floor(contrib * 1e6) into a BIGINT and all cross-term aggregation is exact
integer arithmetic — no float summation order anywhere. RRF goes further: its
score is sum(SCALE div (K + rank)) — pure integer division end to end.

Scale shape (100 TB corpus):
- the corpus is tokenized in ONE narrow pass; doc length rides the (doc, term)
  groupBy key, so term frequencies need no second join against a lengths table;
- the query-term set is tiny by nature (dozens of queries x <= q_terms tokens)
  and BROADCASTS; the exploded token stream is left-semi filtered against it
  BEFORE any aggregation, so the only shuffles are map-side-combined groupBys
  over postings that MATCHED a query term — the corpus itself never reshuffles
  and non-matching tokens never leave their input partition;
- document frequencies are computed from the filtered posting stream (for a
  term in the query set, every doc containing it survives the semi join, so
  the restricted count equals the global df);
- corpus-level stats (N, avgdl) re-enter as a broadcast 1-row relation, the
  tfidf/median pattern — no driver-side action.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from .text import tokens

#: fixed-point scale for BM25 contributions and RRF scores (1e6: ranking
#: resolution far below any meaningful score gap; quantization-boundary
#: ln-ULP risk ~1e-10 per term — same accepted class as the 6dp TF-IDF round)
RETRIEVAL_SCALE = 1_000_000

#: Okapi defaults (Robertson et al.); written as exact literals in BOTH
#: engines so the parsed doubles are bit-identical
BM25_K1 = 1.2
BM25_B = 0.75

#: RRF smoothing constant (Cormack et al. use 60)
RRF_K = 60


def _bm25_contrib_e6(
    tf: Column, df: Column, dl: Column, n_docs: Column, avgdl: Column
) -> Column:
    """floor(idf * tf_norm * SCALE) as BIGINT — the one quantization point.

    idf = ln(1 + (N - df + 0.5) / (df + 0.5))   (always > 0, no negative-idf
    branch needed); tf_norm = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    """
    idf = F.log(
        F.lit(1.0) + (n_docs - df + F.lit(0.5)) / (df + F.lit(0.5))
    )
    tfn = (tf * F.lit(BM25_K1 + 1.0)) / (
        tf + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dl / avgdl)
    )
    return F.floor(idf * tfn * F.lit(float(RETRIEVAL_SCALE))).cast("long")


def _query_terms(
    queries: DataFrame, query_id_col: str, query_text_col: str, q_terms: int
) -> DataFrame:
    """Distinct (qid, term) pairs from the first ``q_terms`` tokens per query."""
    return (
        queries.select(
            F.col(query_id_col).alias("_qid"),
            F.explode(
                F.slice(tokens(F.lower(F.col(query_text_col))), 1, q_terms)
            ).alias("_term"),
        )
        .distinct()
    )


def _score_postings(
    posting: DataFrame,
    stats: DataFrame,
    qterms: DataFrame,
    k: int,
    id_col: str,
    query_id_col: str,
) -> DataFrame:
    """The shared BM25 scoring tail: posting is (_id, _dl, _term, _tf)
    restricted to query-matched terms (for a term in the query set every doc
    containing it must be present, so the in-stream document frequency equals
    the global df); stats is the 1-row (_n_docs, _avgdl) relation; qterms the
    (qid, term) pairs. Used identically by the direct path (bm25_topk) and
    the materialized-index path (bm25_topk_from_index) — ONE expression tree,
    so the streamed-index parity row certifies index content, not a second
    formula implementation."""
    dfreq = posting.groupBy("_term").agg(
        F.count(F.lit(1)).cast("long").alias("_df")
    )
    # r14 (guide §1.2 step 2): the BM25 contribution depends only on the
    # (doc, term) posting row — computing it BEFORE the query-term join
    # evaluates ln + divisions once per posting instead of once per exploded
    # (query, doc, term) row (~#queries-sharing-the-term times more; the
    # profiled 50 s scored-stage CPU at sf0.1). The exploded rows then carry
    # only (_qid, _id, _c) into the map-side partial aggregation.
    contrib = (
        posting.join(F.broadcast(dfreq), "_term")
        .crossJoin(F.broadcast(stats))
        .select(
            "_id",
            "_term",
            _bm25_contrib_e6(
                F.col("_tf").cast("double"),
                F.col("_df").cast("double"),
                F.col("_dl").cast("double"),
                F.col("_n_docs"),
                F.col("_avgdl"),
            ).alias("_c"),
        )
    )
    scored = (
        contrib.join(F.broadcast(qterms), "_term")
        .filter(F.col("_id") != F.col("_qid"))
        .groupBy("_qid", "_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
            F.sum("_c").alias("score_e6"),
        )
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("score_e6"), F.asc("_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_id").alias(id_col),
            "n_terms_matched",
            "score_e6",
            "rank",
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    q_terms: int = 12,
) -> DataFrame:
    """Top-k corpus docs per query under Okapi BM25, deterministic ranking.

    ``queries`` is a (query_id, query_text) relation; its distinct tokens
    (first ``q_terms`` per query) form the term bag — query-side term
    frequency is ignored, the standard short-query simplification. A query
    doc drawn from the corpus never retrieves itself (self-exclusion on id).

    Returns (query_id, doc_id, n_terms_matched, score_e6, rank) where
    score_e6 is the exact BIGINT sum of quantized per-term contributions and
    rank orders by (score_e6 DESC, doc_id ASC) — fully engine-portable.
    """
    base = docs.select(
        F.col(id_col).alias("_id"),
        tokens(F.lower(F.col(text_col))).alias("_toks"),
    ).select("_id", "_toks", F.size("_toks").cast("long").alias("_dl"))

    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        (F.sum("_dl").cast("double") / F.count(F.lit(1))).alias("_avgdl"),
    )

    qterms = _query_terms(queries, query_id_col, query_text_col, q_terms)
    qterm_set = qterms.select("_term").distinct()

    posting = (
        base.select("_id", "_dl", F.explode("_toks").alias("_term"))
        .join(F.broadcast(qterm_set), "_term", "left_semi")
        .groupBy("_id", "_dl", "_term")
        .agg(F.count(F.lit(1)).cast("long").alias("_tf"))
    )
    return _score_postings(posting, stats, qterms, k, id_col, query_id_col)


def build_bm25_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The materializable inverted-index relation for a (batch of) docs:
    (doc_id, dl, term, tf) with a sentinel (term NULL, tf 0) row for empty
    documents, so document count and length stats are recoverable from the
    index alone. One narrow tokenize + one map-side-combined groupBy —
    batch-local (a doc's tokens live in one batch), which is what makes the
    incremental/streaming ingest below exact by construction."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.lower(F.col(text_col))).alias("_toks"),
    ).select("doc_id", "_toks", F.size("_toks").cast("long").alias("dl"))
    return (
        base.select("doc_id", "dl", F.explode_outer("_toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        # count("term") counts NON-NULL values: group size for real terms,
        # 0 for the empty-doc sentinel group
        .agg(F.count("term").cast("long").alias("tf"))
    )


def bm25_topk_from_index(
    index: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    q_terms: int = 12,
) -> DataFrame:
    """bm25_topk over a MATERIALIZED index (build_bm25_index layout) instead
    of raw text — the production shape: the corpus is tokenized once at
    ingest, scoring reads only the (tiny, query-term-pruned) posting slices.
    Same scoring tail as bm25_topk, so results are identical by construction
    when the index matches the corpus."""
    doclens = index.select("doc_id", "dl").distinct()
    stats = doclens.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("_avgdl"),
    )
    qterms = _query_terms(queries, query_id_col, query_text_col, q_terms)
    qterm_set = qterms.select("_term").distinct()
    posting = (
        index.filter(F.col("term").isNotNull())
        .select(
            F.col("doc_id").alias("_id"),
            F.col("dl").alias("_dl"),
            F.col("term").alias("_term"),
            F.col("tf").alias("_tf"),
        )
        .join(F.broadcast(qterm_set), "_term", "left_semi")
    )
    return _score_postings(posting, stats, qterms, k, id_col, query_id_col)


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_a_col: str = "rank",
    rank_b_col: str = "rank",
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Reciprocal-rank fusion of two per-query rankings — pure integer math.

    rrf_e6 = sum over systems of SCALE div (rrf_k + rank); a doc absent from
    one system's list simply contributes nothing from it (the standard RRF
    treatment of partial candidate lists, which is exactly what hybrid
    lexical+vector retrieval produces when the corpora only partially
    overlap). Integer division is floor-identical across engines for the
    positive operands here. Returns (query_id, doc_id, rank_lex, rank_vec,
    rrf_e6, fused_rank); fused_rank orders by (rrf_e6 DESC, doc_id ASC).
    """
    a = ranked_a.select(
        F.col(query_id_col).alias("_qid"),
        F.col(id_col).alias("_id"),
        F.col(rank_a_col).alias("rank_lex"),
    )
    b = ranked_b.select(
        F.col(query_id_col).alias("_qid"),
        F.col(id_col).alias("_id"),
        F.col(rank_b_col).alias("rank_vec"),
    )
    fused = (
        a.join(b, ["_qid", "_id"], "full_outer")
        .withColumn(
            "rrf_e6",
            F.coalesce(
                F.expr(f"{RETRIEVAL_SCALE} div ({rrf_k} + rank_lex)"), F.lit(0)
            ).cast("long")
            + F.coalesce(
                F.expr(f"{RETRIEVAL_SCALE} div ({rrf_k} + rank_vec)"), F.lit(0)
            ).cast("long"),
        )
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("rrf_e6"), F.asc("_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rank") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_id").alias(id_col),
            "rank_lex",
            "rank_vec",
            "rrf_e6",
            "fused_rank",
        )
    )


#: precomputed nDCG discounts floor(SCALE / log2(rank+1)) for ranks 1..10 —
#: a LITERAL table consumed identically by both engines, so the one
#: irrational function in the metric carries zero cross-engine float risk
#: (log2 of non-powers-of-2 can differ in the last ulp between libm and the
#: JVM; a quantized literal cannot)
NDCG_DISCOUNT_E6 = {
    1: 1_000_000, 2: 630_929, 3: 500_000, 4: 430_676, 5: 386_852,
    6: 356_207, 7: 333_333, 8: 315_464, 9: 301_029, 10: 289_064,
}


def _discount_col(rank: Column) -> Column:
    expr = F.lit(0).cast("long")
    for r, d in sorted(NDCG_DISCOUNT_E6.items(), reverse=True):
        expr = F.when(rank == r, F.lit(d).cast("long")).otherwise(expr)
    return expr


def retrieval_metrics(
    ranked: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query ranking-quality metrics against a relevance set — the eval
    half of the retrieval loop, integer-exact end to end.

    ``ranked``: (query_id, doc_id, rank) with rank 1..k per query.
    ``relevance``: (query_id, doc_id) pairs judged relevant — its per-query
    size is the recall denominator.

    Returns one row per query: n_rel, hits_at_k, precision_e6
    ((hits*SCALE) div k), recall_e6 ((hits*SCALE) div n_rel), rr_e6
    (SCALE div first-relevant-rank; 0 when no hit — integer MRR), dcg_e6 /
    idcg_e6 (quantized-literal discount sums; ideal = the top-min(k, n_rel)
    discounts), and ndcg (the ONE float: ROUND(dcg/idcg, 6), a single
    division of two identical integers in any engine). Queries with an empty
    relevance set are dropped (undefined denominators).

    Scale shape: ranked is a top-k relation (queries x k rows); relevance
    joins it per (query, doc) and aggregates per query — nothing here touches
    the corpus. Both inputs are small by construction at any corpus size.
    """
    if k > max(NDCG_DISCOUNT_E6):
        raise ValueError(
            f"retrieval_metrics supports k <= {max(NDCG_DISCOUNT_E6)}; got {k}"
        )
    r = ranked.select(
        F.col(query_id_col).alias("_qid"),
        F.col(id_col).alias("_id"),
        F.col(rank_col).alias("_rank"),
    ).filter(F.col("_rank") <= k)
    rel = relevance.select(
        F.col(query_id_col).alias("_qid"),
        F.col(id_col).alias("_id"),
        F.lit(1).alias("_rel"),
    ).distinct()
    n_rel = rel.groupBy("_qid").agg(F.count(F.lit(1)).cast("long").alias("n_rel"))

    joined = r.join(rel, ["_qid", "_id"], "left")
    per_q = joined.groupBy("_qid").agg(
        F.sum(F.when(F.col("_rel").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("hits_at_k"),
        F.min(F.when(F.col("_rel").isNotNull(), F.col("_rank"))).alias("_first_rel"),
        F.sum(
            F.when(F.col("_rel").isNotNull(), _discount_col(F.col("_rank"))).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("dcg_e6"),
    )
    # ideal DCG: the top-min(k, n_rel) discounts — a closed-form prefix sum of
    # the literal table, expressible as one CASE over min(k, n_rel)
    prefix = {0: 0}
    acc = 0
    for i in range(1, k + 1):
        acc += NDCG_DISCOUNT_E6[i]
        prefix[i] = acc
    ideal_n = F.least(F.lit(k).cast("long"), F.col("n_rel"))
    idcg = F.lit(0).cast("long")
    for i, v in sorted(prefix.items(), reverse=True):
        idcg = F.when(ideal_n == i, F.lit(v).cast("long")).otherwise(idcg)

    out = (
        n_rel.join(per_q, "_qid", "left")
        .select(
            F.col("_qid").alias(query_id_col),
            "n_rel",
            F.coalesce(F.col("hits_at_k"), F.lit(0)).cast("long").alias("hits_at_k"),
            F.expr(f"(coalesce(hits_at_k, 0) * {RETRIEVAL_SCALE}) div {k}")
            .cast("long")
            .alias("precision_e6"),
            F.expr(f"(coalesce(hits_at_k, 0) * {RETRIEVAL_SCALE}) div n_rel")
            .cast("long")
            .alias("recall_e6"),
            F.coalesce(
                F.expr(f"{RETRIEVAL_SCALE} div _first_rel"), F.lit(0)
            )
            .cast("long")
            .alias("rr_e6"),
            F.coalesce(F.col("dcg_e6"), F.lit(0)).cast("long").alias("dcg_e6"),
            idcg.alias("idcg_e6"),
        )
        .withColumn(
            "ndcg",
            F.when(
                F.col("idcg_e6") > 0,
                F.round(
                    F.col("dcg_e6").cast("double") / F.col("idcg_e6").cast("double"), 6
                ),
            ).otherwise(F.lit(0.0)),
        )
    )
    return out
