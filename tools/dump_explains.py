"""Dump formatted Catalyst plans for the perf-critical queries into explains/.

Round-over-round bench discipline (VERDICT r1 next-round #9): wall-times alone can't
show WHY a query regressed; a diffable plan artifact shows a lost pushdown or a new
Exchange immediately. Run after any change to a listed query and commit the diff:

    python tools/dump_explains.py          # sf0.001 (plan shape is SF-independent)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_migration_assessment_tools_spark.queries.registry import QUERIES
from hadoop_migration_assessment_tools_spark.session import get_spark

# Top r01 bench costs + the queries whose plan shape VERDICT r1 called out.
TRACKED = [
    # round-6: deterministic-centroid IVF twins replace the retired small-scale
    # learned twin (emb_cosine_topk_ivf)
    "emb_ivf_fixed_topk",
    "emb_cluster_profile",
    "emb_topk_scaled_bruteforce",
    "emb_topk_scaled_ivf",
    "docs_minhash_near_dup",
    "docs_shingle_jaccard",
    "docs_simhash_near_dup",
    "emb_near_dup_lsh",
    "emb_near_dup_pairs",
    # round-7: SemDeDup cluster-scoped dedup — watch the within-cluster equi
    # join (must stay keyed on centroid_id) and the single checkpoint boundary
    "emb_semantic_dedup",
    # round-7: KMV sketch (post-checkpoint remainder: control + report joins;
    # the bottom-k TakeOrderedAndProject strategy is pinned in test_plans.py)
    "docs_shingle_kmv",
    "qe_table_read_frequency",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "lineitem_price_band_join",
    "orders_customer_bucketed_join",
    "docs_decontaminate",
    "docs_contamination_ratio",
    # round-4 TPC-H shape completion — the two with the most fragile shapes
    # (self-join semi+anti pair; scalar-subquery + anti join)
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    # late round-4 strategy operators
    "docs_incremental_ingest",
    "docs_hybrid_search",
    "lineitem_exact_median",
    "orders_zorder_locality",
    # round-5 additions: amortized admission path, verified heavy hitters,
    # verbatim span dedup
    "docs_ingest_indexed_parity",
    "docs_heavy_terms",
    "docs_repeated_spans",
    "docs_split_leakage",
    "qe_assessment_summary",
    "emb_hard_negatives",
    # round-6/7: certified sketches, join pruning, the new scored sampler, and
    # the round-7 distributed-decomposition operators
    "lineitem_bloom_prefilter",
    "docs_shingle_hll",
    "docs_shingle_cms",
    "docs_pps_sample",
    "docs_cdc_chunking",
    "docs_fuzzy_typo_pairs",
    "events_sliding_hll_users",
    # round-8: quantile sketch (post-collect remainder: exact control + report
    # joins; the bottom-k TakeOrderedAndProject strategy is pinned in
    # test_plans.py), the ISO-BMFF container pipeline, the bucketed interval
    # join, and the checkpointed-index Jaccard remainder
    "events_sampled_quantiles",
    "media_mp4_container_stats",
    "events_session_concurrency",
    "events_cms_join_size",
    "events_grouped_sampled_quantiles",
    "events_sliding_sample_quantiles",
    "emb_pq_topk",
    "emb_ivfpq_topk",
    # round-9: the refine step (two-stage ranking) — watch both WindowGroupLimits
    "emb_ivfpq_rerank_topk",
    # round-10: residual PQ (watch the residual subtraction staying a narrow
    # Arrow map), the actuated advisor (the executed branch's join strategy),
    # and the composed refine stack (shortlist shuffle must stay 3-column)
    "emb_residual_pq_topk",
    "events_join_advice_applied",
    "emb_residual_pq_rerank_topk",
    # round-11: the production-knob ANN stack (watch the one fused assignment
    # scan at nlist=256), the actuated salted top-k (both WindowGroupLimits),
    # the streaming state-sink downstream read, the byte-aware advice twin,
    # the DLT sample (TakeOrderedAndProject — the corpus never shuffles), and
    # the bigram scorer (broadcast-only scoring joins)
    "emb_residual_rerank_scaled",
    "events_salted_group_topk",
    "events_stream_state_sink_parity",
    "events_join_advice",
    "docs_priority_sample",
    "docs_bigram_surprisal",
    # round-11: the Hilbert-vs-Z comparison (watch the two distributed-rank
    # pipelines and the per-level projection chain staying collapsed-free)
    "orders_hilbert_locality",
    # round-12: the retrieval stack — watch the left-semi posting filter
    # staying BEFORE the groupBys (the corpus must never reshuffle) and the
    # fusion's full-outer staying on the two top-k relations only
    "docs_bm25_topk",
    "docs_hybrid_rrf",
    # round-13: hierarchical IVF (watch the corpus side staying scan + Arrow
    # assignment with probes broadcast), the PageRank remainder (must stay
    # join-free post-checkpoint), the Viterbi pipeline (one broadcast of the
    # finished segmentations, DP never in the plan), and the window advisor
    # (the chosen branch's window stack + the 1-row advice crossJoin)
    "emb_hier_ivf_topk",
    "docs_dup_pagerank",
    "docs_viterbi_tokenize",
    "events_window_advice_applied",
    # round-13 late: the composed 1e11 stack (must keep the flat production
    # row's exact envelope) and the judged hybrid (three top-k legs + metrics,
    # nothing corpus-sized after the leg scans)
    "emb_hier_residual_rerank_topk",
    "docs_hybrid_metrics",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "explains")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain-artifacts", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in TRACKED:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(f"-- {name} @ {SF_DIR} (formatted physical plan)\n\n{plan}")
        print(f"wrote explains/{name}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
