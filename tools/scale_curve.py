"""Scale-curve evidence (VERDICT r9 #8): time the most expensive registry queries
at sf0.001 / sf0.01 / sf0.1 and print a markdown table + one JSON line.

The 100 TB claims in SCALE.md rest on plan shapes; this measures the shapes.
The signal is the sf0.01 -> sf0.1 ratio (10x data): a linear query lands well
under 10x because fixed costs (session, Python workers, plan compile) don't
scale; anything OVER 10x is super-linear and needs a documented reason.
sf0.001 numbers are overhead-dominated and reported for completeness only.

    python tools/scale_curve.py                 # default query set
    python tools/scale_curve.py name1 name2 ... # explicit set
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_migration_assessment_tools_spark.config import DEFAULT_CPUS  # noqa: E402
from hadoop_migration_assessment_tools_spark.queries.registry import QUERIES  # noqa: E402
from hadoop_migration_assessment_tools_spark.session import get_spark  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]

#: The 10+ most expensive queries per BENCH_r09 / the r9 judge's clean run,
#: plus the two heaviest round-10 additions. Each carries its documented
#: complexity in corpus size n (|Q| = fixed query-set size, fixed per SF here
#: only for emb_* whose query set is a fixed 75-row broadcast).
DEFAULT_SET = [
    "emb_topk_scaled_bruteforce",  # all-pairs O(n*|Q|) control — linear in n
    "emb_topk_scaled_ivf",  # train sample fixed; assign O(n), probe sublinear
    "emb_ivfpq_rerank_topk",  # assign+encode O(n); shortlist R*|Q| fixed
    "emb_pq_topk",  # encode O(n); ADC scan O(n) codes-only
    "emb_residual_pq_topk",  # same as above + residual subtraction O(n)
    # r11 refresh (VERDICT r10 #4/#7): the newest heavy rows
    "emb_residual_pq_rerank_topk",  # + R*|Q| exact refine — constant in n
    "emb_residual_rerank_scaled",  # production knobs: nlist=256, 12x corpus
    "events_stream_hll_parity",  # state-bounded maintainer — expected flat
    "events_stream_cms_parity",  # state-bounded maintainer — expected flat
    "events_stream_state_sink_parity",  # maintainer + partitioned state sink
    "docs_training_prep_pipeline",  # five linear stages, checkpointed
    "docs_incremental_ingest",  # batch admission linear; index probe
    "qe_stream_batch_parity",  # fixed micro-batch machinery dominates
    "docs_cdc_chunking",  # per-doc rolling hash, linear in text volume
    "docs_split_kmv_jaccard",  # bottom-k per split: k fixed, scan linear
    "docs_dup_pagerank",  # iterations fixed; edges grow with dup density
    "docs_shingle_jaccard",  # candidate PAIRS grow with organic dup density
]


def main(argv: list[str]) -> int:
    names = argv or DEFAULT_SET
    missing = [n for n in names if n not in QUERIES]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        return 1
    spark = get_spark(app_name="scale-curve", master=f"local[{DEFAULT_CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    # Same warmups as bench.py so no query absorbs one-time session costs.
    from pyspark.sql import functions as F

    QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.01").count()

    def _warm(batches):
        import numpy  # noqa: F401

        from hadoop_migration_assessment_tools_spark.ext import multimodal  # noqa: F401

        yield from batches

    sdf = spark.range(DEFAULT_CPUS, numPartitions=DEFAULT_CPUS)
    sdf.mapInPandas(_warm, "id long").count()
    sdf.agg(*[F.sum((F.col("id") + i) % 7).alias(f"s{i}") for i in range(64)]).count()
    import tempfile

    with tempfile.TemporaryDirectory(prefix="curve_stream_warm_") as tmp:
        spark.range(4).withColumn("ts", F.current_timestamp()).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/src")
        (
            spark.readStream.schema("id long, ts timestamp")
            .parquet(f"{tmp}/src")
            .withWatermark("ts", "1 minute")
            .dropDuplicatesWithinWatermark(["id"])
            .writeStream.format("memory")
            .queryName("curve_stream_warm")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    results: dict[str, dict[str, float]] = {}
    for name in names:
        q = QUERIES[name]
        results[name] = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            best = float("inf")
            for _ in range(2):  # min-of-2: contention adds, never subtracts
                t0 = time.perf_counter()
                q(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            results[name][sf] = round(best, 3)
        r = results[name]
        ratio = r["0.1"] / r["0.01"] if r["0.01"] > 0 else float("inf")
        print(
            f"| {name} | {r['0.001']:.2f} | {r['0.01']:.2f} | {r['0.1']:.2f} "
            f"| {ratio:.1f}x |",
            flush=True,
        )

    print(
        json.dumps(
            {
                "metric": "scale_curve_seconds",
                "sfs": SFS,
                "queries": results,
                "ratio_01_to_1": {
                    n: round(r["0.1"] / r["0.01"], 2) if r["0.01"] > 0 else None
                    for n, r in results.items()
                },
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
