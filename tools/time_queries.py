"""Targeted A/B timing harness for the optimization rounds.

Mimics bench.py's methodology (same session configs, q1 + Python-worker +
codegen warmups, count() action, min-of-reruns for >2 s queries) on a NAMED
subset, so per-query before/after numbers are comparable to the full bench
without paying its ~5 min wall time per iteration.

    python tools/time_queries.py emb_topk_scaled_bruteforce docs_shingle_hll ...
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/time_queries.py --reps 3 <names>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_migration_assessment_tools_spark.config import DEFAULT_CPUS, DEFAULT_SF_DIR
from hadoop_migration_assessment_tools_spark.queries.registry import QUERIES
from hadoop_migration_assessment_tools_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
    names = args or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark(app_name="time-queries", master=f"local[{DEFAULT_CPUS}]")
    spark.sparkContext.setLogLevel("WARN")

    # bench.py's warmups, verbatim in spirit
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    def _warm(batches):
        import numpy  # noqa: F401

        from hadoop_migration_assessment_tools_spark.ext import multimodal  # noqa: F401

        yield from batches

    spark.range(DEFAULT_CPUS, numPartitions=DEFAULT_CPUS).mapInPandas(_warm, "id long").count()
    from pyspark.sql import functions as F

    spark.range(DEFAULT_CPUS, numPartitions=DEFAULT_CPUS).agg(
        *[F.sum((F.col("id") + i) % 7).alias(f"s{i}") for i in range(64)]
    ).count()

    out: dict[str, float] = {}
    for name in names:
        q = QUERIES[name]
        spark.sparkContext.setJobDescription(f"time:{name}")
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            q(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        out[name] = round(min(samples), 4)
        print(f"{name}: {out[name]} (samples: {[round(s, 3) for s in samples]})", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
