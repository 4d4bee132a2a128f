"""Dump formatted physical plans for EVERY registry query into plans/<tag>/.

Round-13 optimization discipline (guide §1): the before/after plan artifact
pair is the evidence for every plan-shape claim in OPTIMIZATION_r13.md.

    python tools/dump_all_plans.py plans/r13/before [sf_dir]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_migration_assessment_tools_spark.queries.registry import QUERIES
from hadoop_migration_assessment_tools_spark.session import get_spark


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-artifacts", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name, q in QUERIES.items():
        if only is not None and name not in only:
            continue
        try:
            df = q(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception:
            plan = "PLAN BUILD FAILED\n" + traceback.format_exc()
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(f"-- {name} @ {sf_dir} (formatted physical plan)\n\n{plan}")
        print(f"wrote {out_dir}/{name}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
