"""Vanilla-session verification of the driver-scored window (first 50 registry
entries) — run after ANY registry change, before committing:

    python tools/verify_window.py            # scored window only (driver-like)
    python tools/verify_window.py --all      # every oracled entry
    python tools/verify_window.py --only a b # just the named entries
    python tools/verify_window.py --all --hostile  # local[5]/shuffle=7/parallelism=5
                                             # (the partitioning-invariance sweep)

Uses a bare SparkSession.builder session (no get_spark tuning) to mirror the
driver's conditions; a query that only passes under our session config is a
latent CORRECTNESS failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from hadoop_migration_assessment_tools_spark.queries.registry import (  # noqa: E402
    ORACLE_SQL,
    QUERIES,
)
from hadoop_migration_assessment_tools_spark.testing import assert_oracle_parity  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(argv: list[str]) -> int:
    hostile = "--hostile" in argv
    argv = [a for a in argv if a != "--hostile"]
    if "--only" in argv:
        names = argv[argv.index("--only") + 1 :]
    elif "--all" in argv:
        names = list(ORACLE_SQL)
    else:
        names = list(QUERIES)[:50]
    builder = SparkSession.builder.appName("verify-window")
    if hostile:
        # a deliberately adversarial layout: odd tiny parallelism + odd shuffle
        # width vs the usual local[32]/32 — any partitioning-dependent result
        # (rank ties, fold order, sampling, dedup survivors) breaks parity here
        builder = (
            builder.master("local[5]")
            .config("spark.sql.shuffle.partitions", "7")
            .config("spark.default.parallelism", "5")
        )
    else:
        builder = builder.master("local[8]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    fails = []
    for name in names:
        if name not in ORACLE_SQL:
            print(f"!! scored entry WITHOUT an oracle: {name}")
            fails.append(name)
            continue
        try:
            assert_oracle_parity(spark, QUERIES[name], ORACLE_SQL[name], SF_DIR)
            print(f"ok   {name}")
        except Exception as ex:  # noqa: BLE001
            fails.append(name)
            print(f"FAIL {name}: {str(ex)[:200]}")
    print(f"\n{len(names) - len(fails)}/{len(names)} green @ {SF_DIR}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
