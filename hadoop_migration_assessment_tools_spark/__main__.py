"""CLI entry point: run a named registry query against a corpus directory.

    python -m hadoop_migration_assessment_tools_spark <query_name> [sf_dir] [--explain]
    python -m hadoop_migration_assessment_tools_spark --list
"""

from __future__ import annotations

import sys

from .config import DEFAULT_SF_DIR
from .queries.registry import ORACLE_SQL, QUERIES
from .session import get_spark


def main(argv: list[str]) -> int:
    args = [a for a in argv if not a.startswith("--")]
    flags = {a for a in argv if a.startswith("--")}
    if "--list" in flags or not args:
        for name in sorted(QUERIES):
            kind = "oracled" if name in ORACLE_SQL else "rows-only"
            print(f"{name}  [{kind}]")
        return 0
    name = args[0]
    if name not in QUERIES:
        print(f"unknown query {name!r}; use --list", file=sys.stderr)
        return 2
    sf_dir = args[1] if len(args) > 1 else DEFAULT_SF_DIR
    spark = get_spark(app_name=f"hadoop-migration-assessment-spark:{name}")
    spark.sparkContext.setLogLevel("WARN")
    df = QUERIES[name](spark, sf_dir)
    if "--explain" in flags:
        df.explain("formatted")
    df.show(50, truncate=False)
    print(f"-- {df.count()} rows from {name} @ {sf_dir}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
