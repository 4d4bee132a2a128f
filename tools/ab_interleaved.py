"""Interleaved same-session A/B of an env-toggled variant for named queries.

Cross-session A/B proved too noisy in r14 (same code measured 1.76 s and
2.76 s in back-to-back fresh sessions, and both variants drift faster for
6-8 executions as the JIT warms); this harness times variant A (env unset)
and variant B (env=1) alternately inside ONE warmed session, ALTERNATING
which variant goes first each rep (so warmup drift cancels instead of
favoring whichever ran last), and reports per-variant minima.

    SPARK_GRAFT_SF_DIR=... python tools/ab_interleaved.py \
        [--env SPARK_GRAFT_NO_SPREAD] [--reps 6] <names>
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
    argv = sys.argv[1:]
    reps, env_name = 6, "SPARK_GRAFT_NO_SPREAD"
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    if "--env" in argv:
        i = argv.index("--env")
        env_name = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    names = [a for a in argv if not a.startswith("--")]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark(app_name="ab-interleaved", master=f"local[{DEFAULT_CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    def run(name: str, on: bool) -> float:
        if on:
            os.environ[env_name] = "1"
        else:
            os.environ.pop(env_name, None)
        try:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            return round(time.perf_counter() - t0, 4)
        finally:
            os.environ.pop(env_name, None)

    out: dict[str, dict[str, list[float]]] = {}
    for name in names:
        samples: dict[str, list[float]] = {"off": [], "on": []}
        run(name, False)  # warm both-code-path caches once
        run(name, True)
        for r in range(reps):
            order = (False, True) if r % 2 == 0 else (True, False)
            for on in order:
                samples["on" if on else "off"].append(run(name, on))
        out[name] = samples
        print(
            f"{name} [{env_name}]: off min={min(samples['off'])} "
            f"on min={min(samples['on'])} "
            f"(off {samples['off']} | on {samples['on']})",
            flush=True,
        )
    print(json.dumps({"sf_dir": sf_dir, "env": env_name, "ab": out}))
    spark.stop()


if __name__ == "__main__":
    main()
