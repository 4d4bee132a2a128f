"""Stage-level profiler for the optimization rounds (guide §1/§7).

Runs named registry queries with the Spark event log enabled, then parses the
log to attribute wall time to stages: task counts, total/max task time, shuffle
bytes. The headline signal is SERIAL HOT STAGES — stages with 1-2 tasks and
substantial task time, i.e. CPU-heavy narrow work chained on an unsplittable
single-row-group parquet scan while every other core idles.

    python tools/profile_stages.py docs_minhash_near_dup docs_split_leakage ...
    python tools/profile_stages.py --top 25          # 25 slowest from baseline
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_migration_assessment_tools_spark.config import DEFAULT_CPUS, DEFAULT_SF_DIR
from hadoop_migration_assessment_tools_spark.queries.registry import QUERIES
from hadoop_migration_assessment_tools_spark.session import get_spark


def parse_event_log(path: str) -> dict[str, list[dict]]:
    """job description -> list of stage summaries."""
    jobs: dict[int, dict] = {}
    stages: dict[tuple[int, int], dict] = {}
    tasks: dict[tuple[int, int], list[dict]] = {}
    if os.path.isdir(path):  # Spark 4 rolling event-log dir (eventlog_v2_*)
        files = sorted(
            p for p in glob.glob(os.path.join(path, "*"))
            if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
        )
    else:
        files = [path]
    def _lines(p):
        with open(p, "rb") as fb:
            head = fb.read(4)
        if head[:4] == b"\x28\xb5\x2f\xfd":  # zstd frame magic
            import subprocess

            out = subprocess.run(
                ["zstd", "-dc", p], capture_output=True, check=True
            ).stdout
            yield from out.decode("utf-8", errors="replace").splitlines(keepends=True)
        else:
            yield from open(p, encoding="utf-8", errors="replace")

    lines = (line for p in files for line in _lines(p))
    for line in lines:
        if True:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "t0": ev.get("Submission Time", 0),
                }
            elif et == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev.get("Completion Time", 0)
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                stages[key] = {
                    "id": si["Stage ID"],
                    "name": si.get("Stage Name", "")[:60],
                    "n_tasks": si.get("Number of Tasks", 0),
                    "wall_ms": (si.get("Completion Time", 0) or 0)
                    - (si.get("Submission Time", 0) or 0),
                }
            elif et == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                ti = ev.get("Task Info", {})
                tm = ev.get("Task Metrics") or {}
                sr = (tm.get("Shuffle Read Metrics") or {})
                sw = (tm.get("Shuffle Write Metrics") or {})
                tasks.setdefault(key, []).append(
                    {
                        "ms": (ti.get("Finish Time", 0) or 0)
                        - (ti.get("Launch Time", 0) or 0),
                        "sh_r": sr.get("Remote Bytes Read", 0)
                        + sr.get("Local Bytes Read", 0),
                        "sh_w": sw.get("Shuffle Bytes Written", 0),
                        "py": tm.get("Executor Run Time", 0),
                    }
                )
    out: dict[str, list[dict]] = {}
    for j in jobs.values():
        desc = j["desc"] or "?"
        rows = out.setdefault(desc, [])
        for sid in j["stages"]:
            key = (sid, 0)
            if key not in stages:
                continue  # skipped stage (reused exchange)
            st = dict(stages[key])
            ts = tasks.get(key, [])
            st["task_ms_sum"] = sum(t["ms"] for t in ts)
            st["task_ms_max"] = max((t["ms"] for t in ts), default=0)
            st["sh_r"] = sum(t["sh_r"] for t in ts)
            st["sh_w"] = sum(t["sh_w"] for t in ts)
            rows.append(st)
    return out


def main() -> None:
    argv = sys.argv[1:]
    names: list[str] = []
    if "--top" in argv:
        k = int(argv[argv.index("--top") + 1])
        base = json.load(open("plans/r13/BENCH_baseline.json"))["queries"]
        names = [n for n, _ in sorted(base.items(), key=lambda x: -x[1])[:k]]
    else:
        names = [a for a in argv if not a.startswith("--")]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    log_dir = "/tmp/spark_profile_events"
    os.makedirs(log_dir, exist_ok=True)
    for p in glob.glob(f"{log_dir}/*"):
        os.remove(p)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark(
        app_name="profile-stages",
        master=f"local[{DEFAULT_CPUS}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
        },
    )
    spark.sparkContext.setLogLevel("WARN")

    QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    def _warm(batches):
        import numpy  # noqa: F401

        from hadoop_migration_assessment_tools_spark.ext import multimodal  # noqa: F401

        yield from batches

    spark.range(DEFAULT_CPUS, numPartitions=DEFAULT_CPUS).mapInPandas(
        _warm, "id long"
    ).count()

    walls = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        walls[name] = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        print(f"ran {name}: {walls[name]:.2f}s", flush=True)
    spark.stop()

    logs = sorted(glob.glob(f"{log_dir}/*"), key=os.path.getmtime)
    by_desc = parse_event_log(logs[-1])
    for name in names:
        rows = by_desc.get(name, [])
        n_jobs = 0  # job count not tracked per stage; report stages instead
        total_task = sum(r["task_ms_sum"] for r in rows)
        print(f"\n=== {name}  wall={walls[name]:.2f}s  stages={len(rows)} "
              f"task_ms_sum={total_task}")
        for r in sorted(rows, key=lambda r: -r["task_ms_sum"])[:12]:
            flag = " <-- SERIAL" if r["n_tasks"] <= 2 and r["task_ms_max"] > 200 else ""
            print(
                f"  stage {r['id']:>4} tasks={r['n_tasks']:>3} "
                f"wall={r['wall_ms']:>6}ms sum={r['task_ms_sum']:>7}ms "
                f"max={r['task_ms_max']:>6}ms shR={r['sh_r']:>9} shW={r['sh_w']:>9} "
                f"{r['name'][:40]}{flag}"
            )


if __name__ == "__main__":
    main()
