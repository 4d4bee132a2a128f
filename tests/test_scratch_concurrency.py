"""Regression: concurrent sessions must not corrupt each other's scratch dirs.

VERDICT r12 #1 observed the race live: two processes running the same roundtrip
query at the same SF shared one deterministic /tmp path with wipe=True, and
docs_bm25_stream_index_parity died with FAILED_READ_FILE when a verify sweep
ran beside the pytest suite. scratch_dir() now carries os.getpid(), so the two
processes write disjoint trees; this test proves it by running the same
wipe=True roundtrip query (qe_avro_roundtrip — append-semantics OCF sink, the
exact class that broke) in TWO concurrent subprocesses and requiring both green.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import sys
sys.path.insert(0, {repo!r})
from hadoop_migration_assessment_tools_spark.queries.registry import QUERIES
from hadoop_migration_assessment_tools_spark.session import get_spark

spark = get_spark(app_name="scratch-race-{tag}", master="local[3]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
n = QUERIES["qe_avro_roundtrip"](spark, "/root/testdata/sf0.001").count()
spark.stop()
assert n >= 0
print("OK", n)
"""


def test_scratch_paths_are_per_process():
    from hadoop_migration_assessment_tools_spark.config import scratch_dir

    p = scratch_dir("race_probe", "/root/testdata/sf0.001")
    assert f"_p{os.getpid()}" in os.path.basename(p)
    # Reuse within a process stays deterministic (the ADVICE-r3 no-leak reuse).
    assert scratch_dir("race_probe", "/root/testdata/sf0.001") == p


def test_concurrent_sessions_same_roundtrip_query_both_green():
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD.format(repo=REPO, tag=i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            cwd=REPO,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (
            f"child rc={p.returncode}\nstdout:\n{out.decode()[-2000:]}\n"
            f"stderr:\n{err.decode()[-4000:]}"
        )
        assert b"OK" in out
