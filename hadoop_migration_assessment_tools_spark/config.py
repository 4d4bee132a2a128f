"""Engine constants mirroring the reference hook's configuration surface.

Reference: src/java/com/google/cloud/bigquery/dwhassessment/hooks/logger/LoggingHookConstants.java:25-35
and .../logger/LoggerVarsConfig.java:22-40. We keep the same config keys so a user of the
reference can carry their settings over unchanged.
"""

from __future__ import annotations

import os

# File prefix for sink output files (LoggingHookConstants.java:29).
DWH_ASSESSMENT_FILE_PREFIX = "dwhassessment_"

# Hook version constant stamped on every record (LoggingHookConstants.java:27).
HOOK_VERSION = "1.0"

# Config keys (LoggerVarsConfig.java:25-40). Same key strings as the reference.
CONF_BASE_DIRECTORY = "dwhassessment.hook.base-directory"
CONF_QUEUE_CAPACITY = "dwhassessment.hook.queue.capacity"
CONF_ROLLOVER_INTERVAL = "dwhassessment.hook.rollover-interval"
CONF_ROLLOVER_CHECK_INTERVAL = "dwhassessment.hook.rollover-eligibility-check-interval"

# Queue-name config keys dispatched on execution mode (LoggerVarsConfig.java:22-24).
CONF_MR_QUEUE_NAME = "mapreduce.job.queuename"
CONF_TEZ_QUEUE_NAME = "tez.queue.name"
CONF_LLAP_QUEUE_NAME = "hive.llap.daemon.queue.name"

# Defaults (LoggingHookConstants.java:31-33; EventLogger.java:60).
DEFAULT_QUEUE_CAPACITY = 64
DEFAULT_ROLLOVER_INTERVAL_SECONDS = 3600  # 1 h
DEFAULT_ROLLOVER_CHECK_INTERVAL_SECONDS = 600  # 10 min

# Event types (EventType.java:19-22) and statuses (EventStatus.java:19-22).
EVENT_QUERY_SUBMITTED = "QUERY_SUBMITTED"
EVENT_QUERY_COMPLETED = "QUERY_COMPLETED"
STATUS_SUCCESS = "SUCCESS"
STATUS_FAIL = "FAIL"

# Execution modes (ExecutionMode.java:23-31).
MODE_MR = "MR"
MODE_TEZ = "TEZ"
MODE_LLAP = "LLAP"
MODE_SPARK = "SPARK"
MODE_DDL = "DDL"
MODE_CLIENT_ONLY = "CLIENT_ONLY"
MODE_NONE = "NONE"

# Hive instance types (EventRecordConstructor.java:358-360).
INSTANCE_HS2 = "HS2"
INSTANCE_CLI = "CLI"

# Driver-contract environment knobs.
DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

_SCRATCH_DIRS: set[str] = set()
_SCRATCH_ATEXIT_REGISTERED = False


def _cleanup_scratch_dirs() -> None:
    import shutil

    for path in list(_SCRATCH_DIRS):
        shutil.rmtree(path, ignore_errors=True)
        _SCRATCH_DIRS.discard(path)


def scratch_dir(name: str, sf_dir: str = "", wipe: bool = False) -> str:
    """Deterministic per-(query, sf, PROCESS) scratch path for roundtrip queries.

    Roundtrip queries write-then-read a dataset as part of the query itself; a fresh
    mkdtemp per invocation leaked a full dataset copy to /tmp on every bench or
    correctness run (ADVICE r3). A deterministic path + mode('overwrite') reuses one
    location per (query, scale factor) within a process — repeated runs cost zero
    net disk.

    The path carries ``os.getpid()`` (VERDICT r12 #1): two concurrent sessions
    running the same roundtrip query at the same SF previously shared one path and
    corrupted each other (observed: docs_bm25_stream_index_parity FAILED_READ_FILE
    when a verify sweep ran beside the pytest suite). Per-process paths make
    concurrent runs disjoint; an atexit hook removes everything this process
    created, preserving the ADVICE-r3 no-leak guarantee across processes too.

    ``wipe=True`` clears the dir first — for sinks with append semantics (the avro
    OCF writer names every file uniquely) and streaming checkpoints (offset state
    must not leak across runs), where 'overwrite' can't be expressed in the writer.
    """
    import atexit
    import hashlib
    import shutil
    import tempfile

    global _SCRATCH_ATEXIT_REGISTERED
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8] if sf_dir else "nosf"
    path = os.path.join(
        tempfile.gettempdir(), f"spark_engine_scratch_{name}_{tag}_p{os.getpid()}"
    )
    if wipe:
        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    if not _SCRATCH_ATEXIT_REGISTERED:
        atexit.register(_cleanup_scratch_dirs)
        _SCRATCH_ATEXIT_REGISTERED = True
        _scavenge_dead_scratch_dirs()  # once per process
    _SCRATCH_DIRS.add(path)
    return path


def _scavenge_dead_scratch_dirs() -> None:
    """Remove siblings left by processes that died without running atexit
    (SIGKILL, OOM): a dir whose _p<pid> suffix names a no-longer-running pid
    is orphaned by construction — pids this process could race are alive."""
    import glob
    import re
    import shutil
    import tempfile

    for p in glob.glob(os.path.join(tempfile.gettempdir(), "spark_engine_scratch_*_p*")):
        m = re.search(r"_p(\d+)$", p)
        if not m or int(m.group(1)) == os.getpid():
            continue
        try:
            os.kill(int(m.group(1)), 0)  # raises if the pid is gone
        except ProcessLookupError:
            shutil.rmtree(p, ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another user: leave it


# Tables in the driver-provided relational corpus (TESTDATA.md).
CORPUS_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
