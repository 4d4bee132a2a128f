"""Physical-plan audit: extract a stable operator signature from a DataFrame's
formatted Catalyst plan and assert scale-safety invariants on it.

Why a signature and not a text diff: formatted plans embed node ids, file paths and
statistics that churn on every run; the properties that decide 100 TB behavior are the
OPERATOR MIX — how many shuffles, which join strategies, whether a nested-loop or
cartesian stage appeared, whether a window is present. Pinning those counts per query
(tests/test_plan_audit.py) turns "a broadcast hint silently fell out" or "the range
join degraded to BroadcastNestedLoopJoin" into a test failure instead of a wall-time
mystery (VERDICT r3 next-round #2; BASELINE.md's caveat that wall-times swing ~35%
with machine load is exactly why plan shape, not seconds, is the regression signal).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame

#: Signature keys, in display order.
SIGNATURE_KEYS = (
    "shuffle_exchange",
    "broadcast_exchange",
    "bnlj",
    "cartesian",
    "smj",
    "bhj",
    "shj",
    "window",
)


def formatted_plan(df: DataFrame) -> str:
    """The 'formatted' explain string (tree + per-node details) of a DataFrame."""
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def plan_signature(df_or_plan: DataFrame | str) -> dict[str, int]:
    """Count the scale-relevant physical operators in a plan.

    Nodes are parsed from the formatted explain's per-node detail headers
    (``(N) OperatorName``), which list every physical node exactly once — substring
    counting over the whole text would double-count the tree section.
    """
    plan = df_or_plan if isinstance(df_or_plan, str) else formatted_plan(df_or_plan)
    nodes = Counter(re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, re.M))
    shuffle = sum(
        1 for line in plan.splitlines() if re.match(r"^\(\d+\) Exchange$", line.strip())
    )
    return {
        "shuffle_exchange": shuffle,
        "broadcast_exchange": nodes.get("BroadcastExchange", 0),
        "bnlj": nodes.get("BroadcastNestedLoopJoin", 0),
        "cartesian": nodes.get("CartesianProduct", 0),
        "smj": nodes.get("SortMergeJoin", 0),
        "bhj": nodes.get("BroadcastHashJoin", 0),
        "shj": nodes.get("ShuffledHashJoin", 0),
        "window": nodes.get("Window", 0) + nodes.get("WindowGroupLimit", 0),
    }


def assert_scale_safe(
    sig: dict[str, int], *, allow_bnlj: bool = False, max_shuffles: int | None = None
) -> None:
    """Raise AssertionError if the signature contains a scale-killer.

    - ``CartesianProduct`` is never acceptable (O(n*m) with no broadcast bound).
    - ``BroadcastNestedLoopJoin`` only when ``allow_bnlj`` — the deliberate pattern
      is a crossJoin against a broadcast side KNOWN to be tiny (a query set, an
      nlist-row centroid table); any other appearance means a non-equi join degraded.
    - ``max_shuffles`` optionally bounds the Exchange count (each one is a full
      network pass over the data at 100 TB).
    """
    if sig["cartesian"]:
        raise AssertionError(f"CartesianProduct in plan: {sig}")
    if sig["bnlj"] and not allow_bnlj:
        raise AssertionError(
            f"BroadcastNestedLoopJoin in plan (non-equi join degraded?): {sig}"
        )
    if max_shuffles is not None and sig["shuffle_exchange"] > max_shuffles:
        raise AssertionError(
            f"{sig['shuffle_exchange']} shuffle Exchanges > budget {max_shuffles}: {sig}"
        )
