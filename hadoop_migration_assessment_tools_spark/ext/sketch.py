"""[EXT] Sketch operators: bounded-memory approximations for 100 TB profiling.

``heavy_hitters`` is a distributed Misra-Gries (space-saving family) summary — the
classic answer to "top terms over a corpus too big to exact-count cheaply". Spark's
built-ins cover approximate distincts (HLL++, ``approx_count_distinct``) and
quantiles (``percentile_approx``); frequent-items with bounded memory is the gap
this fills.

Shape: phase 1 builds one capacity-bounded counter summary PER PARTITION inside
``mapInPandas`` (constant memory per task, no shuffle); phase 2 merges summaries
with an ordinary ``groupBy().sum()`` — the merged weight of any item undercounts
its true frequency by at most ``n_partition / capacity`` per partition (standard
Misra-Gries guarantee), so every true heavy hitter survives into the merged top-k.
The exact-count verifier in tests quantifies this on planted-skew corpora.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, functions as F


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 20,
    capacity: int | None = None,
) -> DataFrame:
    """Approximate top-k most frequent values of ``col`` with bounded memory.

    capacity (default 8*k) counters per partition; any value with true frequency
    above n/capacity in a partition is guaranteed a counter there. Returns
    (item, est_count) with est_count <= true count (Misra-Gries undercounts).
    """
    cap = capacity or 8 * k

    def summarize(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in it:
            for v in pdf[col]:
                if v is None:
                    continue
                v = str(v)
                if v in counters:
                    counters[v] += 1
                elif len(counters) < cap:
                    counters[v] = 1
                else:
                    # decrement-all step, dropping zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"item": list(counters.keys()), "w": list(counters.values())}
        )

    summaries = df.select(F.col(col).alias(col)).mapInPandas(
        summarize, schema="item string, w long"
    )
    return (
        summaries.groupBy("item")
        .agg(F.sum("w").cast("long").alias("est_count"))
        .orderBy(F.desc("est_count"), F.asc("item"))
        .limit(k)
    )


def distinct_sketch_profile(df: DataFrame, cols: list[str], rsd: float = 0.02) -> DataFrame:
    """HLL++ distinct-cardinality profile per column (one pass, no shuffle of values):
    the 100 TB substitute for COUNT(DISTINCT x) on every column."""
    aggs = [
        F.approx_count_distinct(c, rsd).cast("long").alias(f"{c}_approx_distinct")
        for c in cols
    ]
    return df.agg(*aggs)
