"""Scale-adaptive scan spreading (optimization guide §2.2/§2.5/§6).

The driver corpus ships each table as ONE single-row-group parquet file, so a
scan produces ONE task no matter how many cores the session has — and every
narrow map chained on that scan (HOF shingling, per-pair cosine folds, Arrow
decode kernels) runs single-threaded while 31 cores idle. The multimodal
pipeline measured this at 27 s -> ~3 s from one repartition (llm.py r9 note).

``spread_small_scan`` generalizes that fix WITHOUT baking in a local-mode
constant: it compares the scan's NATURAL split count (input bytes /
``spark.sql.files.maxPartitionBytes``) against the session's parallelism and
adds a round-robin repartition ONLY when the scan is under-parallel. At 100 TB
the same call is a no-op — the input splits past the core count on its own and
the plan is untouched — so the helper is exactly the "derive partitioning from
input size, not a constant tuned for either deployment" rule from the guide.

The repartition shuffles the SMALL pre-derivation rows (the full corpus table
here is under a megabyte), never a derived/exploded stream, and an explicit
numPartitions is preserved by AQE (coalescing only applies to non-user-
specified shuffles), so the spread survives into every downstream narrow map.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _size_bytes(path: str) -> int | None:
    """Total bytes under a local file or directory; ``None`` when the path is
    not a readable local file/dir (remote URI, missing path). ``None`` means
    "no evidence", which must DISABLE the spread — treating an hdfs://... or
    s3a://... production table as 0 bytes would repartition (full-shuffle AND
    parallelism-cap) a huge input, the opposite of the documented no-op-at-
    scale guarantee (ADVICE r13)."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(path)
            for f in files
        )
    return None


def _conf_bytes(value: str) -> int:
    """Parse a Spark size conf ('134217728', '128m', '128mb', '1g') to bytes.
    Longest-suffix-first so the two-letter forms Spark also accepts ('kb',
    'mb', 'gb', 'tb') don't strip just the trailing 'b' and crash on
    int('128m') (ADVICE r13)."""
    v = value.strip().lower()
    for suffix, mult in (
        ("kb", 1 << 10),
        ("mb", 1 << 20),
        ("gb", 1 << 30),
        ("tb", 1 << 40),
        ("k", 1 << 10),
        ("m", 1 << 20),
        ("g", 1 << 30),
        ("t", 1 << 40),
        ("b", 1),
    ):
        if v.endswith(suffix):
            return int(float(v[: -len(suffix)]) * mult)
    return int(v)


def spread_small_scan(df: DataFrame, *input_paths: str, factor: int = 1) -> DataFrame:
    """Round-robin repartition ``df`` to the session's default parallelism when
    its input files are too small to split into that many scan tasks; identity
    (zero plan change) otherwise.

    ``input_paths``: the files/directories the frame scans. Any path that is
    not a readable LOCAL file/dir (remote hdfs://, s3a://, a missing path)
    disables the spread entirely: with no size evidence the safe direction is
    identity — never a full repartition of what might be a 100 TB production
    table (ADVICE r13). Results are partitioning-invariant by the registry's
    own certification (full-registry hostile-layout sweep, r12), so spreading
    can never change a query's output — only its parallelism.

    ``factor``: partitions per core. 1 for uniform-cost rows; 2-4 when per-row
    cost varies widely (codec decode, variable-length payloads) so the
    scheduler can rebalance the tail (guide §2.6) instead of one max-cost
    partition setting the stage wall time.
    """
    if os.environ.get("SPARK_GRAFT_NO_SPREAD"):  # measurement/debug toggle
        return df
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    if cores <= 1:
        return df
    target = cores * max(1, factor)
    max_split = _conf_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    sizes = [_size_bytes(p) for p in input_paths]
    if any(s is None for s in sizes):
        return df  # un-sizeable input (remote/missing): no evidence, no spread
    total = sum(sizes)
    natural_splits = max(1, -(-total // max_split))  # ceil-div
    if natural_splits >= target:
        return df  # the scan already parallelizes; leave the plan alone
    return df.repartition(target)


def table_path(sf_dir: str, name: str) -> str:
    """The on-disk path of a corpus table (readers.load_table's convention)."""
    return f"{sf_dir}/{name}.parquet"
